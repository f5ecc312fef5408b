#!/bin/bash
# Round-16 closing evidence: full ScalaTest suite, two-scale parity on
# the FINAL surface, and the calibration-adjusted bench sweep — each
# step's exit status checked, with a distinct failure marker instead of
# a normal-looking tail (ADVICE r15 items 3/4: r15_close2.sh ignored
# sbt's exit code, so a red suite could still have produced a clean-
# looking closing log).
set -u
cd /root/repo
. tools/heavy_guard.sh

LOG=target/scale/r16_close.log
: > "$LOG"
note () { echo "[$(date +%T)] $*" | tee -a "$LOG"; }
fail () { note "$1"; exit 1; }

heavy_guard >> "$LOG" 2>&1 || fail R16_CLOSE_ABORT_BUSY

# 1. full unit suite
note "sbt test start"
sbt -batch test > target/scale/r16_sbt_test.log 2>&1 \
  || fail R16_CLOSE_TEST_FAIL
grep -q "All tests passed." target/scale/r16_sbt_test.log \
  || fail R16_CLOSE_TEST_NOT_GREEN
note "sbt test green: $(grep 'Tests: succeeded' target/scale/r16_sbt_test.log | tail -1)"

jar cf /tmp/graft-classes.jar -C target/scala-2.13/classes . \
  || fail R16_CLOSE_JAR_FAIL
JAR=/tmp/graft-classes.jar

# 2. two-scale parity on the final surface
for sf in 0.001 0.01; do
  OUT=target/scale/verify_r16_sf$sf
  rm -rf "$OUT"
  note "verify sf$sf start"
  env SPARK_GRAFT_CPUS=16 \
  /opt/spark/bin/spark-submit --master local[16] --driver-memory 24g \
    --conf spark.local.dir=/root/repo/target/spark-tmp/r16_close \
    --class graft.Verify "$JAR" /root/testdata/sf$sf "$OUT" \
    > target/scale/r16_verify_sf$sf.log 2>&1 \
    || fail "R16_CLOSE_VERIFY_FAIL_sf$sf"
  python3 tools/check_parity.py /root/testdata/sf$sf "$OUT" \
    > target/scale/r16_parity_sf$sf.out 2>&1 \
    || fail "R16_CLOSE_PARITY_RUNNER_FAIL_sf$sf"
  tail -1 target/scale/r16_parity_sf$sf.out | tee -a "$LOG"
  grep -q "^== .*queries match ==" target/scale/r16_parity_sf$sf.out \
    || fail "R16_CLOSE_PARITY_FAIL_sf$sf"
  grep -q "^FAIL" target/scale/r16_parity_sf$sf.out \
    && fail "R16_CLOSE_PARITY_FAIL_sf$sf"
done

# 3. calibration-adjusted bench sweep at sf0.1
note "bench sweep start"
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --master local[32] --driver-memory 32g \
  --conf spark.local.dir=/root/repo/target/spark-tmp/r16_close \
  --class graft.Bench "$JAR" 2>/dev/null | grep '"metric"' \
  > target/scale/r16_bench_sf01_full.json \
  || fail R16_CLOSE_BENCH_FAIL
note "bench: $(python3 -c "
import json
j=[json.loads(l) for l in open('target/scale/r16_bench_sf01_full.json')][-1]
print(j['value'],'s raw /',j.get('total_adjusted'),'s adjusted,',len(j['queries']),'queries, cal',j.get('calibration'))")"

note R16_CLOSE_DONE
