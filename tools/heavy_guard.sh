# Serialization guard for sf100 stages (VERDICT r15 task 7 / SCALE.md
# round-15 incident 1). The box runs one heavy JVM at a time: a full
# sbt test or an interactive Verify running concurrently with an sf100
# batch starved the 96g driver's heartbeats for 600 s and killed the
# batch (r15, stage-1 T2). The rule "nothing else heavy runs while an
# sf100 stage does" is now mechanized instead of remembered: source
# this and call `heavy_guard` before every stage — it REFUSES the
# stage (non-zero) while any foreign sbt / spark-submit / DuckDB
# replay is alive, listing the offenders so the operator can wait or
# kill. The caller's own children never match: the guard runs between
# stages, after the previous stage's JVM has exited.

heavy_guard() {
  local self=$$
  local offenders
  # sbt forks java with sbt-launch.jar; spark-submit forks
  # o.a.s.deploy.SparkSubmit; the oracle replays run python3 + duckdb.
  offenders=$(pgrep -af 'sbt-launch|SparkSubmit|oracle_budget|oracle_staged' \
    2>/dev/null | awk -v self="$self" '$1 != self' || true)
  if [ -n "$offenders" ]; then
    echo "HEAVY_GUARD: refusing stage — heavy processes already running:"
    echo "$offenders"
    return 1
  fi
  echo "HEAVY_GUARD: clear"
}
