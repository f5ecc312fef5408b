#!/usr/bin/env python3
"""Scale up the `events` table the same way graft.ScaleUp scales the
other fact tables (disjoint key universes: event_id/user_id shifted by
copy * 10_000_000). Lives in python because the driver wrote events with
the TIMESTAMP(NANOS) parquet physical type, which Spark can read (via
the nanosAsLong legacy flag) but not write; pyarrow round-trips it.

Usage: python3 tools/scale_events.py <srcDir> <dstDir> [factor]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    t = pq.read_table(f"{src}/events.parquet")
    # Write a DIRECTORY of per-copy part files (like every Spark-written
    # table on a real cluster), not one monolithic file: a single 1.2 GB
    # file gives a 32-core scan only ~10 input splits at the default
    # 128 MB maxPartitionBytes (measured at sf100: events_hourly 41.8 s
    # single-file vs 22.3 s once splits were shrunk to 32 MB — see
    # SCALE.md). Multi-file layout removes the need for the split knob.
    import os
    import shutil
    outdir = f"{dst}/events.parquet"
    # clear stale part files first: re-running with a smaller factor
    # would otherwise leave old part-NNNNN files mixed in, silently
    # inflating the table (both engines read the same inflated data, so
    # oracle parity would stay green and mask it)
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)
    # ~2M rows (~25 MB) per part file: big enough to avoid a tiny-file
    # explosion at factor=1000 (50 files), small enough that a 32-core
    # scan gets a split per core (parquet splits at file granularity
    # below maxPartitionBytes).
    rows_per_file = 2_000_000
    total, nfile, pending = 0, 0, []
    for c in range(factor):
        shifted = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], c * STRIDE))
        shifted = shifted.set_column(
            shifted.schema.get_field_index("user_id"), "user_id",
            pc.add(shifted["user_id"], c * STRIDE))
        pending.append(shifted)
        total += shifted.num_rows
        if sum(p.num_rows for p in pending) >= rows_per_file or c == factor - 1:
            pq.write_table(
                pa.concat_tables(pending), f"{outdir}/part-{nfile:05d}.parquet")
            nfile, pending = nfile + 1, []
    print(f"scaled events {src} -> {dst} x{factor}: {total} rows, "
          f"{nfile} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
