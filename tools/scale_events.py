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
    parts = []
    for c in range(factor):
        shifted = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], c * STRIDE))
        shifted = shifted.set_column(
            shifted.schema.get_field_index("user_id"), "user_id",
            pc.add(shifted["user_id"], c * STRIDE))
        parts.append(shifted)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/events.parquet")
    print(f"scaled events {src} -> {dst} x{factor}: {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
