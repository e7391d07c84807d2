"""Build a TIMESTAMP(NANOS) replica of a testdata dir.

The driver environment's events.parquet stores ts as parquet
TIMESTAMP(NANOS) (isAdjustedToUTC=false); the local regenerated
testdata stores TIMESTAMP(MICROS). Spark reads NANOS only under
spark.sql.legacy.parquet.nanosAsLong=true, and then as BIGINT — a
completely different engine code path from the local TIMESTAMP one.
This script replicates the driver's data shape so that path is
testable locally: every table is copied/symlinked verbatim except
events.parquet, whose ts column is rewritten as timestamp[ns]
(identical instants).

Usage: python tools/make_nanos_fixture.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.01 -> /root/testdata_nanos/sf0.01
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def make(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        s, d = os.path.join(src, fn), os.path.join(dst, fn)
        if fn == "events.parquet":
            t = pq.read_table(s)
            i = t.schema.get_field_index("ts")
            ns_col = t.column("ts").cast(pa.timestamp("ns"))
            t = t.set_column(i, pa.field("ts", pa.timestamp("ns")), ns_col)
            # store_schema=False drops the pandas/Arrow schema metadata
            # so readers see the raw parquet TIMESTAMP(NANOS) type the
            # way the driver's file presents it (no Arrow round-trip
            # hints to fall back on).
            pq.write_table(t, d, store_schema=False)
            print(f"rewrote {fn}: ts -> timestamp[ns] ({t.num_rows} rows)")
        else:
            if os.path.lexists(d):
                os.unlink(d)
            os.symlink(os.path.abspath(s), d)
    print(f"fixture at {dst}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_nanos/sf0.01"
    make(src, dst)
