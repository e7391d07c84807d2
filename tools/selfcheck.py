"""Differential correctness harness mimicking the driver's t2 gate:
run every __spark_entry__.queries() entry on Spark AND its
oracle_sql() on DuckDB over the same parquet, then compare
row-count + schema (column names) + order-insensitive values.

Usage:
    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, colnames):
    """Sort columns by name, canonicalize values, return a sorted list
    of row tuples (order-insensitive compare)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if v is None:
                vals.append(None)
            elif isinstance(v, bool):
                vals.append(bool(v))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    # + 0.0 canonicalizes -0.0 (Spark HALF_UP round
                    # yields +0.0 where C round yields -0.0; str-sorting
                    # '-0.0' vs '0.0' would misalign equal rows)
                    vals.append(round(v, 9) + 0.0)
            elif isinstance(v, int):
                vals.append(int(v))
            else:
                try:
                    import decimal

                    if isinstance(v, decimal.Decimal):
                        vals.append(round(float(v), 9) + 0.0)
                        continue
                except Exception:
                    pass
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from seqtables_spark import get_spark

    spark = get_spark(app_name="selfcheck", cores=16, shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown query name(s): {unknown}; known: {sorted(qs)[:10]}...")
            return 2
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        status = "OK"
        detail = ""
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = ("SPARK_ERROR", f"{type(e).__name__}: {e}", 0.0)
            traceback.print_exc()
            continue
        if name not in oracles:
            results[name] = ("NO_ORACLE", f"{len(s_rows)} rows", time.time() - t0)
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            results[name] = ("ORACLE_ERROR", f"{type(e).__name__}: {e}", time.time() - t0)
            continue
        if sorted(s_cols) != sorted(d_cols):
            status = "SCHEMA_MISMATCH"
            detail = f"spark={sorted(s_cols)} duck={sorted(d_cols)}"
        elif len(s_rows) != len(d_rows):
            status = "ROWCOUNT_MISMATCH"
            detail = f"spark={len(s_rows)} duck={len(d_rows)}"
        else:
            ns = normalize(s_rows, s_cols)
            nd = normalize(d_rows, d_cols)
            if ns != nd:
                status = "VALUE_MISMATCH"
                diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                detail = f"{sum(1 for a, b in zip(ns, nd) if a != b)} rows differ; first: {diffs}"
            else:
                detail = f"{len(s_rows)} rows"
        results[name] = (status, detail, time.time() - t0)

    print("\n" + "=" * 72)
    n_ok = 0
    for name, (status, detail, dt) in results.items():
        mark = "PASS" if status == "OK" else status
        if status == "OK":
            n_ok += 1
        print(f"{mark:18s} {name:24s} {dt:6.1f}s  {detail[:160]}")
    print(f"{n_ok}/{len(results)} OK")
    spark.stop()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
