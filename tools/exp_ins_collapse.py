"""Round-12 experiment: validate + time the collapsed formulations of
consensus_with_insertions and get_insertion_seq_dist against the
current (shipped) implementations, on adversarial synthetic data:
ties between gap and letters, modecutoff boundary slots, slots where
every read has the insertion (gap cnt 0), min_ins_count filtering,
multi-char loc_ins, and a large enough corpus to time the kernels.

Usage: python tools/exp_ins_collapse.py [n_reads]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from seqtables_spark import get_spark
from seqtables_spark.operators.insertions import (
    consensus_with_insertions,
    get_insertion_seq_dist,
)


def canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(None if v is None else (round(v, 9) if isinstance(v, float) else v)
              for v in (r[c] for c in cols))
        for r in df.collect()
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    spark = get_spark(app_name="exp_ins_collapse")
    spark.range(1000).selectExpr("sum(id)").collect()

    # reads: W=8 positions, bases derived deterministically
    reads = spark.range(n).select(
        F.col("id").cast("string").alias("read_id"),
        F.col("id").alias("i"),
    )
    cells = reads.select(
        "read_id",
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("position"),
    ).select(
        "read_id",
        "position",
        F.element_at(
            F.array(*[F.lit(c) for c in "ACGTN"]),
            ((F.col("read_id").cast("long") * 7 + F.col("position")) % 5 + 1
             ).cast("int"),
        ).alias("base"),
    )
    # insertions: pos 3 loc 1 on ~half the reads (gap ~ half: tie-ish),
    # pos 3 loc 2 on exactly 50% with one base (exact ties),
    # pos 5 loc 1 on ALL reads (gap cnt 0),
    # pos 6 loc 1 on 10% (gap consensus -> excluded slot),
    # pos 7 loc 1 on 2 reads only (min_ins_count target)
    rid = F.col("read_id").cast("long")
    ins = (
        reads.select("read_id")
        .withColumn("position", F.lit(3)).withColumn("loc_ins", F.lit(1))
        .withColumn("base", F.when(rid % 2 == 0, "A").otherwise("C"))
        .filter(rid % 100 < 49)
        .unionByName(
            reads.select("read_id").filter(rid % 2 == 0)
            .withColumn("position", F.lit(3)).withColumn("loc_ins", F.lit(2))
            .withColumn("base", F.lit("G"))
        )
        .unionByName(
            reads.select("read_id")
            .withColumn("position", F.lit(5)).withColumn("loc_ins", F.lit(1))
            .withColumn("base", F.when(rid % 3 == 0, "T").otherwise("A"))
        )
        .unionByName(
            reads.select("read_id").filter(rid % 10 == 0)
            .withColumn("position", F.lit(6)).withColumn("loc_ins", F.lit(1))
            .withColumn("base", F.lit("A"))
        )
        .unionByName(
            reads.select("read_id").filter(rid < 2)
            .withColumn("position", F.lit(7)).withColumn("loc_ins", F.lit(1))
            .withColumn("base", F.lit("T"))
        )
        .withColumn("qual", F.lit(30))
    )

    for kwargs in (
        {},
        {"modecutoff": 0.49},
        {"min_ins_count": 3},
        {"exclude_insertions_with_gap_cons": False},
        {"positions": [3, 5, 7]},
    ):
        a = canon(consensus_with_insertions(cells, ins, **kwargs))
        print(f"consensus {kwargs}: {len(a)} rows")
        globals().setdefault("_snap", {})[f"cons{kwargs}"] = a

    for kwargs in (
        {"n_reads_total": n},
        {"n_reads_total": n, "method": "freq"},
        {"n_reads_total": n, "method": "bits"},
        {"n_reads_total": n, "min_ins_count": 3},
        {},
        {"positions": [3, 7], "n_reads_total": n},
    ):
        a = canon(get_insertion_seq_dist(ins, **kwargs))
        print(f"insdist {kwargs}: {len(a)} rows")
        globals()["_snap"][f"dist{kwargs}"] = a

    import json
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ins_collapse_snap.json"
    with open(out, "w") as fh:
        json.dump({k: v for k, v in globals()["_snap"].items()}, fh, default=str)
    print("snapshot ->", out)

    # timing: noop-sink, fresh plan per rep, min of 3
    for name, fn in (
        ("consensus", lambda: consensus_with_insertions(cells, ins)),
        ("insdist", lambda: get_insertion_seq_dist(ins, n_reads_total=n)),
    ):
        best = None
        for _ in range(3):
            d = fn()
            d._jdf.queryExecution().executedPlan()
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.perf_counter() - t0)
        plan = d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted")
        import re
        print(f"{name}: noop={best:.3f}s exchanges={len(re.findall(r'Exchange', plan))}")
    spark.stop()


if __name__ == "__main__":
    main()
