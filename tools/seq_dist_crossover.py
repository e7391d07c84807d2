"""seq_dist vs seq_dist_dense crossover (VERDICT r5 #8): the dense
mapInPandas bincount kernel pays Arrow transit + Python worker
round-trip per batch, the relational explode plan pays one JVM row
per cell - so the dense path only wins once the per-cell work
dominates the fixed transit cost. This harness times both on
synthetic fixed-width reads across row counts and prints the
crossover, which seq_dist_dense's docstring cites.

Usage: python tools/seq_dist_crossover.py [width] [row_counts ...]
       (default width 60, rows 100k 1M 4M 16M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(df_fn, runs=2):
    best = None
    for _ in range(runs):
        df = df_fn()
        df._jdf.queryExecution().executedPlan()  # plan build off-clock
        t0 = time.perf_counter()
        df.collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    row_counts = [int(x) for x in sys.argv[2:]] or [
        100_000, 1_000_000, 4_000_000, 16_000_000
    ]

    from pyspark.sql import functions as F

    from seqtables_spark import get_spark
    from seqtables_spark.model import explode_chars
    from seqtables_spark.operators.distribution import seq_dist, seq_dist_dense

    spark = get_spark(app_name="seq_dist_crossover")
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).collect()  # python worker pool warm

    print(f"{'rows':>12s} {'cells':>14s} {'explode_s':>10s} {'dense_s':>9s} "
          f"{'dense/explode':>13s}")
    for n in row_counts:
        # deterministic 4-letter reads, width chars each, JVM-side
        base = spark.range(n).select(
            F.col("id").alias("read_id"),
            F.concat_ws(
                "",
                *[
                    F.element_at(
                        F.array(F.lit("A"), F.lit("C"), F.lit("G"), F.lit("T")),
                        ((F.xxhash64(F.col("id") * 131 + i) % 4 + 4) % 4 + 1)
                        .cast("int"),
                    )
                    for i in range(width)
                ],
            ).alias("seq"),
        )
        path = f"/tmp/seq_dist_cross_{n}_{width}.parquet"
        if not os.path.isdir(path):
            base.write.mode("overwrite").parquet(path)
        reads = lambda: spark.read.parquet(path)  # noqa: E731
        t_exp = _time(
            lambda: seq_dist(
                explode_chars(reads(), qual_col=None, pos_start_col=None)
            )
        )
        t_den = _time(lambda: seq_dist_dense(reads()))
        print(f"{n:12d} {n * width:14d} {t_exp:10.3f} {t_den:9.3f} "
              f"{t_den / t_exp:13.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
