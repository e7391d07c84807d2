"""Sweep: banded vs all-pairs KMV pairwise Jaccard as the GROUP count
grows (VERDICT r6 #5). The all-pairs path funnels G sketches into one
task doing O(G^2 k log k) python set math — fine to thousands of
groups, quadratic after; the banded path's candidate count is
sum_h C(m_h, 2) (the LSH bound), near-linear in G when cross-group
overlap is sparse. This sweep builds G groups of ~40 unique tokens
plus a small shared pool (so some pairs genuinely overlap), times
both paths warm, and prints one row per G.

Run: python tools/kmv_band_scaling.py [Gs ...]   (default 200 1000 5000)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")

from seqtables_spark.pipeline.sketch import (  # noqa: E402
    kmv_pairwise_jaccard,
    kmv_pairwise_jaccard_banded,
    kmv_sketch,
)

K = 16
TOKENS_PER_GROUP = 40
SHARED_POOL = 30  # tokens every 20th group draws from -> sparse overlap


def build_sketches(spark, g: int):
    # deterministic synthetic membership, JVM-born (no driver loop):
    # group i owns tokens u{i}_{0..39}; groups with i % 20 == 0 also
    # take 10 tokens from the shared pool (chosen by i) so a sparse
    # subset of pairs overlaps.
    base = spark.range(g).select(
        F.col("id").alias("gid"),
        F.explode(F.sequence(F.lit(0), F.lit(TOKENS_PER_GROUP - 1))).alias("j"),
    ).select(
        F.concat(F.lit("grp"), F.col("gid")).alias("source"),
        F.concat(F.lit("u"), F.col("gid"), F.lit("_"), F.col("j")).alias("tok"),
    )
    shared = spark.range(0, g, 20).select(
        F.col("id").alias("gid"),
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("j"),
    ).select(
        F.concat(F.lit("grp"), F.col("gid")).alias("source"),
        F.concat(
            F.lit("s"), (F.col("gid") / 20 + F.col("j")).cast("long") % SHARED_POOL
        ).alias("tok"),
    )
    df = base.unionByName(shared)
    return kmv_sketch(df, "tok", k=K, group_by=["source"]).persist()


def main() -> None:
    gs = [int(a) for a in sys.argv[1:]] or [200, 1000, 5000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'G':>6} {'allpairs_s':>11} {'banded_s':>9} {'n_pairs':>8} {'cand_bound':>10}")
    for g in gs:
        sk = build_sketches(spark, g)
        sk.count()  # materialize outside the timed region

        t0 = time.perf_counter()
        n_band = kmv_pairwise_jaccard_banded(sk, k=K).count()
        t_band = time.perf_counter() - t0

        # candidate bound sum_h C(m_h, 2) — what the banded join emits
        cand = (
            sk.select(F.explode("kmv").alias("h"))
            .groupBy("h").agg(F.count(F.lit(1)).alias("m"))
            .agg(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("c"))
            .collect()[0]["c"]
        )

        if g <= 2000:  # the one-task path is the thing being outgrown
            t0 = time.perf_counter()
            n_all = (
                kmv_pairwise_jaccard(sk, k=K)
                .filter(F.col("n_shared_sketch") >= 1)
                .count()
            )
            t_all = time.perf_counter() - t0
            assert n_all == n_band, (n_all, n_band)
            all_s = f"{t_all:11.2f}"
        else:
            all_s = "   (skipped)"
        print(f"{g:>6} {all_s} {t_band:9.2f} {n_band:8d} {int(cand):10d}")
        sk.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
