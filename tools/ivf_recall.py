"""IVF recall measurement (round-4 judge item 8): recall@10 of
ivf_topk vs the exact cosine_topk ground truth, swept over nprobe at
1x and 8x data scale.

The 8x corpus is the same key-shift construction the SCALING.md
sweeps use: 8 copies with offset ids and deterministic per-copy
component perturbation (so copies are near but not identical - ties
would make recall ambiguous). Ground truth is recomputed per scale.

Usage:  python tools/ivf_recall.py [sf_dir] [n_queries]
Prints a markdown table ready for SCALING.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

K_CELLS = 16
K_TOP = 10
NPROBES = (1, 2, 4, 8, 16)


def scaled_embeddings(spark, sf_dir: str, factor: int):
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    if factor == 1:
        return base
    copies = []
    n_off = 1_000_000
    for c in range(factor):
        pert = F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + ((F.lit(c * 31) + i) % 7 - F.lit(3.0)) * 0.01,
        )
        copies.append(
            base.select(
                (F.col("vec_id") + F.lit(c * n_off)).alias("vec_id"),
                pert.cast("array<double>").alias("embedding"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def measure_recall(spark, df, queries, nprobe: int, centroids) -> float:
    from seqtables_spark.pipeline.similarity import cosine_topk, ivf_topk

    total = 0.0
    for qv in queries:
        truth = {
            r.vec_id for r in cosine_topk(df, qv, k=K_TOP).collect()
        }
        got = {
            r.vec_id
            for r in ivf_topk(
                df, qv, centroids, k=K_TOP, nprobe=nprobe
            ).collect()
        }
        total += len(truth & got) / K_TOP
    return total / len(queries)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from seqtables_spark import get_spark
    from seqtables_spark.pipeline.similarity import ivf_assign, ivf_centroids

    spark = get_spark(app_name="ivf_recall", cores=16, shuffle_partitions=16)

    print(f"| scale | rows | nprobe/{K_CELLS} | recall@{K_TOP} |")
    print("|---|---|---|---|")
    for factor in (1, 8):
        df = scaled_embeddings(spark, sf_dir, factor).persist()
        n = df.count()
        queries = [
            [float(x) for x in r.embedding]
            for r in df.orderBy("vec_id").limit(n_queries).collect()
        ]
        cents = ivf_centroids(df, k=K_CELLS, n_iters=3)
        assigned = ivf_assign(df, cents).persist()
        assigned.count()
        for nprobe in NPROBES:
            rec = measure_recall(spark, assigned, queries, nprobe, cents)
            print(f"| {factor}x | {n} | {nprobe} | {rec:.3f} |")
        assigned.unpersist()
        df.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
