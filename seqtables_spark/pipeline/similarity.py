"""Similarity search over embedding columns (array<float>).

  - cosine_topk: brute-force exact top-k - the correctness baseline.
    Dot products/norms are explicit sequential folds (zip_with +
    aggregate) in DOUBLE: float32 products are exact in double, so a
    fixed fold order makes results bit-reproducible across engines
    (the DuckDB oracle folds in the same order).
  - lsh_bucketed_cosine: the scale path - random-hyperplane LSH
    buckets candidates, exact cosine re-ranks inside buckets. At
    100 TB the brute force is O(N*Q); LSH reduces to O(N/2^b * Q) per
    bucket probe with the same final ranking semantics.

An IVF variant (k-means coarse quantizer) would slot in the same
shape: assign -> equi-join on centroid id -> re-rank; omitted until a
clustering op lands.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity against one query vector.
    Returns DF(id, sim) with exactly k rows, deterministic tie-break
    on id. The filter+sort is a TakeOrderedAndProject - no full sort,
    no shuffle of the vectors themselves."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_similarity_col(F.col(vec_col), q).alias("sim"),
    )
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def lsh_bucketed_cosine(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH + exact re-rank.

    Bucket id = sign bits against n_planes fixed random hyperplanes.
    The query probes its own bucket plus all buckets within hamming
    distance `multiprobe_hamming` (recall knob). Exact cosine then
    ranks the candidates. Returns DF(id, sim), <= k rows.
    """
    if dim is None:
        dim = len(query_vec)
    rng = random.Random(seed)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]

    def bucket_expr(vec: Column) -> Column:
        bits = None
        for i, plane in enumerate(planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(_dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        return bits.cast("int")

    bucketed = df.withColumn("_bucket", bucket_expr(F.col(vec_col)))

    # driver-side: query bucket + multiprobe neighborhood (tiny set)
    qdot = [sum(float(a) * float(b) for a, b in zip(query_vec, plane)) for plane in planes]
    qbucket = sum((1 << i) for i, d in enumerate(qdot) if d >= 0)
    probes = {qbucket}
    if multiprobe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qbucket ^ (1 << i))
    if multiprobe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = bucketed.filter(F.col("_bucket").isin(sorted(probes)))
    scored = cand.select(
        F.col(id_col), cosine_similarity_col(F.col(vec_col), q).alias("sim")
    )
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
