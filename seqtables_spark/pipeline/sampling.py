"""Deterministic corpus sampling: stratified per-group top-n and
hash-Bernoulli source mixing — the data-mixture construction step of
a training pipeline (sample k docs per language; resample sources to
target weights).

Everything is hash-ranked, never rand(): deterministic under retries
and partitioning (a rand() sample changes membership when a stage
re-executes), and reproducible by any engine with md5 — so even the
sampling operators carry value-exact oracles.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, functions as F

from .hashing import portable_string_hash


def stratified_sample(
    df: DataFrame,
    n_per_group: int,
    by: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly n rows per group (fewer if the group is smaller),
    membership decided by portable-hash rank with id tie-break.
    One shuffle on the group key; rank is a window over each group.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        portable_string_hash(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def mix_sources(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
) -> DataFrame:
    """Hash-Bernoulli resampling to target per-source keep rates:
    keep a row iff hash(id) mod 1e6 < weight * 1e6. Row-local (zero
    shuffle), deterministic, and composable — the same row is kept or
    dropped regardless of partitioning, executor count, or retries.
    """
    h = portable_string_hash(F.col(id_col).cast("string")) % F.lit(1_000_000)
    rate = F.lit(float(default_weight))
    for src, wgt in sorted(weights.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(wgt))).otherwise(rate)
    return df.filter(h < rate * 1_000_000)
