"""Distributed global ranking: exact row_number / ntile WITHOUT a
single-task global sort.

Not part of the reference surface (the reference ranks in-memory numpy
arrays); this is the scale-out primitive behind decile/percentile cuts
in the entry queries. Spark's `Window.orderBy(...)` with no partition
key executes as ONE task holding every row - correct, but the exact
anti-pattern at 100 TB.

The classic 2-phase formulation used here:

  1. `repartitionByRange` on the sort key (range-disjoint partitions,
     equal keys co-located - a sampled-boundary shuffle),
  2. per-partition `row_number` (parallel sorts of N/P rows each),
  3. add each partition's global offset = cumulative count of the
     partitions before it (a P-row aggregate, broadcast back).

Cost: two shuffles (range + the pid-window hash, both carrying the
data once) and one broadcast of P rows - every stage's memory is
bounded by the partition size, never by N. Ties within the full sort
key get an arbitrary order exactly as the single-task window would;
pass a unique tiebreaker column for determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ranked_parts(
    df: DataFrame,
    order_by: Sequence[Column],
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared 2-phase core: (local, offsets).

    local   = ranged rows + __pid__ + per-partition __lrn__;
    offsets = P rows of (__pid__, __cnt__, __off__ = exclusive
              running count).

    The offsets branch aggregates the PRE-window `rp` relation, not
    the windowed one: both branches then share the identical
    scan->range-exchange subplan (AQE reuses the shuffle stage), and
    the offsets side adds only a map-side-partial count - the window
    sort never runs twice. (First formulation counted the windowed
    relation and re-executed the whole rank pipeline per branch.)"""
    order_by = list(order_by)
    parts = int(
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    rp = df.repartitionByRange(parts, *order_by).withColumn(
        "__pid__", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid__").orderBy(*order_by)
    local = rp.withColumn("__lrn__", F.row_number().over(w))
    # per-partition counts -> exclusive running offset: P rows total,
    # so the unpartitioned window here is a no-op at any data scale
    wo = Window.orderBy("__pid__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        rp.groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
        .withColumn("__off__", F.coalesce(F.sum("__cnt__").over(wo), F.lit(0)))
    )
    return local, offsets


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over `order_by` (list of Column
    expressions, e.g. [F.col('x').desc(), F.col('id')]), computed with
    bounded per-task state (see module docstring)."""
    local, offsets = _ranked_parts(df, order_by, num_partitions)
    # long, not int: the global rank exceeds int32 past ~2.147B rows
    # (routine at the module's target scale) and a non-ANSI int cast
    # would wrap silently. Only the tile NUMBER in global_ntile stays
    # int (n is small by construction).
    return (
        local.join(F.broadcast(offsets.select("__pid__", "__off__")), "__pid__")
        .withColumn(out_col, (F.col("__lrn__") + F.col("__off__")).cast("long"))
        .drop("__pid__", "__lrn__")
    )


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n: int,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact `ntile(n) OVER (ORDER BY ...)` semantics, distributed:
    the first (N mod n) tiles hold ceil(N/n) rows, the rest floor(N/n)
    - identical to Spark's/ANSI ntile, derived arithmetically from the
    2-phase global row number. The total count comes from the SAME
    P-row offsets relation (sum of partition counts), so no extra
    pass over the data is ever planned."""
    local, offsets = _ranked_parts(df, order_by, num_partitions)
    total = offsets.agg(F.sum("__cnt__").alias("__n__"))
    r = (F.col("__lrn__") + F.col("__off__")).cast("long")
    big = F.floor(F.col("__n__") / n) + 1          # ceil size, first rem tiles
    rem = F.col("__n__") % n
    cut = big * rem                                 # rows covered by big tiles
    tile = F.when(r <= cut, F.floor((r - 1) / big) + 1).otherwise(
        rem + F.floor((r - 1 - cut) / (big - 1)) + 1
    )
    return (
        local.join(F.broadcast(offsets.select("__pid__", "__off__")), "__pid__")
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, tile.cast("int"))
        .drop("__pid__", "__lrn__", "__off__", "__n__")
    )


def global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE `sum(value) OVER (ORDER BY ...)` semantics,
    distributed — the same 2-phase shape as global_row_number but the
    P-row offsets relation carries each partition's value SUM instead
    of its row count: range-partition on the sort key, per-partition
    windowed running sum (bounded state), then add the exclusive
    running total of the partitions before it (broadcast of P rows).

    Ties within `order_by` get an arbitrary order exactly as the
    single-task window would; pass a unique tiebreaker column for a
    deterministic cut. The running sum is long-typed: cast `value_col`
    to a fixed-point integer upstream (cents/token counts), since a
    float running sum is order-dependent and breaks exactness."""
    order_by = list(order_by)
    parts = int(
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    rp = df.repartitionByRange(parts, *order_by).withColumn(
        "__pid__", F.spark_partition_id()
    )
    v = F.col(value_col).cast("long")
    w = (
        Window.partitionBy("__pid__")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = rp.withColumn("__lsum__", F.sum(v).over(w))
    wo = Window.orderBy("__pid__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        rp.groupBy("__pid__")
        .agg(F.sum(v).alias("__s__"))
        .withColumn("__off__", F.coalesce(F.sum("__s__").over(wo), F.lit(0)))
    )
    return (
        local.join(F.broadcast(offsets.select("__pid__", "__off__")), "__pid__")
        .withColumn(out_col, (F.col("__lsum__") + F.col("__off__")).cast("long"))
        .drop("__pid__", "__lsum__")
    )
