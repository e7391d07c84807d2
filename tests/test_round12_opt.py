"""Round-12 optimization pins: the rank/cumsum framework dropped its
second full-data exchange (hash(__pid__) window) in favor of
sortWithinPartitions + monotonically_increasing_id positions (ranks)
and a one-pass Arrow cumsum (running sum). These tests pin the
load-bearing property that made the rewrite safe: the within-partition
sort feeding the nondeterministic position expression must survive
Catalyst (EliminateSorts must not fire through the nondeterministic
projection), so the values stay row-identical to the window
formulation across downstream joins/aggregates.
"""

import pytest
from pyspark.sql import Window, functions as F


@pytest.fixture(scope="module")
def spark():
    from seqtables_spark import get_spark

    s = get_spark(app_name="round12-opt-tests", cores=4, shuffle_partitions=4)
    yield s


def _window_row_number(df, order_by, parts):
    """The pre-round-12 formulation, kept as the semantics reference."""
    rp = df.repartitionByRange(parts, *order_by).withColumn(
        "__pid__", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid__").orderBy(*order_by)
    local = rp.withColumn("__lrn__", F.row_number().over(w))
    wo = Window.orderBy("__pid__").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        rp.groupBy("__pid__")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
        .withColumn("__off__", F.coalesce(F.sum("__cnt__").over(wo), F.lit(0)))
    )
    return (
        local.join(F.broadcast(offsets.select("__pid__", "__off__")), "__pid__")
        .withColumn("rn", (F.col("__lrn__") + F.col("__off__")).cast("long"))
        .drop("__pid__", "__lrn__", "__off__")
    )


def test_global_row_number_matches_window_formulation(spark):
    from seqtables_spark.operators.ranks import global_row_number

    df = spark.range(20_000).selectExpr(
        "id", "CAST(hash(id * 7) AS BIGINT) AS v"
    ).repartition(8)
    ob = [F.col("v").desc(), F.col("id").asc()]
    got = {
        (r["id"], r["rn"])
        for r in global_row_number(df, ob, out_col="rn", num_partitions=4).collect()
    }
    want = {(r["id"], r["rn"]) for r in _window_row_number(df, ob, 4).collect()}
    assert got == want


def test_global_row_number_survives_downstream_aggregate(spark):
    """EliminateSorts guard: an aggregate above the rank must not let
    Catalyst drop the sortWithinPartitions that the position
    expression reads its order from."""
    from seqtables_spark.operators.ranks import global_row_number

    df = spark.range(20_000).selectExpr(
        "id", "CAST(hash(id * 13) AS BIGINT) AS v"
    ).repartition(8)
    ob = [F.col("v").asc(), F.col("id").asc()]
    agg = (
        global_row_number(df, ob, out_col="rn", num_partitions=4)
        .groupBy((F.col("rn") % 7).alias("g"))
        .agg(F.sum("rn").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    ref = (
        _window_row_number(df, ob, 4)
        .groupBy((F.col("rn") % 7).alias("g"))
        .agg(F.sum("rn").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    got = {(r["g"], r["s"], r["c"]) for r in agg.collect()}
    want = {(r["g"], r["s"], r["c"]) for r in ref.collect()}
    assert got == want
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    # the within-partition sort the positions are read in survived
    # (formatted mode renders the node as "(n) Sort [codegen id: m]")
    assert ") Sort" in plan
    assert "monotonically_increasing_id" in plan
    # no row_number window = no full-data hash(__pid__) re-shuffle
    # (the tiny offsets COUNT aggregate still exchanges its P rows)
    assert "Window [row_number" not in plan


def test_global_running_sum_null_values_skip_like_window_sum(spark):
    """A NULL value row leaves the running total unchanged (window-sum
    parity) — the Arrow kernel's fill_null(0) pin."""
    from seqtables_spark.operators.ranks import global_running_sum

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5), (4, None), (5, 1)],
        "id long, v long",
    )
    out = global_running_sum(
        df, [F.col("id").asc()], "v", out_col="cum", num_partitions=2
    )
    got = {(r["id"], r["cum"]) for r in out.collect()}
    assert got == {(1, 10), (2, 10), (3, 15), (4, 15), (5, 16)}
