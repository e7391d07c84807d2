"""Round-4 operators: distributed global ranks (2-phase row_number /
ntile) and the hot-shingle / bounded-state guards added this round."""

import random

import pytest

from pyspark.sql import Window, functions as F


@pytest.mark.parametrize("rows,parts", [(1, 4), (9, 4), (100, 7), (1000, 13)])
def test_global_row_number_matches_window(spark, rows, parts):
    from seqtables_spark.operators.ranks import global_row_number

    rng = random.Random(rows)
    data = [(i, rng.randint(0, 10_000)) for i in range(rows)]
    df = spark.createDataFrame(data, "id long, v long")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r.id: r.rn
        for r in global_row_number(df, order, num_partitions=parts).collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("rows,n", [(5, 10), (10, 10), (103, 10), (1000, 7)])
def test_global_ntile_matches_window(spark, rows, n):
    from seqtables_spark.operators.ranks import global_ntile

    rng = random.Random(n * rows)
    data = [(i, rng.randint(0, 500)) for i in range(rows)]
    df = spark.createDataFrame(data, "id long, v long")
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r.id: r.tile
        for r in global_ntile(df, order, n, num_partitions=5).collect()
    }
    want = {
        r.id: r.t
        for r in df.withColumn(
            "t", F.ntile(n).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_global_row_number_no_single_task_sort(spark):
    """The plan must range-repartition, not funnel through one
    unpartitioned Window sort."""
    from seqtables_spark.operators.ranks import global_row_number

    df = spark.range(1000).selectExpr("id", "id % 37 AS v")
    plan = global_row_number(
        df, [F.col("v").asc(), F.col("id").asc()], num_partitions=8
    )._jdf.queryExecution().executedPlan().toString()
    # Round 12 (opt): the range exchange lives inside the lazy
    # localCheckpoint lineage (the consumer plan reads the checkpoint
    # scan); the load-bearing property is still that NO unpartitioned
    # window sort of the full relation is ever planned
    assert "ExistingRDD" in plan
    assert "Window [row_number" not in plan


def test_aqe_skew_join_splits_hot_key_end_to_end(spark):
    """The OTHER half of the skew story (operators/skew.py handles
    build-sides AQE can't broadcast; AQE skew-split handles hot keys
    at runtime): a star-schema join with one mega-key must come back
    with the SortMergeJoin marked skew=true in the final adaptive
    plan, values identical to the unskewed plan."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # fact: 50k rows, 90% on one hot key; dim: 100 keys. NOTE the
        # probe is the bare join: a downstream groupBy(k) would reuse
        # the join's hash(k) partitioning and AQE then (correctly)
        # refuses to split the skewed partition - measured on this
        # Spark even under forceOptimizeSkewedJoin. That interaction
        # is exactly why operators/skew.salted_join exists for
        # agg-after-join shapes (q_salted_brand_revenue pins it).
        fact = spark.range(50_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 100 END AS k",
            "id AS v",
            "repeat('x', 64) AS pad",
        )
        dim = spark.range(100).selectExpr("id AS k", "id * 10 AS dv")
        joined = fact.join(dim, "k").select("k", "v", "dv")
        got = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
        # value parity with the default-conf plan, aggregated py-side
        agg = {}
        for r in got:
            n, s = agg.get(r.k, (0, 0))
            agg[r.k] = (n + 1, s + r.dv)
        for k, v in confs.items():
            spark.conf.unset(k)
        want = {
            r.k: (r.n, r.s)
            for r in fact.join(dim, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dv").alias("s"))
            .collect()
        }
        assert agg == want
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("seed", [0, 7])
def test_training_order_is_seeded_permutation(spark, seed):
    from seqtables_spark.pipeline.sampling import training_order

    df = spark.range(500).selectExpr("id AS doc_id")
    rows = training_order(df, seed=seed, num_partitions=4).collect()
    pos = sorted(r.position for r in rows)
    assert pos == list(range(1, 501))  # exact 1..N permutation
    # deterministic: same seed -> same order; different seed -> different
    again = {r.doc_id: r.position for r in
             training_order(df, seed=seed, num_partitions=7).collect()}
    assert {r.doc_id: r.position for r in rows} == again
    other = {r.doc_id: r.position for r in
             training_order(df, seed=seed + 1, num_partitions=4).collect()}
    assert again != other
