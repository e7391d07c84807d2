"""operators.widen — map-parallelism restore for indivisible scans."""

from __future__ import annotations

from seqtables_spark.operators import widen


def _one_rowgroup_file(spark, tmp_path, n=5000):
    path = str(tmp_path / "one_rg")
    spark.range(n).selectExpr(
        "id", "md5(cast(id as string)) AS payload"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_widen_restores_parallelism(spark, tmp_path):
    """A single-row-group parquet scans as ONE task (a row group is
    indivisible); widen() restores defaultParallelism partitions so
    the compute-bound map side uses every core."""
    path = _one_rowgroup_file(spark, tmp_path)
    df = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() == 1  # the trap this fixes
    wide = widen(df)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # values untouched — widen is a pure round-robin exchange
    assert wide.count() == df.count()
    assert set(r["id"] for r in wide.collect()) == set(range(5000))


def test_widen_explicit_partitions(spark, tmp_path):
    df = spark.read.parquet(_one_rowgroup_file(spark, tmp_path))
    assert widen(df, num_partitions=7).rdd.getNumPartitions() == 7


def test_widen_only_if_narrow_skips_wide_input(spark, tmp_path):
    """only_if_narrow: inputs already scanning wider than half the
    target keep their plan — no pointless exchange (the many-files /
    many-row-groups production case)."""
    df = spark.read.parquet(_one_rowgroup_file(spark, tmp_path))
    n = spark.sparkContext.defaultParallelism
    already = df.repartition(n)
    out = widen(already, only_if_narrow=True)
    assert out is already  # plan object unchanged -> no new exchange
    # narrow input still widens
    assert (
        widen(df, only_if_narrow=True).rdd.getNumPartitions() == n
    )
