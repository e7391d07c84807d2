"""Round-7 additions: deterministic uniform hash sampling + sketch
quantiles (pipeline/sketch.py) and A-ES weighted sampling without
replacement (pipeline/sampling.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seqtables_spark.pipeline.hashing import portable_string_hash  # noqa: F401
from seqtables_spark.pipeline.sampling import weighted_sample
from seqtables_spark.pipeline.sketch import hash_sample, sample_quantiles


def _vals_df(spark, n=1000, groups=("a", "b")):
    return spark.range(n).select(
        F.col("id"),
        F.element_at(
            F.array(*[F.lit(g) for g in groups]),
            (F.col("id") % len(groups) + 1).cast("int"),
        ).alias("grp"),
        (F.col("id") * 7 % 997).cast("double").alias("v"),
    )


def test_hash_sample_deterministic_bounded_and_column_preserving(spark):
    df = _vals_df(spark)
    s1 = hash_sample(df, "id", k=64, group_by=["grp"])
    s2 = hash_sample(df, "id", k=64, group_by=["grp"])
    r1 = sorted(tuple(r) for r in s1.collect())
    assert r1 == sorted(tuple(r) for r in s2.collect())  # deterministic
    assert s1.columns == df.columns  # all columns survive
    per_grp = {
        r["grp"]: r["n"]
        for r in s1.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 64 for n in per_grp.values())
    # k > group size -> the whole group
    small = hash_sample(df.filter("id < 10"), "id", k=64)
    assert small.count() == 10


def test_hash_sample_is_mergeable(spark):
    """bottom-k of the union == bottom-k of per-shard bottom-k's:
    per-day samples fold without revisiting raw data."""
    df = _vals_df(spark, 2000)
    whole = hash_sample(df, "id", k=50)
    shard_a = hash_sample(df.filter("id % 2 = 0"), "id", k=50)
    shard_b = hash_sample(df.filter("id % 2 = 1"), "id", k=50)
    folded = hash_sample(shard_a.unionByName(shard_b), "id", k=50)
    assert sorted(r["id"] for r in folded.collect()) == sorted(
        r["id"] for r in whole.collect()
    )


def test_hash_sample_is_roughly_uniform(spark):
    """The sampled ids' mean sits near the population mean (uniform
    keys hash uniformly) — loose 3-sigma band, deterministic data."""
    n, k = 20_000, 500
    df = spark.range(n).select(F.col("id"))
    got = [r["id"] for r in hash_sample(df, "id", k=k).collect()]
    mean = sum(got) / k
    sigma = (n / math.sqrt(12)) / math.sqrt(k)
    assert abs(mean - (n - 1) / 2) < 3 * sigma


def test_sample_quantiles_matches_local_replay(spark):
    df = _vals_df(spark, 500)
    samp = hash_sample(df, "id", k=100, group_by=["grp"])
    out = {
        r["grp"]: r
        for r in sample_quantiles(
            samp, "v", [0.5, 0.9], group_by=["grp"], k=100
        ).collect()
    }
    local = {}
    for r in samp.collect():
        local.setdefault(r["grp"], []).append(r["v"])
    for g, vals in local.items():
        vals.sort()
        n = len(vals)
        assert out[g]["sample_n"] == n
        for p, col in [(0.5, "p50"), (0.9, "p90")]:
            assert out[g][col] == vals[int(math.floor(p * (n - 1)))]


def test_sample_quantiles_bound_guard_raises(spark):
    df = _vals_df(spark, 300)  # groups of 150 > declared k=100
    q = sample_quantiles(df, "v", [0.5], group_by=["grp"], k=100)
    with pytest.raises(Exception, match="exceeds declared sample bound"):
        q.collect()


def _aes_local(rows, k, seed=17):
    """Exact local replay of weighted_sample's formula."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2147483647

    keyed = []
    for rid, w in rows:
        if w is None or w <= 0:
            continue
        u = (h(f"{seed}:{rid}") + 1.0) / 2147483648.0
        keyed.append((math.log(u) / w, str(rid), rid))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return sorted(rid for _, _, rid in keyed[:k])


def test_weighted_sample_matches_exact_replay_and_excludes_nonpositive(spark):
    rows = [(i, float((i * 13) % 50) - 2.0) for i in range(400)]  # some <= 0
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "w", k=60, id_col="doc_id").collect()
    )
    assert got == _aes_local(rows, 60)
    # determinism across a second run
    got2 = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "w", k=60, id_col="doc_id").collect()
    )
    assert got2 == got
    # different seed -> different draw (overwhelmingly)
    got3 = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "w", k=60, id_col="doc_id", seed=99).collect()
    )
    assert got3 != got


def test_weighted_sample_weight_dominance_and_groups(spark):
    """Rows with overwhelming weight are always selected; per-group
    k is exact."""
    rows = (
        [(i, "g1", 1e12) for i in range(3)]          # giants: always in
        + [(i + 10, "g1", 1.0) for i in range(50)]
        + [(i + 100, "g2", 1.0) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = weighted_sample(
        df, "w", k=10, id_col="doc_id", group_by=("grp",)
    )
    by_grp = {}
    for r in out.collect():
        by_grp.setdefault(r["grp"], set()).add(r["doc_id"])
    assert len(by_grp["g1"]) == 10 and len(by_grp["g2"]) == 10
    assert {0, 1, 2} <= by_grp["g1"]


def test_weighted_sample_expected_rates(spark):
    """Statistical sanity over independent seeds: a weight-10 row is
    selected far more often than a weight-1 row when k is scarce."""
    rows = [(i, 10.0 if i < 20 else 1.0) for i in range(220)]
    df = spark.createDataFrame(rows, "doc_id long, w double").persist()
    heavy = light = 0
    for seed in range(12):
        sel = {
            r["doc_id"]
            for r in weighted_sample(
                df, "w", k=40, id_col="doc_id", seed=seed
            ).collect()
        }
        heavy += sum(1 for i in range(20) if i in sel)
        light += sum(1 for i in range(20, 220) if i in sel)
    df.unpersist()
    # 20 heavy (w=10) vs 200 light (w=1): heavy inclusion rate must
    # dominate light's by a wide margin
    assert heavy / (12 * 20) > 3 * (light / (12 * 200))


def test_hash_sample_plan_is_group_limited(spark):
    """The rank filter must plan as a WindowGroupLimit (grouped) /
    distributed top-k — never a full unpartitioned sort of the
    relation without a limit."""
    df = _vals_df(spark, 2000)
    plan = (
        hash_sample(df, "id", k=16, group_by=["grp"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_cms_one_sided_error_and_merge(spark):
    """CMS contract: est >= exact for EVERY key (never undercount);
    merged per-shard sketches == whole-corpus sketch cell-for-cell;
    wide sketches estimate heavy keys near-exactly."""
    from seqtables_spark.pipeline.sketch import (
        cms_build, cms_estimate, cms_merge,
    )

    rows = [(i, f"k{i % 97}") for i in range(3000)] + [
        (3000 + i, "hot") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "rid long, word string")
    exact = {
        r["word"]: r["n"]
        for r in df.groupBy("word").agg(F.count("*").alias("n")).collect()
    }
    cms = cms_build(df, "word", width=256, depth=4)
    probes = df.select("word").distinct()
    est = {
        r["word"]: r["est_count"]
        for r in cms_estimate(probes, cms, "word", width=256, depth=4).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # one-sided
    assert est["hot"] >= 500
    # mergeability: two half-corpus sketches fold to the whole's cells
    # (deterministic split on the row id)
    h1 = cms_build(df.filter("rid % 2 = 0"), "word", width=256, depth=4)
    h2 = cms_build(df.filter("rid % 2 = 1"), "word", width=256, depth=4)
    merged = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_merge(h1.unionByName(h2)).collect()
    }
    whole = {(r["j"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert merged == whole


def test_cms_weighted_build(spark):
    """weight_col: pre-aggregated (key, count) relations build the
    same sketch as the raw stream."""
    from seqtables_spark.pipeline.sketch import cms_build

    raw = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3, "word string"
    )
    agg = spark.createDataFrame([("a", 5), ("b", 3)], "word string, n long")
    s_raw = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build(raw, "word", width=64, depth=3).collect()
    }
    s_agg = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms_build(
            agg, "word", width=64, depth=3, weight_col="n"
        ).collect()
    }
    assert s_raw == s_agg


def test_ungrouped_sampler_plans_are_group_limited(spark):
    """Ungrouped hash_sample / weighted_sample: the row_number filter
    must plan a WindowGroupLimit (per-partition top-k prefilter), so
    the single-partition final Window only ever sees <= k rows per
    upstream partition — bounded at any data size."""
    df = _vals_df(spark, 5000)
    for plan in (
        hash_sample(df, "id", k=16)
        ._jdf.queryExecution().executedPlan().toString(),
        weighted_sample(df, "v", k=16, id_col="id")
        ._jdf.queryExecution().executedPlan().toString(),
    ):
        # ungrouped rank<=k rewrites to TakeOrderedAndProject(limit=k)
        # (per-partition top-k + k-row merge); grouped would be
        # WindowGroupLimit — either way, bounded state per task
        assert (
            "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
        ), plan


def test_sample_quantiles_null_values(spark):
    """Round-7 review fix: NULLs are excluded from the quantile fold
    on both engines; an all-NULL group emits sample_n=0 with NULL
    quantiles instead of raising INVALID_INDEX_OF_ZERO."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None), ("b", None)],
        "grp string, v double",
    )
    out = {
        r["grp"]: r
        for r in sample_quantiles(df, "v", [0.5], group_by=["grp"]).collect()
    }
    assert out["a"]["sample_n"] == 2 and out["a"]["p50"] == 1.0
    assert out["b"]["sample_n"] == 0 and out["b"]["p50"] is None
