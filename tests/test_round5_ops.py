"""Round-5 additions: skew-immune ranged as-of join, IVF recall
floor, and the skew-distribution pins behind SCALING.md's round-5
rows."""

import random

import pytest
from pyspark.sql import functions as F


def _random_asof_case(seed, n_left=200, n_right=80, n_keys=6):
    rng = random.Random(seed)
    left = [
        (f"k{rng.randrange(n_keys)}", rng.randrange(0, 1000), i)
        for i in range(n_left)
    ]
    # key k0 may have no rights at all in some seeds; keep one key
    # ("k9") entirely right-less on purpose
    left += [("k9", rng.randrange(0, 1000), n_left + j) for j in range(5)]
    right = [
        (f"k{rng.randrange(n_keys)}", rng.randrange(0, 1000), float(j))
        for j in range(n_right)
    ]
    # planted timestamp ties, both directions
    right += [(left[0][0], left[0][1], 999.0)]
    # collapse right (key, ts) duplicates - the documented asof
    # contract: which duplicate wins is union-sort-order ambiguous,
    # so exact-parity callers pre-aggregate (the oracles do the same)
    agg: dict = {}
    for k_, t_, v_ in right:
        agg[(k_, t_)] = max(agg.get((k_, t_), float("-inf")), v_)
    right = [(k_, t_, v_) for (k_, t_), v_ in agg.items()]
    return left, right


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("tolerance", [None, 50])
def test_asof_join_ranged_matches_standard(spark, seed, tolerance):
    """The 2-exchange skew-immune form must be VALUE-IDENTICAL to the
    1-exchange standard form (backward, allow-exact) on random data
    with ties, missing-right keys, and tolerance - across epoch
    widths (1 = one segment per distinct ts, the extreme cut; 37 =
    boundaries landing mid-timeline; huge = single segment, i.e. the
    degenerate no-split case; None = auto-derived)."""
    from seqtables_spark.operators.asof import asof_join, asof_join_ranged

    lrows, rrows = _random_asof_case(seed)
    left = spark.createDataFrame(lrows, "key string, ts long, lid long")
    right = spark.createDataFrame(rrows, "key string, ts long, price double")
    want = sorted(
        tuple(r)
        for r in asof_join(
            left, right, ["key"], "ts", "ts", tolerance=tolerance
        ).collect()
    )
    for width in (1, 37, 10_000_000, None):
        got = sorted(
            tuple(r)
            for r in asof_join_ranged(
                left, right, ["key"], "ts", "ts",
                tolerance=tolerance, epoch_width=width,
            ).collect()
        )
        assert got == want, f"epoch_width={width}"

    # forward = time mirror of backward (negated timestamps through
    # the same machinery); parity against the standard forward form
    want_f = sorted(
        tuple(r)
        for r in asof_join(
            left, right, ["key"], "ts", "ts",
            tolerance=tolerance, direction="forward",
        ).collect()
    )
    got_f = sorted(
        tuple(r)
        for r in asof_join_ranged(
            left, right, ["key"], "ts", "ts",
            tolerance=tolerance, epoch_width=37, direction="forward",
        ).collect()
    )
    assert got_f == want_f

    # nearest: both carries on ONE segmented relation (mirrored
    # windows + mirrored boundary propagation), ties to backward
    want_n = sorted(
        tuple(r)
        for r in asof_join(
            left, right, ["key"], "ts", "ts",
            tolerance=tolerance, direction="nearest",
        ).collect()
    )
    for width in (1, 37, 10_000_000):
        got_n = sorted(
            tuple(r)
            for r in asof_join_ranged(
                left, right, ["key"], "ts", "ts",
                tolerance=tolerance, epoch_width=width, direction="nearest",
            ).collect()
        )
        assert got_n == want_n, f"nearest epoch_width={width}"


def test_asof_join_ranged_skew_splits_hot_key(spark):
    """Pathological skew: ONE key holds 50%+ of both sides. The
    standard form's window puts all of it in one task; the ranged
    form's epoch segmentation must spread the hot key's timeline
    across many (key, seg) groups and still produce identical
    values."""
    from seqtables_spark.operators.asof import asof_join, asof_join_ranged

    rng = random.Random(7)
    hot = [("hot", rng.randrange(0, 100_000), i) for i in range(2000)]
    cold = [
        (f"c{i % 40}", rng.randrange(0, 100_000), 10_000 + i)
        for i in range(2000)
    ]
    left = spark.createDataFrame(hot + cold, "key string, ts long, lid long")
    right = spark.createDataFrame(
        [("hot", t * 37 % 100_000, float(t)) for t in range(500)]
        + [(f"c{i % 40}", i * 13 % 100_000, float(i)) for i in range(500)],
        "key string, ts long, price double",
    )

    width = 100_000 // 16
    n_segs = (
        left.filter(F.col("key") == "hot")
        .select(F.floor(F.col("ts") / width).alias("seg"))
        .distinct()
        .count()
    )
    assert n_segs >= 8, "hot key's timeline did not split across epochs"

    want = sorted(
        tuple(r)
        for r in asof_join(left, right, ["key"], "ts", "ts").collect()
    )
    got = sorted(
        tuple(r)
        for r in asof_join_ranged(
            left, right, ["key"], "ts", "ts", epoch_width=width
        ).collect()
    )
    assert got == want


def test_asof_join_ranged_plan_partitions_by_epoch(spark):
    """The segment window must hash-partition on (key, seg) - the
    shape that splits a hot key - and the plan must never contain an
    exchange on the bare key carrying the full union (that would be
    the standard form's skew bottleneck reintroduced). The small
    boundary relation's key-only window is fine: it holds one row per
    (key, epoch)."""
    from seqtables_spark.operators.asof import asof_join_ranged

    left = spark.createDataFrame([("a", 1, 1)], "key string, ts long, lid long")
    right = spark.createDataFrame([("a", 1, 1.0)], "key string, ts long, p double")
    plan = (
        asof_join_ranged(left, right, ["key"], "ts", "ts", epoch_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__asof_seg__" in plan
    assert "hashpartitioning(key" in plan


def test_global_row_number_skewed_value_spreads_with_tiebreaker(spark):
    """2-phase rank under value skew: when 50% of rows share ONE sort
    value, repartitionByRange on the value alone co-locates every tie
    in one partition (range partitioning cannot split equal keys).
    The documented mitigation - a unique tiebreaker in the sort key -
    makes the composite key near-unique, so the sampler spreads the
    hot value across partitions. Pin both the spread and the rank
    correctness."""
    from seqtables_spark.operators.ranks import global_row_number

    df = spark.range(4000).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 42 ELSE CAST(id AS INT) END AS v"
    )
    # spread pin, on the exact partitioning the operator uses
    rp = df.repartitionByRange(8, F.col("v"), F.col("id")).withColumn(
        "_pid", F.spark_partition_id()
    )
    hot_share = (
        rp.filter(F.col("v") == 42)
        .groupBy("_pid")
        .count()
        .agg(F.max("count"))
        .first()[0]
    ) / 2000.0
    assert hot_share < 0.5, f"hot value not split: {hot_share}"
    # correctness: matches the single-task window rank
    got = {
        r.id: r.rn
        for r in global_row_number(
            df, [F.col("v").asc(), F.col("id").asc()], num_partitions=8
        ).collect()
    }
    from pyspark.sql import Window

    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_ivf_recall_floor(spark):
    """Recall@10 of ivf_topk vs the exact cosine_topk truth (the
    SCALING.md round-5 measurement, small form): probing ALL cells
    must reproduce brute force EXACTLY (the probe is partition
    pruning, not approximation), and nprobe=8/16 must clear a recall
    floor on the sparse 500-row corpus (the pessimistic regime - see
    SCALING.md: recall at fixed nprobe improves with density)."""
    from seqtables_spark.pipeline.similarity import (
        cosine_topk, ivf_assign, ivf_centroids, ivf_topk,
    )

    df = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )
    cents = ivf_centroids(df, k=16, n_iters=2)
    assigned = ivf_assign(df, cents).persist()
    queries = [
        [float(x) for x in r.embedding]
        for r in df.orderBy("vec_id").limit(6).collect()
    ]
    rec_half, rec_all = 0.0, 0.0
    for qv in queries:
        truth = {r.vec_id for r in cosine_topk(df, qv, k=10).collect()}
        exact = [
            (r.vec_id, r.sim)
            for r in ivf_topk(assigned, qv, cents, k=10, nprobe=16).collect()
        ]
        assert {v for v, _ in exact} == truth  # all-cells == brute force
        got8 = {
            r.vec_id
            for r in ivf_topk(assigned, qv, cents, k=10, nprobe=8).collect()
        }
        rec_half += len(truth & got8) / 10.0
    rec_half /= len(queries)
    assert rec_half >= 0.6, rec_half
    assigned.unpersist()
    df.unpersist()


def test_write_training_shards_replays_permutation(spark, tmp_path):
    """write_training_shards materializes the seeded order as ordered
    shard directories: shard k holds exactly positions
    [k*n+1, (k+1)*n] sorted by position IN FILE ORDER, so a loader
    reading shards in index order replays the exact permutation."""
    import glob

    import pyarrow.parquet as pq

    from seqtables_spark.pipeline.sampling import (
        training_order, write_training_shards,
    )

    df = spark.range(1000).selectExpr("id AS doc_id", "id * 2 AS payload")
    out = str(tmp_path / "shards")
    n = 64
    write_training_shards(df, out, rows_per_shard=n, seed=7)

    want = {
        r.doc_id: r.position
        for r in training_order(df, seed=7).collect()
    }
    shard_dirs = sorted(
        glob.glob(f"{out}/shard=*"),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    assert len(shard_dirs) == (1000 + n - 1) // n
    replay = []
    for k, d in enumerate(shard_dirs):
        files = sorted(glob.glob(f"{d}/*.parquet"))
        assert len(files) == 1  # one task owns each shard
        t = pq.read_table(files[0]).to_pydict()
        pos = t["position"]
        # contiguous slice, already in file order
        assert pos == sorted(pos)
        assert pos[0] == k * n + 1 and pos[-1] == min((k + 1) * n, 1000)
        replay.extend(zip(t["doc_id"], pos))
    assert dict(replay) == want


def test_incremental_minhash_index_probe_and_append(spark, tmp_path):
    """Incremental corpus dedup: the saved band-key index catches a
    new batch's near-dups WITHOUT re-shingling the corpus; the probe
    scan is dynamic-partition-pruned to the buckets the batch
    touches; mode='append' extends the index so the NEXT batch also
    dedups against previously accepted docs."""
    from seqtables_spark.pipeline.dedup import (
        incremental_near_dup_pairs, minhash_band_keys, save_minhash_index,
    )

    corpus = spark.createDataFrame(
        [
            (i, f"document number {i} about topic {i % 7} with plenty of text")
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh_index")
    save_minhash_index(corpus, idx, n_hashes=8, bands=2, k=12)

    batch1 = spark.createDataFrame(
        [
            (1001, "document number 42 about topic 0 with plenty of text!!"),
            (1002, "totally unrelated fresh content xyz qqq"),
        ],
        "doc_id long, text string",
    )
    pairs = incremental_near_dup_pairs(batch1, idx, n_hashes=8, bands=2, k=12)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    got = sorted((r.id_new, r.id_corpus) for r in pairs.collect())
    assert got == [(1001, 42)]
    # the index scan is partition-pruned by the probe's band keys
    assert "dynamicpruning" in plan.lower()

    # accept batch1 -> append its keys; batch2 twins a BATCH1 doc
    save_minhash_index(batch1, idx, n_hashes=8, bands=2, k=12, mode="append")
    batch2 = spark.createDataFrame(
        [(2001, "totally unrelated fresh content xyz qqq!!")],
        "doc_id long, text string",
    )
    got2 = sorted(
        (r.id_new, r.id_corpus)
        for r in incremental_near_dup_pairs(
            batch2, idx, n_hashes=8, bands=2, k=12
        ).collect()
    )
    assert got2 == [(2001, 1002)]
