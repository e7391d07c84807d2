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


def dsir_weights(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    token_pattern: str = "[a-z]{2,}",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how target-like its hashed-unigram distribution is, so a raw
    corpus can be resampled toward a target domain without training a
    classifier.

    Two multinomials over `n_buckets` hashed token buckets are
    estimated from the SAME frame - the target slice (rows where
    `target_pred` holds) and the full raw corpus - with add-one
    smoothing; each document's log importance weight is

        logw(d) = sum_{tokens t in d} [ log p_target(b(t)) - log p_raw(b(t)) ]

    Arithmetic is fixed-point (per-bucket log-ratio rounded to 1e-6
    and carried as int64) so the per-doc sum is order-free: exact
    under any partitioning, any engine.

    Shape at scale: the bucket table is <= n_buckets rows - two
    hash-aggs over the token stream (map-side partials collapse each
    partition to <= n_buckets rows) and a BROADCAST join back onto
    the exploded tokens; the only real shuffle is the final
    groupBy(id). Returns DF(id, n_tokens, logw) - resample by e.g.
    keeping the top fraction by (logw, id).
    """
    toks = df.select(
        F.col(id_col),
        target_pred.alias("__is_target__"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(token_pattern), 0)
        ).alias("__tok__"),
    ).withColumn(
        "__bucket__",
        portable_string_hash(F.col("__tok__")) % F.lit(int(n_buckets)),
    )
    bucket_counts = toks.groupBy("__bucket__").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("__is_target__"), 1).otherwise(0)).alias("n_tgt"),
    )
    # totals roll up from the COLLAPSED bucket table (<= n_buckets
    # rows), not from the token stream: a direct toks.agg() would
    # re-reference the tokenize+explode subtree - Catalyst does not
    # dedupe common subtrees, so the corpus would be tokenized a
    # third time for two numbers the bucket counts already determine.
    # Round 12 (guide §2.4): the totals used to be a SEPARATE
    # aggregate relation crossJoined in, which still re-planned the
    # whole bucket_counts subtree (tokenize included) for its branch
    # and put a BroadcastNestedLoopJoin in every plan. An
    # unbounded-frame window over the <= n_buckets-row bucket table
    # carries both totals onto every row in one tiny single-partition
    # pass instead - the token stream is now planned exactly twice
    # (score pass + bucket pass), never a third time.
    from pyspark.sql import Window

    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    B = float(n_buckets)
    # log ((n_tgt+1)/(t_tgt+B)) - log ((n_raw+1)/(t_raw+B)), fixed-point
    ratio = (
        bucket_counts.withColumn("t_raw", F.sum("n_raw").over(w_all))
        .withColumn("t_tgt", F.sum("n_tgt").over(w_all))
        .select(
            "__bucket__",
            F.round(
                (
                    F.log((F.col("n_tgt") + 1) / (F.col("t_tgt") + F.lit(B)))
                    - F.log((F.col("n_raw") + 1) / (F.col("t_raw") + F.lit(B)))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "__bucket__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr_micro") / 1_000_000.0, 6).alias("logw"),
        )
    )


def training_order(
    df: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    out_col: str = "position",
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeded deterministic global training order: every row gets a
    1-based `position` in a pseudo-random permutation - the "shuffle
    the corpus before writing training shards" step.

    Order key = portable hash of (seed, id), tie-broken by id, ranked
    with the 2-phase distributed global_row_number (operators/ranks) -
    never a single-task sort, never rand() (stable under task retry,
    reproducible by any engine with md5, so the permutation itself
    carries a value-exact oracle). Re-seeding re-shuffles; the same
    seed always yields the same order on any cluster."""
    from ..operators.ranks import global_row_number

    key = portable_string_hash(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    ranked = global_row_number(
        df.withColumn("__shuffle_key__", key),
        [F.col("__shuffle_key__").asc(), F.col(id_col).asc()],
        out_col=out_col,
        num_partitions=num_partitions,
    )
    return ranked.drop("__shuffle_key__")


def write_training_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int,
    seed: int = 0,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the seeded training order as ORDERED SHARDS - the
    step after training_order: the corpus lands at `path` partitioned
    by `shard=<k>`, where shard k holds exactly the rows with
    position in [k*rows_per_shard+1, (k+1)*rows_per_shard], each
    shard's rows sorted by position. A data loader that reads shard
    directories in index order and rows in file order replays the
    exact global permutation.

    Plan shape: training_order's 2-phase rank, then ONE
    repartition-by-shard exchange (rows carry their shard id, so this
    is a hash exchange on a derived key - uniform by construction:
    every shard holds exactly rows_per_shard rows except the last)
    with an in-partition sort on position, written with
    partitionBy('shard'). No global sort, no single-task stage; the
    sort is per-shard and bounded by rows_per_shard.

    Returns the (lazy) sharded DataFrame that was written (id,
    position, shard, original columns) so callers can count/inspect
    without re-reading the files.
    """
    rows_per_shard = int(rows_per_shard)
    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    ordered = training_order(df, seed=seed, id_col=id_col)
    sharded = ordered.withColumn(
        "shard", ((F.col("position") - 1) / rows_per_shard).cast("long")
    )
    (
        sharded.repartition(F.col("shard"))
        .sortWithinPartitions("position")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    return sharded


def sample_to_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_by,
    out_col: str = "cum_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy budget fill: take rows in `order_by` priority order
    while the INCLUSIVE running token total stays <= `budget` — the
    "fill a 50B-token training mix from the best documents first"
    selection step. Returns the selected rows with `out_col` (the
    running total at that row, long).

    A row that would overflow the budget is excluded, and so is
    everything after it (contiguous prefix, not knapsack). Ties in
    `order_by` cut arbitrarily — pass a unique tiebreaker for a
    deterministic boundary.

    Scale shape: the 2-phase distributed running sum
    (operators/ranks.global_running_sum) — range exchange + bounded
    per-partition window + P-row broadcast; the budget filter then
    prunes AFTER the cumsum without another pass. No global
    single-task sort anywhere."""
    from ..operators.ranks import global_running_sum

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    summed = global_running_sum(
        df,
        order_by,
        token_col,
        out_col=out_col,
        num_partitions=num_partitions,
    )
    return summed.filter(F.col(out_col) <= int(budget))


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled source mixing rates (the mT5/multilingual
    standard): target share q_s = p_s^alpha / sum_t p_t^alpha, where
    p_s is each source's corpus share — alpha < 1 flattens the mix
    toward rare sources, alpha = 1 keeps natural proportions.

    Rates are for SUBSAMPLING only (no upsampling): keep_rate_s =
    (q_s / n_s) normalized so the largest implied multiplier is
    exactly 1 — the biggest relative gainer is kept whole and every
    other source is thinned to match the target proportions.

    Returns the tiny per-source relation (source, n, share,
    target_share, keep_rate, exp_kept). Every window/aggregate here
    runs over #sources rows, never corpus rows; the one corpus pass
    is the combinable groupBy count."""
    from pyspark.sql import Window

    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n")
    )
    everything = Window.partitionBy()
    share = F.col("n") / F.sum("n").over(everything)
    scaled = F.pow(share, F.lit(float(alpha)))
    tshare = scaled / F.sum(scaled).over(everything)
    ratio = tshare / F.col("n")
    keep = ratio / F.max(ratio).over(everything)
    return counts.select(
        "source",
        "n",
        share.alias("share"),
        tshare.alias("target_share"),
        keep.alias("keep_rate"),
        F.round(keep * F.col("n")).cast("long").alias("exp_kept"),
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply temperature_rates as a deterministic hash-Bernoulli
    filter (same portable-hash trick as mix_sources: keep iff
    hash(id) mod 1e6 < round(keep_rate * 1e6)) — row-local decision,
    zero shuffle on the corpus; the per-source rate relation joins
    back as a broadcast. The ppm rounding makes the cut boundary an
    integer so engines computing pow() a ulp apart still agree."""
    rates = temperature_rates(df, alpha=alpha, source_col=source_col)
    ppm = F.round(F.col("keep_rate") * 1_000_000).cast("long").alias("__ppm__")
    h = portable_string_hash(F.col(id_col).cast("string")) % F.lit(1_000_000)
    return (
        df.join(
            F.broadcast(rates.select(F.col("source").alias(source_col), ppm)),
            source_col,
        )
        .filter(h < F.col("__ppm__"))
        .drop("__ppm__")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    group_by: tuple[str, ...] = (),
    seed: int = 17,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact k per group —
    Efraimidis & Spirakis (2006) A-ES: give each row the key
    ln(u_i) / w_i with u_i uniform in (0,1), keep the k LARGEST keys;
    the selected set is distributed exactly as sequential weighted
    draws without replacement. (ln(u)/w descending orders identically
    to the paper's u^(1/w) since ln is monotone and u < 1 — one
    transcendental instead of pow.)

    u_i is DETERMINISTIC: (portable_hash(seed:id)+1) / (P+1), so the
    sample is reproducible across engines/retries/days and an SQL
    oracle replays it — the property rand()-based samplers cannot
    give (the same reason salted_join hashes instead of rand()).
    Caveat of determinism: the sample is fixed for a given (seed,
    ids, weights); vary `seed` for independent draws.

    Scale shape: the key is a row-local projection; selection is a
    per-group rank window (ungrouped: Catalyst rewrites the
    row_number filter to a distributed TakeOrderedAndProject top-k),
    so no task ever materializes more than its partition's k best.
    Rows with weight <= 0 or NULL are excluded (zero-weight rows must
    never appear in a weighted sample; the paper's domain is w > 0).

    Cross-engine float note: ln ULP differences could in principle
    flip the order of two keys agreeing to ~16 significant digits;
    ties break on id so the cut is deterministic per engine, and the
    oracle replays the identical formula — same contract as the pLogo
    log-sum arithmetic (~1e-13 agreement, tested at the fixture SFs).
    """
    from pyspark.sql import Window

    gb = list(group_by)
    w = F.col(weight_col).cast("double")
    h = portable_string_hash(
        F.concat_ws(":", F.lit(str(int(seed))), F.col(id_col).cast("string"))
    )
    u = (h + F.lit(1.0)) / F.lit(2147483648.0)  # (0, 1]; ln(1)=0 ok
    key = F.log(u) / w
    win = Window.partitionBy(*gb).orderBy(
        F.col("__aes_key__").desc(), F.col(id_col).cast("string").asc()
    )
    return (
        df.filter(w > 0)
        .withColumn("__aes_key__", key)
        .withColumn("__aes_rk__", F.row_number().over(win))
        .filter(F.col("__aes_rk__") <= int(k))
        .drop("__aes_key__", "__aes_rk__")
    )


def group_split(
    df: DataFrame,
    group_col: str = "source",
    splits: tuple[tuple[str, int], ...] = (
        ("train", 80), ("valid", 10), ("test", 10),
    ),
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/valid/test assignment: the split is a
    deterministic hash of the GROUP (source/domain/site), never the
    row, so every document of a group lands in the same split and
    near-duplicates inside a group can never straddle train and eval
    — the contamination rule corpus pipelines enforce at the domain
    level (a per-row split leaks: two near-identical pages from one
    site end up on both sides of the boundary).

    Row-local projection (portable_string_hash(group) bucketed mod
    100 against cumulative percentage thresholds): zero exchanges,
    composes under any partitioning, identical assignment on any
    engine with md5 — so the audit query carries a value-exact
    oracle. `splits` are (name, percent) in threshold order and must
    sum to 100."""
    total = sum(p for _, p in splits)
    if total != 100:
        raise ValueError(f"group_split: splits must sum to 100, got {total}")
    bucket = portable_string_hash(group_col) % 100
    expr = None
    acc = 0
    for name, pct in splits[:-1]:
        acc += pct
        cond = bucket < acc
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    expr = (
        expr.otherwise(splits[-1][0])
        if expr is not None
        else F.lit(splits[-1][0])
    )
    return df.withColumn(split_col, expr)
