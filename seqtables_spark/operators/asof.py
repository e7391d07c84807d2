"""As-of (time-travel) join: for every left row, attach the single
most recent right row with right_ts <= left_ts (backward direction),
optionally within a tolerance, matching on equi-keys.

Not part of the reference surface (the reference is a positional
sequence engine); this is the temporal primitive a training-data /
event pipeline needs (join each example to the latest config /
checkpoint / price at its timestamp).

Spark has no ASOF JOIN operator, and the naive formulations do not
survive scale: a theta-join (`l.ts >= r.ts`) is O(N*M) per key with a
BroadcastNestedLoopJoin plan, and a per-key `collect_list` +
UDF-bisect ships whole partitions through Python. The scalable
formulation used here is the union-merge trick (the same shape
pandas' merge_asof uses, but expressed relationally so it
distributes):

  1. union left and right into one relation tagged with `side`
     (right=0, left=1 - right sorts first at equal timestamps, so
     "<=" semantics fall out of the sort order),
  2. one window over (keys) ordered by (ts, side):
     `last(right_payload, ignorenulls=True)` propagates the most
     recent right row's payload forward onto every subsequent row,
  3. keep the left rows, apply the optional tolerance.

Cost: exactly ONE shuffle (hash partition by the equi-keys), then a
per-partition sort - identical shape to a sort-merge join, no row
amplification, no Python. At 100 TB: both sides scan with their
filters pushed down, partial projection prunes to (keys, ts,
payload), and the single exchange is the only data movement.

SKEW: a Window over partitionBy(keys) requires every row of a key in
ONE task - and unlike sort-merge joins, AQE's skew handling CANNOT
split a window group. A key holding 50% of the corpus therefore
serializes half the data through one task. `asof_join_ranged` is the
escape hatch: segment on (keys, floor(ts/epoch)) so the hot key's
TIMELINE splits across epoch groups, compute the carry per segment,
and propagate segment-boundary state through a small per-(key,
epoch) relation - the window twin of operators/ranks.py's 2-phase
rank. All three directions (backward / forward / nearest) have
ranged forms. It pays one extra pruned scan (the boundary
aggregation) on top of the single big-side exchange; use it when key
skew is pathological, the default form otherwise (measured in
SCALING.md).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str,
):
    """Shared union-merge construction: tag both sides, pack the right
    row into ONE struct (a NULL inside a payload column must never
    splice values from two different right rows), and union with the
    right schema winning the merge. Returns (u, names) where names =
    (ts, side, pack, matched_ts, out) and out maps a right column to
    its (possibly suffixed) output name."""
    ts = "__asof_ts__"
    side = "__asof_side__"
    pack = "__asof_pack__"
    matched_ts = right_ts + suffix

    def _out(col: str) -> str:
        return col + suffix if col in left.columns else col

    if not suffix:
        clash = [c for c in [right_ts, *right_payload] if c in left.columns]
        if clash:
            raise ValueError(
                f"asof_join: suffix='' but right columns {clash} collide "
                "with left columns - pass a non-empty suffix or rename"
            )

    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        F.struct(
            F.col(right_ts).alias(matched_ts),
            *[F.col(c).alias(_out(c)) for c in right_payload],
        ).alias(pack),
        *[
            F.lit(None).alias(c)
            for c in left.columns
            if c not in on and c != left_ts
        ],
    )
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
        F.lit(None).cast(r.schema[pack].dataType).alias(pack),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
    )
    # column order must agree for unionByName; r first so its schema
    # (concrete struct type for the packed payload) wins the merge
    u = r.unionByName(l.select(*r.columns))
    return u, (ts, side, pack, matched_ts, _out)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join with pandas-merge_asof direction parity. Each left
    row gains the payload of ONE matching right row with equal `on`
    keys, or NULLs if none exists (left-outer flavor):

      - ``backward`` (default; DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
        semantics): the latest right row with right_ts <= left_ts;
      - ``forward``: the earliest right row with right_ts >= left_ts;
      - ``nearest``: whichever of the two is closer in time, ties
        going to the backward match. Both candidates come from TWO
        window frames over ONE sort of the same union relation -
        still exactly one shuffle.

    ``allow_exact_matches=False`` makes the comparisons strict
    (< / >), pandas-style. Equal-timestamp rights are hidden from a
    frame purely by flipping which side sorts first at ties - except
    strict ``nearest``, where the two candidates need OPPOSITE tie
    orders and therefore two sorts (still one exchange: identical
    partitioning, two in-partition Sort nodes).

    Timestamps must share one orderable type (use integer
    epoch-ns for cross-engine exactness). ``tolerance`` (same unit)
    drops matches further than ``tolerance`` from ``left_ts`` in the
    direction's sense (each side separately for ``nearest``).

    Ambiguity: if several right rows share the maximal ``right_ts``
    for a key, the one last in the union sort order wins — pre-
    aggregate the right side to one row per (keys..., ts) when exact
    cross-engine parity matters (the oracle does the same).

    Output: all left columns, plus ``right_ts + suffix`` and each
    payload column (suffixed on name collision with the left).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    right_payload = list(right_payload)

    u, (ts, side, pack, matched_ts, _out) = _asof_union(
        left, right, on, left_ts, right_ts, right_payload, suffix
    )

    # sort-order trick per direction: right rows carry side=0, left
    # side=1, and whether an equal-ts right row is VISIBLE to a frame
    # is decided purely by which side sorts first at timestamp ties:
    #   right-first (side asc): the preceding frame's last() sees an
    #     equal-ts right ('<='), the following frame's first() does
    #     NOT ('>');
    #   left-first (side desc): mirror image ('<' / '>=').
    # For allow-mode nearest, the forward candidate missing an
    # equal-ts right under right-first ordering is harmless: the
    # backward candidate captures it at distance 0, which always
    # wins - so allow-mode nearest needs only ONE sort. Strict
    # nearest needs the two opposite tie orders, hence two Sort nodes
    # over the same exchange.
    right_first = Window.partitionBy(*on).orderBy(
        F.col(ts).asc(), F.col(side).asc()
    )
    left_first = Window.partitionBy(*on).orderBy(
        F.col(ts).asc(), F.col(side).desc()
    )

    def _preceding(w):
        return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _following(w):
        return w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def _tol(c, delta):
        if tolerance is None:
            return c
        return F.when(delta > F.lit(tolerance), F.lit(None)).otherwise(c)

    # Each window aggregate is MATERIALIZED as a column once before
    # the tolerance/nearest logic references it: embedding the window
    # expression inside when()/struct-field chains duplicates it per
    # reference (WindowExec then evaluates 2 identical running
    # aggregates for a tolerance'd backward join and 6 for nearest -
    # visible as _we0.._weN in the plan), while a materialized column
    # is computed once and projected.
    if direction == "backward":
        w = right_first if allow_exact_matches else left_first
        u = u.withColumn(
            "__cb__", F.last(pack, ignorenulls=True).over(_preceding(w))
        )
        cb = F.col("__cb__")
        carried = _tol(cb, F.col(ts) - cb[matched_ts])
    elif direction == "forward":
        w = left_first if allow_exact_matches else right_first
        u = u.withColumn(
            "__cf__", F.first(pack, ignorenulls=True).over(_following(w))
        )
        cf = F.col("__cf__")
        carried = _tol(cf, cf[matched_ts] - F.col(ts))
    else:  # nearest
        w_back = right_first if allow_exact_matches else left_first
        u = u.withColumn(
            "__cb__", F.last(pack, ignorenulls=True).over(_preceding(w_back))
        ).withColumn(
            "__cf__", F.first(pack, ignorenulls=True).over(_following(right_first))
        )
        cb = _tol(F.col("__cb__"), F.col(ts) - F.col("__cb__")[matched_ts])
        cf = _tol(F.col("__cf__"), F.col("__cf__")[matched_ts] - F.col(ts))
        d_b = F.col(ts) - cb[matched_ts]
        d_f = cf[matched_ts] - F.col(ts)
        carried = (
            F.when(cb.isNull(), cf)
            .when(cf.isNull(), cb)
            .when(d_f < d_b, cf)
            .otherwise(cb)  # ties -> backward (documented)
        )
    kept = [
        c for c in u.columns if c not in {pack, side, "__cb__", "__cf__"}
    ]
    res = (
        u.select(*kept, F.col(side).alias(side), carried.alias(pack))
        .filter(F.col(side) == 1)
    )

    # restore the left frame's column names/order + appended match cols
    left_cols = [F.col(ts).alias(left_ts) if c == left_ts else F.col(c)
                 for c in left.columns]
    return res.select(
        *left_cols,
        F.col(pack)[matched_ts].alias(matched_ts),
        *[F.col(pack)[_out(c)].alias(_out(c)) for c in right_payload],
    )


def asof_join_ranged(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
    n_segments: int | None = None,
    epoch_width: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Skew-immune as-of join, all three directions (allow-exact
    semantics, asof_join's defaults): for pathological key skew,
    where one key holds a large fraction of both sides and the
    standard form's per-key window serializes it through one task.

    ``direction='forward'`` is the time mirror: both timestamps are
    NEGATED and the backward machinery runs unchanged (latest
    right_ts' <= left_ts' on negated time IS the earliest right_ts >=
    left_ts; the right-sorts-first tie order maps to '>=' exactly as
    the standard form's left_first window does), with the matched
    timestamp un-negated on output. Integer timestamps only - the
    documented contract below - so negation is exact.

    Construction (the window twin of operators/ranks.py's 2-phase
    rank - segmented scan with boundary-carry propagation, segmented
    by TIME EPOCH so the hot key's timeline splits):

      1. seg = floor(ts / epoch_width) - a segment id derived purely
         from the DATA (deterministic under task retry and across the
         plan's two references to the union; a spark_partition_id
         after repartitionByRange is neither - the sampled boundaries
         may differ between subtree instantiations);
      2. per-segment carry: a window over (keys, seg) - the hot key
         contributes one group PER EPOCH instead of one group total -
         computes the running last-right-row within each segment;
      3. boundary state: one row per (key, seg) - the segment's
         latest right row - aggregated straight off the union (a
         second PRUNED scan collapsing map-side; cheaper than
         re-running the window sort, which a shared-subtree branch
         would), propagated across epochs by a window over that
         SMALL relation (groups bounded by the epoch count, so it
         cannot skew), then BROADCAST back onto the segmented rows
         (AQE: the relation is one row per (key, epoch)) and
         coalesced under the local carry - the big side is exchanged
         exactly ONCE in the whole plan.

    ``epoch_width`` (timestamp units per segment) is the skew dial;
    when None it is derived as (max ts - min ts + 1) / n_segments
    (default parallelism) via one tiny min/max aggregation over the
    union - an extra pass over (keys, ts) only, documented cost of
    auto-tuning. Timestamps must be non-NULL integers; NULL equi-KEYS
    are allowed and match each other, exactly like the standard
    form's window grouping (the boundary join goes null-safe when the
    schema cannot prove the keys non-null - see the inline comment
    for the plan cost). A hot key
    whose rows all share ONE timestamp stays unsplittable - the same
    tie limit the 2-phase rank has. All three directions are
    supported: ``forward`` negates the timestamps through the
    backward machinery (see the paragraph above), ``nearest``
    (allow-exact) computes BOTH carries on the same segmented
    relation - mirrored segment windows plus a mirrored boundary
    column (incoming forward candidate from LATER epochs) - and picks
    the closer match with ties to backward, exactly like the standard
    form.
    """
    if direction == "forward":
        out = asof_join_ranged(
            left.withColumn(left_ts, -F.col(left_ts)),
            right.withColumn(right_ts, -F.col(right_ts)),
            on, left_ts, right_ts, right_payload, tolerance, suffix,
            n_segments, epoch_width, "backward",
        )
        matched = right_ts + suffix
        return out.withColumn(left_ts, -F.col(left_ts)).withColumn(
            matched, -F.col(matched)
        )
    if direction not in ("backward", "nearest"):
        raise ValueError(
            f"asof_join_ranged: direction must be backward|forward|"
            f"nearest, got {direction!r}"
        )
    nearest = direction == "nearest"
    on = list(on)
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    right_payload = list(right_payload)
    u, (ts, side, pack, matched_ts, _out) = _asof_union(
        left, right, on, left_ts, right_ts, right_payload, suffix
    )

    if epoch_width is None:
        parts = int(
            n_segments or left.sparkSession.sparkContext.defaultParallelism
        )
        lo, hi = u.agg(F.min(ts), F.max(ts)).first()
        if lo is None:
            epoch_width = 1
        else:
            epoch_width = max(1, (int(hi) - int(lo) + 1) // max(parts, 1))

    seg = "__asof_seg__"
    # EXPLICIT repartition on (keys, seg): the segment window, the
    # boundary aggregation, and the final join all need exactly this
    # clustering, so declaring it once lets ReuseExchange serve every
    # branch from ONE shuffle - and the window then only adds an
    # in-partition sort on top.
    su = u.withColumn(
        seg, F.floor(F.col(ts) / F.lit(int(epoch_width)))
    ).repartition(*[F.col(c) for c in on], F.col(seg))

    # 2. segment-local carries (right rows sort before left at ts
    # ties, so '<=' semantics fall out exactly as in the standard
    # form; for allow-mode nearest the same single sort order serves
    # both frames - see asof_join's tie-order comment)
    ordered = (
        Window.partitionBy(*on, seg)
        .orderBy(F.col(ts).asc(), F.col(side).asc())
    )
    w_seg = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    loc = su.withColumn(
        "__seg_carry__", F.last(pack, ignorenulls=True).over(w_seg)
    )
    if nearest:
        w_seg_f = ordered.rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        loc = loc.withColumn(
            "__seg_fwd__", F.first(pack, ignorenulls=True).over(w_seg_f)
        )

    # 3. per-(key, seg) boundary state -> incoming carry from EARLIER
    # epochs (and, for nearest, incoming forward candidate from LATER
    # epochs). Computed from `su` directly - the segment's last/first
    # non-null carry is by construction its latest/earliest RIGHT
    # row's pack - NOT from `loc`: a branch on `loc` would re-run the
    # window SORT (Catalyst reuses exchanges, not arbitrary
    # subtrees). Plan reality (verified): the optimizer collapses the
    # repartition under this aggregation, so the branch is a re-scan
    # + map-side-collapsed agg whose shuffle carries one row per
    # (key, epoch) - the trade is a second pruned scan instead of a
    # second full sort+window, and AQE then BROADCASTS the collapsed
    # incoming relation back onto `loc`, so the big side is never
    # exchanged again for the join. Right-ts duplicates within
    # (key, ts) are the documented ambiguity; max_by/min_by on ts
    # matches the pre-aggregated-right contract.
    # grouped over ALL rows (a filter to side=0 would drop left-only
    # segments from the join universe and from the propagation
    # window); the ordering key is NULL for left rows, which
    # max_by/min_by skip, so the summary is still right-rows-only
    r_ts = F.when(F.col(side) == 0, F.col(ts))
    aggs = [F.max_by(pack, r_ts).alias("__seg_last__")]
    if nearest:
        aggs.append(F.min_by(pack, r_ts).alias("__seg_first__"))
    bounds = su.groupBy(*on, seg).agg(*aggs)
    w_in = (
        Window.partitionBy(*on)
        .orderBy(F.col(seg).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    incoming = bounds.withColumn(
        "__incoming__", F.last("__seg_last__", ignorenulls=True).over(w_in)
    )
    inc_cols = ["__incoming__"]
    if nearest:
        w_next = (
            Window.partitionBy(*on)
            .orderBy(F.col(seg).asc())
            .rowsBetween(1, Window.unboundedFollowing)
        )
        incoming = incoming.withColumn(
            "__incoming_next__",
            F.first("__seg_first__", ignorenulls=True).over(w_next),
        )
        inc_cols.append("__incoming_next__")
    incoming = incoming.select(*on, seg, *inc_cols)

    def _tol(c, delta):
        if tolerance is None:
            return c
        return F.when(delta > F.lit(tolerance), F.lit(None)).otherwise(c)

    cb = F.coalesce(F.col("__seg_carry__"), F.col("__incoming__"))
    cb = _tol(cb, F.col(ts) - cb[matched_ts])
    if not nearest:
        carried = cb
    else:
        cf = F.coalesce(F.col("__seg_fwd__"), F.col("__incoming_next__"))
        cf = _tol(cf, cf[matched_ts] - F.col(ts))
        d_b = F.col(ts) - cb[matched_ts]
        d_f = cf[matched_ts] - F.col(ts)
        carried = (
            F.when(cb.isNull(), cf)
            .when(cf.isNull(), cb)
            .when(d_f < d_b, cf)
            .otherwise(cb)  # ties -> backward, as the standard form
        )
    # NULL equi-keys: a USING join would never match NULL keys,
    # silently dropping left rows whose `on` keys contain NULL -
    # while the standard asof_join's Window.partitionBy groups NULLs
    # together and keeps those rows (left-outer contract, the
    # 'value-identical' promise of this docstring). When the schema
    # PROVES every key non-nullable on both sides, the plain
    # equality join keeps the lean plan (its required clustering
    # matches the (keys, seg) repartition, so the big side is never
    # re-exchanged); otherwise the join goes null-safe (eqNullSafe
    # per key). Null-safe keys make Catalyst derive
    # (coalesce(k, default), isnull(k)) join keys, which do NOT
    # match the (keys, seg) clustering - the static plan re-shuffles
    # `loc` - but in the skew regime this operator targets the
    # boundary relation is small (one row per key-epoch) and AQE
    # demotes the join to broadcast / local shuffle read, so the
    # extra exchange does not materialize over the network.
    # Correctness first, documented cost second. seg itself derives
    # from the non-NULL ts contract and stays plain-equality.
    keys_provably_non_null = all(
        not df.schema[c].nullable for df in (left, right) for c in on
    )
    if keys_provably_non_null:
        res = loc.join(incoming, [*on, seg])
    else:
        inc = incoming.select(
            *[F.col(c).alias(f"__inc_{c}__") for c in on],
            F.col(seg).alias("__inc_seg__"),
            *inc_cols,
        )
        cond = F.col(seg) == F.col("__inc_seg__")
        for c in on:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__inc_{c}__"))
        res = loc.join(inc, cond).drop(
            "__inc_seg__", *[f"__inc_{c}__" for c in on]
        )
    res = res.withColumn(pack, carried).filter(F.col(side) == 1)
    left_cols = [F.col(ts).alias(left_ts) if c == left_ts else F.col(c)
                 for c in left.columns]
    return res.select(
        *left_cols,
        F.col(pack)[matched_ts].alias(matched_ts),
        *[F.col(pack)[_out(c)].alias(_out(c)) for c in right_payload],
    )
