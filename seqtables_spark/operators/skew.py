"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
hot keys at runtime; this explicit variant is for the cases AQE can't
touch — a build side too big to broadcast joined on a key where one
value dominates (classic at 100 TB: the empty-string / null-ish
sentinel key, the one mega-document cluster). Salting splits each hot
key's rows across `n_salts` reducers at the cost of replicating the
small side n_salts times.

Deterministic by construction: the big side's salt comes from a hash
of its OWN columns (not rand()), so retried tasks produce identical
output — a requirement for Spark's task-retry model on a real
cluster (a rand() salt can duplicate/lose rows when a stage retries
under shuffle-fetch failure).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
    max_broadcast_rows: int | None = None,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, with the shuffle key widened
    to (on..., salt) so a skewed key spreads over n_salts partitions.

    The small side is replicated n_salts times via a literal
    explode (rows x n_salts — keep it to true dimension tables);
    the big side computes salt = pmod(xxhash64(salt_cols), n_salts)
    row-locally. Result columns = big's then small's non-key columns,
    exactly like a plain df.join(small, on).

    salt_cols defaults to ALL big-side columns. Two limitations of
    that default: (1) byte-identical duplicate big-side rows all hash
    to the SAME salt, so a hot key made of exact duplicates (the
    mega-document cluster pre-dedup) does not spread — pass a
    pre-existing unique row id (e.g. ``salt_cols=["doc_id"]``) when
    rows may be fully duplicated; (2) xxhash64 cannot hash map-typed
    columns — pass salt_cols excluding them. rand() would dodge both
    but breaks task-retry determinism, which matters more.

    Guarded bypass (round 6): salting exists to fix a SHUFFLE problem,
    and a broadcast join has no shuffle — so when the small side is
    genuinely broadcastable, replicating it n_salts times and widening
    the big side's shuffle key is pure overhead (measured ~10x vs the
    broadcast plan on a 20k-row dim). Same pattern as
    contamination_check's count guard: one cheap count of the SMALL
    side only; <= max_broadcast_rows -> plain broadcast join, no salt,
    no big-side shuffle at all; above it -> the salted shuffle join.
    Why a count and not 'let AQE decide': AQE cannot widen a join key —
    if the static plan picks a shuffle join on `on`, the hot key lands
    on one reducer and AQE's skew splitting cannot split a single key
    group with a post-shuffle sort requirement already placed. EAGERNESS CONTRACT (round 7): the guard is OPT-IN.
    max_broadcast_rows=None (the default) keeps plan construction
    fully lazy — no job runs until the caller acts on the result, and
    streaming DataFrames work. Passing a number makes this function
    EAGER: it runs ``small.count()`` at plan time, and when the guard
    does NOT trip, an uncached small side is computed twice (once for
    the count, once again inside the join) — persist/localCheckpoint
    an expensive small side before calling. Never pass a guard value
    for streaming inputs (count() on a streaming relation raises at
    plan time)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full outer would emit one null-padded row PER SALT for
        # every unmatched small-side key (the replicas all survive) -
        # refuse rather than silently multiply rows
        raise ValueError(f"salted_join supports inner/left-family joins, not {how!r}")
    on = list(on)
    if max_broadcast_rows is not None and small.count() <= int(max_broadcast_rows):
        return big.join(F.broadcast(small), on, how)
    salt = "__salted_join_salt__"  # collision-proof internal name
    salts = F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1))).alias(salt)
    small_rep = small.select("*", salts)
    hash_cols = list(salt_cols) if salt_cols is not None else list(big.columns)
    big_salted = big.withColumn(
        salt,
        F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(int(n_salts))).cast("int"),
    )
    return big_salted.join(small_rep, on + [salt], how).drop(salt)
