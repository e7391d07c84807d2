"""Insertion side-table operators.

The rectangular read x position matrix cannot hold CIGAR 'I' bases;
they live in the `insertions` table (read_id, position, loc_ins, base,
qual) where loc_ins is NEGATIVE: -1 = the inserted base immediately
LEFT of `position`, -2 the next one leftward, etc. (reference
constructor_ops.py:297-339; numbering in cython/sam_to_arr.pyx:333-349).

Parity targets (file:line in /root/reference/seqtables/core/seqtables.py):
  - get_insertion_events:            :1452-1485 (facade :1396-1420)
  - get_insertion_distribution:      :1422-1435
  - get_average_insertion_quality:   :1437-1450
  - get_insertion_expectations:      :1452-1485
  - get_insertion_seq_dist:          :1036-1053
  - view_with_ins:                   :408-564

Scale: the insertions table is ~1000x smaller than cells (insertion
rate ~0.1%/base); every agg here is a small groupBy. view_with_ins is
a left join of cells against insertions on read_id+position - Spark
broadcasts the insertion side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _pos_filter(ins: DataFrame, positions: Sequence[int] | None) -> DataFrame:
    if positions is not None:
        ins = ins.filter(F.col("position").isin(list(positions)))
    return ins


def get_insertion_events(
    insertions: DataFrame,
    positions: Sequence[int] | None = None,
    min_quality: int = 0,
) -> DataFrame:
    """Number of reads with >= 1 insertion at each position.
    Returns DF(position, n_reads)."""
    ins = _pos_filter(insertions, positions)
    if min_quality:
        ins = ins.filter(F.col("qual") >= min_quality)
    return ins.groupBy("position").agg(
        F.countDistinct("read_id").alias("n_reads")
    )


def get_insertion_distribution(
    insertions: DataFrame, positions: Sequence[int] | None = None
) -> DataFrame:
    """Counts by (position, loc_ins). Returns DF(position, loc_ins, cnt)."""
    return (
        _pos_filter(insertions, positions)
        .groupBy("position", "loc_ins")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def get_average_insertion_quality(
    insertions: DataFrame, positions: Sequence[int] | None = None
) -> DataFrame:
    """Mean quality by (position, loc_ins). Returns
    DF(position, loc_ins, avg_qual)."""
    return (
        _pos_filter(insertions, positions)
        .groupBy("position", "loc_ins")
        .agg(F.avg("qual").alias("avg_qual"))
    )


def get_insertion_expectations(
    insertions: DataFrame, positions: Sequence[int] | None = None
) -> DataFrame:
    """Per position: mean / max insertion length over reads that have
    an insertion there (length of a read's insertion at a position =
    count of its loc_ins rows; reference weights the per-length counts,
    seqtables.py:1469: mean = sum(len*cnt)/sum(cnt)).
    Returns DF(position, mean_len, max_len, n_reads)."""
    per_read = (
        _pos_filter(insertions, positions)
        .groupBy("position", "read_id")
        .agg(F.count(F.lit(1)).alias("ins_len"))
    )
    return per_read.groupBy("position").agg(
        F.avg("ins_len").alias("mean_len"),
        F.max("ins_len").alias("max_len"),
        F.count(F.lit(1)).alias("n_reads"),
    )


def get_insertion_seq_dist(
    insertions: DataFrame,
    n_reads_total: int | None = None,
    positions: Sequence[int] | None = None,
    min_ins_count: int = 0,
    method: str = "counts",
) -> DataFrame:
    """Letter counts by (position, loc_ins); when n_reads_total is
    given, adds the implicit gap row '-' = N - sum(counts) (reads with
    no insertion at that slot; reference seqtables.py:1049).

    method (reference seqtables.py:1048-1052): 'counts' ->
    DF(position, loc_ins, base, cnt); 'freq' -> per-slot normalized
    (over N when the gap row is present); 'bits' -> information-
    content heights via get_bits with alphabet = the distribution's
    observed letters (seq_logo.py:296-311 — per-slot Shannon entropy,
    small-sample correction over N, negative heights clamped to 0).
    freq/bits require n_reads_total (the reference always has
    self.shape[0])."""
    import math

    ins = _pos_filter(insertions, positions)
    # Round 12 (guide §2.4): the per-(slot, base) counts, the
    # min_ins_count slot totals, and the implicit gap row used to be
    # THREE derivations of the insertions subtree (counts agg, totals
    # re-agg + broadcast semi-join, gaps re-agg + union) — Catalyst
    # does not dedupe common subtrees, so the (potentially expensive)
    # insertions input was planned up to three times and each branch
    # added an exchange. One two-level aggregation replaces all of
    # them: collapse to per-slot rows carrying the (base, cnt) entry
    # list plus the slot total, filter/append the gap entry with array
    # arithmetic on those P-row slot rows, and explode back out. The
    # insertions subtree is planned ONCE and the only exchanges left
    # are the (slot, base) agg and the tiny per-slot agg.
    per_base = ins.groupBy("position", "loc_ins", "base").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    slots = per_base.groupBy("position", "loc_ins").agg(
        F.collect_list(F.struct("base", "cnt")).alias("_e"),
        F.sum("cnt").alias("_t"),
    )
    if min_ins_count > 0:
        slots = slots.filter(F.col("_t") >= min_ins_count)
    if n_reads_total is not None:
        slots = slots.withColumn(
            "_e",
            F.concat(
                "_e",
                F.array(
                    F.struct(
                        F.lit("-").alias("base"),
                        (F.lit(n_reads_total) - F.col("_t")).alias("cnt"),
                    )
                ),
            ),
        )
    dist = slots.select("position", "loc_ins", F.expr("inline(_e)"))
    if method == "counts":
        return dist
    if n_reads_total is None:
        raise ValueError("method='freq'/'bits' requires n_reads_total")
    from pyspark.sql import Window

    w = Window.partitionBy("position", "loc_ins")
    freq = dist.withColumn("freq", F.col("cnt") / F.sum("cnt").over(w)).drop("cnt")
    if method == "freq":
        return freq
    if method == "bits":
        # alphabet = observed letters across the whole distribution
        # (the reference passes list(ins_dist.index)); a zero-freq gap
        # row contributes nothing to entropy (log(0) -> NULL, skipped
        # by sum — the reference's skipna equivalent)
        n_alpha = dist.select("base").distinct().count()
        entropy = F.sum(-F.col("freq") * F.log2("freq")).over(w)
        correction = (1.0 / math.log(2)) * (n_alpha - 1) / (2.0 * n_reads_total)
        total_height = F.log2(F.lit(float(n_alpha))) - (entropy + correction / 2)
        return freq.withColumn(
            "bits", F.greatest(F.col("freq") * total_height, F.lit(0.0))
        ).drop("freq")
    raise ValueError(f"unknown method {method!r}")


def view_with_insertions(
    cells: DataFrame,
    insertions: DataFrame,
    positions: Sequence[int] | None = None,
    min_ins_count: int = 0,
    ins_gap: str = "-",
    lowercase_insertions: bool = True,
    include_quality: bool = False,
) -> DataFrame:
    """Widened long view where insertion slots appear as extra
    (position, loc_ins) rows interleaved with the base matrix
    (loc_ins=0 for matrix cells; negative for insertions, sorting
    (position, loc_ins) reproduces the reference's column order).
    Reads without an insertion at a kept slot get `ins_gap`; insertion
    letters are optionally lowercased (the reference's +32 ASCII trick,
    seqtables.py:465,479).

    include_quality=True (reference include_quality, seqtables.py:419)
    carries the phred channel too: matrix qual from `cells.qual`,
    insertion qual from the side table, gap slots get 0 (the '!' null
    quality, constructor_ops.py:209).

    Returns DF(read_id, position, loc_ins, base[, qual]).
    """
    qual_cols = ["qual"] if include_quality else []
    base_rows = _pos_filter(cells, positions).select(
        "read_id", "position", F.lit(0).alias("loc_ins"), "base", *qual_cols
    )
    ins = _pos_filter(insertions, positions)
    if min_ins_count > 0:
        keep = (
            ins.groupBy("position", "loc_ins")
            .agg(F.countDistinct("read_id").alias("_n"))
            .filter(F.col("_n") >= min_ins_count)
            .select("position", "loc_ins")
        )
        ins = ins.join(F.broadcast(keep), ["position", "loc_ins"], "left_semi")
    ins_col = F.lower(F.col("base")) if lowercase_insertions else F.col("base")
    ins_rows = ins.select(
        "read_id", "position", "loc_ins", ins_col.alias("base"), *qual_cols
    )

    # every read must show a value at every kept insertion slot: cross
    # the distinct slot list (tiny) with the distinct read list, then
    # left-join actual insertion letters and gap-fill.
    slots = ins_rows.select("position", "loc_ins").distinct()
    read_ids = cells.select("read_id").distinct()
    slot_grid = read_ids.crossJoin(F.broadcast(slots))
    filled = (
        slot_grid.join(ins_rows, ["read_id", "position", "loc_ins"], "left")
        .withColumn("base", F.coalesce(F.col("base"), F.lit(ins_gap)))
    )
    if include_quality:
        filled = filled.withColumn("qual", F.coalesce(F.col("qual"), F.lit(0)))
    return base_rows.unionByName(filled)


def consensus_with_insertions(
    cells: DataFrame,
    insertions: DataFrame,
    modecutoff: float = 0.5,
    positions: Sequence[int] | None = None,
    min_ins_count: int = 0,
    fill: str = "N",
    exclude_insertions_with_gap_cons: bool = True,
) -> DataFrame:
    """A2 get_consensus(include_insertions=True), reference
    seqtables.py:1512-1553: consensus over the insertion-interleaved
    view — one modal letter per (position, loc_ins) slot, the
    modecutoff fallback applying to matrix slots exactly as in the
    plain consensus, and (by default) insertion slots whose consensus
    IS the gap dropped from the output
    (exclude_insertions_with_gap_cons).

    Sorting (position, loc_ins) reproduces the reference's
    column-interleaved consensus string.

    Scale shape: the consensus only needs per-(slot, letter) COUNTS,
    so the view's read x slot gap grid is never materialized - the
    gap row is arithmetic, cnt('-') = n_reads - sum(slot counts)
    (each read carries at most one base per slot), with n_reads a
    broadcast one-row aggregate. Nothing here scales with read count
    except the two partial-aggregated counts.

    Returns DF(position, loc_ins, consensus_base).
    """
    # Round 12 (guide §2.4): this used to run FOUR aggregations —
    # matrix counts, insertion counts, a gap-row re-aggregation of the
    # insertion counts (crossJoined with n_reads), and the final
    # per-slot mode over their 3-way union — so the cells subtree was
    # planned twice and the insertions subtree twice (Catalyst does
    # not dedupe common subtrees). Collapsed: union the two inputs
    # FIRST (matrix cells tagged loc_ins=0), aggregate once to
    # (slot, base) counts, once more to per-slot mode/total, and
    # derive the implicit gap row ARITHMETICALLY in the projection —
    # for an insertion slot, gap count = n_reads - sum(slot letter
    # counts) (each read carries at most one base per slot), and the
    # gap wins the mode exactly when gap_cnt >= letter mode count
    # (ties broke toward the lowest ascii letter before, and '-' (45)
    # sorts below every base letter, so >= reproduces the old
    # max_by(base, struct(cnt, -ascii(base))) tie-break bit-exactly).
    # Each input subtree is planned ONCE; the gap union, its
    # re-aggregation and the BroadcastNestedLoopJoin are gone.
    ins = _pos_filter(insertions, positions)
    if min_ins_count > 0:
        keep = (
            ins.groupBy("position", "loc_ins")
            .agg(F.countDistinct("read_id").alias("_n"))
            .filter(F.col("_n") >= min_ins_count)
            .select("position", "loc_ins")
        )
        ins = ins.join(F.broadcast(keep), ["position", "loc_ins"], "left_semi")
    all_cells = (
        _pos_filter(cells, positions)
        .select("position", F.lit(0).alias("loc_ins"), "base")
        .unionByName(ins.select("position", "loc_ins", "base"))
    )
    counts = all_cells.groupBy("position", "loc_ins", "base").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n_reads = cells.select(
        F.countDistinct("read_id").alias("_n_reads")
    )
    per_slot = counts.groupBy("position", "loc_ins").agg(
        F.expr("max_by(base, struct(cnt, -ascii(base)))").alias("letter_mode"),
        F.max("cnt").alias("letter_cnt"),
        F.sum("cnt").alias("letter_total"),
    ).crossJoin(F.broadcast(n_reads))
    gap_cnt = F.col("_n_reads") - F.col("letter_total")
    gap_wins = (F.col("loc_ins") != 0) & (gap_cnt >= F.col("letter_cnt"))
    mode_cnt = F.when(gap_wins, gap_cnt).otherwise(F.col("letter_cnt"))
    mode_base = F.when(gap_wins, F.lit("-")).otherwise(F.col("letter_mode"))
    total = F.when(
        (F.col("loc_ins") != 0) & (gap_cnt > 0), F.col("_n_reads")
    ).otherwise(F.col("letter_total"))
    cons = per_slot.select(
        "position",
        "loc_ins",
        F.when(mode_cnt <= total * F.lit(modecutoff), F.lit(fill))
        .otherwise(mode_base)
        .alias("consensus_base"),
    )
    if exclude_insertions_with_gap_cons:
        cons = cons.filter(
            (F.col("loc_ins") == 0) | (F.col("consensus_base") != "-")
        )
    return cons
