"""Set operations over SeqTables.

Parity target: st_merge_arrays /root/reference/seqtables/xarray_mods/
st_merge.py:63-138 (facade merge_seqs seqtables.py:114-118).

axis=0 (vertical): UNION ALL over the union of positions; cells a
table lacks are implicit in long form (the reference materializes
seq='-', qual='!' fills because its matrix is dense - we expose the
same via an optional dense_fill flag on the cells view).

axis=1 (horizontal): merge on shared read ids with last-writer-wins
on overlapping positions (st_merge.py:127-136) - a full outer join
of the WIDE reads tables on read_id, with the overlay computed
row-locally as a per-position string zip. The cells view is never
exploded: the only shuffle is the read_id join of narrow rows, so
the cost at 100 TB is one co-partitionable join, not two exchanges
of 300x-multiplied cell rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..model import SeqTable


def merge_seqtables(
    tables: list[SeqTable],
    axis: int = 0,
    renumber_reads: bool = False,
    ins_duplicates: str = "drop",
) -> SeqTable:
    if axis == 0:
        return _merge_axis0(tables, renumber_reads, ins_duplicates)
    if axis == 1:
        return _merge_axis1(tables)
    raise ValueError("axis must be 0 or 1")


def _merge_axis0(
    tables: list[SeqTable], renumber_reads: bool, ins_duplicates: str
) -> SeqTable:
    reads = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True),
        [t.reads for t in tables],
    )
    if renumber_reads:
        # stable re-number: order-insensitive hash-free id via
        # monotonically_increasing_id is partition-dependent; keep the
        # original id and add a disambiguating table index instead.
        reads = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            [
                t.reads.withColumn(
                    "read_id", F.concat_ws("#", F.lit(str(i)), F.col("read_id"))
                )
                for i, t in enumerate(tables)
            ],
        )
    # insertions must be renumbered in LOCKSTEP with reads: otherwise
    # every insertion is orphaned (joins on the new 'i#id' match
    # nothing) and same-raw-id insertions from different tables would
    # collide in the duplicate check
    if renumber_reads:
        ins_tables = [
            t._insertions.withColumn(
                "read_id", F.concat_ws("#", F.lit(str(i)), F.col("read_id"))
            )
            for i, t in enumerate(tables)
            if t._insertions is not None
        ]
    else:
        ins_tables = [t._insertions for t in tables if t._insertions is not None]
    ins = None
    if ins_tables:
        ins = reduce(lambda a, b: a.unionByName(b), ins_tables)
        if ins_duplicates == "drop":
            ins = ins.dropDuplicates(["read_id", "position", "loc_ins"])
    first = tables[0]
    return SeqTable(reads, ins, first.seq_type, first.phred_adjust, first.fillna_val)


def _merge_axis1(tables: list[SeqTable]) -> SeqTable:
    """Horizontal merge on read_id: later tables overwrite earlier
    ones on overlapping positions; the overlay is row-local.

    After one full outer join of the wide reads tables, each output
    character is a nested CASE over the joined row: the LAST table
    whose [pos_start, pos_start+len) range covers the position (for a
    read it contains) supplies both the base char and the qual char
    (qual '!' when the winner carries no quality) - the same winner
    for both, matching the cell-level last-writer-wins of the
    reference (st_merge.py:127-136). No explode, no aggregation."""
    n = len(tables)
    sides = []
    for i, t in enumerate(tables):
        r = t.reads
        qual = (
            F.col("qual") if "qual" in r.columns else F.lit(None).cast("string")
        )
        ps = (
            F.col("pos_start").cast("long")
            if "pos_start" in r.columns
            else F.lit(1).cast("long")
        )
        sides.append(
            r.select(
                F.col("read_id"),
                F.col("seq").alias(f"_seq{i}"),
                qual.alias(f"_qual{i}"),
                ps.alias(f"_ps{i}"),
            )
        )
    joined = reduce(lambda a, b: a.join(b, "read_id", "full_outer"), sides)

    # global position bounds: ONE job over the union of per-table
    # narrow aggs on reads (never the exploded cells)
    bound_frames = []
    for t in tables:
        r = t.reads
        ps = (
            F.col("pos_start").cast("long")
            if "pos_start" in r.columns
            else F.lit(1).cast("long")
        )
        bound_frames.append(
            r.agg(
                F.min(ps).alias("_lo"),
                F.max(ps + F.length("seq") - F.lit(1)).alias("_hi"),
            )
        )
    row = (
        reduce(lambda a, b: a.unionByName(b), bound_frames)
        .agg(F.min("_lo"), F.max("_hi"))
        .first()
    )
    lo = int(row[0]) if row[0] is not None else None
    hi = int(row[1]) if row[1] is not None else None

    first = tables[0]
    if lo is None:  # all inputs empty
        reads = joined.select(
            "read_id",
            F.lit("").alias("seq"),
            F.lit("").alias("qual"),
            F.lit(1).cast("long").alias("pos_start"),
        )
        return SeqTable(reads, None, first.seq_type, first.phred_adjust, first.fillna_val)

    pos_arr = F.sequence(F.lit(lo).cast("long"), F.lit(hi).cast("long"))

    def overlay(p, char_of, fill):
        expr = F.lit(fill)
        for i in range(n):  # ascending wrap => highest i checked first
            covers = (
                F.col(f"_ps{i}").isNotNull()
                & (p >= F.col(f"_ps{i}"))
                & (p < F.col(f"_ps{i}") + F.length(F.col(f"_seq{i}")))
            )
            expr = F.when(covers, char_of(i, p)).otherwise(expr)
        return expr

    def base_char(i, p):
        return F.col(f"_seq{i}").substr(
            (p - F.col(f"_ps{i}") + F.lit(1)).cast("int"), F.lit(1)
        )

    def qual_char(i, p):
        return F.coalesce(
            F.col(f"_qual{i}").substr(
                (p - F.col(f"_ps{i}") + F.lit(1)).cast("int"), F.lit(1)
            ),
            F.lit("!"),
        )

    reads = joined.select(
        "read_id",
        F.concat_ws(
            "", F.transform(pos_arr, lambda p: overlay(p, base_char, "-"))
        ).alias("seq"),
        F.concat_ws(
            "", F.transform(pos_arr, lambda p: overlay(p, qual_char, "!"))
        ).alias("qual"),
        F.lit(lo).cast("long").alias("pos_start"),
    )
    return SeqTable(reads, None, first.seq_type, first.phred_adjust, first.fillna_val)
