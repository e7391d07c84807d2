"""Set operations over SeqTables.

Parity target: st_merge_arrays /root/reference/seqtables/xarray_mods/
st_merge.py:63-138 (facade merge_seqs seqtables.py:114-118).

axis=0 (vertical): UNION ALL over the union of positions; cells a
table lacks are implicit in long form (the reference materializes
seq='-', qual='!' fills because its matrix is dense - we expose the
same via an optional dense_fill flag on the cells view).

axis=1 (horizontal): merge on shared read ids with last-writer-wins
on overlapping positions (st_merge.py:127-136) - a full outer join
per-position with coalesce(right, left).
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
    ins_tables = [t._insertions for t in tables if t._insertions is not None]
    ins = None
    if ins_tables:
        ins = reduce(lambda a, b: a.unionByName(b), ins_tables)
        if ins_duplicates == "drop":
            ins = ins.dropDuplicates(["read_id", "position", "loc_ins"])
    first = tables[0]
    return SeqTable(reads, ins, first.seq_type, first.phred_adjust, first.fillna_val)


def _merge_axis1(tables: list[SeqTable]) -> SeqTable:
    """Horizontal merge on read_id: later tables overwrite earlier ones
    on overlapping positions. Implemented on the cells view; the result
    SeqTable re-assembles seq strings per read (positions union,
    missing cells filled '-')."""
    cells = [t.cells() for t in tables]
    for i, c in enumerate(cells):
        if "qual" not in c.columns:
            cells[i] = c.withColumn("qual", F.lit(None).cast("int"))
    tagged = [
        c.withColumn("_src", F.lit(i)) for i, c in enumerate(cells)
    ]
    union = reduce(lambda a, b: a.unionByName(b), tagged)
    # last writer wins per (read_id, position)
    winner = union.groupBy("read_id", "position").agg(
        F.expr("max_by(base, _src)").alias("base"),
        F.expr("max_by(qual, _src)").alias("qual"),
    )
    # rebuild fixed-width reads over the union of positions
    bounds = winner.agg(F.min("position"), F.max("position")).first()
    lo, hi = int(bounds[0]), int(bounds[1])
    pos_arr = F.sequence(F.lit(lo).cast("long"), F.lit(hi).cast("long"))
    # map_from_entries over structs, NOT map_from_arrays over two
    # collect_lists: collect_list skips NULL quals, which would
    # desynchronize the key and value arrays
    grouped = winner.groupBy("read_id").agg(
        F.map_from_entries(F.collect_list(F.struct("position", "base"))).alias("_b"),
        F.map_from_entries(F.collect_list(F.struct("position", "qual"))).alias("_q"),
    )
    reads = grouped.select(
        "read_id",
        F.concat_ws(
            "",
            F.transform(pos_arr, lambda p: F.coalesce(F.element_at(F.col("_b"), p), F.lit("-"))),
        ).alias("seq"),
        F.concat_ws(
            "",
            F.transform(
                pos_arr,
                lambda p: F.coalesce(
                    F.char(F.element_at(F.col("_q"), p) + F.lit(33)), F.lit("!")
                ),
            ),
        ).alias("qual"),
        F.lit(lo).cast("long").alias("pos_start"),
    )
    first = tables[0]
    return SeqTable(reads, None, first.seq_type, first.phred_adjust, first.fillna_val)
