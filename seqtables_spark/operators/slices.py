"""Row/position slicing and reassembly operators.

Parity targets (file:line in /root/reference):
  - slice_sequences: seqtables/core/seqtables.py:566-673 (re-assemble
    the substring at an arbitrary set of positions per read)
  - filter_by_count: seqtables/core/numpy_ops.py:374-405 (keep rows
    whose value-group count exceeds a cutoff)

Scale notes. slice_sequences is a filter + groupBy(read_id) with a
map-assembly: positions are filtered BEFORE the shuffle, so slicing 5
positions out of 300 moves ~1.7% of the cells; assembly per read is
a small in-memory map lookup, no global sort. filter_by_count is a
two-phase aggregate-then-semi-join - cheaper than a window over the
full table and skew-immune (the counts side is tiny and broadcasts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def slice_sequences(
    cells: DataFrame,
    positions: Sequence[int],
    name: str = "seqs",
    return_quality: bool = False,
    empty_char: str = "N",
    all_read_ids: DataFrame | None = None,
) -> DataFrame:
    """Per read, the string formed by the requested positions in
    ascending position order. Positions absent for a read are padded
    with `empty_char` (the reference pads requested positions outside
    the table, seqtables.py:598-616).

    all_read_ids: optional DF carrying a read_id column naming the full
    read universe. With it, reads matching NONE of the requested
    positions still come back (as the all-`empty_char` pad string) -
    the reference returns every read even for fully out-of-range
    position sets. Without it the filter-first plan can only see reads
    that hit >= 1 position. The facade passes its reads table (one row
    per read, far cheaper than shuffling all cells to keep empties).

    Returns DF(read_id, <name>[, quality]).
    """
    pos_list = sorted(set(int(p) for p in positions))
    pos_arr = F.array(*[F.lit(p).cast("long") for p in pos_list])
    has_qual = return_quality and "qual" in cells.columns

    sliced = cells.filter(F.col("position").isin(pos_list))
    # map_from_entries over structs (NOT map_from_arrays over parallel
    # collect_lists - collect_list drops NULL quals and desyncs arrays)
    grouped = sliced.groupBy("read_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("position", "base"))
        ).alias("_bases"),
        *(
            [
                F.map_from_entries(
                    F.collect_list(F.struct("position", "qual"))
                ).alias("_quals")
            ]
            if has_qual
            else []
        ),
    )
    if all_read_ids is not None:
        grouped = all_read_ids.select("read_id").join(grouped, "read_id", "left")
    seq_expr = F.concat_ws(
        "",
        F.transform(
            pos_arr,
            lambda p: F.coalesce(F.element_at(F.col("_bases"), p), F.lit(empty_char)),
        ),
    ).alias(name)
    if not has_qual:
        return grouped.select("read_id", seq_expr)
    qual_expr = F.concat_ws(
        "",
        F.transform(
            pos_arr,
            lambda p: F.coalesce(
                F.char(F.element_at(F.col("_quals"), p) + F.lit(33)), F.lit("!")
            ),
        ),
    ).alias("quality")
    return grouped.select("read_id", seq_expr, qual_expr)


def deterministic_sample(
    df: DataFrame,
    n: int,
    id_col: str = "read_id",
) -> DataFrame:
    """Exact-n pseudo-random sample, reproducible across engines: rank
    by md5 of the id (a fixed universal permutation) and take the
    first n. The scalable analog of the reference's `subsample`
    (seqtables.py:675-686) - seeded `rand()` is engine-specific, a
    content hash is not. TakeOrderedAndProject: no full sort."""
    return (
        df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n)
    )


def filter_by_count(
    df: DataFrame,
    value_cols: Sequence[str],
    min_count: int,
) -> DataFrame:
    """Keep rows whose value-group appears more than min_count times
    (reference filter_by_count semantics: strictly greater)."""
    cols = list(value_cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") > min_count
    )
    return df.join(F.broadcast(counts.select(*cols)), cols, "left_semi")
