"""K-mer / substring counting.

Parity target: get_substrings (gapped k-mers over every n-choose-k
combination of positions), /root/reference/seqtables/core/
seqtables.py:936-1034.

Scale notes. The gapped variant is combinatorially explosive BY
SPECIFICATION (the reference warns the same); we keep it faithful for
small P and add `contiguous_kmers` as the scale path: sliding-window
k-mers via a single explode - linear in input size, the shape every
large-scale pipeline (dedup shingles, motif counting) actually uses.
The combination list is built driver-side (it is metadata, size
C(P,k)) and exploded executor-side; counting is one hash aggregate.
"""

from __future__ import annotations

import itertools
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def get_substrings(
    reads: DataFrame,
    word_length: int,
    positions: Sequence[int] | None = None,
    weights: DataFrame | None = None,
    max_combinations: int = 20000,
    seq_col: str = "seq",
    pos_start: int = 1,
) -> DataFrame:
    """Gapped k-mer counts: for every combination of `word_length`
    positions, count each distinct letter-tuple.

    Returns long DF(combo string 'p1,p3,p4', kmer string, cnt) - the
    reference's kmers x combos matrix in long form. Guarded by
    max_combinations (the reference computes C(P, k) unconditionally;
    at scale that must be an explicit opt-in).
    """
    if positions is None:
        width = reads.agg(F.max(F.length(seq_col))).first()[0] or 0
        positions = list(range(pos_start, pos_start + width))
    combos = list(itertools.combinations(sorted(positions), word_length))
    if len(combos) > max_combinations:
        raise ValueError(
            f"{len(combos)} combinations > max_combinations={max_combinations}; "
            "use contiguous_kmers or restrict positions"
        )
    # combo metadata exploded executor-side; substr positions are
    # 1-based offsets into the (aligned, fixed-width) seq string
    combo_arr = F.array(
        *[
            F.struct(
                F.lit(",".join(f"p{p}" for p in c)).alias("combo"),
                F.array(*[F.lit(p - pos_start + 1) for p in c]).alias("offs"),
            )
            for c in combos
        ]
    )
    exploded = reads.select(
        F.col(seq_col),
        *(["read_id"] if weights is not None else []),
        F.explode(combo_arr).alias("c"),
    ).select(
        F.col("c.combo").alias("combo"),
        F.concat_ws(
            "",
            F.transform(F.col("c.offs"), lambda o: F.col(seq_col).substr(o, F.lit(1))),
        ).alias("kmer"),
        *(["read_id"] if weights is not None else []),
    )
    if weights is not None:
        exploded = exploded.join(F.broadcast(weights), "read_id", "left")
        return exploded.groupBy("combo", "kmer").agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(1.0))).alias("cnt")
        )
    return exploded.groupBy("combo", "kmer").agg(F.count(F.lit(1)).alias("cnt"))


def contiguous_kmers(
    df: DataFrame,
    k: int,
    text_col: str = "seq",
    id_col: str | None = None,
) -> DataFrame:
    """Sliding-window k-mers (the scalable counting mode): one row per
    (k-mer occurrence), counted. Returns DF(kmer, cnt) or
    DF(id, kmer, cnt) when id_col is given. Pure explode + hash agg:
    linear, no driver combinatorics, partial aggregation map-side."""
    ids = [F.col(id_col)] if id_col else []
    kmer = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - F.lit(k - 1), F.lit(0))),
            lambda i: F.col(text_col).substr(i, F.lit(k)),
        )
    ).alias("kmer")
    exploded = df.filter(F.length(text_col) >= k).select(*ids, kmer)
    keys = ([id_col] if id_col else []) + ["kmer"]
    return exploded.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
