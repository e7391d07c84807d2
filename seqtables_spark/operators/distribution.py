"""Per-position distribution operators: the reference's workhorse
aggregation family.

Parity targets (file:line in /root/reference):
  - get_seq_dist:        seqtables/core/seqtables.py:882-934; bincount
    kernel numpy_ops.py:107-134
  - get_consensus:       seqtables/core/seqtables.py:1512-1553
  - pos_entropy:         seqtables/core/seqtables.py:1315-1317;
    shannon_info seq_logo.py:314-318
  - get_bits:            seq_logo.py:297-311
  - relative_entropy:    seqtables/core/seqtables.py:1319-1326;
    seq_logo.py:321-329

Scale notes. Everything here is `groupBy(position, base)` - Spark
executes it as partial (map-side) + final hash aggregate, so the
shuffle carries at most |positions| x |alphabet| rows per task
regardless of read count: at 100 TB of reads the shuffle for a
300-position amplicon is ~6k rows/task. We keep results in LONG form
(position, base, value) - the reference's letters x positions pivot
is a presentation detail and pivoting early would fight columnar
execution; `pivot()` remains available on the tiny result.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..alphabets import AA_LETTERS, NT_LETTERS


def _apply_position_filter(cells: DataFrame, positions: Sequence[int] | None) -> DataFrame:
    if positions is not None:
        cells = cells.filter(F.col("position").isin(list(positions)))
    return cells


def seq_dist(
    cells: DataFrame,
    method: str = "counts",
    positions: Sequence[int] | None = None,
    ignore_characters: Sequence[str] = (),
    weights: DataFrame | None = None,
    seq_type: str = "NT",
) -> DataFrame:
    """Per-position letter distribution.

    Returns long DF (position, base, cnt) for method='counts',
    (position, base, freq) for 'freq', (position, base, bits) for
    'bits' (sequence-logo letter heights, get_bits semantics).

    weights: optional DF(read_id, weight) joined onto cells before
    aggregation (reference weight_by, seqtables.py:890-903). The join
    is broadcast when the weight table is small; weighted count =
    sum(weight).
    """
    cells = _apply_position_filter(cells, positions)
    if ignore_characters:
        cells = cells.filter(~F.col("base").isin(list(ignore_characters)))
    if weights is not None:
        cells = cells.join(F.broadcast(weights), "read_id", "left").withColumn(
            "_w", F.coalesce(F.col("weight"), F.lit(1.0))
        )
        counts = cells.groupBy("position", "base").agg(F.sum("_w").alias("cnt"))
    else:
        counts = cells.groupBy("position", "base").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    if method == "counts":
        return counts
    w = Window.partitionBy("position")
    freq = counts.withColumn("freq", F.col("cnt") / F.sum("cnt").over(w))
    if method == "freq":
        return freq.drop("cnt")
    if method == "bits":
        # 20 for AA, 4 for NT - the reference's aa_alphabet/dna_alphabet
        # (seq_logo.py:303); the extended validation set (incl. X/*)
        # must NOT inflate log2|alphabet| bit heights
        alphabet_n = len(AA_LETTERS) if seq_type == "AA" else len(NT_LETTERS)
        n_reads = F.sum("cnt").over(w)
        entropy = F.sum(-F.col("freq") * F.log2("freq")).over(w)
        correction = (1.0 / math.log(2)) * (alphabet_n - 1) / (2.0 * n_reads)
        total_height = F.log2(F.lit(float(alphabet_n))) - (entropy + correction / 2)
        return (
            freq.withColumn("bits", F.greatest(F.col("freq") * total_height, F.lit(0.0)))
            .select("position", "base", "bits")
        )
    raise ValueError(f"unknown method {method!r}")


def consensus(
    cells: DataFrame,
    modecutoff: float = 0.5,
    positions: Sequence[int] | None = None,
    fill: str = "N",
) -> DataFrame:
    """Per-position modal letter; emits `fill` when the mode's count is
    <= total * modecutoff (reference uses `<=`, seqtables.py:1534-1536).
    Ties break to the smallest letter (the reference argmaxes over a
    distribution indexed by ascending character code).

    Returns DF(position, consensus_base). One narrow shuffle (the
    count agg); the max-by runs on the tiny distribution.
    """
    counts = seq_dist(cells, "counts", positions=positions)
    # max_by on (cnt, -ascii(base)): highest count wins, ties go to the
    # smallest letter — the reference's first-argmax over an ascending
    # character-code index.
    per_pos = counts.groupBy("position").agg(
        F.expr("max_by(base, struct(cnt, -ascii(base)))").alias("mode_base"),
        F.max("cnt").alias("mode_cnt"),
        F.sum("cnt").alias("total"),
    )
    return per_pos.select(
        "position",
        F.when(F.col("mode_cnt") <= F.col("total") * F.lit(modecutoff), F.lit(fill))
        .otherwise(F.col("mode_base"))
        .alias("consensus_base"),
    )


def seq_dist_with_insertions(
    cells: DataFrame,
    insertions: DataFrame,
    positions: Sequence[int] | None = None,
    ignore_characters: Sequence[str] = (),
    ins_letter: str = "^",
) -> DataFrame:
    """A1 get_seq_dist(include_insertion_counts=True): the per-position
    letter counts with insertion-event counts appended as the
    pseudo-letter '^' (reference seqtables.py:905-918 — one extra row
    per position counting reads that carry >= 1 insertion there).

    Both branches are partial-aggregated before their union, so the
    combined shuffle stays |positions| x (|alphabet|+1) rows."""
    from .insertions import get_insertion_events

    counts = seq_dist(
        cells, "counts", positions=positions, ignore_characters=ignore_characters
    )
    ins_counts = get_insertion_events(insertions, positions=positions).select(
        "position", F.lit(ins_letter).alias("base"), F.col("n_reads").alias("cnt")
    )
    return counts.unionByName(ins_counts)


def consensus_string(cells: DataFrame, modecutoff: float = 0.5, fill: str = "N") -> str:
    """Driver-side convenience: assemble the consensus into one string
    (ordered by position). Fine because the result is |positions| long."""
    rows = consensus(cells, modecutoff, fill=fill).orderBy("position").collect()
    return "".join(r["consensus_base"] for r in rows)


def pos_entropy(
    cells: DataFrame,
    positions: Sequence[int] | None = None,
    ignore_characters: Sequence[str] = (),
    nbit: int = 2,
) -> DataFrame:
    """Shannon entropy of the per-position letter distribution:
    -sum(p * log_nbit(p)). Zero-frequency letters contribute nothing
    (the reference's pandas `.sum(skipna=True)` does the same).
    Returns DF(position, entropy)."""
    freq = seq_dist(cells, "freq", positions=positions, ignore_characters=ignore_characters)
    return freq.groupBy("position").agg(
        (-F.sum(F.col("freq") * F.log("freq")) / F.lit(math.log(nbit))).alias("entropy")
    )


def seq_bits(
    cells: DataFrame,
    positions: Sequence[int] | None = None,
    ignore_characters: Sequence[str] = (),
    seq_type: str = "NT",
) -> DataFrame:
    """Information-content letter heights (sequence logo); see seq_dist
    method='bits'."""
    return seq_dist(
        cells, "bits", positions=positions, ignore_characters=ignore_characters, seq_type=seq_type
    )


def relative_entropy(
    cells: DataFrame,
    background_cells: DataFrame | None = None,
    positions: Sequence[int] | None = None,
    seq_type: str = "NT",
) -> DataFrame:
    """Per-position KL divergence of observed letter freq vs a
    background freq; uniform 1/4 (NT) or 1/20 (AA) when no background
    is given (seq_logo.py:321-329). Returns DF(position, rel_entropy).

    The background join is on (position, base) - the background
    distribution is tiny, so it broadcasts.
    """
    fg = seq_dist(cells, "freq", positions=positions)
    if background_cells is None:
        constant = 1.0 / (20 if seq_type == "AA" else 4)
        joined = fg.withColumn("bg_freq", F.lit(constant))
    else:
        bg = seq_dist(background_cells, "freq", positions=positions).withColumnRenamed(
            "freq", "bg_freq"
        )
        joined = fg.join(F.broadcast(bg), ["position", "base"], "left")
    return joined.groupBy("position").agg(
        F.sum(F.col("freq") * F.log(F.col("freq") / F.col("bg_freq"))).alias("rel_entropy")
    )


def seq_dist_dense(
    reads: DataFrame,
    seq_col: str = "seq",
    pos_start: int = 1,
    algorithm: str = "dense",
    crossover_cells: int = 100_000_000,
) -> DataFrame:
    """The reference's dense bincount kernel (numpy_ops.py:107-134),
    distributed: each Arrow batch becomes a uint8 char matrix,
    np.bincount runs per column, and only the per-partition 256 x P
    count matrix leaves Python as (position, base, cnt) partials; one
    final hash agg collapses partitions.

    Same result as seq_dist over cells() (pinned by test, including on
    ragged reads: a read contributes only the positions it has, the
    relational plan's semantics) - this is the THROUGHPUT path. The
    relational explode plan materializes one row per cell (~160M
    cells/s across 32 local cores, measured at 300M cells); this
    kernel counts at ~335M cells/s on the same cores because a cell
    is one byte, never a row (the reference's own single-core numpy
    runs ~75M cells/s on this machine — see SCALING.md). Choose it
    when the corpus is the bottleneck (the 100 TB scan), the explode
    plan when composability with other cell-level predicates matters.

    CROSSOVER (measured, tools/seq_dist_crossover.py): the dense
    path pays a fixed Arrow-transit + Python-worker cost per batch,
    so below ~100M cells (rows x width) the JVM explode plan is
    FASTER (1.1-1.4x at 6-60M cells) and this kernel only wins above
    it (0.70x at 240M, 0.60x at ~1B cells, 32 local cores).

    algorithm (round 11, verdict #3):
      * "dense" (default)   — always the bincount kernel; pure plan
        build (no jobs), streaming-safe.
      * "explode"           — always the JVM posexplode + hash-agg
        plan (identical result, pinned by test); pure, streaming-safe.
      * "auto"              — measure the EXACT cell count with one
        bounded aggregate (sum(length(seq)) — cheaper than it sounds:
        column-pruned scan + partial agg) and pick the measured
        crossover winner (`crossover_cells`, default the 100M knee
        above). Runs a job at plan-BUILD time, so it raises on
        streaming input — pass an explicit algorithm there (the
        round-10 eager-plan-build containment pattern).
    """
    import numpy as np
    import pandas as pd

    if algorithm not in ("dense", "explode", "auto"):
        raise ValueError(
            f"algorithm must be dense|explode|auto, got {algorithm!r}"
        )
    if algorithm == "auto":
        if reads.isStreaming:
            raise ValueError(
                "algorithm='auto' counts cells at plan-build time and"
                " cannot run on a streaming DataFrame; pass"
                " algorithm='dense' or 'explode' explicitly"
            )
        cells_n = reads.agg(
            F.sum(F.length(F.col(seq_col)))
        ).first()[0] or 0
        algorithm = "dense" if cells_n >= crossover_cells else "explode"
    if algorithm == "explode":
        # Round 12 (verdict #3): explode POSITIONS, not characters.
        # The old posexplode(split(seq, '(?!$)')) allocated a W-element
        # single-char-string array per read before generating; exploding
        # sequence(1, length) and taking substr(seq, position, 1) per
        # generated row keeps the read string intact (one reference,
        # W substrs) - measured 0.81 s -> 0.49 s at sf1 (1.2M cells),
        # identical result (hash-pinned). Empty reads are dropped
        # BEFORE exploding - also load-bearing for correctness here:
        # sequence(1, 0) generates the DESCENDING [1, 0], which would
        # emit two phantom positions per zero-width read.
        exploded = reads.filter(F.length(F.col(seq_col)) > 0).select(
            F.col(seq_col).alias("_seq"),
            F.explode(
                F.sequence(F.lit(1), F.length(F.col(seq_col)))
            ).alias("_p"),
        )
        return exploded.groupBy(
            (F.lit(pos_start - 1) + F.col("_p")).cast("long").alias(
                "position"
            ),
            F.expr("substr(_seq, _p, 1)").alias("base"),
        ).agg(F.count(F.lit(1)).alias("cnt"))

    def part(batches):
        counts: dict[int, "np.ndarray"] = {}  # 0-based offset -> 256 bins
        for pdf in batches:
            seqs = pdf[seq_col]
            if len(seqs) == 0:
                continue
            # group by length: each group is a dense rectangle; ragged
            # inputs just form several rectangles with shared columns
            for w, grp in seqs.groupby(seqs.str.len()):
                w = int(w)
                if w == 0:
                    continue
                arr = np.frombuffer(
                    "".join(grp).encode("ascii"), dtype=np.uint8
                ).reshape(len(grp), w)
                for j in range(w):
                    c = counts.get(j)
                    if c is None:
                        c = counts[j] = np.zeros(256, dtype=np.int64)
                    c += np.bincount(arr[:, j], minlength=256)
        if not counts:
            return
        rows = [
            (pos_start + j, chr(b), int(c[b]))
            for j, c in counts.items()
            for b in np.nonzero(c)[0]
        ]
        yield pd.DataFrame(rows, columns=["position", "base", "cnt"])

    partials = reads.mapInPandas(part, "position long, base string, cnt long")
    return partials.groupBy("position", "base").agg(F.sum("cnt").alias("cnt"))
