"""CIGAR realignment: SAM-shaped rows -> gap-padded fixed-width
aligned sequences + insertion side-table.

Parity target: the reference's one Cython kernel, df_to_algn_arr
(/root/reference/seqtables/core/internals/cython/sam_to_arr.pyx:
229-377; per-read extractor :80-210; tokenizer :27-77). Behavior
preserved exactly:

  - window [min_pos, max_pos] defaults to
      min(pos) .. max(pos + len(seq) + dels(incl. N) - ins - clips - 1)
    computed over all reads (pyx:256-273)
  - M/X/= copy read bases; D emits '-'/qual '!'; N emits '.'/qual '!';
    S consumes read bases silently; H ignored; I diverts bases to the
    insertion table when min_pos <= refP <= max_pos
  - reads starting after max_pos become all-edge-gap rows; reads
    ending before min_pos become all-edge-gap rows; partial overlaps
    are clipped at both window edges (pyx:114-207)
  - insertion loc numbering is NEGATIVE, counted leftward from the
    reference base the run precedes: for inserted run 'CGG' before
    position p, G(last)=-1, G=-2, C=-3 (pyx:333-349)

Spark-first design: the window-bounds pass is a pure-SQL aggregate
over a tokenized cigar column (regexp + transform; no UDF), so
Catalyst prunes/pushes it. The per-read walk is a mapInPandas batch
operator - the one genuinely imperative kernel in the engine (SURVEY
2.9). Each input row yields one output row carrying the aligned
seq/qual plus an array<struct> of its insertions; callers split that
into the `reads` and `insertions` DataFrames (persist the aligned DF
first when both sides are consumed, to avoid recomputing the UDF).
At 100 TB the operator is embarrassingly parallel per partition and
Arrow-batched; no shuffle at all.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=XB])")

ALIGNED_SCHEMA = (
    "read_id string, pos_start long, seq string, qual string, "
    "ins array<struct<position: long, loc_ins: int, base: string, qual_ch: string>>"
)


def align_read(
    seq: str,
    qual: str,
    pos: int,
    cigar: str,
    min_pos: int,
    max_pos: int,
    edge_gap: str = "-",
    null_qual: str = "!",
):
    """Pure-python port of extract_algn_seq semantics (see module
    docstring). Returns (aligned_seq, aligned_qual, insertions) where
    insertions is a list of (position, loc_ins, base, qual_char)."""
    width = max_pos - min_pos + 1
    if pos > max_pos:
        return edge_gap * width, null_qual * width, []

    out_s: list[str] = []
    out_q: list[str] = []
    ins_bases: list[tuple[int, str, str]] = []  # (refP, base, qual_char)

    if pos > min_pos:
        out_s.append(edge_gap * (pos - min_pos))
        out_q.append(null_qual * (pos - min_pos))

    ref_p = pos
    seq_p = 0
    for m in _CIGAR_RE.finditer(cigar):
        nevt = int(m.group(1))
        evt = m.group(2)
        if evt in "MX=":
            if ref_p < min_pos:
                adjust = (ref_p + nevt) - min_pos
                if adjust <= 0:
                    ref_p += nevt
                    seq_p += nevt
                    continue
                seq_p += nevt - adjust
                ref_p += nevt - adjust
                nevt = adjust
            out_s.append(seq[seq_p : seq_p + nevt])
            out_q.append(qual[seq_p : seq_p + nevt])
            ref_p += nevt
            seq_p += nevt
        elif evt == "I":
            if min_pos <= ref_p <= max_pos:
                for k in range(nevt):
                    ins_bases.append((ref_p, seq[seq_p + k], qual[seq_p + k]))
            seq_p += nevt
        elif evt in "DN":
            fill = "-" if evt == "D" else "."
            if ref_p < min_pos:
                adjust = (ref_p + nevt) - min_pos
                if adjust <= 0:
                    ref_p += nevt
                    continue
                ref_p += nevt - adjust
                nevt = adjust
            out_s.append(fill * nevt)
            out_q.append(null_qual * nevt)
            ref_p += nevt
        elif evt == "S":
            seq_p += nevt
        # H / P / B: no-op (reference ignores them, pyx:195-199)

    if ref_p < min_pos:
        ref_p = min_pos
    s = "".join(out_s)
    q = "".join(out_q)
    if ref_p <= max_pos:
        s += edge_gap * (max_pos - ref_p + 1)
        q += null_qual * (max_pos - ref_p + 1)
    # clip anything written past the window (reference guards dest index)
    s, q = s[:width], q[:width]

    # negative leftward loc numbering per run of same ref position
    ins_records: list[tuple[int, int, str, str]] = []
    if ins_bases:
        counter = 0
        marker = ins_bases[-1][0]
        for ref_pos, b, qc in reversed(ins_bases):
            if ref_pos != marker:
                counter = -1
                marker = ref_pos
            else:
                counter -= 1
            ins_records.append((ref_pos, counter, b, qc))
    return s, q, ins_records


def align_sam_df(
    df: DataFrame,
    min_pos: int | None = None,
    max_pos: int | None = None,
    edge_gap: str = "-",
    id_col: str = "header",
    return_cached: bool = False,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """Align a SAM-shaped DataFrame (id, pos, seq, qual, cigar).

    Returns (reads, insertions) - or, with return_cached=True,
    (reads, insertions, cached_stage) where cached_stage is the
    persisted mapInPandas output BOTH derive from: the owner must
    eventually .unpersist() it (SeqTable.unpersist does), otherwise
    the CacheManager entry lives for the whole session.

      reads(read_id, seq, qual, pos_start)  - fixed width, aligned
      insertions(read_id, position, loc_ins, base, qual)
    """
    need = {"pos", "seq", "qual", "cigar"}
    missing = need - set(df.columns)
    if missing:
        raise ValueError(f"missing SAM columns: {sorted(missing)}")

    if min_pos is None or max_pos is None:
        # window bounds, pure SQL: tokenize cigar once, sum the event
        # lengths by class (D and N count as deletions, pyx:63-66)
        toks = F.expr(r"regexp_extract_all(cigar, '[0-9]+[MIDNSHP=XB]', 0)")

        def _total(ops: str):
            # token shape '12M': strip the op letter to get the length
            return F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.when(
                    F.substring(t, -1, 1).isin(list(ops)),
                    F.translate(t, "MIDNSHP=XB", "").cast("long"),
                ).otherwise(F.lit(0)),
            )

        bounds = df.select(
            F.col("pos").cast("long").alias("pos"),
            (
                F.col("pos").cast("long")
                + F.length("seq")
                + _total("DN")
                - _total("I")
                - _total("S")
                - F.lit(1)
            ).alias("end_pos"),
        ).agg(F.min("pos").alias("mn"), F.max("end_pos").alias("mx")).first()
        if min_pos is None:
            min_pos = int(bounds["mn"])
        if max_pos is None:
            max_pos = int(bounds["mx"])
    # <= : a width-1 window (min_pos == max_pos) is legitimate
    assert min_pos <= max_pos, "min_pos must be <= max_pos"

    mn, mx, gap = int(min_pos), int(max_pos), edge_gap

    def _align_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"read_id": [], "pos_start": [], "seq": [], "qual": [], "ins": []}
            for rid, seq, qual, pos, cigar in zip(
                pdf["_rid"], pdf["seq"], pdf["qual"], pdf["pos"], pdf["cigar"]
            ):
                # SAM's missing-quality sentinel is '*' (spec 1.4),
                # not just empty/None - without this a '*' qual reads
                # as a 1-char phred-9 string and desyncs widths
                if not qual or qual == "*":
                    qual = "!" * len(seq)
                s, q, ins = align_read(seq, qual, int(pos), cigar, mn, mx, gap)
                out["read_id"].append(str(rid))
                out["pos_start"].append(mn)
                out["seq"].append(s)
                out["qual"].append(q)
                out["ins"].append(ins)
            yield pd.DataFrame(out)

    prepared = df.select(
        F.col(id_col).cast("string").alias("_rid"),
        F.col("seq"),
        F.col("qual"),
        F.col("pos").cast("long").alias("pos"),
        F.col("cigar"),
    )
    # both outputs derive from the one mapInPandas stage; persist so
    # consuming reads AND insertions costs one CIGAR-realign pass,
    # not two (MEMORY_AND_DISK default - spills, never recomputes)
    aligned = prepared.mapInPandas(_align_batches, ALIGNED_SCHEMA).persist()
    # the persisted stage is handed back via return_cached so an OWNER
    # (SeqTable.unpersist) can release it - persist without a release
    # handle leaks CacheManager entries for the session lifetime
    reads = aligned.select("read_id", "seq", "qual", "pos_start")
    insertions = (
        aligned.select("read_id", F.explode("ins").alias("i"))
        .select(
            "read_id",
            F.col("i.position").alias("position"),
            F.col("i.loc_ins").alias("loc_ins"),
            F.col("i.base").alias("base"),
            (F.ascii("i.qual_ch") - F.lit(33)).alias("qual"),
        )
    )
    if return_cached:
        return reads, insertions, aligned
    return reads, insertions
