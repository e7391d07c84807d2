"""Quality-score operators.

Parity targets (file:line in /root/reference):
  - get_quality_dist:  seqtables/core/seqtables.py:1328-1377; kernel
    numpy_ops.py:137-371 (fastqc preset at :203-210 deliberately skips
    the (75,79) bin - replicated verbatim for parity)
  - quality_filter:    seqtables/core/seqtables.py:1223-1258
  - convert_low_bases_to_null: seqtables/core/seqtables.py:1260-1303

Scale notes. quality_dist joins cells against a tiny broadcast bins
table on a BETWEEN range condition (broadcast nested loop over ~60
bins - cheap, no shuffle of the big side), then one hash aggregate
per bin. quality_filter computes the per-read pass predicate with a
single groupBy(read_id) and applies it with LEFT SEMI joins, which
Spark executes broadcast when the survivor set is small and shuffled
hash otherwise; no data is collected to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import SeqTable


def fastqc_bins(max_position: int) -> list[tuple[int, int]]:
    """The FASTQC-style preset bin table (numpy_ops.py:203-210),
    including its (75,79) gap."""
    bins: list[tuple[int, int]] = [(i, i) for i in range(1, 10)]
    bins += [(p, p + 4) for p in range(10, 75, 5)]
    bins += [(p, p + 4) for p in range(80, 300, 5)]  # note: no (75,79)
    bins += [(p, p + 9) for p in range(300, max_position, 10)]
    return bins


def even_bins(min_position: int, max_position: int, n: int = 10) -> list[tuple[int, int]]:
    width = max_position - min_position + 1
    binsize = max(int(width / n), 1)
    out = []
    lo = min_position
    while lo <= max_position:
        out.append((lo, min(lo + binsize - 1, max_position)))
        lo += binsize
    return out


def quality_dist(
    cells: DataFrame,
    bins: str | Sequence[tuple[int, int]] = "even",
    exclude_null_quality: bool = True,
    percentiles: Sequence[int] = (10, 25, 50, 75, 90),
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """FASTQC-style binned quality distribution.

    Returns one row per bin: (bin_name, bin_lo, bin_hi, mean, median,
    min, max, p0, p10, p25, p50, p75, p90, p100, ... user percentiles).
    The percentile set always includes {0,10,25,50,75,90,100} like the
    reference (numpy_ops.py:251-257). Exact percentiles are used for
    parity; swap `F.percentile` for `F.percentile_approx` at very high
    cardinality if a sketch is acceptable.
    """
    qcells = cells.filter(F.col("qual").isNotNull())
    if exclude_null_quality:
        qcells = qcells.filter(F.col("qual") > 0)
    if sample_fraction:
        qcells = qcells.sample(fraction=sample_fraction, seed=seed)

    if isinstance(bins, str):
        lohi = qcells.agg(F.min("position"), F.max("position")).first()
        min_pos, max_pos = int(lohi[0]), int(lohi[1])
        bin_list = fastqc_bins(max_pos) if bins == "fastqc" else even_bins(min_pos, max_pos)
        bin_list = [b for b in bin_list if b[0] >= min_pos and b[0] <= max_pos]
    else:
        bin_list = [(int(lo), int(hi)) for lo, hi in bins]

    spark = SparkSession.getActiveSession()
    bins_df = spark.createDataFrame(
        [(f"{lo}-{hi}" if lo != hi else str(lo), lo, hi) for lo, hi in bin_list],
        "bin_name string, bin_lo long, bin_hi long",
    )
    joined = qcells.join(
        F.broadcast(bins_df),
        (F.col("position") >= F.col("bin_lo")) & (F.col("position") <= F.col("bin_hi")),
    )
    pset = sorted(set(int(p) for p in percentiles) | {0, 10, 25, 50, 75, 90, 100})
    aggs = [
        F.avg("qual").alias("mean"),
        F.expr("percentile(qual, 0.5)").alias("median"),
        F.min("qual").alias("min"),
        F.max("qual").alias("max"),
    ] + [F.expr(f"percentile(qual, {p / 100.0})").alias(f"p{p}") for p in pset]
    return joined.groupBy("bin_name", "bin_lo", "bin_hi").agg(*aggs)


def quality_filter(
    st: SeqTable,
    q: int,
    p: float,
    ignore_null_qual: bool = True,
) -> SeqTable:
    """Keep reads where >= p% of (non-null-quality) bases have
    phred >= q; the insertion table is filtered to survivors too
    (reference seqtables.py:1223-1258)."""
    cells = st.cells()
    considered = cells.filter(F.col("qual") > 0) if ignore_null_qual else cells
    good = (
        considered.groupBy("read_id")
        .agg((F.avg((F.col("qual") >= q).cast("double")) * 100).alias("pct"))
        .filter(F.col("pct") >= p)
        .select("read_id")
    )
    reads = st.reads.join(good, "read_id", "left_semi")
    ins = st.insertions.join(good, "read_id", "left_semi") if st._insertions is not None else None
    return SeqTable(reads, ins, st.seq_type, st.phred_adjust, st.fillna_val)


def convert_low_bases_to_null(
    cells: DataFrame,
    q: int,
    replace_with: str = "N",
    ignore_null_qual: bool = True,
) -> DataFrame:
    """Masked update on the cells view: base -> fill letter where
    qual < q (and qual > 0 when ignoring null quality), mirroring
    reference seqtables.py:1260-1303. Pure projection - no shuffle."""
    low = F.col("qual") < q
    if ignore_null_qual:
        low = low & (F.col("qual") > 0)
    return cells.withColumn(
        "base", F.when(low, F.lit(replace_with)).otherwise(F.col("base"))
    )
