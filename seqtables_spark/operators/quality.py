"""Quality-score operators.

Parity targets (file:line in /root/reference):
  - get_quality_dist:  seqtables/core/seqtables.py:1328-1377; kernel
    numpy_ops.py:137-371 (fastqc preset at :203-210 deliberately skips
    the (75,79) bin - replicated verbatim for parity)
  - quality_filter:    seqtables/core/seqtables.py:1223-1258
  - convert_low_bases_to_null: seqtables/core/seqtables.py:1260-1303

Scale notes. quality_dist joins cells against a tiny broadcast bins
table on a BETWEEN range condition (broadcast nested loop over ~60
bins - cheap, no shuffle of the big side). Percentiles are EXACT but
computed from a (bin x qual) histogram rather than a sort-based
percentile() over the raw cells: phred is a small integer domain
(~0..45), so one partial+final hash aggregate collapses each map
partition to at most |bins| x 46 rows before the exchange, and the
interpolation runs on that tiny table with window functions. At
100 TB the shuffle carries kilobytes. quality_filter computes the
per-read pass predicate with a single groupBy(read_id) and applies
it with LEFT SEMI joins; no data is collected to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


#: positions spanned beyond which the literal-array bin lookup would
#: bloat the plan; such bin tables fall back to the broadcast range join
_BIN_LOOKUP_MAX_SPAN = 8192


def _attach_bins(spark, qcells: DataFrame, bin_list) -> DataFrame:
    """Attach (bin_name, bin_lo, bin_hi) to each cell row and drop
    rows covered by no bin (inner-join semantics, e.g. the fastqc
    (75,79) gap).

    Fast path (round 12, guide §3): when the bins are non-overlapping
    and span a bounded position domain — always true for the
    even/fastqc presets, whose positions are read offsets — the
    assignment is a row-local ``element_at`` on literal arrays
    indexed by position. The previous broadcast range join planned as
    a BroadcastNestedLoopJoin that evaluated every bin's BETWEEN
    predicate against every cell row (|bins| ~ 60 comparisons/cell);
    the lookup is O(1) per row and removes the join node entirely.
    Overlapping or unbounded bin tables keep the range join (a
    position matching several bins must emit one row per match)."""
    if not bin_list:
        # r12 ADVICE: min() over an empty bin list raised ValueError
        # where the range-join path it replaced returned an empty
        # DataFrame; preserve the old contract.
        return qcells.withColumns(
            {
                "bin_name": F.lit(None).cast("string"),
                "bin_lo": F.lit(None).cast("long"),
                "bin_hi": F.lit(None).cast("long"),
            }
        ).filter(F.lit(False))
    lo_all = min(lo for lo, _ in bin_list)
    hi_all = max(hi for _, hi in bin_list)
    span = hi_all - lo_all + 1
    non_overlapping = all(
        a[1] < b[0] for a, b in zip(sorted(bin_list), sorted(bin_list)[1:])
    )
    if non_overlapping and 0 < span <= _BIN_LOOKUP_MAX_SPAN:
        names: list[str | None] = [None] * span
        los: list[int | None] = [None] * span
        his: list[int | None] = [None] * span
        for lo, hi in bin_list:
            nm = f"{lo}-{hi}" if lo != hi else str(lo)
            for p in range(lo, hi + 1):
                names[p - lo_all] = nm
                los[p - lo_all] = lo
                his[p - lo_all] = hi
        name_arr = F.array(*[F.lit(n).cast("string") for n in names])
        lo_arr = F.array(*[F.lit(v).cast("long") for v in los])
        hi_arr = F.array(*[F.lit(v).cast("long") for v in his])
        idx = (F.col("position") - F.lit(lo_all) + 1).cast("int")
        return (
            qcells.filter(
                F.col("position").between(F.lit(lo_all), F.lit(hi_all))
            )
            .withColumns(
                {
                    "bin_name": F.element_at(name_arr, idx),
                    "bin_lo": F.element_at(lo_arr, idx),
                    "bin_hi": F.element_at(hi_arr, idx),
                }
            )
            .filter(F.col("bin_name").isNotNull())
        )
    bins_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(f"{lo}-{hi}" if lo != hi else str(lo), lo, hi) for lo, hi in bin_list], 1
        ),
        "bin_name string, bin_lo long, bin_hi long",
    )
    return qcells.join(
        F.broadcast(bins_df),
        (F.col("position") >= F.col("bin_lo")) & (F.col("position") <= F.col("bin_hi")),
    )


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
    reference (numpy_ops.py:251-257). Percentiles are exact with
    linear interpolation (numpy/Spark `percentile` semantics:
    rank = p*(n-1), v = v[floor] + frac*(v[ceil] - v[floor])), computed
    from the per-bin quality histogram - see module docstring.
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
    joined = _attach_bins(spark, qcells, bin_list)
    pset = sorted(set(int(p) for p in percentiles) | {0, 10, 25, 50, 75, 90, 100})

    # (bin x qual) histogram: the ONLY aggregation that sees the raw
    # cells; partial aggregation bounds the shuffle at |bins|*|phred|.
    hist = joined.groupBy("bin_name", "bin_lo", "bin_hi", "qual").agg(
        F.count(F.lit(1)).alias("c")
    )
    bywin = Window.partitionBy("bin_name")
    cumwin = bywin.orderBy("qual").rowsBetween(Window.unboundedPreceding, 0)
    hist = (
        hist.withColumn("cum", F.sum("c").over(cumwin))
        .withColumn("cum_lo", F.col("cum") - F.col("c"))
        .withColumn("n", F.sum("c").over(bywin))
        .withColumn("qc_sum", F.sum(F.col("qual") * F.col("c")).over(bywin))
    )

    pct_df = F.broadcast(
        spark.createDataFrame(
            spark.sparkContext.parallelize([(p, p / 100.0) for p in pset], 1),
            "p long, frac double",
        )
    )
    rk = (F.col("n") - 1).cast("double") * F.col("frac")
    # a histogram row holds sorted indexes [cum_lo, cum); pick the rows
    # covering the two indexes that bracket the fractional rank
    covers = lambda idx: (idx >= F.col("cum_lo")) & (idx < F.col("cum"))  # noqa: E731
    vals = (
        hist.join(pct_df, how="cross")
        .withColumn("rk", rk)
        .groupBy("bin_name", "bin_lo", "bin_hi", "p")
        .agg(
            F.max(F.when(covers(F.floor("rk")), F.col("qual"))).alias("v_lo"),
            F.max(F.when(covers(F.ceil("rk")), F.col("qual"))).alias("v_hi"),
            F.max("rk").alias("rk"),
            F.max("n").alias("n"),
            F.max("qc_sum").alias("qc_sum"),
            F.min(F.when(F.col("cum_lo") == 0, F.col("qual"))).alias("minq"),
            F.max(F.when(F.col("cum") == F.col("n"), F.col("qual"))).alias("maxq"),
        )
        .withColumn(
            "val",
            F.col("v_lo")
            + (F.col("rk") - F.floor("rk")) * (F.col("v_hi") - F.col("v_lo")),
        )
    )
    out = vals.groupBy("bin_name", "bin_lo", "bin_hi").agg(
        (F.max("qc_sum").cast("double") / F.max("n")).alias("mean"),
        F.max(F.when(F.col("p") == 50, F.col("val"))).alias("median"),
        F.max("minq").alias("min"),
        F.max("maxq").alias("max"),
        *[
            F.max(F.when(F.col("p") == p, F.col("val"))).alias(f"p{p}")
            for p in pset
        ],
    )
    return out


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
