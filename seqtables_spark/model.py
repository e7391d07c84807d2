"""Canonical data model: the SeqTable.

The reference stores an N-reads x P-positions x {seq,quality} dense
character tensor (xarray DataArray, /root/reference/seqtables/core/
seqtables.py:121). Spark-first, that becomes two canonical DataFrames
(SURVEY.md section 1.4):

  reads:      read_id string, seq string, qual string?, pos_start int,
              ... arbitrary metadata columns
  cells:      read_id string, position bigint, base string(1),
              qual int?   (numeric phred, NULL when no quality)
  insertions: read_id string, position bigint, loc_ins int,
              base string(1), qual int?

``cells`` is derived lazily from ``reads`` by a single
zip-explode projection - pure Catalyst expressions, no UDF, so it
whole-stage-codegens and the parquet scan under it still prunes
columns/predicates. At 100 TB the cells view is never materialized
unless an operator needs repeated passes; aggregations over it reduce
map-side (partial hash agg) before any shuffle, so the exploded width
(x P rows) never crosses the network.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .alphabets import FILL_CHAR, PHRED_ADJUST

#: split pattern that never produces a trailing empty element
_CHAR_SPLIT = "(?!$)"


def explode_chars(
    df: DataFrame,
    id_col: str = "read_id",
    seq_col: str = "seq",
    qual_col: str | None = "qual",
    pos_start_col: str | None = "pos_start",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Long/exploded per-character view of a string column.

    Returns (id_col, position, base[, qual][, keep_cols...]). Position is
    1-based reference coordinate: pos_start + offset (reference shifts
    pysam 0-based to 1-based, seqtables.py:266).
    """
    has_qual = qual_col is not None and qual_col in df.columns
    seq_arr = F.split(F.col(seq_col), _CHAR_SPLIT)
    if has_qual:
        zipped = F.arrays_zip(
            seq_arr.alias("b"),
            F.split(F.coalesce(F.col(qual_col), F.lit("")), _CHAR_SPLIT).alias("q"),
        )
        exploded = df.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            (F.col(pos_start_col) if pos_start_col and pos_start_col in df.columns else F.lit(1)).alias("_ps"),
            F.posexplode(zipped).alias("_off", "_cell"),
        )
        out = exploded.select(
            id_col,
            *keep_cols,
            (F.col("_ps").cast("long") + F.col("_off")).alias("position"),
            F.col("_cell.b").alias("base"),
            F.when(
                F.col("_cell.q").isNotNull() & (F.col("_cell.q") != ""),
                F.ascii("_cell.q") - F.lit(PHRED_ADJUST),
            ).alias("qual"),
        )
    else:
        exploded = df.select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            (F.col(pos_start_col) if pos_start_col and pos_start_col in df.columns else F.lit(1)).alias("_ps"),
            F.posexplode(seq_arr).alias("_off", "base"),
        )
        out = exploded.select(
            id_col,
            *keep_cols,
            (F.col("_ps").cast("long") + F.col("_off")).alias("position"),
            "base",
        )
    return out


class SeqTable:
    """A set of aligned sequences as Spark DataFrames.

    Parity target: class SeqTable, /root/reference/seqtables/core/
    seqtables.py:121 (xarray DataArray subclass). Here it is a thin
    handle over the `reads` DataFrame plus metadata; all analysis
    operators are free functions over the derived `cells` view so they
    also run on any relational table shaped (read_id, position, base).
    """

    def __init__(
        self,
        reads: DataFrame,
        insertions: DataFrame | None = None,
        seq_type: str = "NT",
        phred_adjust: int = PHRED_ADJUST,
        fillna_val: str | None = None,
    ):
        self.reads = reads
        self._insertions = insertions
        self.seq_type = seq_type
        self.phred_adjust = phred_adjust
        self.fillna_val = fillna_val or FILL_CHAR.get(seq_type, "N")

    # -- metadata ------------------------------------------------------
    @property
    def has_quality(self) -> bool:
        return "qual" in self.reads.columns

    @property
    def insertions(self) -> DataFrame:
        if self._insertions is None:
            spark = SparkSession.getActiveSession()
            self._insertions = spark.createDataFrame(
                [],
                "read_id string, position long, loc_ins int, base string, qual int",
            )
        return self._insertions

    # -- views ---------------------------------------------------------
    def cells(self, with_qual: bool = True) -> DataFrame:
        """The long per-(read, position) view; see module docstring."""
        return explode_chars(
            self.reads,
            qual_col="qual" if (with_qual and self.has_quality) else None,
        )

    def get_sequences(self) -> DataFrame:
        """Project the seq plane (reference get_sequences seqtables.py:380)."""
        return self.reads.select("read_id", "seq")

    def get_quality(self, as_num: bool = True) -> DataFrame:
        """Project quality; numeric decode = ascii - phred_adjust
        (reference get_quality seqtables.py:399-404)."""
        if not self.has_quality:
            raise ValueError("table has no quality data")
        if not as_num:
            return self.reads.select("read_id", "qual")
        return explode_chars(self.reads, seq_col="qual", qual_col=None).select(
            "read_id", "position", (F.ascii("base") - F.lit(self.phred_adjust)).alias("qual")
        )

    # -- simple transforms (thin wrappers; heavy ops live in operators/)
    def subsample(self, fraction: float | None = None, n: int | None = None, seed: int = 42) -> "SeqTable":
        """Uniform random read sample (reference subsample seqtables.py:675-686).
        fraction-based is the scalable path (no global shuffle); exact-n
        does a distributed sort by rand which is acceptable for small n."""
        if fraction is not None:
            reads = self.reads.sample(fraction=fraction, seed=seed)
        elif n is not None:
            reads = self.reads.orderBy(F.rand(seed)).limit(n)
        else:
            raise ValueError("pass fraction or n")
        return SeqTable(reads, self._insertions, self.seq_type, self.phred_adjust, self.fillna_val)

    def filter_positions(self, min_pos: int | None = None, max_pos: int | None = None) -> DataFrame:
        """Position-window slice over cells == reference .loc position
        slicing (seqtables.py:320-340); becomes a pushable predicate."""
        c = self.cells()
        if min_pos is not None:
            c = c.filter(F.col("position") >= min_pos)
        if max_pos is not None:
            c = c.filter(F.col("position") <= max_pos)
        return c


def phred_char_to_num(col: Column | str, phred_adjust: int = PHRED_ADJUST) -> Column:
    """chr(q+33) -> numeric phred (reference seqtables.py:401)."""
    return F.ascii(col) - F.lit(phred_adjust)


def phred_num_to_char(col: Column | str, phred_adjust: int = PHRED_ADJUST) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.char(c + F.lit(phred_adjust))
