"""FASTQ reader / writer.

Parity targets (file:line in /root/reference/seqtables/io/):
  - read_fastq:     read_sequences.py:11-59 (pandas index%4 grouping)
  - seqs_to_fastq:  write_sequences.py:1-8

Spark-first: `spark.read.text` + a line-number pivot. FASTQ's 4-line
record structure needs a global line index; zipWithIndex would work
but costs an RDD pass, so we use a per-file window rank over a
monotonic id - for splittable scale-out, convert FASTQ to parquet
once with this reader and operate on parquet after (the recommended
pattern for 100 TB: raw text is an ingest format, not a query
format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_fastq(
    spark: SparkSession,
    path: str,
    limit: int | None = None,
    use_header_as_index: bool = True,
) -> DataFrame:
    """Read FASTQ -> DF(read_id, seq, qual).

    monotonically_increasing_id is ordered within a partition and text
    partitions preserve line order, so (file, id) rank reconstructs the
    global line number per file.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.col("value").alias("line"),
            F.input_file_name().alias("_f"),
            F.monotonically_increasing_id().alias("_id"),
        )
    )
    w = Window.partitionBy("_f").orderBy("_id")
    numbered = lines.withColumn("_ln", F.row_number().over(w) - 1)
    recs = (
        numbered.withColumn("_rec", (F.col("_ln") / 4).cast("long"))
        .withColumn("_part", F.col("_ln") % 4)
        .groupBy("_f", "_rec")
        .pivot("_part", [0, 1, 3])
        .agg(F.first("line"))
        .withColumnRenamed("0", "header")
        .withColumnRenamed("1", "seq")
        .withColumnRenamed("3", "qual")
    )
    out = recs.select(
        (
            F.regexp_replace(F.col("header"), r"^@", "")
            if use_header_as_index
            else (F.col("_rec") + 1).cast("string")
        ).alias("read_id"),
        "seq",
        "qual",
    )
    if limit:
        out = out.limit(limit)
    return out


def write_fastq(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """DF(read_id, seq, qual) -> FASTQ text (reference seqs_to_fastq)."""
    df.select(
        F.concat_ws(
            "\n",
            F.concat(F.lit("@"), F.col("read_id")),
            F.col("seq"),
            F.lit("+"),
            F.col("qual"),
        ).alias("value")
    ).write.mode(mode).text(path)
