"""Structured Streaming ingest: the reference's chunked-iterator
pattern (from_sam/from_pysam yielding one SeqTable per chunk,
/root/reference/seqtables/core/seqtables.py:214-283) re-expressed as
a file-source stream + foreachBatch.

The domain has no event time (SURVEY 2.8), so aggregations stream
without watermarks: per-position letter counts are a classic
incremental groupBy whose state is |positions| x |alphabet| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..model import explode_chars


def stream_reads(
    spark: SparkSession,
    path: str,
    schema: str = "read_id string, seq string, qual string, pos_start long",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Incrementally ingest parquet read batches dropped into `path`
    (the streaming analog of the chunked SAM reader)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_seq_dist(
    reads_stream: DataFrame,
    query_name: str = "seq_dist_stream",
) -> StreamingQuery:
    """Continuously maintained per-position letter counts over the
    read stream, exposed as an in-memory table `query_name` (complete
    mode: the aggregate is tiny). Tests drive it synchronously with
    processAllAvailable()."""
    cells = explode_chars(reads_stream)
    dist = cells.groupBy("position", "base").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        dist.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_to_parquet(
    reads_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    process_fn=None,
) -> StreamingQuery:
    """foreachBatch sink: apply an arbitrary batch transform (any
    operator in this package) per micro-batch and append to parquet -
    the exactly-once incremental-ingest pattern."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        out = process_fn(batch_df) if process_fn else batch_df
        out.write.mode("append").parquet(out_path)

    return (
        reads_stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .start()
    )
