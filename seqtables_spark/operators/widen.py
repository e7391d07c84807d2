"""Map-side widening for indivisible scans.

A parquet ROW GROUP is the unit of scan parallelism: Spark can split
a file into at most one task per row group, no matter how many cores
are idle or how small ``spark.sql.files.maxPartitionBytes`` is set.
A file written as one giant row group (one writer, no repartition
before write — a real production-lake shape, and exactly how the
sf* test fixtures are written) therefore serializes the ENTIRE
map side above the first exchange into one task: every per-row
regex, md5, shingle fold, or translate runs on one core while the
rest of the cluster idles.

``widen()`` is the fix: one round-robin exchange right after the
scan, restoring map parallelism at the price of shuffling the corpus
once.

WIDEN-vs-NARROW decision rule (measured at sf0.1, SCALING.md
"Single-row-group scans serialize the map side"): widen only when
the per-row map cost clearly exceeds the per-row shuffle
write+read cost —

  WIDE wins  : md5/minhash signature folds (5.5x), sketch builds
               (2x), span hashing, regex feature extraction, BPE
               vocab aggregation — anything cryptographic or
               regex-heavy per row.
  NARROW wins: cheap splits + aggregations, plain relational
               sum/count map sides — the exchange costs more than
               the work it parallelizes.

Measure, don't assume. On inputs that already scan as many splits
(many row groups / many files), widen() buys nothing and costs one
exchange — check ``df.rdd.getNumPartitions()`` first or pass
``only_if_narrow=True`` to make that check part of the call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(
    df: DataFrame,
    num_partitions: int | None = None,
    only_if_narrow: bool = False,
) -> DataFrame:
    """Round-robin repartition to restore map parallelism after an
    indivisible (single-row-group / single-file) scan.

    num_partitions defaults to ``sparkContext.defaultParallelism``
    (= total cores in local mode, cluster-wide cores on a real
    deployment).

    only_if_narrow=True first checks the CURRENT partition count and
    skips the exchange when the input already scans wider than half
    the target — the "many row groups, widen is a no-op concern"
    case. The check calls ``df.rdd.getNumPartitions()``, which
    resolves the physical scan but runs no job; it is not available
    on streaming DataFrames (widen a stream's SOURCE layout instead,
    or leave foreachBatch to repartition per batch).
    """
    sc = df.sparkSession.sparkContext
    n = int(num_partitions) if num_partitions else sc.defaultParallelism
    if only_if_narrow:
        try:
            current = df.rdd.getNumPartitions()
        except Exception:  # streaming relation — no static partitioning
            current = None
        if current is not None and current * 2 > n:
            return df
    return df.repartition(n)
