"""Incremental-index scale evidence (VERDICT r5 #4): what does
incremental_near_dup_pairs actually cost as the CORPUS grows under a
FIXED probe batch?

The honest model: the probe equi-join reads every (band_idx,
band_bucket) partition the batch touches, and a bucket holds
~n_docs * bands / 2^bucket_bits keys - so probe cost is
O(batch_buckets x bucket_size), i.e. LINEAR in the corpus at fixed
bucket_bits, and ~FLAT when bucket_bits grows with the corpus
(bits ~ log2(n_docs * bands / target_bucket_rows) - standard hash
index sizing). This harness measures BOTH columns so the sizing rule
in save_minhash_index's docstring is evidence, not prose.

Methodology notes (the first cut of this harness got both wrong):
  - replicas must be TEXTUALLY distinct, not doc_id-shifted copies -
    identical text makes every batch doc match every replica, so hit
    count (and the probe's output cost) grows with the corpus and the
    sweep measures result size, not index cost. Each replica applies
    a per-replica character rotation (F.translate) so every shingle
    differs and the fixed batch keeps a constant hit set;
  - the batch is probed with the SAME bucket_bits the index was
    built with (they define the key space).

Also measures the append -> fragmentation -> compact story: N
appends, per-partition file counts, probe before/after
compact_minhash_index.

Usage: python tools/incremental_index_bench.py [mults ...]
       (default 1 8 32; SPARK_GRAFT_SF_DIR picks the base sf dir)

Results land in SCALING.md ("Incremental index" section).
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HASHES, BANDS, K = 16, 4, 5
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _probe_time(spark, batch, idx_path, bucket_bits, runs=3):
    from seqtables_spark.pipeline.dedup import incremental_near_dup_pairs

    times, n = [], 0
    for _ in range(runs):
        df = incremental_near_dup_pairs(
            batch, idx_path, n_hashes=N_HASHES, bands=BANDS, k=K,
            bucket_bits=bucket_bits,
        )
        df._jdf.queryExecution().executedPlan()  # plan build off-clock
        t0 = time.perf_counter()
        n = df.count()
        times.append(time.perf_counter() - t0)
    return min(times), n


def _replicate(docs, mult):
    """Union of `mult` TEXTUALLY-DISTINCT replicas: replica i applies
    a rotate-by-i character substitution, so its shingle space is
    disjoint from replica 0's and the fixed probe batch (twins of
    replica 0) collides only with replica 0 rows."""
    from pyspark.sql import functions as F

    rep = docs
    for i in range(1, mult):
        rot = ALPHA[i % 26:] + ALPHA[: i % 26]
        t = F.translate("text", ALPHA, rot)
        # rotation alone cycles at i=26 (replica 26 == replica 0,
        # which doubled the x32 hit count in the first cut); compose
        # with a reverse for the second cycle - 52 distinct replicas
        if (i // 26) % 2 == 1:
            t = F.reverse(t)
        rep = rep.unionByName(
            docs.select(
                (F.col("doc_id") + i * 10_000_000_000).alias("doc_id"),
                t.alias("text"),
            )
        )
    return rep


def main() -> int:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "8", "32"])]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from seqtables_spark import get_spark
    from seqtables_spark.pipeline.dedup import (
        compact_minhash_index, save_minhash_index,
    )

    spark = get_spark(app_name="incremental_index_bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(os.path.join(src, "documents.parquet")).select(
        "doc_id", "text"
    )
    base_n = docs.count()
    # fixed probe batch: truncated twins of every 50th replica-0 doc
    batch = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.substring("text", 1, 250).alias("text"),
    )
    batch_n = batch.count()
    print(f"# corpus 1x = {base_n} docs, probe batch = {batch_n} docs",
          file=sys.stderr)

    tmp = tempfile.mkdtemp(prefix="mhidx_scale_")
    rows = []
    try:
        for mult in mults:
            rep = _replicate(docs, mult)
            # scaled bits keep ~constant rows per bucket as the corpus
            # grows: bits = 8 + log2(mult)
            scaled_bits = 8 + int(round(math.log2(mult)))
            per = {"mult": mult, "docs": base_n * mult}
            for label, bits in (("fixed8", 8), ("scaled", scaled_bits)):
                idx = os.path.join(tmp, f"idx_x{mult}_{label}")
                t0 = time.perf_counter()
                save_minhash_index(
                    rep, idx, n_hashes=N_HASHES, bands=BANDS, k=K,
                    bucket_bits=bits,
                )
                build_s = time.perf_counter() - t0
                probe_s, hits = _probe_time(spark, batch, idx, bits)
                n_files = len(
                    glob.glob(os.path.join(idx, "*", "*", "*.parquet"))
                )
                per[label] = (bits, build_s, probe_s, hits, n_files)
                print(f"# x{mult} {label} (bits={bits}): build {build_s:.2f}s "
                      f"probe {probe_s:.3f}s ({hits} pairs, {n_files} files)",
                      file=sys.stderr)
            rows.append(per)

        print(f"\n{'corpus':20s} {'bits':>4s} {'build_s':>8s} {'probe_s':>8s} "
              f"{'pairs':>6s} {'files':>6s}   (fixed bits=8 vs corpus-scaled)")
        for per in rows:
            name = f"x{per['mult']} ({per['docs']} docs)"
            for label in ("fixed8", "scaled"):
                bits, b, p, h, nf = per[label]
                tag = name if label == "fixed8" else ""
                print(f"{tag:20s} {bits:4d} {b:8.2f} {p:8.3f} {h:6d} {nf:6d}")

        # append-accumulation + compaction story on the x1 index
        idx1 = os.path.join(tmp, "idx_x1_fixed8")
        p0, _ = _probe_time(spark, batch, idx1, 8)
        n_appends = 12
        for i in range(n_appends):
            app = docs.filter(F.col("doc_id") % 100 == i).select(
                (F.col("doc_id") + (100 + i) * 10_000_000_000).alias("doc_id"),
                "text",
            )
            save_minhash_index(
                app, idx1, n_hashes=N_HASHES, bands=BANDS, k=K, mode="append"
            )
        parts = glob.glob(os.path.join(idx1, "*", "*"))
        fpp = [len([f for f in os.listdir(d) if f.endswith(".parquet")])
               for d in parts]
        p_frag, _ = _probe_time(spark, batch, idx1, 8)
        t0 = time.perf_counter()
        n_rw = compact_minhash_index(spark, idx1, max_files_per_partition=2)
        compact_s = time.perf_counter() - t0
        fpp2 = [len([f for f in os.listdir(d) if f.endswith(".parquet")])
                for d in parts]
        p_comp, _ = _probe_time(spark, batch, idx1, 8)
        print(f"\nappend/compact (x1 index, {n_appends} appends):")
        print(f"  probe fresh index        {p0:8.3f}s")
        print(f"  after appends: max files/part {max(fpp) if fpp else 0}")
        print(f"  probe fragmented         {p_frag:8.3f}s")
        print(f"  compact: {n_rw} partitions rewritten in {compact_s:.2f}s "
              f"(2 jobs) -> max files/part {max(fpp2)}")
        print(f"  probe compacted          {p_comp:8.3f}s")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
