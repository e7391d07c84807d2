"""Realistic-vocab BPE scaling (VERDICT r6 #2).

The round-6 sweep proved train-time flat to 32x corpus but on a
31-word synthetic vocab, and the distributed (>1M-word) path applied
r accumulated literal replaces per round — O(merges^2) rewrite growth.
This harness exposes both: a JVM-born corpus with >=10k DISTINCT
pseudo-words (md5-derived letter strings, Zipf-ish repetition) and
>=64 merges, timing the distributed rounds with and without the
round-7 replace-chain fold (train_bpe(fold_every=...)), plus the
default local path for reference. Per-16-round block times show
whether the chain bends.

Usage: python tools/bpe_realistic_scaling.py [n_words] [n_merges]
       (defaults 200000 96)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def realistic_corpus(spark, n_words: int):
    """~n_words distinct [a-p]{6..13} pseudo-words with Zipf-ish
    repetition: word i appears 1 + 2000/(i+1) times. All JVM-born."""
    words = spark.range(n_words).select(
        F.col("id"),
        F.translate(
            F.substring(F.md5(F.col("id").cast("string")), 1,
                        (F.col("id") % 8 + 6).cast("int")),
            "0123456789abcdef",
            "abcdefghijklmnop",
        ).alias("word"),
        (F.lit(1) + F.lit(2000) / (F.col("id") + 1)).cast("long").alias("reps"),
    )
    return words.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.col("reps").cast("int")),
                lambda _: F.col("word"),
            ),
        ).alias("text"),
    )


def main() -> None:
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from seqtables_spark.pipeline.bpe import train_bpe, word_vocab

    docs = realistic_corpus(spark, n_words).persist()
    n_vocab = word_vocab(docs).count()
    print(f"corpus: {n_vocab} distinct words, {n_merges} merges")

    t0 = time.perf_counter()
    local_rules = train_bpe(docs, num_merges=n_merges)  # local path
    print(f"local path (default, vocab<=1M): {time.perf_counter()-t0:6.2f}s")

    # WITHIN-RUN per-round timing: cross-run totals are dominated by
    # JIT/GC warmth (measured: the same config varies 19-40s by run
    # position), but the replace-chain bend is a WITHIN-run trend —
    # round cost growing with rank when the chain is never folded.
    def blocks(times, width=16):
        return [
            sum(times[i:i+width]) / width
            for i in range(0, len(times), width)
        ]

    results = {}
    for fold in (16, 0, 16, 0):  # interleaved for warmth fairness
        times: list = []
        rules = train_bpe(
            docs, num_merges=n_merges, max_local_vocab=0,
            fold_every=fold, on_round=lambda r, s: times.append(s),
        )
        assert rules == local_rules, "distributed/local divergence!"
        label = f"fold={fold or 'off'}"
        results.setdefault(label, []).append(times)
        b = blocks(times)
        print(
            f"{label:9s} total {sum(times):6.2f}s  per-16-round block: "
            + " ".join(f"{x:5.3f}" for x in b)
            + f"  last/first x{b[-1]/b[0]:.2f}"
        )

    # round-8: batched merges (exact top-m prefix). Rounds = number
    # of driver synchronizations; each batched round costs 2 jobs vs
    # 1, so the job count is 2*rounds (batch) vs merges (top-1) — a
    # win iff avg batch > 2. Interleaved with a fresh top-1 run for
    # warmth fairness.
    for m in (1, 4, 8, 16, 8, 1):
        times = []
        t0 = time.perf_counter()
        rules = train_bpe(
            docs, num_merges=n_merges, max_local_vocab=0, fold_every=16,
            batch_merges=m, on_round=lambda r, s: times.append(s),
        )
        wall = time.perf_counter() - t0
        assert rules == local_rules, f"batch={m} divergence!"
        rounds = len(times)
        jobs = rounds * (2 if m > 1 else 1)
        print(
            f"batch={m:2d}: rounds {rounds:3d}  est jobs {jobs:3d}  "
            f"avg batch {n_merges/rounds:4.2f}  wall {wall:6.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
