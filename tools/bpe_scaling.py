"""BPE training cost vs corpus size.

The claim in pipeline/bpe.py: the corpus is touched ONCE (the vocab
aggregation); per-round cost depends on the DISTINCT-WORD vocab, not
the corpus. This harness measures it with the same shifted-key
replica builder as scaling_bench: train time at x1/x8/x32 should
grow far slower than the data (the vocab agg scan grows linearly but
is one pass; the 8 iteration rounds grow only with vocab size, which
the synthetic corpus barely grows at all — replicas repeat words).

Usage: python tools/bpe_scaling.py [mults ...]   # default 1 8 32
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import build_replica  # noqa: E402


def main() -> int:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "8", "32"])]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from seqtables_spark import get_spark
    from seqtables_spark.pipeline.bpe import train_bpe, word_vocab

    spark = get_spark(app_name="bpe_scaling")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).selectExpr("sum(id)").collect()

    tmp_roots = []
    try:
        for mult in mults:
            if mult == 1:
                sf_dir = src
            else:
                sf_dir = tempfile.mkdtemp(prefix=f"bpe_x{mult}_")
                tmp_roots.append(sf_dir)
                build_replica(spark, src, sf_dir, mult)
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            n_vocab = word_vocab(docs).count()  # warm the scan, report size
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                rules = train_bpe(docs, num_merges=8)
                times.append(time.perf_counter() - t0)
            print(
                f"x{mult}: train8 cold {times[0]:.2f}s warm {min(times):.2f}s"
                f" vocab={n_vocab} first_rule={rules[0]['lhs']}+{rules[0]['rhs']}"
            )
    finally:
        for d in tmp_roots:
            shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
