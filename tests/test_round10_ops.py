"""Round 10: scale-correct IVF sizing + vectorized Arrow cosine
kernels (bit-equality pins vs the HOF reference expressions), plan-
build purity containment, sharded BAM output, bai/csi cross-index
equivalence.

Reference parity notes: the IVF/semantic-dedup family models the
SemDeDup pipeline (Abbas et al. 2023); the reference repo's
comparable kernels are the pairwise ops in
seqtables/core/utils/numpy_ops.py (dense vector math re-expressed
Spark-first here).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _rand_emb(spark, n=400, dim=16, seed=7, n_parts=4):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)])
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(n_parts)


class TestIvfSizing:
    def test_k_grows_with_corpus_fixed_cell(self):
        from seqtables_spark.pipeline.similarity import ivf_k_for

        assert ivf_k_for(499) == 8          # floor stays at min_k
        assert ivf_k_for(1999) == 8
        assert ivf_k_for(19999) == 79       # sf1: 19999 // 250
        assert ivf_k_for(2_000_000) == 8000  # expected cell stays 250
        # floor division, matching GREATEST(8, n // 250) in the oracle
        assert ivf_k_for(2249) == 8 and ivf_k_for(2250) == 9

    def test_nprobe_keeps_probe_fraction(self):
        from seqtables_spark.pipeline.similarity import ivf_nprobe_for

        assert ivf_nprobe_for(8) == 3       # the shipped 3/8 ratio
        assert ivf_nprobe_for(79) == 29
        assert ivf_nprobe_for(5) == 3       # min_probe floor


class TestArrowKernelBitEquality:
    """The Arrow kernels MUST produce bit-identical values to the HOF
    reference expressions (same sequential IEEE fold) - that identity
    is what lets the DuckDB oracle keep checking the fast path."""

    def test_assign_arrow_equals_sql(self, spark):
        from seqtables_spark.pipeline.similarity import (
            ivf_assign, ivf_centroids,
        )

        emb = _rand_emb(spark).persist()
        cents = ivf_centroids(emb, k=6, n_iters=1, dim=16)
        a = {r["vec_id"]: r["_c"]
             for r in ivf_assign(emb, cents, kernel="arrow").collect()}
        s = {r["vec_id"]: r["_c"]
             for r in ivf_assign(emb, cents, kernel="sql").collect()}
        assert a == s
        emb.unpersist()

    def test_centroids_arrow_equals_sql(self, spark):
        from seqtables_spark.pipeline.similarity import ivf_centroids

        emb = _rand_emb(spark, n=300, seed=11).persist()
        ca = ivf_centroids(emb, k=5, n_iters=2, dim=16, kernel="arrow")
        cs = ivf_centroids(emb, k=5, n_iters=2, dim=16, kernel="sql")
        assert ca == cs  # exact float equality: fixed-point Lloyd
        emb.unpersist()

    def test_semantic_dedup_arrow_equals_sql(self, spark):
        from seqtables_spark.pipeline.similarity import (
            ivf_assign, ivf_centroids, semantic_dedup,
        )

        emb = _rand_emb(spark, n=500, seed=3).persist()
        cents = ivf_centroids(emb, k=4, n_iters=1, dim=16)
        asg = ivf_assign(emb, cents).persist()
        asg.count()
        a = sorted(map(tuple, semantic_dedup(asg, tau=0.1, kernel="arrow").collect()))
        s = sorted(map(tuple, semantic_dedup(asg, tau=0.1, kernel="sql").collect()))
        assert a == s and len(a) > 0  # exact doubles incl. max_sim
        asg.unpersist()
        emb.unpersist()

    def test_pair_cosine_tau_filter_and_passthrough(self, spark):
        from seqtables_spark.pipeline.similarity import pair_cosine

        emb = _rand_emb(spark, n=60, seed=5)
        a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "va", "vb"
        )
        out = pair_cosine(pairs, "va", "vb", tau=0.3)
        assert out.columns == ["id_a", "id_b", "sim"]
        rows = out.collect()
        assert all(r["sim"] >= 0.3 for r in rows)
        # unfiltered kernel scores every pair
        n_all = pair_cosine(pairs, "va", "vb").count()
        assert n_all == pairs.count()

    def test_pair_cosine_empty_input(self, spark):
        from seqtables_spark.pipeline.similarity import pair_cosine

        emb = _rand_emb(spark, n=4, seed=9)
        a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        pairs = a.join(b, (F.col("id_a") < F.col("id_b")) & (F.col("id_a") > 99)).select(
            "id_a", "id_b", "va", "vb"
        )
        assert pair_cosine(pairs, "va", "vb", tau=0.0).count() == 0
