"""Distributed connected-components soak (VERDICT r7 #7).

The driver union-find path is capped at `driver_edge_limit` edges;
everything above runs the alternating large-star/small-star rounds
(`pipeline/dedup._cc_star`). The star path had unit tests but no
large-graph evidence — this harness builds a >=10M-edge synthetic
graph whose two halves stress the opposite failure modes:

  - one LONG CHAIN (adversarial diameter: label propagation would
    need diameter rounds; star must converge in O(log n)), and
  - a forest of k-CLIQUES (the realistic near-dup shape: dense local
    blobs; stresses per-round distinct/groupBy volume, not depth).

All JVM-born (spark.range), nothing driver-side. Per-round surviving
edge counts (= next round's shuffle volume) and wall times come from
connected_components(on_round=...); correctness is asserted exactly
(cluster count and sizes are known closed-form).

Usage: python tools/cc_soak.py [chain_nodes] [n_cliques] [clique_size] [algo]
       (defaults 2_000_000 100_000 13 star -> ~9.8M edges; algo=both
       runs star AND label — only sensible on low-diameter graphs,
       label needs diameter rounds)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

CLIQUE_BASE = 1 << 40  # clique ids far above chain ids


def build_graph(spark, chain_nodes: int, n_cliques: int, clique_size: int):
    """Chain edges (i, i+1) + per-clique all-pairs edges, as one
    DF(id_a, id_b). Clique pairs are exploded JVM-side from a
    per-clique literal pair array (size s*(s-1)/2, tiny)."""
    chain = spark.range(chain_nodes - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    s = clique_size
    pair_structs = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"))
            for i in range(s)
            for j in range(i + 1, s)
        ]
    )
    cliques = (
        spark.range(n_cliques)
        .select(
            (F.lit(CLIQUE_BASE) + F.col("id") * s).alias("base"),
            F.explode(pair_structs).alias("p"),
        )
        .select(
            (F.col("base") + F.col("p.i")).alias("id_a"),
            (F.col("base") + F.col("p.j")).alias("id_b"),
        )
    )
    return chain.unionAll(cliques)


def main() -> None:
    chain_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_cliques = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    clique_size = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    algo = sys.argv[4] if len(sys.argv) > 4 else "star"

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from seqtables_spark.pipeline.dedup import connected_components

    pairs = build_graph(spark, chain_nodes, n_cliques, clique_size)
    n_edges = pairs.count()
    n_nodes = chain_nodes + n_cliques * clique_size
    print(
        f"graph: {n_edges:,} edges, {n_nodes:,} nodes "
        f"(chain {chain_nodes:,} + {n_cliques:,} cliques of {clique_size})"
    )

    for algorithm in (("star", "label") if algo == "both" else (algo,)):
        rounds: list = []
        t0 = time.perf_counter()
        labels = connected_components(
            pairs,
            driver_edge_limit=0,
            algorithm=algorithm,
            on_round=lambda i, cnt, s: (
                rounds.append((i, cnt, s)),
                print(f"  round {i:2d}: {cnt:>12,} edges  {s:6.2f}s", flush=True),
            ),
        )
        _validate(labels, rounds, algorithm, t0,
                  chain_nodes, n_cliques, clique_size)


def _validate(labels, rounds, algorithm, t0, chain_nodes, n_cliques,
              clique_size):
    import time
    from pyspark.sql import functions as F
    # one aggregation validates everything closed-form:
    #   chain -> 1 cluster of chain_nodes, cluster_id 0
    #   cliques -> n_cliques clusters of clique_size, min-id roots
    stats = (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("sz")
        .collect()
    )
    wall = time.perf_counter() - t0
    got = {r["sz"]: r["n_clusters"] for r in stats}
    want = {clique_size: n_cliques}
    if chain_nodes > 1:
        want[chain_nodes] = 1
    assert got == want, f"cluster histogram wrong ({algorithm}): {got}"
    roots_ok = (
        labels.filter(
            (F.col("cluster_id") != 0)
            & ((F.col("cluster_id") - CLIQUE_BASE) % clique_size != 0)
        ).limit(1).count()
        == 0
    )
    assert roots_ok, f"non-canonical cluster roots ({algorithm})"
    nr = f"{len(rounds)} rounds" if rounds else "rounds n/a (label hook-less)"
    if algorithm == "auto":
        # the star path is the only on_round caller, so the hook
        # witnesses which branch auto took
        nr = (f"auto->star ({len(rounds)} star rounds)" if rounds
              else "auto->label (converged in the probe)")
    print(
        f"OK [{algorithm}]: {nr}, {wall:6.1f}s wall, "
        f"labels exact ({n_cliques:,}x{clique_size}"
        + (f" + 1x{chain_nodes:,}" if chain_nodes > 1 else "") + ")"
    )


if __name__ == "__main__":
    main()
