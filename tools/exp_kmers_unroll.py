"""Same-session interleaved A/B: get_substrings' kmer assembly —
transform() HOF lambda (shipped) vs word_length-unrolled
element_at+substr expressions.

Round-13 receipt: a cross-session qprof A/B first suggested the
unrolled form was 60% slower, but the revert measured identically
slow in its own fresh session — the delta was session warm-up, not
the expression (guide §1: same-box, same-time, interleaved). This
script removes the session variable: one SparkSession, the SAME
materialized input relation, alternating reps of both forms.

Usage: SPARK_GRAFT_SF_DIR=... python tools/exp_kmers_unroll.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import itertools

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from seqtables_spark import get_spark

    spark = get_spark(app_name="exp_kmers_unroll")
    spark.range(32).repartition(32).count()

    # the same slot/combo metadata q_kmers_gapped_ins derives, but the
    # upstream (__ext_seq__ assembly) is materialized ONCE so the A/B
    # times ONLY the explode + kmer projection + count aggregate
    reads, ins = entry._aligned(spark, sf_dir)
    positions = [9, 10, 11]
    ins_f = ins.filter(F.col("position").isin(positions))
    slots = sorted(
        {(r["position"], r["loc_ins"]) for r in
         ins_f.select("position", "loc_ins").distinct().collect()}
        | {(p, 0) for p in positions}
    )
    names = [f"p{p}" if l == 0 else f"p{p}_ins_{abs(l)}" for p, l in slots]
    ins_map = (
        ins_f.dropDuplicates(["read_id", "position", "loc_ins"])
        .groupBy("read_id")
        .agg(F.map_from_entries(F.collect_list(F.struct(
            F.concat_ws(":", "position", "loc_ins").alias("k"),
            F.col("base").alias("v")))).alias("_insmap"))
    )
    max_off = max(p for p, l in slots if l == 0)
    padded = F.rpad(F.col("seq"), max_off, "N")
    chars = []
    for p, l in slots:
        if l == 0:
            chars.append(F.substring(padded, p, 1))
        else:
            chars.append(F.coalesce(
                F.lower(F.element_at("_insmap", F.lit(f"{p}:{l}"))),
                F.lit("-")))
    base = (
        reads.join(ins_map, "read_id", "left")
        .select(F.concat(*chars).alias("ext"))
    )
    base = base.localCheckpoint()  # eager: upstream OFF the clock
    n = base.count()
    offs = list(range(1, len(names) + 1))
    combos = list(itertools.combinations(range(len(names)), 2))
    print(f"{n} reads, {len(slots)} slots, {len(combos)} combos")

    combo_arr = F.array(*[
        F.struct(
            F.lit(",".join(names[i] for i in c)).alias("combo"),
            F.array(*[F.lit(offs[i]) for i in c]).alias("offs"),
        ) for c in combos
    ])

    def hof():
        return base.select(F.explode(combo_arr).alias("c"), "ext").select(
            F.col("c.combo").alias("combo"),
            F.concat_ws("", F.transform(
                F.col("c.offs"), lambda o: F.col("ext").substr(o, F.lit(1))
            )).alias("kmer"),
        ).groupBy("combo", "kmer").agg(F.count(F.lit(1)).alias("cnt"))

    def unrolled():
        return base.select(F.explode(combo_arr).alias("c"), "ext").select(
            F.col("c.combo").alias("combo"),
            F.concat_ws("", *[
                F.col("ext").substr(
                    F.element_at(F.col("c.offs"), j + 1), F.lit(1))
                for j in range(2)
            ]).alias("kmer"),
        ).groupBy("combo", "kmer").agg(F.count(F.lit(1)).alias("cnt"))

    def structkmer():
        # kmer computed INSIDE the combo struct (non-constant array,
        # built per row, but all-codegen and the Generate emits only
        # (combo, kmer))
        arr = F.array(*[
            F.struct(
                F.lit(",".join(names[i] for i in c)).alias("combo"),
                F.concat_ws("", *[
                    F.substring(F.col("ext"), offs[i], 1) for i in c
                ]).alias("kmer"),
            ) for c in combos
        ])
        return base.select(F.explode(arr).alias("c")).select(
            "c.combo", "c.kmer"
        ).groupBy("combo", "kmer").agg(F.count(F.lit(1)).alias("cnt"))

    forms = {"hof": hof, "unrolled": unrolled, "struct": structkmer}
    best = {k: None for k in forms}
    vals = {}
    for rep in range(5):
        for k, fn in forms.items():
            df = fn()
            df._jdf.queryExecution().executedPlan()
            t0 = time.perf_counter()
            out = df.collect()
            dt = time.perf_counter() - t0
            best[k] = dt if best[k] is None else min(best[k], dt)
            vals[k] = sorted(map(tuple, out))
    assert vals["hof"] == vals["unrolled"] == vals["struct"], "VALUE DIFF"
    for k, v in best.items():
        print(f"{k:10s} best {v:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
