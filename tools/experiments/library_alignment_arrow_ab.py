"""Round-12 A/B experiment (verdict item #2): Arrow batch matcher vs
the JVM regex plan for library_alignment_details.

Measured at sf1 (testdata_sf1, 50k designs -> 1.2M output rows),
same host, min-of-3 fresh-plan collects:

    arrow kernel: 5.281s   jvm current: 5.072s   EQUAL: True

Decomposition (tools-of-the-trade: count/noop-agg vs collect):
compute is ~0.6 s on the Spark side (8x faster than the oracle's
4.5 s fetchall); a bare literal DataFrame of the same 1.2M x 10
shape collects in 4.6 s (toPandas: 0.42 s). The sf1 ratio for this
query is therefore the pyspark Row-object materialization floor of
the protocol-counted output, not plan cost - adjudicated in
tools/sf1_ledger.py. The JVM regex formulation is kept: it ties the
kernel while staying inside Catalyst (prunable, no Python workers).
"""
import time, sys
sys.path.insert(0, '/root/repo')
from seqtables_spark import get_spark
import __spark_entry__ as e
from pyspark.sql import functions as F
import numpy as np

spark = get_spark(app_name="protoarrow")
sf_dir = "/root/repo/testdata_sf1"
spark.range(1000).selectExpr("sum(id)").collect()
spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").collect()

# degenerate map
sys.path.insert(0,'/root/repo')
from seqtables_spark.alphabets import DEGENERATE_MAP

OUT_SCHEMA = ("doc_id long, nt_pos bigint, wt_base string, start_aln bigint, "
              "wt_sub string, in_amplicon int, expected_mut_nt int, "
              "aa_pos bigint, codon_pos bigint, expected_mut_aa int")

def make_kernel():
    # match[l, a] = lib byte l degenerate-matches act byte a
    match = np.zeros((256, 256), dtype=bool)
    for code, bases in DEGENERATE_MAP.items():
        for b in bases:
            match[ord(code), ord(b)] = True
    byte2str = np.array([chr(i) for i in range(256)], dtype=object)
    acgt = np.zeros(256, dtype=bool)
    for c in b"ACGT": acgt[c] = True

    def kernel(batches):
        import pyarrow as pa
        for batch in batches:
            tb = batch.to_pandas()
            n = len(tb)
            if n == 0: continue
            acts_b = tb["actual_seq"].str.upper().to_numpy()
            libs_b = tb["library_seq"].str.upper().to_numpy()
            ids = tb["doc_id"].to_numpy()
            # fixed widths assumed per batch group? handle ragged: use lists
            alen = np.fromiter((len(s) for s in acts_b), dtype=np.int64, count=n)
            llen = np.fromiter((len(s) for s in libs_b), dtype=np.int64, count=n)
            W_, L_ = int(alen.max()), int(llen.max())
            # only uniform-width fast path here (fixture is uniform)
            A = np.frombuffer("".join(acts_b).encode("latin1"), dtype=np.uint8).reshape(n, W_)
            Lb = np.frombuffer("".join(libs_b).encode("latin1"), dtype=np.uint8).reshape(n, L_)
            # find leftmost offset
            start = np.full(n, -1, dtype=np.int64)
            remaining = np.ones(n, dtype=bool)
            for o in range(W_ - L_ + 1):
                ok = remaining.copy()
                idx = np.nonzero(remaining)[0]
                sub = match[Lb[idx], A[idx, o:o+L_]]
                good = sub.all(axis=1)
                hit = idx[good]
                start[hit] = o
                remaining[hit] = False
                if not remaining.any(): break
            keep = start >= 0
            if not keep.all():
                A, Lb, ids, start = A[keep], Lb[keep], ids[keep], start[keep]
            m = len(ids)
            if m == 0: continue
            # per-design wt_sub strings
            cols_idx = start[:, None] + np.arange(L_)[None, :]
            sub_bytes = A[np.arange(m)[:, None], cols_idx]
            wt_sub_per = sub_bytes.view(f'S{L_}').ravel().astype('U')
            # exploded frame
            nt_pos = np.tile(np.arange(1, W_+1, dtype=np.int64), m)
            rid = np.repeat(ids, W_)
            st = np.repeat(start, W_)
            wt_base = byte2str[A.ravel()]
            wt_sub = np.repeat(wt_sub_per, W_)
            rel = nt_pos - st  # 1-based position within lib when in [1, L]
            in_amp = (rel >= 1) & (rel <= L_)
            lib_flat = Lb  # (m, L_)
            # lib byte at rel for in-amp rows
            lib_deg = np.zeros(m*W_, dtype=bool)
            ia = np.nonzero(in_amp)[0]
            lib_deg[ia] = ~acgt[lib_flat[ia // W_, (rel[ia]-1)]]
            mut_nt = (in_amp & lib_deg).astype(np.int32)
            aa_pos = (nt_pos - 1)//3 + 1
            codon_pos = (nt_pos - 1) % 3
            # per-design degeneracy mask over wildtype positions: (m, W_)
            deg_by_pos = (in_amp & lib_deg).reshape(m, W_)
            n_res = W_//3
            codon_any = deg_by_pos[:, :n_res*3].reshape(m, n_res, 3).any(axis=2)
            mut_aa_full = np.zeros((m, W_), dtype=np.int32)
            mut_aa_full[:, :n_res*3] = np.repeat(codon_any, 3, axis=1)
            mut_aa = mut_aa_full.ravel()
            import pandas as pd
            out = pd.DataFrame({
                "doc_id": rid, "nt_pos": nt_pos, "wt_base": wt_base,
                "start_aln": st, "wt_sub": wt_sub,
                "in_amplicon": in_amp.astype(np.int32),
                "expected_mut_nt": mut_nt, "aa_pos": aa_pos,
                "codon_pos": codon_pos, "expected_mut_aa": mut_aa,
            })
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)
    return kernel

reads = e._doc_reads(spark, sf_dir)
act = e._nt_projection()
off = (F.col("read_id").cast("long") % 8).cast("int")
def lib_char(i):
    ch = act.substr(off + i, F.lit(1))
    two_fold = (F.when(ch=="A","R").when(ch=="C","Y").when(ch=="G","K").otherwise(F.lit("W")))
    return F.when(i.isin(4,9), F.lit("N")).when(i==6, two_fold).otherwise(ch)
library = F.concat_ws("", F.transform(F.sequence(F.lit(1), F.lit(12)), lib_char))
designs = reads.select(F.col("read_id").cast("long").alias("doc_id"), act.alias("actual_seq"), library.alias("library_seq"))

arrow_df = designs.mapInArrow(make_kernel(), OUT_SCHEMA)

def t(name, df, reps=3):
    df._jdf.queryExecution().executedPlan()
    best=None
    for _ in range(reps):
        t0=time.perf_counter(); nn=len(df.collect()); dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"{name}: {best:.3f}s ({nn} rows)")

t("arrow kernel", arrow_df)
jvm_df = e.q_library_alignment(spark, sf_dir)
t("jvm current", jvm_df)

# correctness: compare sorted results
a = sorted(map(tuple, arrow_df.collect()))
b = sorted(map(tuple, jvm_df.collect()))
print("EQUAL:", a == b, len(a), len(b))
