"""Experiment (round 12 opt): Arrow byte-matrix kernel for
library_alignment_details vs the shipped JVM-regex + explode form.

Semantics replicated exactly (leftmost degenerate match, drop
unmatched / too-short rows, per-position masks, codon arithmetic).
Compares full collected row sets for equality, then times both forms
interleaved (fresh plan per rep, noop + collect, min-of-3).

Usage: python tools/exp_library_arrow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def library_alignment_details_arrow(
    designs: DataFrame,
    id_col: str = "lib_id",
    actual_col: str = "actual_seq",
    library_col: str = "library_seq",
) -> DataFrame:
    """Arrow-kernel twin of library_alignment_details: one mapInArrow
    pass does the leftmost degenerate-match search (byte lookup
    matrix, vectorized across rows grouped by (act_len, lib_len)) and
    emits the exploded per-nucleotide rows directly."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    base = designs.select(
        F.col(id_col).cast("long").alias("lib_id"),
        F.upper(F.col(actual_col)).alias("_act"),
        F.upper(F.col(library_col)).alias("_lib"),
    ).filter(F.length("_act") >= F.length("_lib"))

    out_schema = StructType([
        StructField("lib_id", LongType()),
        StructField("nt_pos", IntegerType()),
        StructField("wt_base", StringType()),
        StructField("start_aln", IntegerType()),
        StructField("wt_sub", StringType()),
        StructField("in_amplicon", IntegerType()),
        StructField("expected_mut_nt", IntegerType()),
        StructField("aa_pos", LongType()),
        StructField("codon_pos", IntegerType()),
        StructField("expected_mut_aa", IntegerType()),
    ])

    def _kernel(batches):
        import numpy as np
        import pyarrow as pa

        from seqtables_spark.alphabets import DEGENERATE_MAP

        allow = np.zeros((256, 256), dtype=bool)
        for code, bases in DEGENERATE_MAP.items():
            for b in bases:
                allow[ord(code), ord(b)] = True
        acgt = np.zeros(256, dtype=bool)
        for b in "ACGT":
            acgt[ord(b)] = True
        chars = np.array([chr(i) for i in range(256)], dtype=object)

        for batch in batches:
            ids = batch.column("lib_id").to_numpy(zero_copy_only=False)
            acts = batch.column("_act").to_pylist()
            libs = batch.column("_lib").to_pylist()
            alen = np.array([len(a) for a in acts])
            llen = np.array([len(x) for x in libs])
            cols = {k: [] for k in (
                "lib_id", "nt_pos", "wt_base", "start_aln", "wt_sub",
                "in_amplicon", "expected_mut_nt", "aa_pos", "codon_pos",
                "expected_mut_aa",
            )}
            for (L, l) in sorted(set(zip(alen.tolist(), llen.tolist()))):
                if l == 0:
                    # r12 ADVICE: an empty library_seq yields a 0-byte
                    # buffer that cannot reshape to (n, 1); such rows
                    # have no alignment by definition — skip the group
                    # (the JVM path emits no offsets for them either).
                    continue
                sel = np.flatnonzero((alen == L) & (llen == l))
                n = len(sel)
                A = np.frombuffer(
                    b"".join(acts[i].encode("latin-1") for i in sel),
                    dtype=np.uint8,
                ).reshape(n, L)
                B = np.frombuffer(
                    b"".join(libs[i].encode("latin-1") for i in sel),
                    dtype=np.uint8,
                ).reshape(n, max(l, 1))[:, :l]
                n_off = L - l + 1
                found = np.full(n, -1, dtype=np.int64)
                for off in range(n_off):
                    cand = found < 0
                    if not cand.any():
                        break
                    idx = np.flatnonzero(cand)
                    ok = allow[B[idx], A[idx, off:off + l]].all(axis=1)
                    found[idx[ok]] = off
                hit = found >= 0
                if not hit.any():
                    continue
                rows = np.flatnonzero(hit)
                m = len(rows)
                start = found[rows]                       # (m,)
                Ah = A[rows]                              # (m, L)
                Bh = B[rows]                              # (m, l)
                ids_h = ids[sel][rows]
                # exploded grids (m, L)
                nt = np.broadcast_to(np.arange(1, L + 1), (m, L))
                st = start[:, None]
                in_amp = (nt > st) & (nt <= st + l)
                # lib base at (nt - start); clip to a valid index,
                # mask decides validity
                lib_idx = np.clip(nt - st - 1, 0, max(l - 1, 0))
                lib_at = Bh[np.arange(m)[:, None], lib_idx] if l else np.zeros((m, L), np.uint8)
                mut_nt = (in_amp & ~acgt[lib_at]).astype(np.int32)
                aa = (nt - 1) // 3 + 1                    # long
                codon_pos = ((nt - 1) % 3).astype(np.int32)
                cstart = (aa - 1) * 3 + 1

                def degen_at(q):
                    inside = (q > st) & (q <= st + l)
                    qi = np.clip(q - st - 1, 0, max(l - 1, 0))
                    at = Bh[np.arange(m)[:, None], qi] if l else np.zeros((m, L), np.uint8)
                    return inside & ~acgt[at]

                mut_aa = np.where(
                    aa <= L // 3,
                    (degen_at(cstart) | degen_at(cstart + 1)
                     | degen_at(cstart + 2)).astype(np.int32),
                    0,
                ).astype(np.int32)
                wt_sub = np.array(
                    [acts[sel[r]][start[i]:start[i] + l]
                     for i, r in enumerate(rows)],
                    dtype=object,
                )
                cols["lib_id"].append(np.repeat(ids_h, L))
                cols["nt_pos"].append(nt.ravel().astype(np.int32))
                cols["wt_base"].append(chars[Ah.ravel()])
                cols["start_aln"].append(
                    np.repeat(start.astype(np.int32), L)
                )
                cols["wt_sub"].append(np.repeat(wt_sub, L))
                cols["in_amplicon"].append(in_amp.ravel().astype(np.int32))
                cols["expected_mut_nt"].append(mut_nt.ravel())
                cols["aa_pos"].append(aa.ravel().astype(np.int64))
                cols["codon_pos"].append(codon_pos.ravel())
                cols["expected_mut_aa"].append(mut_aa.ravel())
            if not cols["lib_id"]:
                continue
            arrays = [
                pa.array(np.concatenate(cols["lib_id"]), pa.int64()),
                pa.array(np.concatenate(cols["nt_pos"]), pa.int32()),
                pa.array(np.concatenate(cols["wt_base"]), pa.string()),
                pa.array(np.concatenate(cols["start_aln"]), pa.int32()),
                pa.array(np.concatenate(cols["wt_sub"]), pa.string()),
                pa.array(np.concatenate(cols["in_amplicon"]), pa.int32()),
                pa.array(np.concatenate(cols["expected_mut_nt"]), pa.int32()),
                pa.array(np.concatenate(cols["aa_pos"]), pa.int64()),
                pa.array(np.concatenate(cols["codon_pos"]), pa.int32()),
                pa.array(np.concatenate(cols["expected_mut_aa"]), pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, [f.name for f in out_schema.fields]
            )

    return base.mapInArrow(_kernel, out_schema)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    import __spark_entry__ as entry
    from seqtables_spark import get_spark

    spark = get_spark(app_name="exp-library-arrow")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").collect()
    qf = entry.queries(cached=False)

    # value equality: old query vs a kernel twin built from the same
    # designs relation (re-derive designs the way the query does)
    old_df = qf["library_alignment"](spark, sf_dir)
    # rebuild designs identically to q_library_alignment
    reads = entry._doc_reads(spark, sf_dir)
    act = entry._nt_projection()
    off = (F.col("read_id").cast("long") % 8).cast("int")

    def lib_char(i):
        ch = act.substr(off + i, F.lit(1))
        two_fold = (
            F.when(ch == "A", "R").when(ch == "C", "Y")
            .when(ch == "G", "K").otherwise(F.lit("W"))
        )
        return (
            F.when(i.isin(4, 9), F.lit("N")).when(i == 6, two_fold).otherwise(ch)
        )

    library = F.concat_ws(
        "", F.transform(F.sequence(F.lit(1), F.lit(12)), lib_char)
    )
    designs = reads.select(
        F.col("read_id").cast("long").alias("doc_id"),
        act.alias("actual_seq"),
        library.alias("library_seq"),
    )
    new_df = library_alignment_details_arrow(designs, id_col="doc_id")
    # match the query's output column names
    old_cols = old_df.columns
    new_df = new_df.toDF(*old_cols)

    a = {tuple(r) for r in old_df.collect()}
    b = {tuple(r) for r in new_df.collect()}
    print(f"old rows={len(a)} new rows={len(b)} equal={a == b}")
    if a != b:
        da, db = list(a - b)[:3], list(b - a)[:3]
        print("only-old:", da)
        print("only-new:", db)
        return 1

    # timing: interleaved fresh-plan min-of-3, noop + collect
    def bench(build):
        nb = cb = None
        for _ in range(3):
            d = build()
            d._jdf.queryExecution().executedPlan()
            t0 = time.perf_counter()
            d.write.format("noop").mode("overwrite").save()
            nb = min(nb or 9e9, time.perf_counter() - t0)
            d = build()
            d._jdf.queryExecution().executedPlan()
            t0 = time.perf_counter()
            d.collect()
            cb = min(cb or 9e9, time.perf_counter() - t0)
        return nb, cb

    for tag, build in (
        ("jvm-regex", lambda: qf["library_alignment"](spark, sf_dir)),
        ("arrow-kernel", lambda: library_alignment_details_arrow(
            designs, id_col="doc_id").toDF(*old_cols)),
        ("jvm-regex-2", lambda: qf["library_alignment"](spark, sf_dir)),
        ("arrow-kernel-2", lambda: library_alignment_details_arrow(
            designs, id_col="doc_id").toDF(*old_cols)),
    ):
        nb, cb = bench(build)
        print(f"{tag:16s} noop={nb:6.3f} collect={cb:6.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
