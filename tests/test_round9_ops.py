"""Round-9 additions: distributed BAM sink wiring, PWM fold
invariants, and the no-driver-collect contract for queries()."""

import gzip
import inspect

import pytest
from pyspark.sql import functions as F


def test_bam_roundtrip_query_has_no_driver_collect():
    """Round-9 pin: the BAM roundtrip fixture is built by the
    distributed write_bam sink - the round-8 version collected the
    full (capped) table to the driver and encoded in-process. Guards
    the regression at the source level: no .collect( in the query
    body, write_bam present."""
    import __spark_entry__ as e

    src = inspect.getsource(e.q_bam_roundtrip)
    assert ".collect(" not in src
    assert "write_bam" in src


def test_write_bam_preserves_partition_order(spark, tmp_path):
    """Parts concatenate by partition index: a range-partitioned sort
    order must survive into the file's record order (what a caller
    producing a coordinate-sorted BAM for indexing relies on)."""
    from seqtables_spark.sources.bam import read_bam, write_bam

    rows = [(f"r{i:03d}", 0, "c1", i + 1, 60, "4M", "ACGT", "IIII")
            for i in range(64)]
    df = (
        spark.createDataFrame(
            rows,
            "header string, flag int, rname string, pos int, mapq int,"
            " cigar string, seq string, qual string",
        )
        .repartitionByRange(4, "pos")
        .sortWithinPartitions("pos")
    )
    path = str(tmp_path / "sorted.bam")
    write_bam(df, path, [("c1", 1000)])
    got = [r["pos"] for r in read_bam(spark, path, records_per_chunk=16)
           .orderBy("voffset").collect()] if "voffset" in read_bam(
               spark, path).columns else None
    if got is None:
        # no voffset column: decode the payload stream directly -
        # record order in the file IS the decode order
        from seqtables_spark.sources.bam import decode_bam

        _, recs = decode_bam(open(path, "rb").read())
        got = [pos for (_n, _f, _r, pos, *_rest) in recs]
    assert len(got) == 64
    assert got == sorted(got)


def test_classifier_logit_micro_is_exact_half_away(spark):
    """Round-9 sf1 finding: double round() of a ratio is not engine-
    portable at shortest-repr '.5' boundaries. The micro path must
    equal Python's exact Fraction-based half-away-from-zero rounding
    for every doc - including adversarial near-boundary ratios."""
    from fractions import Fraction

    import hashlib

    from seqtables_spark.pipeline.text import classifier_logit

    def portable_string_hash_py(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 2147483647

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(i % 37 + 1)))
         for i in range(200)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit_micro"])
        for r in classifier_logit(docs, micro=True).collect()
    }

    def py_micro(text):
        toks = text.lower().split()
        s = sum(
            (portable_string_hash_py(t) % 1024) * 2654435761 % 1000003
            - 500001
            for t in toks
        )
        n = len(toks)
        q = Fraction(s, n) / 1_000_000  # logit as an exact rational
        micro = Fraction(s, n)
        sign = -1 if micro < 0 else 1
        m = abs(micro)
        # half away from zero to integer micro-units
        import math
        whole = math.floor(m)
        rem = m - whole
        r = whole + (1 if rem >= Fraction(1, 2) else 0)
        return n, sign * r

    for i in range(200):
        text = " ".join(f"w{i}x{j}" for j in range(i % 37 + 1))
        assert got[i] == py_micro(text), (i, got[i], py_micro(text))


def test_write_bam_with_index_end_to_end(spark, tmp_path):
    """Round 9: sorted distributed write + index build + indexed
    region fetch, all through our own sink/codecs. The fetched rows
    must equal the brute-force overlap filter."""
    from seqtables_spark.sources.bai import read_bam_region_bai
    from seqtables_spark.sources.bam import write_bam
    from seqtables_spark.sources.csi import read_bam_region_csi

    rows = [(f"r{i:04d}", 0, "c1", 3 * i + 1, 60, "4M", "ACGT", "IIII")
            for i in range(500)]
    df = (
        spark.createDataFrame(
            rows,
            "header string, flag int, rname string, pos int, mapq int,"
            " cigar string, seq string, qual string",
        )
        .repartitionByRange(5, "pos")
        .sortWithinPartitions("pos")
    )
    refs = [("c1", 3 * 500 + 10)]
    want = sorted(r[0] for r in rows
                  if r[3] - 1 < 400 and r[3] - 1 + 4 > 150)  # [150,400)

    for idx, reader in [("bai", read_bam_region_bai),
                        ("csi", read_bam_region_csi)]:
        path = str(tmp_path / f"sorted_{idx}.bam")
        write_bam(df, path, refs, index=idx)
        import os
        assert os.path.exists(path + "." + idx)
        got = sorted(
            r["header"]
            for r in reader(spark, path, "c1", 150, 400).collect()
        )
        assert got == want, idx


def test_write_bam_rejects_unknown_index(spark, tmp_path):
    import pytest

    from seqtables_spark.sources.bam import write_bam

    df = spark.createDataFrame(
        [("r", 0, "c1", 1, 60, "4M", "ACGT", "IIII")],
        "header string, flag int, rname string, pos int, mapq int,"
        " cigar string, seq string, qual string",
    )
    with pytest.raises(ValueError, match="index"):
        write_bam(df, str(tmp_path / "x.bam"), [("c1", 100)], index="tbi")


def test_interval_overlap_auto_bin_matches_fixed(spark):
    """bin_width='auto' must change only the physical binning - the
    overlap pair set is bin-invariant (the property suite pins fixed
    widths against the quadratic reference; this pins auto against a
    fixed width)."""
    from seqtables_spark.operators.ranges import (
        auto_bin_width,
        interval_overlap_join,
    )

    rows = [(i, (i * 37) % 500, (i * 37) % 500 + (i % 9) * 13 + 1)
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    fixed = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(df, df, "s", "e", bin_width=50)
        .filter(F.col("l_id") < F.col("r_id")).collect()
    )
    auto = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(df, df, "s", "e", bin_width="auto")
        .filter(F.col("l_id") < F.col("r_id")).collect()
    )
    assert auto == fixed and len(fixed) > 100
    w = auto_bin_width(df, df, "s", "e")
    avg_len = sum(e - s for _, s, e in rows) / len(rows)
    assert w == max(1, int(2 * avg_len))
