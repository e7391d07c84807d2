"""File sources: SAM text reader + QC filter, FASTQ round-trip, and
the seq-type sniffer."""

import pytest

from seqtables_spark.constructors import guess_seqtype
from seqtables_spark.sources.fastq import read_fastq, write_fastq
from seqtables_spark.sources.sam import filter_reads, read_sam

SAM_TEXT = """@HD\tVN:1.6
@SQ\tSN:ref1\tLN:100
r1\t0\tref1\t3\t60\t4M\t*\t0\t0\tACGT\tIIII\tXN:i:0\tMD:Z:4
r2\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\tIIII
r3\t0\tphiX174\t1\t60\t4M\t*\t0\t0\tCCCC\tIIII\tXN:i:1
r4\t512\tref1\t5\t60\t4M\t*\t0\t0\tGGGG\tIIII
r5\t0\tref1\t7\t60\t2M1I1M\t*\t0\t0\tACGT\tIIII
r6\t0\tref1\t2\t60\t1S3M\t*\t0\t0\tACGT\tIIII
"""


@pytest.fixture(scope="module")
def sam_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("sam") / "test.sam"
    p.write_text(SAM_TEXT)
    return read_sam(spark, str(p))


def test_read_sam_std_columns(sam_df):
    rows = {r["header"]: r for r in sam_df.collect()}
    assert len(rows) == 6
    assert rows["r1"]["rname"] == "ref1" and rows["r1"]["pos"] == 3
    assert rows["r1"]["flag"] == 0 and rows["r1"]["mapq"] == 60
    assert rows["r1"]["seq"] == "ACGT" and rows["r1"]["cigar"] == "4M"


def test_read_sam_optional_tags(sam_df):
    rows = {r["header"]: r for r in sam_df.collect()}
    assert rows["r1"]["XN"] == "0" and rows["r1"]["MD"] == "4"
    assert rows["r2"]["XN"] is None


def test_filter_reads_split(sam_df):
    good, bad, stats = filter_reads(sam_df)
    good_ids = {r["header"] for r in good.collect()}
    assert good_ids == {"r1", "r6"}
    reasons = {r["header"]: r["error"] for r in bad.collect()}
    assert reasons == {
        "r2": "unmapped",
        "r3": "phix",
        "r4": "flag",
        "r5": "indels",
    }
    st = {r["error"]: r["n"] for r in stats.collect()}
    assert st == {"unmapped": 1, "phix": 1, "flag": 1, "indels": 1}


def test_filter_reads_derived_cols(sam_df):
    good, _, _ = filter_reads(sam_df)
    rows = {r["header"]: r for r in good.collect()}
    # r6: 1S3M at pos 2 -> clip 1, pos_end = 2 + 4 + 0 - 0 - 1 - 1 = 4
    assert rows["r6"]["nterm_clip"] == 1
    assert rows["r6"]["pos_end"] == 4
    # r1: 4M at pos 3 -> pos_end = 3 + 4 - 1 = 6
    assert rows["r1"]["pos_end"] == 6


def test_fastq_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("read/1", "ACGT", "IIII"), ("read/2", "TTAA", "JJJJ")],
        "read_id string, seq string, qual string",
    )
    out = str(tmp_path / "out_fastq")
    write_fastq(df, out)
    back = read_fastq(spark, out)
    got = {r["read_id"]: (r["seq"], r["qual"]) for r in back.collect()}
    assert got == {"read/1": ("ACGT", "IIII"), "read/2": ("TTAA", "JJJJ")}


def test_guess_seqtype():
    assert guess_seqtype(["ACGT", "GGTT"]) == "NT"
    with pytest.warns(UserWarning):
        assert guess_seqtype(["ACGR"]) == "NT"  # degenerate DNA
    assert guess_seqtype(["MKVL"]) == "AA"
    with pytest.warns(UserWarning):
        assert guess_seqtype(["MKVL123"]) == "AA"  # unknown letters
