"""Pure-Python BAM codec (S4): byte-level round-trip, BGZF interop,
and cross-check against the SAM text reader on the same alignments."""

import gzip

import pytest

from seqtables_spark.sources.bam import (
    BGZF_EOF,
    decode_bam,
    encode_bam,
    read_bam,
)
from seqtables_spark.sources.sam import read_sam

REFS = [("ref1", 100), ("phiX174", 5386)]
RECORDS = [
    ("r1", 0, "ref1", 3, 60, "4M", "ACGT", "IIII"),
    ("r2", 4, "*", 1, 0, "*", "TTTT", "IIII"),
    ("r3", 0, "phiX174", 1, 60, "4M", "CCCC", "IIII"),
    ("r4", 512, "ref1", 5, 60, "4M", "GGGG", "IIII"),
    ("r5", 0, "ref1", 7, 60, "2M1I1M", "ACGT", "IIII"),
    ("r6", 0, "ref1", 2, 30, "1S3M", "ACGT", "IIII"),
    ("r7", 0, "ref1", 9, 60, "3M", "ACG", ""),  # missing quality
]

SAM_TEXT = "".join(
    ["@HD\tVN:1.6\n@SQ\tSN:ref1\tLN:100\n@SQ\tSN:phiX174\tLN:5386\n"]
    + [
        f"{n}\t{f}\t{r}\t{p}\t{m}\t{c}\t*\t0\t0\t{s}\t{q or '*'}\n"
        for n, f, r, p, m, c, s, q in RECORDS
    ]
)


@pytest.fixture(scope="module")
def bam_bytes():
    return encode_bam(RECORDS, REFS)


def test_bgzf_blocks_are_valid_gzip(bam_bytes):
    # stdlib gzip must accept the whole stream (concatenated members
    # with BC extra subfields + the spec EOF marker)
    raw = gzip.decompress(bam_bytes)
    assert raw[:4] == b"BAM\x01"
    assert bam_bytes.endswith(BGZF_EOF)


def test_decode_round_trip(bam_bytes):
    refs, recs = decode_bam(bam_bytes)
    assert refs == [r for r, _ in REFS]
    got = list(recs)
    assert got == [tuple(r) for r in RECORDS]


def test_unmapped_and_missing_quality_conventions(bam_bytes):
    _, recs = decode_bam(bam_bytes)
    by_name = {r[0]: r for r in recs}
    assert by_name["r2"][2] == "*"       # unmapped: no reference name
    assert by_name["r7"][7] == ""        # 0xFF quality block -> empty
    assert by_name["r5"][5] == "2M1I1M"  # multi-op cigar survives


def test_read_bam_matches_sam_reader(spark, tmp_path):
    (tmp_path / "t.bam").write_bytes(encode_bam(RECORDS, REFS))
    (tmp_path / "t.sam").write_text(SAM_TEXT)

    bam_rows = {
        r["header"]: r
        for r in read_bam(spark, str(tmp_path / "t.bam")).collect()
    }
    sam_rows = {
        r["header"]: r for r in read_sam(spark, str(tmp_path / "t.sam")).collect()
    }
    assert set(bam_rows) == set(sam_rows)
    for name, b in bam_rows.items():
        s = sam_rows[name]
        for col in ("flag", "rname", "pos", "cigar", "seq"):
            assert b[col] == s[col], (name, col, b[col], s[col])


def test_read_bam_mapq_filter(spark, tmp_path):
    (tmp_path / "q.bam").write_bytes(encode_bam(RECORDS, REFS))
    rows = read_bam(spark, str(tmp_path / "q.bam"), min_mapping_quality=50).collect()
    names = {r["header"] for r in rows}
    assert "r6" not in names and "r2" not in names
    assert "r1" in names


def test_bam_feeds_alignment_pipeline(spark, tmp_path):
    """Integration: BAM -> from_df -> CIGAR align -> cells, identical
    to the SAM text path."""
    from seqtables_spark.constructors import from_sam_df

    (tmp_path / "p.bam").write_bytes(encode_bam(RECORDS, REFS))
    bam_df = read_bam(spark, str(tmp_path / "p.bam"))
    st = from_sam_df(bam_df.filter("rname = 'ref1' AND flag = 0"))
    cells = st.cells(with_qual=False).collect()
    assert cells
    positions = {r["position"] for r in cells}
    assert min(positions) >= 2
