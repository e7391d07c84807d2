"""CIGAR realignment kernel: unit tests for align_read (pure python,
no spark needed) plus an end-to-end align_sam_df test.

Scenarios mirror the reference kernel's edge cases
(sam_to_arr.pyx:114-207): window clipping on both edges, D/N gap
fills, soft clips, insertions with negative leftward numbering,
reads entirely outside the window.
"""

import pytest

from seqtables_spark.sources.align import align_read


def test_simple_match():
    s, q, ins = align_read("ACGT", "IIII", 1, "4M", 1, 4)
    assert s == "ACGT" and q == "IIII" and ins == []


def test_left_edge_pad():
    s, q, ins = align_read("ACGT", "IIII", 3, "4M", 1, 6)
    assert s == "--ACGT" and q == "!!IIII"


def test_right_edge_pad():
    s, q, ins = align_read("ACGT", "IIII", 1, "4M", 1, 6)
    assert s == "ACGT--" and q == "IIII!!"


def test_deletion_gap():
    s, q, ins = align_read("ACGT", "IIII", 1, "2M2D2M", 1, 6)
    assert s == "AC--GT" and q == "II!!II"


def test_intron_gap():
    s, q, ins = align_read("ACGT", "IIII", 1, "2M2N2M", 1, 6)
    assert s == "AC..GT"


def test_soft_clip_consumed():
    s, q, ins = align_read("TTACGT", "JJIIII", 1, "2S4M", 1, 4)
    assert s == "ACGT" and q == "IIII"


def test_insertion_negative_numbering():
    # A [CGG] T: CGG inserted before reference position 2
    s, q, ins = align_read("ACGGT", "IIIII", 1, "1M3I1M", 1, 2)
    assert s == "AT"
    # leftmost inserted base most negative: C=-3, G=-2, G=-1
    by_loc = {loc: b for (_pos, loc, b, _q) in ins}
    assert by_loc == {-1: "G", -2: "G", -3: "C"}
    assert all(pos == 2 for (pos, _l, _b, _q) in ins)


def test_two_insertion_runs():
    s, q, ins = align_read("AGCTA", "IIIII", 1, "1M1I1M1I1M", 1, 3)
    assert s == "ACA"
    locs = sorted((p, l, b) for (p, l, b, _q) in ins)
    assert locs == [(2, -1, "G"), (3, -1, "T")]


def test_read_starts_after_window():
    s, q, ins = align_read("ACGT", "IIII", 10, "4M", 1, 4)
    assert s == "----" and q == "!!!!" and ins == []


def test_read_ends_before_window():
    s, q, ins = align_read("ACGT", "IIII", 1, "4M", 10, 13)
    assert s == "----" and q == "!!!!"


def test_window_clips_read_start():
    s, q, ins = align_read("ACGT", "ABCD", 1, "4M", 3, 4)
    assert s == "GT" and q == "CD"


def test_window_clips_read_end():
    s, q, ins = align_read("ACGT", "ABCD", 1, "4M", 1, 2)
    assert s == "AC" and q == "AB"


def test_deletion_spanning_window_start():
    # read starts at 1, 2M 4D 2M; window starts at 4: deletion covers 3-6
    s, q, ins = align_read("ACGT", "IIII", 1, "2M4D2M", 4, 8)
    assert s == "---GT"


def test_insertion_outside_window_dropped():
    s, q, ins = align_read("ACGGT", "IIIII", 5, "1M3I1M", 10, 12)
    assert ins == []


@pytest.mark.spark
def test_align_sam_df_end_to_end(spark):
    rows = [
        ("r1", 1, "ACGT", "IIII", "4M"),
        ("r2", 3, "ACGTA", "JJJJJ", "2M1I2M"),
    ]
    df = spark.createDataFrame(
        rows, "header string, pos long, seq string, qual string, cigar string"
    )
    from seqtables_spark.sources.align import align_sam_df

    reads, insertions = align_sam_df(df)
    got = {r["read_id"]: (r["seq"], r["qual"], r["pos_start"]) for r in reads.collect()}
    # window: min_pos=1, max over (1+4-1=4, 3+5+0-1-1-0=5... len(seq)=5, dels=0, ins=1, clips=0 -> 3+5+0-1-1=6)
    # r2 end = pos + len + dels - ins - clips - 1 = 3+5+0-1-0-1 = 6
    assert got["r1"][0] == "ACGT--"
    assert got["r2"][0] == "--ACTA"
    ins = insertions.collect()
    assert len(ins) == 1
    r = ins[0]
    assert r["read_id"] == "r2" and r["position"] == 5 and r["loc_ins"] == -1 and r["base"] == "G"
