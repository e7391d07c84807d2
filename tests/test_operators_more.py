"""K-mers, slicing, count-filter, deterministic sample, quality ops,
merges and insertion aggregations on hand-computed fixtures."""

import pytest

from pyspark.sql import functions as F

from seqtables_spark import from_list
from seqtables_spark.operators.insertions import (
    get_average_insertion_quality,
    get_insertion_distribution,
    get_insertion_events,
    get_insertion_expectations,
    get_insertion_seq_dist,
    view_with_insertions,
)
from seqtables_spark.operators.kmers import contiguous_kmers, get_substrings
from seqtables_spark.operators.merge import merge_seqtables
from seqtables_spark.operators.quality import (
    convert_low_bases_to_null,
    even_bins,
    fastqc_bins,
    quality_dist,
    quality_filter,
)
from seqtables_spark.operators.slices import (
    deterministic_sample,
    filter_by_count,
    slice_sequences,
)


# ---------------------------------------------------------------- kmers

def test_gapped_kmers(spark):
    st = from_list(spark, ["ACGT", "AAGT", "ACGA"])
    d = {
        (r["combo"], r["kmer"]): r["cnt"]
        for r in get_substrings(st.reads, 2, positions=[1, 2, 3]).collect()
    }
    # combos: (1,2) (1,3) (2,3)
    assert d[("p1,p2", "AC")] == 2 and d[("p1,p2", "AA")] == 1
    assert d[("p1,p3", "AG")] == 3
    assert d[("p2,p3", "CG")] == 2 and d[("p2,p3", "AG")] == 1


def test_gapped_kmers_weighted(spark):
    st = from_list(spark, ["ACGT", "AAGT"])
    w = spark.createDataFrame([("1", 2.0), ("2", 3.0)], "read_id string, weight double")
    d = {
        (r["combo"], r["kmer"]): r["cnt"]
        for r in get_substrings(st.reads, 2, positions=[1, 2], weights=w).collect()
    }
    assert d[("p1,p2", "AC")] == 2.0 and d[("p1,p2", "AA")] == 3.0


def test_gapped_kmers_include_insertions(spark):
    # reference seqtables.py:999-1003: insertion slots interleave with
    # matrix positions, sorted by (position, loc_ins); reads without
    # the insertion contribute the gap char; letters lowercased
    st = from_list(spark, ["AC", "AG"])
    ins = spark.createDataFrame(
        [("1", 2, -1, "T", 30)],
        "read_id string, position long, loc_ins int, base string, qual int",
    )
    d = {
        (r["combo"], r["kmer"]): r["cnt"]
        for r in get_substrings(
            st.reads, 2, positions=[1, 2],
            include_insertions=True, insertions=ins,
        ).collect()
    }
    # slots sorted: p1 (1,0), p2_ins_1 (2,-1), p2 (2,0)
    assert d[("p1,p2_ins_1", "At")] == 1  # read 1 has the insertion
    assert d[("p1,p2_ins_1", "A-")] == 1  # read 2 gets the gap
    assert d[("p1,p2", "AC")] == 1 and d[("p1,p2", "AG")] == 1
    assert d[("p2_ins_1,p2", "tC")] == 1 and d[("p2_ins_1,p2", "-G")] == 1


def test_gapped_kmers_include_insertions_min_count_and_case(spark):
    st = from_list(spark, ["AC", "AG"])
    ins = spark.createDataFrame(
        [("1", 2, -1, "T", 30)],
        "read_id string, position long, loc_ins int, base string, qual int",
    )
    # min_ins_count=2 drops the singleton slot -> plain matrix combos
    d = {
        r["combo"]
        for r in get_substrings(
            st.reads, 2, positions=[1, 2],
            include_insertions=True, insertions=ins, min_ins_count=2,
        ).collect()
    }
    assert d == {"p1,p2"}
    # lowercase_insertions=False keeps the original letter
    d2 = {
        (r["combo"], r["kmer"]): r["cnt"]
        for r in get_substrings(
            st.reads, 2, positions=[1, 2],
            include_insertions=True, insertions=ins,
            lowercase_insertions=False,
        ).collect()
    }
    assert d2[("p1,p2_ins_1", "AT")] == 1


def test_gapped_kmers_subsample_seqs_deterministic(spark):
    st = from_list(spark, ["AC", "AG", "TT", "GG"])
    a = {
        (r["combo"], r["kmer"]): r["cnt"]
        for r in get_substrings(
            st.reads, 2, positions=[1, 2], subsample_seqs=2
        ).collect()
    }
    b = {
        (r["combo"], r["kmer"]): r["cnt"]
        for r in get_substrings(
            st.reads, 2, positions=[1, 2], subsample_seqs=2
        ).collect()
    }
    assert a == b  # hash-deterministic, retry-safe
    assert sum(v for (c, _), v in a.items() if c == "p1,p2") == 2


def test_compare_set_diff(spark):
    from seqtables_spark.operators.compare import compare_to_references

    st = from_list(spark, ["ACGT"])
    # positions={1,2} with set_diff -> compare only the complement {3,4}
    cmp_df = compare_to_references(
        st.cells(with_qual=False), ["ACGT"], positions=[1, 2], set_diff=True
    )
    got = sorted(r["position"] for r in cmp_df.collect())
    assert got == [3, 4]


def test_gapped_kmers_guard(spark):
    st = from_list(spark, ["A" * 30])
    with pytest.raises(ValueError):
        get_substrings(st.reads, 5, max_combinations=10)


def test_contiguous_kmers(spark):
    df = spark.createDataFrame([("ABAB",), ("BABA",)], "seq string")
    d = {r["kmer"]: r["cnt"] for r in contiguous_kmers(df, 2).collect()}
    assert d == {"AB": 3, "BA": 3}


# ---------------------------------------------------------------- slices

def test_slice_pads_missing_positions(spark):
    st = from_list(spark, ["ACGT"])
    out = slice_sequences(st.cells(), [2, 4, 9]).first()
    assert out["seqs"] == "CTN"  # position 9 outside table -> fill


def test_filter_by_count(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], "v string"
    )
    kept = filter_by_count(df, ["v"], 2)
    assert kept.count() == 3  # only 'a' rows survive (3 > 2); 'b' (1) dropped


def test_deterministic_sample_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = [r["id"] for r in deterministic_sample(df, 10, "id").collect()]
    b = [r["id"] for r in deterministic_sample(df, 10, "id").collect()]
    assert a == b and len(a) == 10


# ---------------------------------------------------------------- quality

def test_fastqc_bins_skip_75_79():
    bins = fastqc_bins(300)
    assert (70, 74) in bins and (80, 84) in bins
    assert not any(lo == 75 for lo, hi in bins)


def test_even_bins():
    assert even_bins(1, 20, 10)[:2] == [(1, 2), (3, 4)]


def test_quality_filter(spark):
    # read 1: quals 40,40,40,2 -> 75% >= 20; read 2: all low
    st = from_list(spark, ["ACGT", "ACGT"], quals=["III#", "####"])
    out = quality_filter(st, q=20, p=70.0)
    assert [r["read_id"] for r in out.reads.collect()] == ["1"]


def test_convert_low_bases(spark):
    st = from_list(spark, ["ACGT"], quals=["I#I!"])  # phred 40,2,40,0
    got = {
        r["position"]: r["base"]
        for r in convert_low_bases_to_null(st.cells(), q=20).collect()
    }
    # pos2 low -> N; pos4 null-qual (0) kept because ignore_null_qual
    assert got == {1: "A", 2: "N", 3: "G", 4: "T"}


def test_quality_dist_exact(spark):
    st = from_list(spark, ["AC", "AC"], quals=["I5", "I5"])  # 40,20 x2
    rows = quality_dist(st.cells(), bins=[(1, 1), (2, 2)]).collect()
    by_bin = {r["bin_name"]: r for r in rows}
    assert by_bin["1"]["mean"] == 40.0 and by_bin["2"]["mean"] == 20.0
    assert by_bin["1"]["p50"] == 40.0


# ---------------------------------------------------------------- merge

def test_merge_axis0_position_union(spark):
    a = from_list(spark, ["AAA"], pos=1)
    b = from_list(spark, ["TT"], pos=5)
    cells = merge_seqtables([a, b], axis=0).cells(with_qual=False)
    got = {(r["position"], r["base"]) for r in cells.collect()}
    assert got == {(1, "A"), (2, "A"), (3, "A"), (5, "T"), (6, "T")}


def test_merge_axis1_last_writer_wins(spark):
    a = from_list(spark, ["AAAA"], index=["r"])
    b = from_list(spark, ["TT"], index=["r"])  # positions 1-2 overwrite
    merged = merge_seqtables([a, b], axis=1)
    assert merged.reads.first()["seq"] == "TTAA"


# ------------------------------------------------------------- insertions

@pytest.fixture(scope="module")
def ins_df(spark):
    rows = [
        ("r1", 5, -1, "G", 30),
        ("r1", 5, -2, "C", 20),
        ("r2", 5, -1, "A", 10),
        ("r2", 7, -1, "T", 40),
    ]
    return spark.createDataFrame(
        rows, "read_id string, position long, loc_ins int, base string, qual int"
    )


def test_insertion_events(ins_df):
    got = {r["position"]: r["n_reads"] for r in get_insertion_events(ins_df).collect()}
    assert got == {5: 2, 7: 1}


def test_insertion_events_min_quality(ins_df):
    got = {
        r["position"]: r["n_reads"]
        for r in get_insertion_events(ins_df, min_quality=15).collect()
    }
    assert got == {5: 1, 7: 1}


def test_insertion_distribution(ins_df):
    got = {
        (r["position"], r["loc_ins"]): r["cnt"]
        for r in get_insertion_distribution(ins_df).collect()
    }
    assert got == {(5, -1): 2, (5, -2): 1, (7, -1): 1}


def test_insertion_avg_quality(ins_df):
    got = {
        (r["position"], r["loc_ins"]): r["avg_qual"]
        for r in get_average_insertion_quality(ins_df).collect()
    }
    assert got[(5, -1)] == 20.0


def test_insertion_expectations(ins_df):
    got = {r["position"]: (r["mean_len"], r["max_len"], r["n_reads"])
           for r in get_insertion_expectations(ins_df).collect()}
    assert got[5] == (1.5, 2, 2) and got[7] == (1.0, 1, 1)


def test_insertion_seq_dist_gap_row(ins_df):
    rows = get_insertion_seq_dist(ins_df, n_reads_total=3).collect()
    gaps = {
        (r["position"], r["loc_ins"]): r["cnt"]
        for r in rows if r["base"] == "-"
    }
    # 3 reads total; slot (5,-1) has 2 -> gap 1; (5,-2) has 1 -> gap 2
    assert gaps[(5, -1)] == 1 and gaps[(5, -2)] == 2


def test_view_with_insertions(spark, ins_df):
    st = from_list(
        spark, ["ACGTACGT", "ACGTACGT", "ACGTACGT"], index=["r1", "r2", "3"], pos=1
    )
    v = view_with_insertions(st.cells(with_qual=False), ins_df, positions=[5])
    rows = v.collect()
    base = [(r["read_id"], r["loc_ins"], r["base"]) for r in rows if r["loc_ins"] == 0]
    assert len(base) == 3  # 3 reads x position 5
    slot = {
        (r["read_id"], r["loc_ins"]): r["base"] for r in rows if r["loc_ins"] < 0
    }
    # lowercased insertion letters; '-' where the read has none
    assert slot[("r1", -1)] == "g" and slot[("r1", -2)] == "c"
    assert slot[("r2", -1)] == "a" and slot[("r2", -2)] == "-"
    assert slot[("3", -1)] == "-"


def test_get_substrings_insertions_ragged_reads_keep_slot_alignment(spark):
    """A read shorter than a matrix slot must NOT shift later slots:
    the short read's missing positions read as 'N' and the insertion
    slot still carries the insertion letter (reviewed failure mode:
    substring('') collapsed the slot and mislabeled combos)."""
    from seqtables_spark.operators.kmers import get_substrings

    reads = spark.createDataFrame(
        [("1", "ACGT"), ("2", "AC")], "read_id string, seq string"
    )
    ins = spark.createDataFrame(
        [("2", 4, -1, "T", 40)],
        "read_id string, position long, loc_ins int, base string, qual int",
    )
    out = get_substrings(
        reads, word_length=5, include_insertions=True, insertions=ins
    ).collect()
    # slots sort by (position, loc_ins): p1 p2 p3 p4_ins_1 p4
    # (loc_ins=-1 < 0, the view_with_ins interleaving order)
    kmers = {r["kmer"]: r["cnt"] for r in out}
    assert kmers == {"ACG-T": 1, "ACNtN": 1}
