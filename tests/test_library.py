"""Site-saturation-library setup ops (reference library_utils.py:239-306)."""

import pytest

from seqtables_spark.operators.library import (
    get_read_alignment_details,
    initialize_sequences,
    library_alignment_details,
    parse_fasta_text,
)

FASTA = """>5_3_fwd_primer
ACGTAC
>5_3_N_dialout
NNNN
>3_5_C_dialout
TTTT
>3_5_rev_primer
GGCCAA
>amplified_seq
AAACCCGGG
>WTSEQ
TTTAAACCCGGGTTT
"""


def test_initialize_sequences_from_text():
    fwd, rev, dn, dc, soi, wt = initialize_sequences(FASTA)
    assert (fwd, rev, dn, dc) == ("ACGTAC", "GGCCAA", "NNNN", "TTTT")
    assert soi == "AAACCCGGG"
    assert wt == "TTTAAACCCGGGTTT"


def test_initialize_sequences_from_path(tmp_path):
    p = tmp_path / "design.fasta"
    p.write_text(FASTA)
    assert initialize_sequences(str(p))[5] == "TTTAAACCCGGGTTT"


def test_parse_fasta_multiline_and_case():
    recs = parse_fasta_text(">a desc\nacg\nt\n>b\nGG\n")
    assert recs == {"a": "ACGT", "b": "GG"}


def test_get_read_alignment_details_reference_flow():
    # wildtype 12 nt (4 residues); library covers positions 4-9 with
    # NNK saturating residue 2 (nt 4-6) and a degenerate R at nt 8
    actual = "ATGGCTTACGGA"
    library = "NNKTRC"
    nt, aa, start, wt_sub = get_read_alignment_details(actual, library)
    assert start == 3  # 0-based: NNK matches GCT, T matches T, R=AG->A, C
    assert wt_sub == "GCTTAC"
    assert nt == [0, 0, 0, 1, 1, 1, 0, 1, 0, 0, 0, 0]
    assert aa == [0, 1, 1, 0]  # residues 2 (nt 4-6) and 3 (nt 8)


def test_get_read_alignment_details_no_match_raises():
    with pytest.raises(ValueError):
        get_read_alignment_details("AAAA", "GGG")


def test_get_read_alignment_details_first_match_wins():
    # N matches anywhere; first (leftmost) offset is reported
    nt, aa, start, wt_sub = get_read_alignment_details("ACGT", "N")
    assert start == 0 and wt_sub == "A"
    assert nt == [1, 0, 0, 0]


def test_library_alignment_details_matches_scalar(spark):
    designs = spark.createDataFrame(
        [
            (1, "ATGGCTTACGGA", "NNKTRC"),
            (2, "ACGT", "N"),
            (3, "AAAA", "GGG"),  # no alignment -> dropped
        ],
        "lib_id long, actual_seq string, library_seq string",
    )
    rows = library_alignment_details(designs).collect()
    assert {r["lib_id"] for r in rows} == {1, 2}

    d1 = sorted((r for r in rows if r["lib_id"] == 1), key=lambda r: r["nt_pos"])
    nt_mask, aa_mask, start, wt_sub = get_read_alignment_details(
        "ATGGCTTACGGA", "NNKTRC"
    )
    assert [r["expected_mut_nt"] for r in d1] == nt_mask
    assert all(r["start_aln"] == start for r in d1)
    assert all(r["wt_sub"] == wt_sub for r in d1)
    # per-residue mask agrees with the scalar aa mask
    by_res = {}
    for r in d1:
        by_res[r["aa_pos"]] = max(by_res.get(r["aa_pos"], 0), r["expected_mut_aa"])
    assert [by_res[i + 1] for i in range(len(aa_mask))] == aa_mask
    assert [r["codon_pos"] for r in d1[:6]] == [0, 1, 2, 0, 1, 2]
    assert [r["wt_base"] for r in d1] == list("ATGGCTTACGGA")
    assert [r["in_amplicon"] for r in d1] == [0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0]


def test_library_alignment_details_partial_codon_residue_is_zero(spark):
    # 5-nt wildtype: residue 2 (nt 4-5) is a partial codon -> aa mask
    # has floor(5/3)=1 entry; nt 4 is degenerate but falls outside it
    designs = spark.createDataFrame(
        [(1, "ACGTA", "TN")], "lib_id long, actual_seq string, library_seq string"
    )
    rows = {r["nt_pos"]: r for r in library_alignment_details(designs).collect()}
    assert rows[4]["expected_mut_nt"] == 0  # T literal at nt 4
    assert rows[5]["expected_mut_nt"] == 1  # N at nt 5
    assert rows[5]["expected_mut_aa"] == 0  # residue 2 beyond len//3
    assert rows[3]["expected_mut_aa"] == 0
