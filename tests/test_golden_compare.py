"""Exact-match goldens ported from the reference's hand-recorded
expected outputs (/root/reference/tests/tests_to_make.txt) for
compare_sequence_matrices -> compare_cells / hamming.

The reference compares the 6-sequence toy set against its first two
rows and records match-count matrices under four option sets,
including the flip + ignore + treat_as_match NaN interaction.
"""

import pytest

from seqtables_spark import from_list
from seqtables_spark.operators import compare_cells, hamming_distance
from seqtables_spark.operators.compare import ref_cells_from_strings


@pytest.fixture(scope="module")
def cells(spark, golden_seqs):
    return from_list(spark, golden_seqs).cells()


@pytest.fixture(scope="module")
def refs(spark, golden_seqs):
    return ref_cells_from_strings(spark, golden_seqs[:2])


def match_counts(cmp_df):
    """sum(match) per (read, ref) like the golden .sum(axis=1)."""
    rows = cmp_df.groupBy("read_id", "ref_id").sum("match_int").collect()
    out = {}
    for r in rows:
        out[(int(r["read_id"]), int(r["ref_id"]))] = r["sum(match_int)"]
    return out


def run(cells, refs, **kw):
    from pyspark.sql import functions as F

    cmp_df = compare_cells(cells, refs, **kw).withColumn(
        "match_int", F.col("match").cast("int")
    )
    return match_counts(cmp_df)


def as_matrix(d, n_reads=6, n_refs=2):
    return [[d[(i + 1, j + 1)] for j in range(n_refs)] for i in range(n_reads)]


def test_plain_match_counts(cells, refs):
    got = as_matrix(run(cells, refs))
    assert got == [[4, 1], [1, 4], [2, 2], [1, 1], [1, 0], [1, 0]]


def test_treat_as_match_A(cells, refs):
    got = as_matrix(run(cells, refs, treat_as_match=["A"]))
    assert got == [[4, 4], [4, 4], [3, 4], [1, 4], [2, 4], [2, 4]]


def test_treat_as_match_AG(cells, refs):
    got = as_matrix(run(cells, refs, treat_as_match=["A", "G"]))
    assert got == [[4, 4], [4, 4], [3, 4], [3, 4], [3, 4], [4, 4]]


def test_flip_ignore_treat_interaction(cells, refs):
    """The NaN/NULL golden: flip=True, ignore=['C','G'],
    treat_as_match=['A','T'] -> every non-NULL cell is 0 (False) and
    the NULL pattern matches the recorded matrix."""
    from pyspark.sql import functions as F

    cmp_df = compare_cells(
        cells, refs, flip=True, ignore_characters=["C", "G"], treat_as_match=["A", "T"]
    )
    rows = cmp_df.collect()
    # recorded tensor, read-major: rows=reads 1..6, per read rows=positions
    # 1..4, cols=refs 1..2; None = NaN
    golden = {
        # (read, pos, ref) -> value
    }
    expected_tensor = [
        [[0, 0], [None, None], [None, None], [0, 0]],
        [[0, 0], [None, 0], [None, 0], [0, 0]],
        [[0, 0], [None, 0], [None, None], [0, 0]],
        [[0, 0], [None, 0], [None, None], [None, None]],
        [[None, None], [None, None], [None, None], [None, None]],
        [[None, None], [None, None], [None, None], [None, None]],
    ]
    for read_i, per_pos in enumerate(expected_tensor, start=1):
        for pos_i, per_ref in enumerate(per_pos, start=1):
            for ref_i, val in enumerate(per_ref, start=1):
                golden[(read_i, pos_i, ref_i)] = val
    assert len(rows) == 6 * 4 * 2
    for r in rows:
        key = (int(r["read_id"]), int(r["position"]), int(r["ref_id"]))
        want = golden[key]
        got = r["match"]
        if want is None:
            assert got is None, f"{key}: expected NULL, got {got}"
        else:
            assert got is not None and int(got) == want, f"{key}: expected {want}, got {got}"


def test_hamming_distance_plain(cells, refs):
    rows = hamming_distance(cells, refs).collect()
    got = {(int(r["read_id"]), int(r["ref_id"])): r["dist"] for r in rows}
    # dist = 4 - match_count from the plain golden
    expect = {
        (1, 1): 0, (1, 2): 3, (2, 1): 3, (2, 2): 0, (3, 1): 2, (3, 2): 2,
        (4, 1): 3, (4, 2): 3, (5, 1): 3, (5, 2): 4, (6, 1): 3, (6, 2): 4,
    }
    assert got == expect


def test_hamming_normalized(cells, refs):
    rows = hamming_distance(cells, refs, normalized=True).collect()
    got = {(int(r["read_id"]), int(r["ref_id"])): r["dist"] for r in rows}
    assert got[(1, 1)] == 0.0
    assert got[(1, 2)] == 0.75
    assert got[(5, 2)] == 1.0
