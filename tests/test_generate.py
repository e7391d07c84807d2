"""In-silico generators (reference S9, insilica_sequences.py +
scratch_data.py): deterministic portable-hash randomness, so every
property is exact, not statistical-with-tolerance."""

import math

import pytest
from pyspark.sql import functions as F

from seqtables_spark.sources.generate import (
    add_quality_scores,
    create_scratch_data,
    generate_library,
    generate_sequence_py,
    generate_sequences,
    quality_mean_curve,
    randomly_add_indels,
    u01_py,
)


def test_generate_sequences_deterministic_and_matches_py_twin(spark):
    rows = generate_sequences(spark, 8, 25, seed=3).collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r.seq) == 25
        assert set(r.seq) <= set("ACTG")
        assert r.seq == generate_sequence_py(25, seed=3, read_id=r.read_id)
    again = generate_sequences(spark, 8, 25, seed=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_generate_sequences_weighted_alphabet(spark):
    # all-A distribution: degenerate weights pin every letter
    rows = generate_sequences(
        spark, 4, 10, chars="AC", p_bases=[1.0, 0.0], seed=1
    ).collect()
    assert all(r.seq == "A" * 10 for r in rows)


def test_generate_library_zero_rate_is_scaffold(spark):
    wt = generate_sequence_py(30, seed=9)
    rows = generate_library(spark, wt, 5, error_prone_rate=0.0, seed=9).collect()
    assert all(r.seq == wt for r in rows)


def test_generate_library_protected_and_saturated_positions(spark):
    wt = generate_sequence_py(20, seed=4)
    df = generate_library(
        spark,
        wt,
        50,
        error_prone_rate=1.0,           # mutate everywhere allowed
        no_error_prone_pos=tuple(range(1, 21)),  # ...but protect all
        ss_pos=(7,),                    # except saturation at 7
        site_saturation={3: "R"},       # and R = A/G at 3
        seed=4,
    )
    rows = df.collect()
    for r in rows:
        assert len(r.seq) == 20
        # protected positions keep the wildtype letter
        for j in range(1, 21):
            if j in (3, 7):
                continue
            assert r.seq[j - 1] == wt[j - 1], (r.read_id, j)
        assert r.seq[2] in "AG"        # R saturation
        assert r.seq[6] in "ACGT"      # N saturation
    # saturation actually varies across reads
    assert len({r.seq[6] for r in rows}) > 1


def test_generate_library_error_prone_hits_only_actg(spark):
    wt = "A" * 40
    rows = generate_library(spark, wt, 30, error_prone_rate=0.5, seed=2).collect()
    muts = [c for r in rows for c in r.seq if c != "A"]
    assert muts and set(muts) <= set("CTG")
    # the hit decision is the portable hash: reproduce one row in python
    r0 = next(r for r in rows if r.read_id == 1)
    for j in range(1, 41):
        hit = u01_py("2:ep", 1, j) < 0.5
        if not hit:
            assert r0.seq[j - 1] == "A"


def test_quality_mean_curve_shape():
    m = quality_mean_curve(50, read_type="r2", starting_mean_quality=36, ending_mean_quality=15)
    assert m[0] == 15 and m == sorted(m)  # r2: rises from the end-mean
    r1 = quality_mean_curve(50, read_type="r1")
    assert r1 == m[::-1]
    with pytest.raises(ValueError):
        quality_mean_curve(10, read_type="r3")


def test_add_quality_scores_bounds_and_trend(spark):
    df = generate_sequences(spark, 40, 60, seed=6)
    q = add_quality_scores(df, 60, read_type="r1", min_quality=0, max_quality=40, seed=6)
    rows = q.collect()
    phreds = [[ord(c) - 33 for c in r.qual] for r in rows]
    assert all(len(p) == 60 for p in phreds)
    assert all(0 <= v <= 40 for p in phreds for v in p)
    # r1 curve: early positions average well above late positions
    head = sum(p[1] for p in phreds) / len(phreds)
    tail = sum(p[-2] for p in phreds) / len(phreds)
    assert head > tail + 5


def test_randomly_add_indels_identity_at_zero_rates(spark):
    df = add_quality_scores(generate_sequences(spark, 5, 15, seed=8), 15, seed=8)
    out = randomly_add_indels(df, insertion_rate=0.0, deletion_rate=0.0, seed=8)
    for r in out.collect():
        assert len(r.seq) == 15 and len(r.qual) == 15


def test_randomly_add_indels_shapes_and_qual_sync(spark):
    df = add_quality_scores(generate_sequences(spark, 30, 40, seed=10), 40, seed=10)
    out = randomly_add_indels(
        df, insertion_rate=0.08, deletion_rate=0.08, max_ins=4, seed=10
    )
    rows = out.collect()
    # qual stays in lockstep with seq through every indel
    assert all(len(r.seq) == len(r.qual) for r in rows)
    lens = {len(r.seq) for r in rows}
    assert any(n < 40 for n in lens) and any(n > 40 for n in lens)
    assert all(set(r.seq) <= set("ACTG") for r in rows)
    # deletions are the deterministic hash decisions
    r0 = next(r for r in rows if r.read_id == 1)
    expected_dels = sum(1 for j in range(1, 41) if u01_py("10:del", 1, j) < 0.08)
    expected_ins = sum(1 for j in range(1, 41) if u01_py("10:ins", 1, j) < 0.08)
    if expected_ins == 0:
        assert len(r0.seq) == 40 - expected_dels


def test_create_scratch_data_round_trip(spark):
    df, wt = create_scratch_data(spark, 10, 30, ss_pos=[5], error_prone_rate=0.02, seed=12)
    assert len(wt) == 30
    rows = df.collect()
    assert len(rows) == 10
    assert all(len(r.seq) == 30 and len(r.qual) == 30 for r in rows)
    # low error rate: consensus across reads equals wildtype away from ss
    from seqtables_spark.operators.distribution import consensus
    from seqtables_spark.constructors import from_list

    st = from_list(spark, [r.seq for r in rows])
    cons = {r["position"]: r["consensus_base"] for r in consensus(st.cells(), modecutoff=0.5).collect()}
    mismatches = sum(
        1 for j in range(1, 31) if j != 5 and cons[j] not in (wt[j - 1], "N")
    )
    assert mismatches <= 2


def test_generated_library_feeds_mutation_profile(spark):
    """Integration: generator output flows through the comparison
    operators exactly like ingested data."""
    from seqtables_spark.constructors import from_list
    from seqtables_spark.operators.compare import mutation_profile

    wt = generate_sequence_py(25, seed=13)
    lib = generate_library(spark, wt, 40, error_prone_rate=0.3, seed=13)
    st = from_list(spark, [r.seq for r in lib.collect()])
    prof = mutation_profile(st.cells(), [wt]).collect()
    assert prof  # mutations exist at 30% rate
    total = sum(r["cnt"] for r in prof)
    # every counted mutation differs from the wildtype letter
    assert all(r["ref_base"] != r["read_base"] for r in prof)
    assert 0 < total < 40 * 25
