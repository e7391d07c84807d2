"""Distribution family vs hand-computed expectations on the golden set."""

import math

import pytest

from seqtables_spark import from_list
from seqtables_spark.operators import (
    consensus_string,
    pos_entropy,
    seq_dist,
)


@pytest.fixture(scope="module")
def st(spark, golden_seqs):
    return from_list(spark, golden_seqs)


def dist_map(df, value_col="cnt"):
    return {(r["position"], r["base"]): r[value_col] for r in df.collect()}


def test_counts(st):
    d = dist_map(seq_dist(st.cells()))
    # position 1: A,A,A,A,C,G -> A:4 C:1 G:1
    assert d[(1, "A")] == 4 and d[(1, "C")] == 1 and d[(1, "G")] == 1
    # position 2: C,A,T,T,C,G
    assert d[(2, "C")] == 2 and d[(2, "T")] == 2 and d[(2, "A")] == 1 and d[(2, "G")] == 1
    assert sum(v for (p, b), v in d.items() if p == 3) == 6


def test_freq(st):
    d = dist_map(seq_dist(st.cells(), method="freq"), "freq")
    assert d[(1, "A")] == pytest.approx(4 / 6)
    assert d[(2, "C")] == pytest.approx(2 / 6)


def test_weighted_counts(st, spark):
    w = spark.createDataFrame(
        [(str(i), float(i)) for i in range(1, 7)], "read_id string, weight double"
    )
    d = dist_map(seq_dist(st.cells(), weights=w))
    # position 1: A from reads 1,2,3,4 (w 1+2+3+4=10), C read 5 (5), G read 6 (6)
    assert d[(1, "A")] == 10.0 and d[(1, "C")] == 5.0 and d[(1, "G")] == 6.0


def test_ignore_characters(st):
    d = dist_map(seq_dist(st.cells(), ignore_characters=["A"]))
    assert (1, "A") not in d
    assert d[(1, "C")] == 1


def test_consensus(st):
    # pos1 mode A(4)>3 -> A; pos2 C/T tie at 2 <= 3 -> N; pos3: A2 C2 G2 -> N;
    # pos4: A3 C1 G1 T1 -> mode 3 <= 3 -> N (cutoff is <=)
    assert consensus_string(st.cells()) == "ANNN"


def test_consensus_cutoff_zero(st):
    # modecutoff=0: every mode wins; ties break to smallest letter.
    # pos1 A(4); pos2 C/T tie(2) -> C; pos3 G(3); pos4 A/G tie(2) -> A
    assert consensus_string(st.cells(), modecutoff=0.0) == "ACGA"


def test_entropy(st):
    ent = {r["position"]: r["entropy"] for r in pos_entropy(st.cells()).collect()}
    p = [4 / 6, 1 / 6, 1 / 6]
    expect1 = -sum(x * math.log2(x) for x in p)
    assert ent[1] == pytest.approx(expect1)
    p2 = [2 / 6, 2 / 6, 1 / 6, 1 / 6]
    assert ent[2] == pytest.approx(-sum(x * math.log2(x) for x in p2))


def test_ragged_fill(spark):
    st = from_list(spark, ["ACG", "AC", "A"])
    d = dist_map(seq_dist(st.cells()))
    assert d[(3, "N")] == 2 and d[(3, "G")] == 1
    assert d[(2, "N")] == 1


def test_seq_dist_dense_matches_relational(spark):
    """The dense bincount kernel (mapInPandas) and the relational
    explode plan produce identical (position, base, cnt) results."""
    import random

    from seqtables_spark.constructors import from_list
    from seqtables_spark.operators.distribution import seq_dist, seq_dist_dense

    rng = random.Random(11)
    seqs = [
        "".join(rng.choice("ACGTN") for _ in range(12)) for _ in range(300)
    ]
    st = from_list(spark, seqs)
    want = {
        (r["position"], r["base"]): r["cnt"]
        for r in seq_dist(st.cells(with_qual=False)).collect()
    }
    got = {
        (r["position"], r["base"]): r["cnt"]
        for r in seq_dist_dense(st.reads).collect()
    }
    assert got == want


def test_seq_dist_dense_ragged_matches_relational(spark):
    """Ragged reads: both plans count only the positions a read has."""
    from pyspark.sql import functions as F

    from seqtables_spark.operators.distribution import seq_dist, seq_dist_dense

    df = spark.createDataFrame(
        [("1", "ACGT"), ("2", "AC"), ("3", ""), ("4", "GGGGGG")],
        "read_id string, seq string",
    )
    cells = df.select(
        "read_id",
        F.posexplode(F.split("seq", "(?!^)")).alias("off", "base"),
    ).select(
        "read_id", (F.col("off") + 1).cast("long").alias("position"), "base"
    ).filter(F.col("base") != "")  # split(limit=-1) keeps a trailing ""
    want = {
        (r["position"], r["base"]): r["cnt"] for r in seq_dist(cells).collect()
    }
    got = {
        (r["position"], r["base"]): r["cnt"]
        for r in seq_dist_dense(df).collect()
    }
    assert got == want and (6, "G") in got
