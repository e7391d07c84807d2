"""Scalar domain functions: translation (standard + degenerate
codons), codon splitting, regex expansion, phred codecs, coordinate
arithmetic, SAM flag/CIGAR predicates."""

import pytest

from pyspark.sql import functions as F

from seqtables_spark.functions.dna import (
    get_codons_expr,
    nt_pos_to_res_num,
    phred_decode,
    phred_encode,
    res_num_to_nt_pos,
    seq_to_regex,
    translate_expr,
)
from seqtables_spark.functions.sam import (
    cigar_event_total,
    cterminal_softclip,
    flag_bit_set,
    nterminal_softclip,
    read_number,
)


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], ", ".join(f"{k} string" for k in cols))
    return df.select(expr.alias("v")).first()["v"]


def test_translate_standard(spark):
    # ATG GCA TAA -> M A *
    assert one(spark, translate_expr("s"), s="ATGGCATAA") == "MA*"


def test_translate_all_codons(spark):
    """Every standard codon through the fast path matches the table."""
    from seqtables_spark.alphabets import _STANDARD_CODONS

    rows = [(c,) for c in sorted(_STANDARD_CODONS)]
    df = spark.createDataFrame(rows, "s string")
    got = {r["s"]: r["aa"] for r in df.select("s", translate_expr("s").alias("aa")).collect()}
    assert got == _STANDARD_CODONS


def test_translate_degenerate(spark):
    # GGN is 4-fold degenerate glycine; RAT is ambiguous (AAT=N / GAT=D)
    assert one(spark, translate_expr("s"), s="GGN") == "G"
    assert one(spark, translate_expr("s"), s="RAT") == "X"
    assert one(spark, translate_expr("s"), s="NNN") == "X"


def test_translate_frame(spark):
    # frame 2 drops the first base: (A)TGGCA -> TGG CA(drop) -> W
    assert one(spark, translate_expr("s", frame=2), s="ATGGCA") == "W"


def test_get_codons(spark):
    got = one(spark, F.concat_ws(",", get_codons_expr("s")), s="ATGGCATA")
    assert got == "ATG,GCA"  # trailing partial dropped


def test_seq_to_regex():
    assert seq_to_regex("ANR") == "A[ACGT][AG]"


def test_coordinate_arithmetic(spark):
    df = spark.createDataFrame([(1,), (3,), (4,), (7,)], "p long")
    got = [r["r"] for r in df.select(nt_pos_to_res_num("p").alias("r")).collect()]
    assert got == [1, 1, 2, 3]
    df2 = spark.createDataFrame([(1,), (2,)], "r long")
    got2 = [x["p"] for x in df2.select(res_num_to_nt_pos("r").alias("p")).collect()]
    assert got2 == [1, 4]


def test_phred_roundtrip(spark):
    assert one(spark, phred_decode("c"), c="I") == 40
    df = spark.createDataFrame([(40,)], "q int")
    assert df.select(phred_encode("q").alias("c")).first()["c"] == "I"


def test_flags(spark):
    df = spark.createDataFrame([(0,), (64,), (128,), (4 | 64,)], "flag int")
    got = [r["rn"] for r in df.select(read_number("flag").alias("rn")).collect()]
    assert got == ["R1", "R1", "R2", "R1"]
    kept = df.filter(~flag_bit_set("flag", 4)).count()
    assert kept == 3


def test_softclips(spark):
    df = spark.createDataFrame(
        [("4S10M2S",), ("10M",), ("3S7M",)], "cigar string"
    )
    rows = df.select(
        nterminal_softclip("cigar").alias("n"),
        cterminal_softclip("cigar").alias("c"),
        cigar_event_total("cigar", "M").alias("m"),
    ).collect()
    assert [(r["n"], r["c"], r["m"]) for r in rows] == [(4, 2, 10), (0, 0, 10), (3, 0, 7)]


def test_translate_and_codons_on_too_short_sequences(spark):
    """No complete codon -> empty results, not the sequence(0,-1)
    descending-array garbage (reviewed failure mode)."""
    from seqtables_spark.functions.dna import get_codons_expr, translate_expr

    df = spark.createDataFrame(
        [("AG",), ("",), ("ACGT",), ("ACG",)], "seq string"
    )
    rows = df.select(
        "seq",
        get_codons_expr("seq").alias("codons"),
        translate_expr("seq").alias("aa"),
        get_codons_expr("seq", frame=3).alias("codons_f3"),
    ).collect()
    by = {r["seq"]: r for r in rows}
    assert by["AG"]["codons"] == [] and by["AG"]["aa"] == ""
    assert by[""]["codons"] == [] and by[""]["aa"] == ""
    assert by["ACGT"]["codons"] == ["ACG"] and len(by["ACGT"]["aa"]) == 1
    assert by["ACGT"]["codons_f3"] == []  # 'GT' after frame shift
    assert by["ACG"]["codons"] == ["ACG"]
