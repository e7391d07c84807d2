"""SAM flag / CIGAR scalar predicates as column expressions.

Parity targets (file:line in /root/reference/seqtables/core/utils/
custom_sam_utils.py):
  - breakdown_bits / filter_flags / return_read_num: :17-60
  - get_nterminal_softclip / get_cterminal_softclip: :63-121
  - cigar_breakdown (scalar): :99-121

Pure bitwise / regexp expressions - no shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def flag_bit_set(flag: Column | str, bit: int) -> Column:
    f = F.col(flag) if isinstance(flag, str) else flag
    return (f.bitwiseAND(F.lit(bit))) != 0


def read_number(flag: Column | str) -> Column:
    """R1/R2 classification from the 0x40/0x80 bits (reference
    return_read_num)."""
    return (
        F.when(flag_bit_set(flag, 0x40), F.lit("R1"))
        .when(flag_bit_set(flag, 0x80), F.lit("R2"))
        .otherwise(F.lit("R1"))
    )


def nterminal_softclip(cigar: Column | str) -> Column:
    """Leading soft-clip length: ^(\\d+)S -> int (0 when absent)."""
    c = F.col(cigar) if isinstance(cigar, str) else cigar
    return F.coalesce(
        F.nullif(F.regexp_extract(c, r"^(\d+)S", 1), F.lit("")), F.lit("0")
    ).cast("int")


def cterminal_softclip(cigar: Column | str) -> Column:
    """Trailing soft-clip length: (\\d+)S$ -> int (0 when absent)."""
    c = F.col(cigar) if isinstance(cigar, str) else cigar
    return F.coalesce(
        F.nullif(F.regexp_extract(c, r"(\d+)S$", 1), F.lit("")), F.lit("0")
    ).cast("int")


def cigar_tokens(cigar: Column | str) -> Column:
    """Full tokenization '(\\d+)([MIDNSHP=XB])' -> array of structs
    (n int, op string)."""
    c = F.col(cigar) if isinstance(cigar, str) else cigar
    toks = F.regexp_extract_all(c, F.lit(r"([0-9]+[MIDNSHP=XB])"), 1)
    return F.transform(
        toks,
        lambda t: F.struct(
            F.translate(t, "MIDNSHP=XB", "").cast("int").alias("n"),
            F.substring(t, -1, 1).alias("op"),
        ),
    )


def cigar_event_total(cigar: Column | str, ops: str) -> Column:
    """Total bases across the given CIGAR event classes (e.g. 'DN')."""
    return F.aggregate(
        F.filter(cigar_tokens(cigar), lambda t: t["op"].isin(list(ops))),
        F.lit(0),
        lambda acc, t: acc + t["n"],
    )
