"""Alphabets, fill characters and the codon table.

Semantics match the reference (cited for parity, not copied):
  - alphabets: /root/reference/seqtables/core/utils/alphabets.py:1-39
  - fill values 'N' (NT) / 'X' (AA), gap '-', intron '.', edge gap '$',
    null quality '!': /root/reference/seqtables/core/internals/
    constructor_ops.py:209,294 and cython/sam_to_arr.pyx:169-184
  - codon table incl. degenerate N-codons:
    /root/reference/seqtables/core/library_utils.py:8-134
"""

from __future__ import annotations

NT_LETTERS = list("ACGT")
NT_DEGENERATE = list("RYSWKMBDHVN")
NT_ALPHABET = NT_LETTERS + NT_DEGENERATE
# the 20 proper residues (reference aa_alphabet,
# core/utils/alphabets.py:2) - what |alphabet| means in bit-height
# math; AA_ALPHABET extends it with unknown/stop for letter VALIDATION
AA_LETTERS = list("ACDEFGHIKLMNPQRSTVWY")
AA_ALPHABET = AA_LETTERS + ["X", "*"]

GAP = "-"
INTRON = "."
EDGE_GAP = "$"
NULL_QUAL_CHAR = "!"  # phred 0 at the default +33 adjust
PHRED_ADJUST = 33
CIGAR_OPS = "MIDNSHP=XB"

FILL_CHAR = {"NT": "N", "AA": "X"}

# degenerate IUPAC base -> concrete bases (used by seq_to_regex)
DEGENERATE_MAP = {
    "A": "A", "C": "C", "G": "G", "T": "T",
    "R": "AG", "Y": "CT", "S": "CG", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}

_STANDARD_CODONS = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L",
    "CTT": "L", "CTC": "L", "CTA": "L", "CTG": "L",
    "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V",
    "TCT": "S", "TCC": "S", "TCA": "S", "TCG": "S",
    "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T",
    "GCT": "A", "GCC": "A", "GCA": "A", "GCG": "A",
    "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q",
    "AAT": "N", "AAC": "N", "AAA": "K", "AAG": "K",
    "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W",
    "CGT": "R", "CGC": "R", "CGA": "R", "CGG": "R",
    "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


def _build_codon_table() -> dict[str, str]:
    """Standard table plus degenerate codons: any codon containing an
    ambiguous base translates to the unique AA all its expansions share,
    else 'X' (reference behavior: N-codons that are 4-fold degenerate
    still translate, e.g. 'GGN' -> 'G'; ambiguous ones -> 'X')."""
    table = dict(_STANDARD_CODONS)
    import itertools

    bases_with_degenerate = list(DEGENERATE_MAP)
    for codon in itertools.product(bases_with_degenerate, repeat=3):
        codon_s = "".join(codon)
        if codon_s in table:
            continue
        expansions = {
            table["".join(c)]
            for c in itertools.product(*(DEGENERATE_MAP[b] for b in codon))
        }
        table[codon_s] = expansions.pop() if len(expansions) == 1 else "X"
    return table


CODON_TABLE = _build_codon_table()
