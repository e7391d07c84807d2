"""Site-saturation-library setup ops (reference library_utils.py).

The reference's workflow (library_utils.py:239-306): parse a library
design FASTA into its named components (`initialize_sequences`,
library_utils.py:239-255), then locate the (degenerate-base) library
amplicon inside the wildtype sequence and derive the expected-mutation
masks (`get_read_alignment_details`, library_utils.py:258-306).

Three entry points:

* ``initialize_sequences`` — driver-side FASTA parse (a design file is
  six short records; no cluster involvement warranted).
* ``get_read_alignment_details`` — scalar parity function, same
  returns as the reference.
* ``library_alignment_details`` — the Spark-first formulation: a
  whole TABLE of (id, wildtype, library) designs aligned at once,
  emitting one row per wildtype nucleotide position with the
  expected-mutation masks. Alignment search and mask derivation are
  pure built-in higher-order functions (no UDF): per row the work is
  O(|wildtype| * |library|) inside whole-stage codegen and every
  output column is row-local — a shuffle-free projection that scales
  to millions of designs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from ..alphabets import DEGENERATE_MAP
from ..functions.dna import seq_to_regex

_FASTA_KEYS = (
    "5_3_fwd_primer",
    "3_5_rev_primer",
    "5_3_N_dialout",
    "3_5_C_dialout",
    "amplified_seq",
    "WTSEQ",
)


def parse_fasta_text(text: str) -> dict[str, str]:
    """Minimal FASTA parse: {record id: uppercased sequence}."""
    records: dict[str, str] = {}
    name = None
    chunks: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if name is not None:
                records[name] = "".join(chunks).upper()
            name = line[1:].split()[0]
            chunks = []
        elif name is not None:
            chunks.append(line)
    if name is not None:
        records[name] = "".join(chunks).upper()
    return records


def initialize_sequences(fasta: str):
    """Reference initialize_sequences (library_utils.py:239-255): parse
    the library-design FASTA into (fwd_primer, rev_primer, dialout_n,
    dialout_c, seq_of_interest, actual_seq). `fasta` may be a path or
    the raw FASTA text."""
    if "\n" not in fasta and not fasta.startswith(">"):
        with open(fasta) as f:
            text = f.read()
    else:
        text = fasta
    params = parse_fasta_text(text)
    return tuple(params.get(k) for k in _FASTA_KEYS)


def get_read_alignment_details(actual_seq: str, library_seq: str):
    """Reference get_read_alignment_details (library_utils.py:258-306),
    scalar form: locate `library_seq` (may contain degenerate IUPAC
    bases) inside `actual_seq` via regex expansion, and return

    (expected_mutations_nt, expected_mutations_aa, start_of_alignment,
     wt_seq_substring)

    where expected_mutations_nt[i] = 1 iff wildtype nt position i+1 is
    covered by a degenerate library base, expected_mutations_aa[r] = 1
    iff residue r+1 (len(actual)//3 residues, frame 1) contains such a
    position, start_of_alignment is 0-based, and wt_seq_substring is
    the wildtype slice under the amplicon.

    The reference searches inside seq_to_regex(actual_seq); for the
    documented valid input (WTSEQ free of degenerate codes,
    library_utils.py:247) that expansion is the identity, so we search
    the wildtype directly — identical results without the reference's
    undefined behavior when WTSEQ does contain degenerate codes.
    """
    m = re.search(seq_to_regex(library_seq), actual_seq)
    if not m:
        raise ValueError("library_seq does not align inside actual_seq")
    start, end = m.span()
    nt_mask = [0] * len(actual_seq)
    aa_mask = [0] * (len(actual_seq) // 3)
    for ind, b in enumerate(library_seq):
        wt_pos = ind + 1 + start  # 1-based wildtype position
        if b not in ("A", "C", "T", "G"):
            nt_mask[wt_pos - 1] = 1
            res = (wt_pos - 1) // 3  # frame-1 residue, 0-based
            if res < len(aa_mask):
                aa_mask[res] = 1
    return nt_mask, aa_mask, start, actual_seq[start:end]


def _degen_expand_map() -> Column:
    """IUPAC code -> allowed-bases string as a map literal."""
    items: list[Column] = []
    for code, bases in DEGENERATE_MAP.items():
        items.append(F.lit(code))
        items.append(F.lit(bases))
    return F.create_map(*items)


def library_alignment_details(
    designs: DataFrame,
    id_col: str = "lib_id",
    actual_col: str = "actual_seq",
    library_col: str = "library_seq",
) -> DataFrame:
    """Distributed get_read_alignment_details over a design table.

    DF(id, actual_seq, library_seq) -> one row per wildtype position:

    (id, nt_pos [1-based], wt_base, start_aln [0-based], wt_sub,
     in_amplicon, expected_mut_nt, aa_pos, codon_pos, expected_mut_aa)

    Rows where no alignment exists are dropped (the scalar form
    raises; a relational op filters). The alignment offset is the
    FIRST (minimum) position where every library base
    degenerate-matches the wildtype — computed row-locally with
    nested higher-order functions, no UDF. The per-codon
    expected_mut_aa is ALSO row-local (an exists() over the codon's
    three nucleotides against the library string each row already
    carries), so the whole operator is a shuffle-free projection:
    at any scale it is scan → explode → project, no exchange.
    """
    expand = _degen_expand_map()
    act = F.col("_act")
    lib = F.col("_lib")
    lib_len = F.length(lib)
    act_len = F.length(act)

    # The leftmost degenerate-matching offset, found by ONE JVM regex
    # scan per row: each library char becomes its allowed-base
    # character class ([AG] for R, a never-matching (?!) for a char
    # outside the IUPAC map - the old all-offsets formulation matched
    # nowhere for such rows, so the row must drop, not error), and
    # regexp_instr returns the 1-based leftmost match. This replaced a
    # filter(sequence, forall(...)) nested-HOF search: higher-order
    # functions evaluate INTERPRETED (outside whole-stage codegen), so
    # the O(|wt| x |lib|) per-row scan cost ~6 s at sf0.1 where the
    # compiled-regex scan costs ~0.5 s (12x; leftmost-match semantics
    # identical, pinned by the scalar-parity tests).
    base = (
        designs.select(
            F.col(id_col).alias("lib_id"),
            F.upper(F.col(actual_col)).alias("_act"),
            F.upper(F.col(library_col)).alias("_lib"),
        )
        .filter(act_len >= lib_len)
        .withColumn(
            "_re",
            F.concat_ws(
                "",
                F.transform(
                    F.filter(F.split(lib, ""), lambda ch: ch != ""),
                    lambda ch: F.when(
                        F.length(F.element_at(expand, ch)) > 1,
                        F.concat(F.lit("["), F.element_at(expand, ch), F.lit("]")),
                    ).otherwise(F.coalesce(F.element_at(expand, ch), F.lit("(?!)"))),
                ),
            ),
        )
        .withColumn("_ri", F.expr("regexp_instr(_act, _re)"))
        .withColumn(
            "start_aln", F.when(F.col("_ri") > 0, F.col("_ri") - 1)
        )
        .filter(F.col("start_aln").isNotNull())
        .withColumn("wt_sub", act.substr(F.col("start_aln") + 1, lib_len))
        .drop("_re", "_ri")
    )
    pos = base.select(
        "lib_id",
        "start_aln",
        "wt_sub",
        act_len.alias("_alen"),
        lib_len.alias("_llen"),
        "_act",
        "_lib",
        F.explode(F.sequence(F.lit(1), act_len)).alias("nt_pos"),
    )
    in_amp = (F.col("nt_pos") > F.col("start_aln")) & (
        F.col("nt_pos") <= F.col("start_aln") + F.col("_llen")
    )
    lib_base = F.col("_lib").substr(
        (F.col("nt_pos") - F.col("start_aln")).cast("int"), F.lit(1)
    )
    mut_nt = F.when(
        in_amp & ~lib_base.isin("A", "C", "G", "T"), F.lit(1)
    ).otherwise(F.lit(0))
    aa_pos = F.floor((F.col("nt_pos") - 1) / 3) + 1
    codon_start = (aa_pos - 1) * 3 + 1
    start, llen = F.col("start_aln"), F.col("_llen")
    # row-local per-codon mask: any of the codon's three nucleotides
    # degenerate in the library (no window — every row carries _lib);
    # residues past len//3 (trailing partial codon) are outside the
    # reference's fixed-size aa mask -> 0. The three positions are an
    # UNROLLED OR, not exists() over a sequence: higher-order
    # functions evaluate interpreted, and this projection runs once
    # per exploded nucleotide row.
    def _degen_at(q):
        return (
            (q > start)
            & (q <= start + llen)
            & ~F.col("_lib")
            .substr((q - start).cast("int"), F.lit(1))
            .isin("A", "C", "G", "T")
        )

    mut_aa = F.when(
        aa_pos <= F.floor(F.col("_alen") / 3),
        (
            _degen_at(codon_start)
            | _degen_at(codon_start + 1)
            | _degen_at(codon_start + 2)
        ).cast("int"),
    ).otherwise(F.lit(0))
    return pos.select(
        "lib_id",
        "nt_pos",
        F.col("_act").substr(F.col("nt_pos").cast("int"), F.lit(1)).alias("wt_base"),
        "start_aln",
        "wt_sub",
        in_amp.cast("int").alias("in_amplicon"),
        mut_nt.alias("expected_mut_nt"),
        aa_pos.alias("aa_pos"),
        ((F.col("nt_pos") - 1) % 3).alias("codon_pos"),
        mut_aa.alias("expected_mut_aa"),
    )
