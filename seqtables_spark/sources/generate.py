"""In-silico sequence generators (reference S9).

Parity targets (file:line in /root/reference):
  - generate_sequence:   seqtables/core/utils/insilica_sequences.py:9-27
  - generate_library +   insilica_sequences.py:30-117 (site saturation
    generate_error_prone  first, then error-prone, positions 1-based)
  - add_quality_scores:  insilica_sequences.py:139-233 (log-falling
    mean curve, r1 = flipped, normal noise, clip to [min,max])
  - randomly_add_indels: insilica_sequences.py:236-305
  - create_scratch_data: seqtables/io/scratch_data.py:5-28

The reference draws from the global numpy RNG, so its exact outputs
are irreproducible by design; what we preserve is the *distributional
contract* (which letters are allowed where, the mean-quality curve,
the order site-saturation -> error-prone). Randomness here is a
portable deterministic hash u(seed, read, pos) = md5-derived uniform
in [0,1) - the same value in Spark, DuckDB, and pure Python - so
every generated dataset is bit-reproducible and oracle-checkable.

Scale notes. Generation is spark.range + per-row expressions: zero
shuffle, zero UDFs, embarrassingly parallel at any scale. A 100 TB
synthetic corpus is range(N) with whatever parallelism the sink
wants; nothing is ever collected.

Known divergences from the reference, on purpose:
  - add_quality_scores replicates the DOCUMENTED intent (normal noise
    around the log curve). The reference additionally casts the raw
    standard normals to uint8 *before* scaling
    (insilica_sequences.py:194 `.astype(np.uint8)`), which wraps
    negative draws to ~255 and truncates the rest - an RNG-dependent
    artifact no oracle can reproduce.
  - randomly_add_indels draws the consecutive-insertion length from a
    truncated geometric (same mean knob) instead of numpy's Poisson.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..pipeline.hashing import HASH_PRIME, portable_string_hash

NT_CHARS = "ACTG"

# IUPAC degenerate base -> allowed concrete bases (alphabets.py holds
# the NT/AA alphabets; this map mirrors the reference's degen_to_base
# at seqtables/core/utils/seq_table_util.py used by generate_library)
DEGEN_TO_BASES = {
    "A": "A", "C": "C", "G": "G", "T": "T",
    "R": "AG", "Y": "CT", "S": "GC", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}


def _u01(seed: int | str, *parts: Column) -> Column:
    """Portable uniform in [0,1): md5-derived 31-bit hash of
    'seed:part:part:...' over HASH_PRIME. Identical in DuckDB via
    CAST(('0x'||substring(md5(x),1,15)) AS BIGINT) % p."""
    key = F.concat_ws(":", F.lit(str(seed)), *[p.cast("string") for p in parts])
    return portable_string_hash(key).cast("double") / F.lit(float(HASH_PRIME))


def u01_py(seed: int | str, *parts) -> float:
    """The same uniform, computed driver-side (for scaffolds and
    tests): bit-identical to _u01."""
    key = ":".join([str(seed)] + [str(p) for p in parts])
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % HASH_PRIME
    return h / float(HASH_PRIME)


def _pick_char(u: Column, chars: str, p_bases: list[float] | None = None) -> Column:
    """chars[k] with P(k) = p_bases[k] (uniform when None) - linear
    when-chain over the (tiny) alphabet; uniform case is one substr."""
    k = len(chars)
    assert k > 0
    if p_bases is None:
        idx = F.least(F.floor(u * k), F.lit(k - 1)).cast("int")
        return F.lit(chars).substr(idx + F.lit(1), F.lit(1))
    assert len(p_bases) == k
    total = float(sum(p_bases))
    cum = 0.0
    expr = None
    for i, p in enumerate(p_bases[:-1]):
        cum += p / total
        cond = u < cum
        expr = F.when(cond, F.lit(chars[i])) if expr is None else expr.when(cond, F.lit(chars[i]))
    return F.lit(chars[-1]) if expr is None else expr.otherwise(F.lit(chars[-1]))


def generate_sequences(
    spark: SparkSession,
    num_seqs: int,
    seq_len: int = 100,
    chars: str = NT_CHARS,
    p_bases: list[float] | None = None,
    seed: int = 0,
    start_id: int = 1,
) -> DataFrame:
    """Random sequences (reference generate_sequence, vectorized over
    N reads): DF(read_id, seq). char(read, j) = chars drawn by the
    portable uniform u(seed, read, j)."""
    base = spark.range(start_id, start_id + num_seqs).select(
        F.col("id").alias("read_id")
    )
    ch = lambda j: _pick_char(_u01(seed, F.col("read_id"), j), chars, p_bases)  # noqa: E731
    seq = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(seq_len)), ch), ""
    )
    return base.select("read_id", seq.alias("seq"))


def generate_sequence_py(
    seq_len: int = 100,
    chars: str = NT_CHARS,
    p_bases: list[float] | None = None,
    seed: int = 0,
    read_id: int = 0,
) -> str:
    """Driver-side twin of generate_sequences for one sequence -
    bit-identical letters (used to make deterministic scaffolds)."""
    out = []
    k = len(chars)
    if p_bases is not None:
        total = float(sum(p_bases))
        cum, cums = 0.0, []
        for p in p_bases:
            cum += p / total
            cums.append(cum)
    for j in range(1, seq_len + 1):
        u = u01_py(seed, read_id, j)
        if p_bases is None:
            out.append(chars[min(int(u * k), k - 1)])
        else:
            idx = next((i for i, c in enumerate(cums) if u < c), k - 1)
            out.append(chars[idx])
    return "".join(out)


def generate_library(
    spark: SparkSession,
    scaffold_seq: str,
    num_seqs: int,
    error_prone_rate: float = 0.0,
    no_error_prone_pos: list[int] | tuple[int, ...] = (),
    ss_pos: list[int] | tuple[int, ...] = (),
    site_saturation: dict | None = None,
    default_site_saturation: str = "N",
    seed: int = 0,
    start_id: int = 1,
) -> DataFrame:
    """Mutagenesis library from a wildtype scaffold (reference
    generate_library): site saturation FIRST, then error-prone, both
    1-based positions. site_saturation maps position -> degenerate
    base code (or list of (letter, weight)); error-prone draws
    uniformly from ACTG (possibly the same letter - reference
    semantics, insilica_sequences.py:127). Returns DF(read_id, seq).
    """
    site_saturation = dict(site_saturation or {})
    ss_all = sorted(set(ss_pos) | set(site_saturation.keys()))
    for p in ss_all:
        site_saturation.setdefault(p, default_site_saturation)
    no_ep = set(int(p) for p in no_error_prone_pos)
    L = len(scaffold_seq)

    base = spark.range(start_id, start_id + num_seqs).select(
        F.col("id").alias("read_id")
    )
    rid = F.col("read_id")

    def char_at(j: Column) -> Column:
        wt = F.lit(scaffold_seq).substr(j, F.lit(1))
        expr = wt
        # site saturation (applied first)
        for p, spec in site_saturation.items():
            if isinstance(spec, str):
                allowed = DEGEN_TO_BASES[spec]
                pick = _pick_char(_u01(f"{seed}:ss", rid, F.lit(p)), allowed)
            else:
                letters = "".join(l for l, _ in spec)
                weights = [w for _, w in spec]
                pick = _pick_char(_u01(f"{seed}:ss", rid, F.lit(p)), letters, weights)
            expr = F.when(j == F.lit(int(p)), pick).otherwise(expr)
        # error-prone on top (skipping protected positions)
        if error_prone_rate:
            hit = _u01(f"{seed}:ep", rid, j) < F.lit(float(error_prone_rate))
            if no_ep:
                protected = j.isin([int(p) for p in no_ep])
                hit = hit & ~protected
            mut = _pick_char(_u01(f"{seed}:mut", rid, j), NT_CHARS)
            expr = F.when(hit, mut).otherwise(expr)
        return expr

    seq = F.array_join(F.transform(F.sequence(F.lit(1), F.lit(L)), char_at), "")
    return base.select("read_id", seq.alias("seq"))


def quality_mean_curve(
    seq_len: int,
    read_type: str = "r1",
    starting_mean_quality: int = 36,
    ending_mean_quality: int = 15,
) -> list[int]:
    """The reference's log-falling per-position mean quality
    (insilica_sequences.py:208-216): m(j0) = floor(a*ln(j0+1)+b) with
    b = end, a = (end-start)/ln(1/(1+L)); r1 reads are the flipped
    curve (start high, end low)."""
    b = float(ending_mean_quality)
    a = (ending_mean_quality - starting_mean_quality) / math.log(1.0 / (1.0 + seq_len))
    means = [int(a * math.log(j0 + 1.0) + b) for j0 in range(seq_len)]
    if read_type == "r1":
        means = means[::-1]
    elif read_type != "r2":
        raise ValueError(f"invalid read type: {read_type}")
    return means


def add_quality_scores(
    df: DataFrame,
    seq_len: int,
    read_type: str = "r1",
    min_quality: int = 0,
    max_quality: int = 40,
    starting_mean_quality: int = 36,
    ending_mean_quality: int = 15,
    std: float = 5.0,
    phred_adjust: int = 33,
    seed: int = 0,
    id_col: str = "read_id",
) -> DataFrame:
    """Synthetic phred strings around the reference's log-falling mean
    curve: q(read, j) = clip(round(mean(j) + std*z), min, max) with z
    a Box-Muller standard normal from two portable uniforms. Adds a
    `qual` column of phred+33 characters."""
    means = quality_mean_curve(
        seq_len, read_type, starting_mean_quality, ending_mean_quality
    )
    mean_arr = F.array(*[F.lit(m) for m in means])
    rid = F.col(id_col)

    def qchar(j: Column) -> Column:
        # u1 in (0,1]: shift the 31-bit hash by 1 so ln() is finite
        h1 = portable_string_hash(
            F.concat_ws(":", F.lit(f"{seed}:q1"), rid.cast("string"), j.cast("string"))
        )
        u1 = (h1.cast("double") + F.lit(1.0)) / F.lit(float(HASH_PRIME + 1))
        u2 = _u01(f"{seed}:q2", rid, j)
        z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
        m = F.element_at(mean_arr, j).cast("double")
        q = F.round(m + F.lit(float(std)) * z).cast("int")
        q = F.greatest(F.lit(int(min_quality)), F.least(F.lit(int(max_quality)), q))
        return F.char(q + F.lit(int(phred_adjust)))

    qual = F.array_join(F.transform(F.sequence(F.lit(1), F.lit(seq_len)), qchar), "")
    return df.withColumn("qual", qual)


def randomly_add_indels(
    df: DataFrame,
    insertion_rate: float = 0.001,
    deletion_rate: float = 0.01,
    expected_cons_ins: int = 1,
    max_ins: int = 10,
    avg_ins_qual: int = 20,
    ins_qual_std: float = 3.0,
    phred_adjust: int = 33,
    seed: int = 0,
    id_col: str = "read_id",
    seq_col: str = "seq",
    qual_col: str | None = "qual",
) -> DataFrame:
    """Deterministic indel injection (reference randomly_add_indels):
    each position is deleted with P=deletion_rate; with
    P=insertion_rate a run of g in [1, max_ins] bases (truncated
    geometric with mean ~expected_cons_ins+1) is appended AFTER the
    position, with qualities ~ N(avg_ins_qual, std) clipped to
    [0, 45]. Rewrites seq (and qual when present) per row - a pure
    projection, no shuffle."""
    rid = F.col(id_col)
    n_seq = F.length(F.col(seq_col))
    p_geo = 1.0 / (1.0 + float(expected_cons_ins))  # mean (1-p)/p ~ expected

    def ins_len(j: Column) -> Column:
        u = _u01(f"{seed}:g", rid, j)
        # truncated geometric: 1 + floor(ln(1-u)/ln(1-p)), capped
        g = F.lit(1) + F.floor(
            F.log(F.lit(1.0) - u) / F.lit(math.log(1.0 - p_geo))
        ).cast("int")
        return F.least(g, F.lit(int(max_ins)))

    def ins_seq(j: Column) -> Column:
        g = ins_len(j)
        pick = lambda t: _pick_char(_u01(f"{seed}:il", rid, j * F.lit(64) + t), NT_CHARS)  # noqa: E731
        return F.array_join(F.transform(F.sequence(F.lit(1), g), pick), "")

    def ins_qual(j: Column) -> Column:
        g = ins_len(j)

        def qc(t: Column) -> Column:
            h1 = portable_string_hash(
                F.concat_ws(
                    ":", F.lit(f"{seed}:iq1"), rid.cast("string"),
                    (j * F.lit(64) + t).cast("string"),
                )
            )
            u1 = (h1.cast("double") + F.lit(1.0)) / F.lit(float(HASH_PRIME + 1))
            u2 = _u01(f"{seed}:iq2", rid, j * F.lit(64) + t)
            z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * math.pi) * u2)
            q = F.round(F.lit(float(avg_ins_qual)) + F.lit(float(ins_qual_std)) * z).cast("int")
            q = F.greatest(F.lit(0), F.least(F.lit(45), q))
            return F.char(q + F.lit(int(phred_adjust)))

        return F.array_join(F.transform(F.sequence(F.lit(1), g), qc), "")

    deleted = lambda j: _u01(f"{seed}:del", rid, j) < F.lit(float(deletion_rate))  # noqa: E731
    inserted = lambda j: _u01(f"{seed}:ins", rid, j) < F.lit(float(insertion_rate))  # noqa: E731

    def piece(get_base, get_ins):
        def f(j: Column) -> Column:
            kept = F.when(deleted(j), F.lit("")).otherwise(get_base(j))
            ins = F.when(inserted(j), get_ins(j)).otherwise(F.lit(""))
            return F.concat(kept, ins)
        return f

    seq_piece = piece(
        lambda j: F.col(seq_col).substr(j, F.lit(1)), ins_seq
    )
    new_seq = F.array_join(F.transform(F.sequence(F.lit(1), n_seq), seq_piece), "")
    out = df.withColumn("_new_seq", new_seq)
    if qual_col is not None and qual_col in df.columns:
        qual_piece = piece(
            lambda j: F.col(qual_col).substr(j, F.lit(1)), ins_qual
        )
        new_qual = F.array_join(
            F.transform(F.sequence(F.lit(1), n_seq), qual_piece), ""
        )
        out = out.withColumn(qual_col, new_qual)
    return out.withColumn(seq_col, F.col("_new_seq")).drop("_new_seq")


def create_scratch_data(
    spark: SparkSession,
    num_seqs: int,
    seq_len: int = 300,
    ss_pos: list[int] | tuple[int, ...] = (),
    error_prone_rate: float = 0.01,
    seed: int = 0,
) -> tuple[DataFrame, str]:
    """Reference create_scratch_data (scratch_data.py:5-28): a
    deterministic wildtype + site-saturated error-prone library with
    r1 quality curves. Returns (DF(read_id, seq, qual), wildtype)."""
    wt = generate_sequence_py(seq_len=seq_len, seed=seed, read_id=0)
    lib = generate_library(
        spark, wt, num_seqs,
        error_prone_rate=error_prone_rate, ss_pos=ss_pos, seed=seed,
    )
    return add_quality_scores(lib, seq_len, read_type="r1", seed=seed), wt
