"""Portable deterministic hashing.

Spark's `hash()`/`xxhash64()` are murmur3/xxhash with Spark-specific
seeds - no other engine reproduces them, which would make every
hash-based operator (minhash, LSH banding, fingerprints) untestable
against an external oracle. Instead we derive integers from md5,
which every engine computes identically, and keep all arithmetic
inside int64 with an explicit 31-bit modulus so ANSI overflow rules
never trigger (Spark 4 runs ANSI mode by default).

portable_string_hash(s) = first 15 hex digits of md5(s) as int64,
mod 2^31-1. Downstream universal hashing uses (a*h + b) % p with
a,b < p, so products stay < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne)


def portable_string_hash(col: Column | str) -> Column:
    """Deterministic 31-bit string hash reproducible in any engine
    with md5 + hex parse (DuckDB: md5 -> substr -> hex cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % HASH_PRIME).cast(
        "long"
    )


def universal_hash(h: Column, a: int, b: int, prime: int = HASH_PRIME) -> Column:
    """(a*h + b) % prime - the classic Carter-Wegman family; h must
    already be < prime so the product fits int64."""
    return (F.lit(int(a)) * h + F.lit(int(b))) % F.lit(int(prime))


def minhash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash family.
    A fixed LCG keeps the parameters reproducible in the oracle SQL
    (they are literals there)."""
    params = []
    state = seed
    for _ in range(n_hashes):
        state = (state * 1103515245 + 12345) % (1 << 31)
        a = (state % (HASH_PRIME - 1)) + 1
        state = (state * 1103515245 + 12345) % (1 << 31)
        b = state % HASH_PRIME
        params.append((a, b))
    return params
