"""Property tests for the round-10 vectorized Arrow kernels
(pipeline/similarity._seq_dot_np / _seq_norm_np and the ivf_assign
argmin loop).

The kernels' correctness claim is BIT-equality with the HOF/SQL
expression forms, which reduce to a left-associated sequential IEEE
float64 fold ((0.0 + x0) + x1) + ... . The fixed-data Spark pins live
in tests/test_round10_ops.py; these tests attack the claim with
hypothesis-generated adversarial floats (mixed magnitudes, negatives,
zeros, values whose addition order genuinely changes the result) and
compare against a pure-Python scalar fold — no Spark session, so they
run hundreds of examples in milliseconds.

If numpy ever changed the kernels to pairwise/BLAS summation (np.dot,
.sum()), these tests fail on the first mixed-magnitude example.
"""

import math
import struct

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from seqtables_spark.pipeline.similarity import _seq_dot_np, _seq_norm_np

# float32-representable values across magnitudes; the fold order only
# matters when magnitudes differ, so spread exponents widely
f32 = st.floats(
    min_value=-1e6,
    max_value=1e6,
    allow_nan=False,
    allow_infinity=False,
    width=32,
)
vec = st.lists(f32, min_size=1, max_size=96)


def scalar_seq_dot(a, b):
    """The reference semantics: left-associated float64 fold, exactly
    what the HOF aggregate() and DuckDB list_reduce execute."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(np.float64(np.float32(x))) * float(
            np.float64(np.float32(y))
        )
    return acc


def bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


@given(st.data())
@settings(max_examples=300, deadline=None)
def test_seq_dot_bit_equals_scalar_fold(data):
    n = data.draw(st.integers(min_value=1, max_value=96))
    rows = data.draw(st.integers(min_value=1, max_value=5))
    A = np.asarray(
        [[data.draw(f32) for _ in range(n)] for _ in range(rows)],
        dtype=np.float32,
    )
    B = np.asarray(
        [[data.draw(f32) for _ in range(n)] for _ in range(rows)],
        dtype=np.float32,
    )
    got = _seq_dot_np(A, B)
    for r in range(rows):
        want = scalar_seq_dot(A[r], B[r])
        assert bits(float(got[r])) == bits(want), (
            f"row {r}: kernel {float(got[r])!r} != fold {want!r}"
        )


@given(vec)
@settings(max_examples=300, deadline=None)
def test_seq_norm_bit_equals_scalar_fold(xs):
    A = np.asarray([xs], dtype=np.float32)
    got = float(_seq_norm_np(A)[0])
    acc = 0.0
    for x in xs:
        v = float(np.float64(np.float32(x)))
        acc = acc + v * v
    want = math.sqrt(acc)
    assert bits(got) == bits(want)


def test_fold_order_genuinely_matters_and_kernel_is_forward():
    """Sanity for the whole file: addition order REALLY changes the
    result in this magnitude regime (otherwise bit-equality tests
    prove nothing), and the kernel computes the FORWARD left fold.
    With x = [1, 1e16, -1e16] (1e16 > 2^53, so +1 is absorbed):
      forward:  ((0+1) + 1e16) - 1e16 = 0.0
      reversed: ((0-1e16) + 1e16) + 1 = 1.0
    """
    ones = np.ones((1, 3), dtype=np.float32)
    fwd = np.asarray([[1.0, 1e16, -1e16]], dtype=np.float32)
    rev = fwd[:, ::-1].copy()
    assert float(_seq_dot_np(fwd, ones)[0]) == 0.0
    assert float(_seq_dot_np(rev, ones)[0]) == 1.0
    assert float(_seq_dot_np(fwd, ones)[0]) == scalar_seq_dot(fwd[0], ones[0])


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_ivf_assign_argmin_first_tie_wins(data):
    """ivf_assign's batch argmin (the REAL kernel code —
    pipeline/similarity._ivf_argmin_np, shared with the Arrow assign
    path; round-11 ADVICE fix replaced the hand-copied replay) updates
    best only on STRICT improvement (acc < best_d) — ties keep the
    LOWEST centroid index, matching the SQL argmin's deterministic
    first-match rule. Checked against a scalar reference on small
    instances (duplicate centroids force exact ties)."""
    from seqtables_spark.pipeline.similarity import _ivf_argmin_np

    dim = data.draw(st.integers(min_value=1, max_value=8))
    n_c = data.draw(st.integers(min_value=1, max_value=5))
    cents = [[data.draw(f32) for _ in range(dim)] for _ in range(n_c)]
    if n_c > 1 and data.draw(st.booleans()):
        cents[-1] = list(cents[0])  # exact duplicate -> guaranteed tie
    v = np.asarray([[data.draw(f32) for _ in range(dim)]], dtype=np.float32)

    C = np.asarray(cents, dtype=np.float64)
    vv = v.astype(np.float64)
    best_i = _ivf_argmin_np(C, vv)

    # scalar reference: sequential-fold distance per centroid, first
    # strictly-smaller wins
    ref_best, ref_i = None, 0
    for ci in range(n_c):
        acc = 0.0
        for j in range(dim):
            t = float(vv[0, j]) - float(C[ci, j])
            acc = acc + t * t
        if ref_best is None or acc < ref_best:
            ref_best, ref_i = acc, ci
    assert int(best_i[0]) == ref_i
