"""Property suites for the relational operators with independent
reference implementations: asof_join vs pandas.merge_asof,
interval_overlap_join vs the quadratic nested-loop reference, and
global_running_sum vs pandas cumsum — randomized inputs, exact
equality.

asof_join runs across randomized key/timestamp distributions, all
three directions, strict/inclusive matching, and tolerances.

One deliberate divergence is excluded by construction: when several
right rows tie on (key, right_ts), our engine documents last-in-sort
wins while pandas takes the last INPUT row; the docstring tells users
to pre-aggregate ties, and the generator dedups (key, ts) pairs on
the right side accordingly (as the oracle queries do).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from seqtables_spark.operators.asof import asof_join


def _frames(draw_left, draw_right):
    left = pd.DataFrame(
        draw_left, columns=["k", "lts", "lv"], dtype="int64"
    )
    right = pd.DataFrame(
        draw_right, columns=["k", "rts", "rv"], dtype="int64"
    )
    right = right.drop_duplicates(subset=["k", "rts"], keep="last")
    return left, right


rows_left = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=-50, max_value=50),   # ts
        st.integers(min_value=0, max_value=99),     # value
    ),
    min_size=1,
    max_size=25,
)
rows_right = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=100, max_value=199),
    ),
    min_size=0,
    max_size=25,
)


@pytest.fixture(scope="module")
def aspark():
    from seqtables_spark import get_spark

    return get_spark(app_name="asof_props", cores=4, shuffle_partitions=4)


@settings(max_examples=60, deadline=None)
@given(
    lrows=rows_left,
    rrows=rows_right,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    exact=st.booleans(),
    tol=st.sampled_from([None, 0, 3, 10]),
)
def test_asof_join_matches_pandas(aspark, lrows, rrows, direction, exact, tol):
    if tol == 0 and not exact:
        tol = None  # pandas rejects tolerance=0 with strict matching
    left, right = _frames(lrows, rrows)
    want = pd.merge_asof(
        left.sort_values(["lts", "k"]).reset_index(drop=True),
        right.sort_values(["rts", "k"]).reset_index(drop=True),
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tol,
    )
    ldf = aspark.createDataFrame(left, "k long, lts long, lv long")
    rdf = aspark.createDataFrame(right, "k long, rts long, rv long")
    got = asof_join(
        ldf,
        rdf,
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tol,
    ).toPandas()

    def norm(df, ts_col, v_col):
        out = df[["k", "lts", "lv", ts_col, v_col]].copy()
        out.columns = ["k", "lts", "lv", "mts", "mv"]
        out["mts"] = out["mts"].astype("float64")
        out["mv"] = out["mv"].astype("float64")
        return out.sort_values(["k", "lts", "lv"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        norm(got, "rts_right", "rv"), norm(want, "rts", "rv")
    )


ivals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # key
        st.integers(min_value=-30, max_value=30),    # start
        st.integers(min_value=0, max_value=25),      # length
        st.integers(min_value=0, max_value=999),     # id payload
    ),
    min_size=0,
    max_size=15,
)


@settings(max_examples=40, deadline=None)
@given(
    lrows=ivals,
    rrows=ivals,
    bin_width=st.sampled_from([1, 3, 7, 64]),
    keyed=st.booleans(),
)
def test_interval_overlap_join_matches_bruteforce(
    aspark, lrows, rrows, bin_width, keyed
):
    """interval_overlap_join vs the quadratic nested-loop reference:
    exact pair set (no misses, no duplicates from shared bins), with
    and without equality keys, across bin widths from finer-than-
    intervals to coarser-than-domain."""
    from seqtables_spark.operators.ranges import interval_overlap_join

    def df(rows):
        return aspark.createDataFrame(
            [(k, s, s + ln, i) for k, s, ln, i in rows],
            "k long, s long, e long, rid long",
        )

    on = ["k"] if keyed else []
    got = sorted(
        (r["l_rid"], r["r_rid"])
        for r in interval_overlap_join(
            df(lrows), df(rrows), "s", "e", bin_width, on=on
        ).collect()
    )
    want = sorted(
        (li, ri)
        for (lk, ls, ll, li) in lrows
        for (rk, rs, rl, ri) in rrows
        if (lk == rk or not keyed) and ls <= rs + rl and rs <= ls + ll
    )
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-20, max_value=20),  # sort key
            st.integers(min_value=-5, max_value=9),    # value
        ),
        min_size=1,
        max_size=40,
    ),
    parts=st.sampled_from([1, 2, 5]),
)
def test_global_running_sum_matches_pandas(aspark, vals, parts):
    """2-phase distributed running sum vs pandas cumsum, with a unique
    tiebreaker so the cut is deterministic, across partition counts
    (1 = the single-task window it replaces)."""
    from pyspark.sql import functions as F

    from seqtables_spark.operators.ranks import global_running_sum

    rows = [(k, i, v) for i, (k, v) in enumerate(vals)]
    df = aspark.createDataFrame(rows, "k long, uid long, v long")
    got = (
        global_running_sum(
            df, [F.col("k"), F.col("uid")], "v", num_partitions=parts
        )
        .orderBy("k", "uid")
        .collect()
    )
    ref = pd.DataFrame(rows, columns=["k", "uid", "v"]).sort_values(
        ["k", "uid"]
    )
    ref["rs"] = ref["v"].cumsum()
    assert [r["running_sum"] for r in got] == ref["rs"].tolist()
