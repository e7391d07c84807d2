"""pLogo statistic (O'Shea et al. 2013, Nat Methods 10:1211-1212).

Parity target: get_plogo /root/reference/seqtables/core/
seq_logo.py:332-456 (facade seqtables.py:1305-1313): per
(position, letter) the binomial log-odds
    -(log10 sf(k-1; N, p) - log10 cdf(k; N, p))
where k = observed count, N = reads, p = background frequency of the
letter; the Bonferroni significance line is log10(a'/(1-a')) with
a' = alpha / (number of (position,letter) cells).

The binomial tails need scipy - the one place the reference's math
has no Spark builtin (SURVEY 2.9). Implemented as a vectorized
pandas UDF over the (position, letter) count table, which is TINY
(positions x alphabet rows) regardless of read count, so the Python
hop is off the hot path at any scale.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

try:
    from scipy.stats import binom  # noqa: F401

    HAVE_SCIPY = True
except Exception:
    HAVE_SCIPY = False


def _binom_log_tails(ks, ns, ps):
    """log10 sf(k-1; n, p) and log10 cdf(k; n, p) without scipy.

    The pmf is evaluated in log space with math.lgamma and reduced by
    log-sum-exp cumulatives. One pmf vector is computed per distinct
    (n, p) - in pLogo all rows share one (N, background p), so this is
    a single O(N) pass regardless of row count."""
    import numpy as np

    ks = np.asarray(ks, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    ps = np.asarray(ps, dtype=np.float64)
    log_sf = np.empty(len(ks), dtype=np.float64)
    log_cdf = np.empty(len(ks), dtype=np.float64)
    lgamma = np.vectorize(math.lgamma, otypes=[np.float64])

    def _cum_logsumexp(v):
        out = np.empty_like(v)
        acc = -np.inf
        for i, x in enumerate(v):
            hi = max(acc, x)
            acc = hi + math.log(math.exp(acc - hi) + math.exp(x - hi))
            out[i] = acc
        return out

    for n, p in {(int(n), float(p)) for n, p in zip(ns, ps)}:
        if p <= 0.0 or p >= 1.0:
            # degenerate background (a letter absent from / saturating
            # the background set): the distribution is a point mass.
            # math.log(0) would raise inside the executor; emit the
            # exact limit instead.
            mask = (ns == n) & (ps == p)
            k = ks[mask]
            if p <= 0.0:
                # X == 0 surely: sf(k-1) = 0 unless k <= 0; cdf(k) = 1
                log_sf[mask] = np.where(k <= 0, 0.0, -np.inf)
                log_cdf[mask] = 0.0
            else:
                # X == n surely: sf(k-1) = 1; cdf(k) = 0 unless k >= n
                log_sf[mask] = 0.0
                log_cdf[mask] = np.where(k >= n, 0.0, -np.inf)
            continue
        i = np.arange(n + 1, dtype=np.float64)
        logpmf = (
            lgamma(n + 1.0) - lgamma(i + 1.0) - lgamma(n - i + 1.0)
            + i * math.log(p) + (n - i) * math.log1p(-p)
        )
        cum_lo = _cum_logsumexp(logpmf)            # log P(X <= k)
        cum_hi = _cum_logsumexp(logpmf[::-1])[::-1]  # log P(X >= k)
        mask = (ns == n) & (ps == p)
        k = ks[mask]
        log_sf[mask] = cum_hi[np.clip(k, 0, n)] / math.log(10)
        log_cdf[mask] = cum_lo[np.clip(k, 0, n)] / math.log(10)
    return log_sf, log_cdf


def get_plogo(
    cells: DataFrame,
    background_freq: DataFrame | None = None,
    positions: Sequence[int] | None = None,
    alpha: float = 0.01,
    seq_type: str = "NT",
    use_scipy: bool = False,
) -> DataFrame:
    """Returns DF(position, base, k, n, p_bg, plogo) plus a
    `significance` column holding the Bonferroni line (constant).

    background_freq: optional DF(base, p_bg); defaults to the unbiased
    1/4 (NT) or 1/20 (AA) frequency (seq_logo.py:327-329).
    """
    from .distribution import seq_dist

    counts = seq_dist(cells, "counts", positions=positions)
    totals = counts.groupBy("position").agg(F.sum("cnt").alias("n"))
    joined = counts.join(totals, "position")
    if background_freq is None:
        const = 1.0 / (20 if seq_type == "AA" else 4)
        joined = joined.withColumn("p_bg", F.lit(const))
    else:
        joined = joined.join(F.broadcast(background_freq), "base", "left").withColumn(
            "p_bg", F.coalesce(F.col("p_bg"), F.lit(0.0))
        )

    @F.pandas_udf(DoubleType())
    def _plogo(k: pd.Series, n: pd.Series, p: pd.Series) -> pd.Series:
        import numpy as np

        # log10 odds of over- vs under-representation, capped like the
        # reference (which searches a finite fill for +/-inf). Default
        # path is the lgamma/log-sum-exp recurrence: deterministic,
        # dependency-free, and what the DuckDB oracle reproduces
        # (~1e-13 agreement); scipy's betainc tails are opt-in only -
        # preferring them when importable would silently change the
        # oracle-matched values by environment.
        if use_scipy and HAVE_SCIPY:
            from scipy.stats import binom as _b

            sf = _b.logsf(k - 1, n, p) / math.log(10)
            cdf = _b.logcdf(k, n, p) / math.log(10)
        else:
            sf, cdf = _binom_log_tails(k, n, p)
        out = -(np.asarray(sf) - np.asarray(cdf))
        out = np.clip(out, -350.0, 350.0)
        return pd.Series(out)

    n_cells = counts.count()
    alpha_prime = alpha / max(n_cells, 1)
    significance = math.log10(alpha_prime / (1 - alpha_prime))
    return joined.select(
        "position",
        "base",
        F.col("cnt").alias("k"),
        "n",
        "p_bg",
        _plogo(F.col("cnt").cast("double"), F.col("n").cast("double"), F.col("p_bg")).alias("plogo"),
        F.lit(significance).alias("significance"),
    )
