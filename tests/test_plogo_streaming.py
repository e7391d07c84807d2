"""pLogo statistic (numpy binomial tails) and Structured Streaming
ingest parity with the batch aggregation."""

import math

import pytest

from pyspark.sql import functions as F

from seqtables_spark import from_list
from seqtables_spark.operators.plogo import _binom_log_tails, get_plogo


def exact_tails(n, p, k):
    from math import comb, log10

    sf = sum(comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k, n + 1))
    cdf = sum(comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(0, k + 1))
    return log10(sf), log10(cdf)


def test_binom_log_tails_vs_exact():
    ks, ns, ps = [0, 3, 10, 250], [10, 10, 10, 500], [0.25] * 4
    sf, cdf = _binom_log_tails(ks, ns, ps)
    for i, (k, n, p) in enumerate(zip(ks, ns, ps)):
        esf, ecdf = exact_tails(n, p, k)
        assert abs(sf[i] - esf) < 1e-12
        assert abs(cdf[i] - ecdf) < 1e-12


def test_plogo_end_to_end(spark):
    # 4 reads, all 'A' at position 1: strong over-representation vs 1/4
    st = from_list(spark, ["AC", "AC", "AC", "AT"])
    rows = get_plogo(st.cells(with_qual=False)).collect()
    by = {(r["position"], r["base"]): r for r in rows}
    a1 = by[(1, "A")]
    assert a1["k"] == 4 and a1["n"] == 4 and a1["p_bg"] == 0.25
    # -(log10 P(X>=4) - log10 P(X<=4)) = -(4*log10(1/4) - 0)
    expect = -4 * math.log10(0.25)
    assert abs(a1["plogo"] - expect) < 1e-9
    assert a1["significance"] < 0


def test_streaming_matches_batch(spark, tmp_path):
    from seqtables_spark.streaming.ingest import stream_reads, streaming_seq_dist

    reads = from_list(spark, ["ACGT", "ACGA", "TTTT"]).reads
    path = str(tmp_path / "reads")
    reads.write.parquet(path)

    stream = stream_reads(spark, path)
    q = streaming_seq_dist(stream, query_name="t_stream_dist")
    try:
        q.processAllAvailable()
        got = {
            (r["position"], r["base"]): r["cnt"]
            for r in spark.table("t_stream_dist").collect()
        }
    finally:
        q.stop()
    batch = {
        (r["position"], r["base"]): r["cnt"]
        for r in from_list(spark, ["ACGT", "ACGA", "TTTT"])
        .cells(with_qual=False)
        .groupBy("position", "base")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == batch
