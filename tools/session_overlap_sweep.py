"""session_overlap bin-width sweep (VERDICT r6 #3: 9.5x oracle,
unexplained constant factor).

Times the full q_session_overlap pipeline at sf0.1 for a range of
interval_overlap_join bin widths, plus a decomposition: sessionize
time (materialize sessions), replicate counts (rows x bins per
side), candidate-pair count (pre-filter join output), and final agg
time. The quadratic-pair semantics are fixed; the tunable is bin
width: too narrow -> each long session replicates to many bins (row
blowup), too wide -> every session lands in few bins so each bin is
a hot key (mini cartesian per bin). The sweep finds the knee.

Usage: python tools/session_overlap_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

SESSION_GAP_US = 30 * 60 * 1_000_000

WIDTHS = {
    "5min": 5 * 60 * 1_000_000,
    "15min": 15 * 60 * 1_000_000,
    "30min": 30 * 60 * 1_000_000,
    "1h": 60 * 60 * 1_000_000,
    "3h": 3 * 60 * 60 * 1_000_000,
    "12h": 12 * 60 * 60 * 1_000_000,
}


def sessions(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_us = (
        F.expr("ts DIV 1000")
        if dict(ev.dtypes).get("ts") in ("bigint", "int", "long")
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    ev = ev.select(F.col("user_id"), ts_us.alias("t"))
    w = Window.partitionBy("user_id").orderBy("t")
    brk = F.when(
        F.lag("t").over(w).isNull()
        | (F.col("t") - F.lag("t").over(w) >= SESSION_GAP_US),
        1,
    ).otherwise(0)
    sid = ev.withColumn(
        "sid", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sid.groupBy("user_id", "sid").agg(
        F.min("t").alias("s_us"), F.max("t").alias("e_us")
    ).drop("sid")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from seqtables_spark.operators.ranges import interval_overlap_join

    t0 = time.perf_counter()
    sess = sessions(spark, sf_dir).localCheckpoint(eager=True)
    t_sess = time.perf_counter() - t0
    n_sess = sess.count()
    span = sess.select(
        F.avg(F.col("e_us") - F.col("s_us")).alias("avg_us"),
        F.max(F.col("e_us") - F.col("s_us")).alias("max_us"),
    ).collect()[0]
    print(
        f"sessions: {n_sess} rows, sessionize {t_sess:.2f}s, "
        f"avg span {span['avg_us']/1e6:.0f}s max {span['max_us']/1e6:.0f}s"
    )

    for name, w in WIDTHS.items():
        # replicated rows per side at this width
        n_repl = sess.select(
            F.sum(
                F.floor(F.col("e_us") / w) - F.floor(F.col("s_us") / w) + 1
            ).alias("n")
        ).collect()[0]["n"]
        pairs = interval_overlap_join(
            sess, sess, "s_us", "e_us", bin_width=w
        ).filter(F.col("l_user_id") < F.col("r_user_id"))
        agg = pairs.groupBy("l_user_id", "r_user_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            n_out = agg.count()
            times.append(time.perf_counter() - t0)
        print(
            f"bin={name:>5}: repl/side {int(n_repl):>8}  out_pairs {n_out:>8} "
            f" warm {min(times):5.2f}s  (runs: {' '.join(f'{t:.2f}' for t in times)})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
