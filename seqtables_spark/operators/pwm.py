"""Position-weight-matrix scoring.

Parity target: calculate_pwm /root/reference/seqtables/core/
seqtables.py:874-880; kernel seq_pwm_ascii_map_and_score
numpy_ops.py:462-516 (the 256-wide ASCII-indexed lookup is the
reference's perfect-hash trick; relationally it is just a broadcast
map join on (position, letter)).

Scale: the PWM is |positions| x |alphabet| rows - always broadcast.
One groupBy(read_id) shuffle whose payload is a single double.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def pwm_to_df(
    spark: SparkSession,
    pwm: Sequence[Sequence[float]],
    positions: Sequence[int] | None = None,
    column_names: str = "ACTG",
) -> DataFrame:
    """Rows = positions, columns ordered like `column_names`
    (reference default 'ACTG', seqtables.py:874)."""
    rows = []
    for i, weights in enumerate(pwm):
        pos = positions[i] if positions is not None else i + 1
        for letter, w in zip(column_names, weights):
            rows.append((int(pos), letter, float(w)))
    return spark.createDataFrame(rows, "position long, letter string, weight double")


def calculate_pwm(
    cells: DataFrame,
    pwm_df: DataFrame,
    positions: Sequence[int] | None = None,
    null_score: float = 1.0,
    use_log_before_sum: bool = True,
) -> DataFrame:
    """Score each read against the PWM: product of per-position letter
    weights computed as exp(sum(log w)) (reference
    use_log_before_sum=True path); letters absent from the PWM get
    null_score. Returns DF(read_id, pwm_score)."""
    if positions is not None:
        cells = cells.filter(F.col("position").isin(list(positions)))
        pwm_df = pwm_df.filter(F.col("position").isin(list(positions)))
    joined = cells.join(
        F.broadcast(pwm_df),
        (cells["position"] == pwm_df["position"]) & (cells["base"] == pwm_df["letter"]),
        "left",
    ).select(
        "read_id",
        F.coalesce(pwm_df["weight"], F.lit(float(null_score))).alias("w"),
    )
    if use_log_before_sum:
        # Spark's log(w<=0) is NULL and sum() SKIPS nulls - a 0.0 PWM
        # weight would silently drop out and leave a confidently wrong
        # nonzero product. The reference's numpy path gives
        # log(0) = -inf -> sum = -inf -> exp = 0; reproduce that.
        log_w = F.when(F.col("w") > 0, F.log("w")).otherwise(
            F.lit(float("-inf"))
        )
        score = F.exp(F.sum(log_w))
    else:
        score = F.sum("w")
    return joined.groupBy("read_id").agg(score.alias("pwm_score"))
