"""Windowed signal transforms (SURVEY §2.4 A1/A5).

The reference's USXR postprocess subtracts the mean of each channel's
first 1,000 samples (modules/usxr/_postprocess.py:10-12:
``data - np.mean(data[0:1000])``). Long-format equivalent: rank rows
per group along the axis, average the first-n, subtract.

Scale: the rank window prunes to ``rn <= n`` via WindowGroupLimit; the
per-group baseline relation is |groups| rows → AQE broadcasts the
re-join. Baselines use exact-decimal accumulation so results are
partition-order-independent (see fdf_spark.functions.scalar).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from fdf_spark.functions.scalar import dsum


def prefix_mean(
    df: DataFrame,
    value: str,
    order: Sequence[str | Column],
    n: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-group mean of the first ``n`` samples (usxr/_postprocess.py:11)."""
    w = (W.partitionBy(*by) if by else W.partitionBy()).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order]
    )
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    gb = ranked.groupBy(*by) if by else ranked.groupBy()
    return gb.agg((dsum(value) / F.count(value)).alias("baseline"))


def baseline_subtract(
    df: DataFrame,
    value: str,
    order: Sequence[str | Column],
    n: int,
    by: Sequence[str] = (),
    out: str = "value_adj",
) -> DataFrame:
    """``value - mean(first n samples)`` per group (A1, F2)."""
    base = prefix_mean(df, value, order, n, by)
    joined = df.join(F.broadcast(base), list(by)) if by else df.crossJoin(F.broadcast(base))
    return joined.withColumn(out, F.col(value) - F.col("baseline")).drop("baseline")
