"""Selection semantics of the reference's Signal (SURVEY §2.2 P2/P4/P5).

The reference's subtlest machinery is how ``sig(time=...)`` and
``sig[a:b]`` select samples (fdf_signal.py:182-231, 283-302). In our
long format an axis is a column, so these become Catalyst plans:

- **nearest_sample** (P5): ``sig(time=v)`` → ``slice(i, i+1)`` with
  ``i = argmin(|axis − v|)`` (fdf_signal.py:298-300) — exactly one
  sample per group. numpy's argmin takes the *first* minimum, which on
  an ascending axis is the smaller axis value — replicated via
  lexicographic ``min(struct(diff, axis))``.
- **value_window** (P4): ``sig(time=[lo,hi])`` →
  ``slice(argmin(|axis−lo|), argmin(|axis−hi|))``
  (fdf_signal.py:296-297,301): snap each endpoint to its nearest
  sample, keep samples in ``[snap_lo, snap_hi)`` — the nearest-to-hi
  sample is EXCLUDED (half-open on nearest indices, no +1).
- **positional_slice** (P2): ``sig[a:b:c]`` → row_number per group.

Scale notes: nearest_sample and the bound computation of value_window
are aggregations with map-side partial combine (min of a 2-field
struct) — no sort, no window, one shuffle of |groups| rows; the bounds
re-join is an AQE broadcast at any realistic group count.
positional_slice is the only one that needs a per-group sort (that IS
its semantics); rank windows prune with predicate pushdown of the
``rn`` filter into the window via Spark's WindowGroupLimit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _axis_num(df: DataFrame, axis: str) -> Column:
    """Numeric view of an axis column (timestamps → epoch micros)."""
    if isinstance(df.schema[axis].dataType, T.TimestampType):
        return F.unix_micros(F.col(axis))
    return F.col(axis)


def _lit_num(df: DataFrame, axis: str, v) -> Column:
    if isinstance(df.schema[axis].dataType, T.TimestampType):
        return F.unix_micros(F.lit(v).cast("timestamp"))
    return F.lit(v)


def nearest_sample(df: DataFrame, axis: str, value, by: Sequence[str] = ()) -> DataFrame:
    """The single row per group whose ``axis`` is nearest ``value``.

    Reference: ``Signal.__call__`` scalar path fdf_signal.py:298-300
    (``slice(i, i+1)``, ``i = argmin(abs(axis − v))``) and the
    nearest-timeslice plot lookup mpts/plot.py:44-49.

    Ties (equidistant samples) resolve to the smaller axis value —
    numpy argmin's first-minimum on a sorted axis.
    """
    diff = F.abs(_axis_num(df, axis) - _lit_num(df, axis, value))
    w = W.partitionBy(*by) if by else W.partitionBy()
    wn = w.orderBy(diff.asc(), F.col(axis).asc())
    return (
        df.withColumn("__nearest_rn", F.row_number().over(wn))
        .filter(F.col("__nearest_rn") == 1)
        .drop("__nearest_rn")
    )


def value_window(df: DataFrame, axis: str, lo, hi, by: Sequence[str] = ()) -> DataFrame:
    """Samples in the nearest-snapped half-open window ``[snap(lo), snap(hi))``.

    Reference: ``Signal.__call__`` range path fdf_signal.py:296-297,301.
    The endpoints snap independently to nearest samples over the
    *distinct* axis values of each group (an axis is one coordinate
    vector shared by all channels/radii of a signal); the hi-side
    nearest sample is excluded, and ``snap(hi) <= snap(lo)`` yields an
    empty result exactly like an empty numpy slice.

    Implementation: per-group bounds via min-of-struct aggregation
    (associative, partial-agg friendly), broadcast-joined back.
    """
    num = _axis_num(df, axis)
    dlo = F.abs(num - _lit_num(df, axis, lo))
    dhi = F.abs(num - _lit_num(df, axis, hi))
    gb = df.groupBy(*by) if by else df.groupBy()
    bounds = gb.agg(
        F.min(F.struct(dlo.alias("d"), F.col(axis).alias("t"))).getField("t").alias("__t_lo"),
        F.min(F.struct(dhi.alias("d"), F.col(axis).alias("t"))).getField("t").alias("__t_hi"),
    )
    joined = df.join(F.broadcast(bounds), list(by)) if by else df.crossJoin(F.broadcast(bounds))
    return (
        joined.filter((F.col(axis) >= F.col("__t_lo")) & (F.col(axis) < F.col("__t_hi")))
        .drop("__t_lo", "__t_hi")
    )


def positional_slice(
    df: DataFrame,
    order: Sequence[str | Column],
    start: int = 0,
    stop: int | None = None,
    step: int = 1,
    by: Sequence[str] = (),
) -> DataFrame:
    """numpy-style positional slice ``[start:stop:step]`` per group.

    Reference: ``Signal.__getitem__``/``parseindex`` fdf_signal.py:182-231
    (0-based, half-open, step ≥ 1). Returns the input rows plus a
    0-based ``__pos`` column (callers may drop it).
    """
    if step < 1:
        raise ValueError("positional_slice supports step >= 1")
    w = (W.partitionBy(*by) if by else W.partitionBy()).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order]
    )
    out = df.withColumn("__pos", F.row_number().over(w) - 1)
    cond = F.col("__pos") >= start
    if stop is not None:
        cond = cond & (F.col("__pos") < stop)
    if step != 1:
        cond = cond & (((F.col("__pos") - start) % step) == 0)
    return out.filter(cond)
