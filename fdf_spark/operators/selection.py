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


def _with_pos(df: DataFrame, order: Sequence[str | Column], by: Sequence[str]) -> DataFrame:
    """Input rows + 0-based ``__pos`` (rank in ``order``) and ``__n``
    (group size). Both window functions share one partitioning, so
    Catalyst plans a single exchange + sort."""
    part = W.partitionBy(*by) if by else W.partitionBy()
    w = part.orderBy(*[F.col(c) if isinstance(c, str) else c for c in order])
    return df.withColumn("__pos", F.row_number().over(w) - 1).withColumn(
        "__n", F.count(F.lit(1)).over(part)
    )


def positional_slice(
    df: DataFrame,
    order: Sequence[str | Column],
    start: int | None = 0,
    stop: int | None = None,
    step: int = 1,
    by: Sequence[str] = (),
) -> DataFrame:
    """Full Python/numpy slice ``[start:stop:step]`` per group —
    negative indices count from the group's end, negative steps walk
    backwards, bounds clamp exactly like ``slice.indices(n)``.

    Reference: ``Signal.__getitem__``/``parseindex`` + ``__getslice__``
    fdf_signal.py:189-206,269-281 (ndarray subclass ⇒ inherits the
    complete numpy slice surface).

    Returns the selected rows plus ``__pos`` (0-based source position)
    and ``__sel`` (0-based position in the *selection*, i.e. numpy
    output order — for a negative step, ascending ``__sel`` is the
    reversed walk). Group length is resolved per group as a window
    count, so mixed-length groups slice independently, exactly like a
    per-(shot, channel) numpy array would.
    """
    if step == 0:
        raise ValueError("slice step cannot be zero")
    out = _with_pos(df, order, by)
    n, pos = F.col("__n"), F.col("__pos")

    def _norm(v: int, default_lo, default_hi):
        """Clamp one bound the way slice.indices does."""
        if v is None:
            return default_lo if step > 0 else default_hi
        lit = F.lit(int(v))
        if v < 0:
            return F.greatest(lit + n, F.lit(-1) if step < 0 else F.lit(0))
        return F.least(lit, n if step > 0 else n - 1)

    if step > 0:
        s = _norm(start, F.lit(0), None)
        e = _norm(stop, n, None)
        cond = (pos >= s) & (pos < e)
        sel = F.floor((pos - s) / F.lit(step))
        if step != 1:
            cond = cond & (((pos - s) % step) == 0)
    else:
        s = _norm(start, None, n - 1)
        e = _norm(stop, None, F.lit(-1))
        cond = (pos <= s) & (pos > e)
        sel = F.floor((s - pos) / F.lit(-step))
        if step != -1:
            cond = cond & (((s - pos) % (-step)) == 0)
    return out.filter(cond).withColumn("__sel", sel.cast("long")).drop("__n")


def positional_take(
    df: DataFrame,
    order: Sequence[str | Column],
    positions: Sequence[int],
    by: Sequence[str] = (),
) -> DataFrame:
    """Fancy (int-array) indexing per group: ``sig[[3, -1, 3]]``.

    numpy semantics — negative positions count from the group's end,
    duplicates and arbitrary order preserved via ``__sel`` (position in
    the ``positions`` list; one output row per list entry). Positions
    out of range for a group are dropped (a distributed engine cannot
    usefully raise numpy's IndexError mid-job; filter or validate
    driver-side if strictness is needed).

    Scale: the wanted-position relation is |groups| × len(positions)
    rows built from a groupBy count — broadcast-joined, never a
    row-explosion of the fact table.
    """
    out = _with_pos(df, order, by)
    sizes = (df.groupBy(*by).count() if by else df.groupBy().count()).withColumnRenamed(
        "count", "__gn"
    )
    want = sizes.select(
        *by,
        F.posexplode(F.array(*[F.lit(int(p)) for p in positions])).alias("__sel", "__raw"),
        F.col("__gn"),
    ).select(
        *by,
        "__sel",
        F.when(F.col("__raw") < 0, F.col("__raw") + F.col("__gn"))
        .otherwise(F.col("__raw"))
        .alias("__want"),
        "__gn",
    ).filter((F.col("__want") >= 0) & (F.col("__want") < F.col("__gn"))).drop("__gn")
    keys = [*by, "__pos"]
    want = want.withColumnRenamed("__want", "__pos")
    return out.drop("__n").join(F.broadcast(want), keys)
