"""As-of (nearest-time) join — SURVEY §2.3 J4, the one genuinely custom join.

The reference maps requested timeslices to nearest stored samples on
non-uniform grids (mpts/plot.py:44-49, fdf_signal.py:296-301). The
general relational form is the as-of join: for each left row, the
right row with the greatest ``on`` ≤ left's (backward), smallest ≥
(forward), or closest (nearest), within equality groups ``by``.

Implementation — the *union trick*, not a range join:
tag both sides, union, sort by (by, on, side), and carry the latest
right-side values forward with ``last(col, ignorenulls=True)`` over a
running frame. Cost: ONE shuffle + sort of |L|+|R| rows on the same
key both sides — linear, skew-tolerant (AQE), no range-bucket
explosion and no per-group pandas materialization. At 100 TB this
beats ``applyInPandas(merge_asof)`` (which must materialize whole
groups in Python memory) and beats the O(|L|·|R|) windowed
range-join fallback.

Exact matches (right.on == left.on) are included, like
``pandas.merge_asof(allow_exact_matches=True)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    columns (renamed ``<col><suffix>``), or nulls when no match.

    ``tolerance``: max |left.on − right.on| (numeric, or seconds when
    ``on`` is a timestamp); matches farther than this become nulls.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        return _nearest(left, right, on, by, tolerance, suffix)

    by = list(by)
    carry_cols = [c for c in right.columns if c not in by and c != on]
    r_on = on + suffix

    lhs = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in by and c != on],
        F.lit(None).cast(right.schema[on].dataType).alias(r_on),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in carry_cols],
    )
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
        F.col(on).alias(r_on),
        *[F.col(c).alias(c + suffix) for c in carry_cols],
    )
    both = lhs.unionByName(rhs)

    # backward: ascending scan, right rows sort before left at equal `on`
    # so exact matches are visible to the carrying frame. forward: the
    # mirror image on a descending scan.
    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc()]
    else:
        order = [F.col(on).desc(), F.col("__side").asc()]
    w = W.partitionBy(*by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow) if by else W.partitionBy().orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)

    carried = [F.last(r_on, ignorenulls=True).over(w).alias(r_on)] + [
        F.last(c + suffix, ignorenulls=True).over(w).alias(c + suffix) for c in carry_cols
    ]
    out = (
        both.select(*by, on, "__side", *[c for c in left.columns if c not in by and c != on], *carried)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if tolerance is not None:
        out = _apply_tolerance(out, left, on, r_on, [c + suffix for c in carry_cols], tolerance)
    return out


def _num(col, dtype):
    return F.unix_micros(col) if isinstance(dtype, T.TimestampType) else col


def _apply_tolerance(out: DataFrame, left: DataFrame, on: str, r_on: str, suffixed: list[str], tolerance) -> DataFrame:
    dtype = left.schema[on].dataType
    tol = tolerance * 1_000_000 if isinstance(dtype, T.TimestampType) else tolerance
    within = F.abs(_num(F.col(on), dtype) - _num(F.col(r_on), dtype)) <= F.lit(tol)
    for c in [r_on, *suffixed]:
        out = out.withColumn(c, F.when(within, F.col(c)))
    return out


def _nearest(left, right, on, by, tolerance, suffix):
    """nearest = backward ⊕ forward, keep the closer side (tie → backward,
    matching pandas.merge_asof semantics)."""
    bwd = asof_join(left, right, on, by, "backward", tolerance, suffix)
    fwd_sfx = suffix + "__fwd"
    fwd = asof_join(left, right, on, by, "forward", tolerance, fwd_sfx)
    dtype = left.schema[on].dataType
    key = [*by, on] if by else [on]
    carry = [c for c in right.columns if c not in by and c != on]
    joined = bwd.join(
        fwd.select(*key, *[F.col(c + fwd_sfx) for c in [on, *carry]]), list(key)
    )
    b_on, f_on = F.col(on + suffix), F.col(on + fwd_sfx)
    d_b = F.abs(_num(F.col(on), dtype) - _num(b_on, dtype))
    d_f = F.abs(_num(F.col(on), dtype) - _num(f_on, dtype))
    use_b = F.when(b_on.isNull(), F.lit(False)).when(f_on.isNull(), F.lit(True)).otherwise(d_b <= d_f)
    out = joined.withColumn("__use_b", use_b)
    for c in [on, *carry]:
        out = out.withColumn(
            c + suffix, F.when(F.col("__use_b"), F.col(c + suffix)).otherwise(F.col(c + fwd_sfx))
        ).drop(c + fwd_sfx)
    return out.drop("__use_b")
