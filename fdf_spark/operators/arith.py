"""Signal arithmetic (J3 + F2/F3): operator overloads over long-format
signals.

The reference's ``Signal`` is an ndarray subclass (fdf_signal.py:30-92),
so ``te - te_fit``, ``ip / 1e6``, or any numpy expression works directly
on signals, with axes propagating through ``__array_finalize__``. In the
long format the same semantics are relational:

- **signal ∘ scalar** — a column expression on ``value`` (no shuffle,
  whole-stage codegen).
- **signal ∘ signal** — equi-join on ``shot`` + the *shared axes*,
  then the column expression. Alignment is exact-coordinate: two
  signals on the same axis grid combine sample-by-sample, exactly like
  numpy's elementwise ops on lock-step arrays. (Signals on different
  grids should be resampled first — nearest_sample / asof join — just
  as the reference user would interpolate before subtracting.)

Units combine symbolically: add/sub keep the left units when they
agree (else None — heterogeneous addition has no unit); mul/div build
``"u1*u2"`` / ``"u1/u2"``; scalar ops keep the signal's units.

Scale: the axis equi-join shuffles on (shot, axes…) — the same key the
physical layout partitions by (SCALE.md), so co-partitioned storage
makes it a local join; scalar ops are pure map-side.
"""

from __future__ import annotations

import operator
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit_combine(op: str, lu: str | None, ru: str | None) -> str | None:
    if op in ("+", "-"):
        return lu if lu == ru or ru is None else (ru if lu is None else None)
    if lu is None or ru is None:
        return lu or ru
    return f"{lu}{op}{ru}"


class SignalExpr:
    """A lazily-combined signal: long-format DataFrame + axis names +
    units. Closed under arithmetic — every operator returns a new
    SignalExpr whose ``df`` is the combined Catalyst plan."""

    def __init__(
        self,
        df: DataFrame,
        axes: Sequence[str],
        units: str | None = None,
        value: str = "value",
        group: Sequence[str] = ("shot",),
    ):
        self.axes = list(axes)
        self.group = list(group)
        self.units = units
        cols = [*self.group, *self.axes, F.col(value).alias("value")]
        self.df = df.select(*cols)

    # -- combination core ----------------------------------------------------

    def _keys(self, other: "SignalExpr") -> list[str]:
        shared = [a for a in self.axes if a in other.axes]
        if self.group != other.group:
            raise ValueError(f"group keys differ: {self.group} vs {other.group}")
        return [*self.group, *shared]

    def _binop(self, other, fn: Callable[[Column, Column], Column], sym: str, reflected: bool = False) -> "SignalExpr":
        lhs = self
        if isinstance(other, (int, float)):
            lit = F.lit(other)
            l, r = (lit, F.col("value")) if reflected else (F.col("value"), lit)
            out = lhs.df.withColumn("value", fn(l, r))
            return SignalExpr(out, lhs.axes, lhs.units, group=lhs.group)
        other = as_signal_expr(other)
        keys = lhs._keys(other)
        # broadcast semantics: the result carries the UNION of axes — a
        # 1-D waveform combined with a 2-D profile fans out across the
        # profile's extra axis, like numpy broadcasting on lock-step grids
        extra = [a for a in other.axes if a not in lhs.axes]
        a = lhs.df.withColumnRenamed("value", "__l")
        b = other.df.select(*keys, *extra, F.col("value").alias("__r"))
        l, r = (F.col("__r"), F.col("__l")) if reflected else (F.col("__l"), F.col("__r"))
        axes = lhs.axes + extra
        joined = a.join(b, keys).withColumn("value", fn(l, r)).drop("__l", "__r")
        lu, ru = (other.units, lhs.units) if reflected else (lhs.units, other.units)
        return SignalExpr(joined, axes, _unit_combine(sym, lu, ru), group=lhs.group)

    # -- operator surface (fdf_signal.py:30-92 ndarray parity) ---------------

    def __add__(self, other):
        return self._binop(other, operator.add, "+")

    def __radd__(self, other):
        return self._binop(other, operator.add, "+", reflected=True)

    def __sub__(self, other):
        return self._binop(other, operator.sub, "-")

    def __rsub__(self, other):
        return self._binop(other, operator.sub, "-", reflected=True)

    def __mul__(self, other):
        return self._binop(other, operator.mul, "*")

    def __rmul__(self, other):
        return self._binop(other, operator.mul, "*", reflected=True)

    def __truediv__(self, other):
        return self._binop(other, operator.truediv, "/")

    def __rtruediv__(self, other):
        return self._binop(other, operator.truediv, "/", reflected=True)

    def __pow__(self, other):
        return self._binop(other, lambda a, b: F.pow(a, b), "^")

    def __neg__(self):
        return SignalExpr(self.df.withColumn("value", -F.col("value")), self.axes, self.units, group=self.group)

    def __abs__(self):
        return SignalExpr(self.df.withColumn("value", F.abs(F.col("value"))), self.axes, self.units, group=self.group)

    # -- alignment -----------------------------------------------------------

    def resample(self, axis: str, points: Sequence[float]) -> "SignalExpr":
        """Linear interpolation onto explicit ``axis`` coordinates
        (np.interp semantics via operators/resample.py), per group ×
        remaining axes — the alignment step before combining signals
        sampled on different grids: ``a.resample('time', g) /
        b.resample('time', g)``."""
        from fdf_spark.operators.resample import resample_linear

        if axis not in self.axes:
            raise KeyError(f"signal has no axis '{axis}'")
        others = [a for a in self.axes if a != axis]
        by = [*self.group, *others]
        keys = self.df.select(*by).distinct()
        grid = keys.select(
            *by, F.explode(F.array(*[F.lit(float(p)) for p in points])).alias(axis)
        )
        out = resample_linear(self.df, axis, grid, by=by)
        return SignalExpr(
            out.select(*self.group, *self.axes, "value"), self.axes, self.units, group=self.group
        )

    # -- materialization -----------------------------------------------------

    def to_pandas(self):
        return self.df.orderBy(*self.group, *self.axes).toPandas()


def as_signal_expr(obj) -> SignalExpr:
    """Adapt a SignalFrame (or pass through a SignalExpr)."""
    if isinstance(obj, SignalExpr):
        return obj
    df = getattr(obj, "df", None)
    axes = getattr(obj, "axes", None)
    if df is None or axes is None:
        raise TypeError(f"cannot combine signal with {type(obj).__name__}")
    return SignalExpr(df, axes, getattr(obj, "units", None))
