"""Machine → Shot → Container → Signal: the reference's object graph
on lazy DataFrames.

Parity map (all lazy — nothing touches storage until an action, the
Spark analog of the reference's ``_empty`` fill-on-access,
fdf_signal.py:73,215-220):

- ``Machine`` (factory.py:43-147): shot container + logbook + events.
- ``Machine.filter_shots`` → ``ImmutableMachine`` (factory.py:287-293,
  331-375): frozen shot-set view (semi-join semantics).
- ``Shot`` (factory.py:378-436): lazy diagnostic modules; ``xp``/
  ``date`` resolved from the logbook on first access (factory.py:438-455).
- ``Container`` (factory.py:689-871): catalog-driven attribute access;
  ``equilibria`` runs efit discovery on build (factory.py:495-512,
  equilibria/_preprocess.py:13-43).
- ``SignalFrame`` (fdf_signal.py:30-302): long-format DataFrame with
  axis metadata; ``sig(time=…)`` value selection with nearest-sample
  snapping, ``sig[a:b]`` positional slicing, transforms applied from
  the catalog (factory.py:198-201).
"""

from __future__ import annotations

import os
from collections.abc import MutableMapping
from functools import cached_property

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fdf_spark.catalog.registry import (
    TRANSFORM_UNITS,
    TRANSFORMS,
    Catalog,
    CatalogEntry,
    ContainerEntry,
    get_catalog,
)
from fdf_spark.operators.selection import (
    nearest_sample,
    positional_slice,
    positional_take,
    value_window,
)


def _parse_index(index, dims: int) -> list:
    """The reference's ``parseindex`` (fdf_signal.py:189-206): normalize
    any single index / tuple to one entry per axis — floats and numpy
    scalars cast to int, ``Ellipsis`` expands to the skipped axes'
    ``:``, missing trailing axes pad with ``:``. Int-arrays (fancy
    indexes) pass through as Python lists of ints."""
    def _one(i):
        if isinstance(i, slice) or i is Ellipsis:
            return i
        if isinstance(i, (list, tuple)):
            return [int(v) for v in i]
        if hasattr(i, "tolist") and getattr(i, "ndim", 0) >= 1:  # np.ndarray
            return [int(v) for v in i.tolist()]
        if isinstance(i, (int, float)) or hasattr(i, "__int__"):
            return int(i)
        raise TypeError(f"unsupported index {i!r}")

    if isinstance(index, tuple):
        parsed = [_one(i) for i in index]
    else:
        parsed = [_one(index)]
    n_ellipsis = sum(1 for i in parsed if i is Ellipsis)
    if n_ellipsis > 1:
        raise IndexError("an index can only have a single ellipsis ('...')")
    if n_ellipsis:
        at = parsed.index(Ellipsis)
        pad = [slice(None)] * (dims - len(parsed) + 1)
        parsed = parsed[:at] + pad + parsed[at + 1 :]
    else:
        parsed = parsed + [slice(None)] * (dims - len(parsed))
    if len(parsed) > dims:
        raise IndexError(f"too many indices: signal has {dims} axes, got {len(parsed)}")
    return parsed


class Machine(MutableMapping):
    """Dict-like shot container bound to a data directory of Parquet
    tables (factory.py:43-147). ``machine[141000]`` / ``machine.s141000``
    / ``machine.shot(141000)`` all resolve the same lazy Shot."""

    def __init__(self, spark: SparkSession, data_dir: str, name: str = "nstx", catalog: Catalog | None = None):
        self._spark = spark
        self._data_dir = data_dir
        self._name = name.lower()
        self._catalog = catalog or get_catalog()
        self._shots: dict[int, Shot] = {}

    # -- table access -------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        return self._spark.read.parquet(os.path.join(self._data_dir, f"{name}.parquet"))

    @cached_property
    def logbook(self) -> DataFrame:
        """Live logbook rows (``voided IS NULL`` pushed to the scan,
        factory.py:537-542)."""
        return self.table("logbook").filter(F.col("voided").isNull())

    # -- shot resolution (factory.py:107-116) --------------------------------

    def shot(self, number: int) -> "Shot":
        if number not in self._shots:
            self._shots[number] = Shot(self, int(number))
        return self._shots[number]

    def __getattr__(self, attr: str):
        if attr.startswith("s") and attr[1:].isdigit():
            return self.shot(int(attr[1:]))
        raise AttributeError(attr)

    # -- MutableMapping (factory.py:118-147) ---------------------------------

    def __getitem__(self, key: int) -> "Shot":
        return self.shot(key)

    def __setitem__(self, key: int, value) -> None:  # parity: no-op assign
        raise TypeError("shots are created via machine[shot]/addshot")

    def __delitem__(self, key: int) -> None:
        self._shots.pop(key, None)

    def __iter__(self):
        return iter(sorted(self._shots))

    def __len__(self) -> int:
        return len(self._shots)

    def __contains__(self, value) -> bool:
        # factory.py:124-126: exact dict-key membership — a float only
        # matches when integral (141000.9 must NOT hit shot 141000) and
        # bool is rejected rather than aliasing shots 0/1
        if isinstance(value, bool):
            return False
        if isinstance(value, float):
            # nan/inf: int(value) raises — membership is simply False
            return value.is_integer() and int(value) in self._shots
        if isinstance(value, int):
            return value in self._shots
        if isinstance(value, str):
            try:
                return int(value) in self._shots
            except ValueError:
                return False
        return False

    def __dir__(self):
        # factory.py:144-148: sNNNNNN attrs for loaded shots + the API
        return sorted(set(super().__dir__()) | {f"s{s}" for s in self._shots})

    # -- shot algebra (factory.py:213-293, 596-633) --------------------------

    def get_shotlist(self, date=None, xp=None, limit: int | None = 500) -> DataFrame:
        """Distinct shots for dates/XPs, ordered (Logbook.get_shotlist
        factory.py:596-633 incl. the SET ROWCOUNT 500 guard :572). The
        reference's per-date/per-XP query loop collapses into one plan."""
        lb = self.logbook
        conds = []
        if date is not None:
            dates = [date] if not isinstance(date, (list, tuple)) else list(date)
            conds.append(F.col("rundate").isin(dates))
        if xp is not None:
            xps = [xp] if not isinstance(xp, (list, tuple)) else list(xp)
            conds.append(F.col("xp").isin(xps))
        if conds:
            cond = conds[0]
            for c in conds[1:]:
                cond = cond | c
            lb = lb.filter(cond)
        out = lb.select("shot").distinct().orderBy("shot")
        return out.limit(limit) if limit else out

    def addshot(self, shotlist=None, date=None, xp=None) -> list[int]:
        """Materialize Shot objects for explicit ids ∪ date-query ∪
        XP-query, deduped (factory.py:213-244)."""
        ids = set(int(s) for s in (shotlist or []))
        if date is not None or xp is not None:
            ids.update(r["shot"] for r in self.get_shotlist(date=date, xp=xp).collect())
        for s in sorted(ids):
            self.shot(s)
        return sorted(ids)

    def addxp(self, xp) -> list[int]:
        """factory.py:246-257: addshot restricted to an XP query."""
        return self.addshot(xp=xp)

    def adddate(self, date) -> list[int]:
        """factory.py:259-268: addshot restricted to a run-date query."""
        return self.addshot(date=date)

    def list_shots(self) -> list[int]:
        """factory.py:270-275: the materialized shot ids, ordered."""
        return sorted(self._shots)

    def get_entries(self, shot=None, date=None, xp=None) -> DataFrame:
        """Logbook entries for explicit shots ∪ shots-of-date ∪ shots-of-XP,
        entry-ordered (get_entries factory.py:635-648: shotlist build +
        per-shot cached queries collapse into one semi-join plan)."""
        shots = None
        if shot is not None:
            ids = [shot] if not isinstance(shot, (list, tuple)) else list(shot)
            shots = self._spark.createDataFrame([(int(s),) for s in ids], "shot long")
        if date is not None or xp is not None:
            q = self.get_shotlist(date=date, xp=xp, limit=None)
            shots = q if shots is None else shots.unionByName(q).distinct()
        lb = self.logbook
        if shots is not None:
            lb = lb.join(F.broadcast(shots), "shot", "left_semi")
        return lb.orderBy("shot", "entered")

    def filter_shots(self, date=None, xp=None) -> "ImmutableMachine":
        """Frozen sub-view restricted to the query's shots
        (factory.py:287-293)."""
        shots = [r["shot"] for r in self.get_shotlist(date=date, xp=xp).collect()]
        return ImmutableMachine(self, shots)

    # -- events (factory.py:295-320) -----------------------------------------

    def setevent(self, name: str, shot: int, bus_dir: str | None = None) -> None:
        from fdf_spark.streaming.events import setevent

        setevent(self._spark, bus_dir or os.path.join(self._data_dir, "events_bus"), name, shot)

    def wfevent(self, name: str, timeout: float = 10.0, bus_dir: str | None = None):
        from fdf_spark.streaming.events import wfevent

        return wfevent(
            self._spark, bus_dir or os.path.join(self._data_dir, "events_bus"), name, timeout
        )

    def __repr__(self) -> str:
        return f"<machine {self._name.upper()}>"


class ImmutableMachine(MutableMapping):
    """Frozen shotlist view (factory.py:331-375): reads resolve through
    the parent, writes raise."""

    def __init__(self, parent: Machine, shots: list[int]):
        self._parent = parent
        self._shotset = sorted(set(int(s) for s in shots))

    def __getitem__(self, key: int) -> "Shot":
        if int(key) not in self._shotset:
            raise KeyError(key)
        return self._parent.shot(int(key))

    def __getattr__(self, attr: str):
        if attr.startswith("s") and attr[1:].isdigit():
            return self[int(attr[1:])]
        raise AttributeError(attr)

    def __setitem__(self, key, value):
        raise TypeError("ImmutableMachine is read-only (factory.py:340-346)")

    def __delitem__(self, key):
        raise TypeError("ImmutableMachine is read-only (factory.py:340-346)")

    def __iter__(self):
        return iter(self._shotset)

    def __len__(self) -> int:
        return len(self._shotset)


class Shot:
    """One discharge; diagnostic containers materialize lazily on
    attribute access (factory.py:378-436)."""

    def __init__(self, machine: Machine, number: int):
        self.machine = machine
        self.shot = number
        self._containers: dict[str, Container] = {}

    # -- logbook enrichment (factory.py:438-455, 635-648) --------------------

    @cached_property
    def _xp_date(self) -> tuple[int | None, int | None]:
        row = (
            self.machine.logbook.filter(F.col("shot") == self.shot)
            .select("xp", "rundate")
            .head(1)
        )
        return (row[0]["xp"], row[0]["rundate"]) if row else (None, None)

    @property
    def xp(self) -> int | None:
        return self._xp_date[0]

    @property
    def date(self) -> int | None:
        return self._xp_date[1]

    @property
    def logbook(self) -> DataFrame:
        """This shot's entries, entry-order (factory.py:577-594,583-585)."""
        return (
            self.machine.logbook.filter(F.col("shot") == self.shot)
            .orderBy("shot", "entered")
        )

    def check_efit(self) -> list[str]:
        """Available equilibrium trees for this shot — existence probe
        against the availability table (factory.py:495-512: 18 candidate
        trees filtered by userid-node existence)."""
        avail = (
            self.machine.table("efit_availability")
            .filter(F.col("shot") == self.shot)
            .select("efit")
            .distinct()
        )
        return sorted(r["efit"] for r in avail.collect())

    def __getattr__(self, attr: str):
        cat = self.machine._catalog
        if attr in cat.containers and "." not in attr:
            if attr not in self._containers:
                self._containers[attr] = Container(self, cat.containers[attr])
            return self._containers[attr]
        raise AttributeError(f"shot {self.shot} has no diagnostic '{attr}'")

    def __dir__(self):
        roots = [p for p in self.machine._catalog.containers if "." not in p]
        return sorted(set(list(super().__dir__()) + roots))

    # -- module mapping (factory.py:416-436: iterate/contain/index the
    # shot's diagnostic modules) ---------------------------------------------

    def _module_names(self) -> list[str]:
        return sorted(p for p in self.machine._catalog.containers if "." not in p)

    def __iter__(self):
        return iter(self._module_names())

    def __contains__(self, value) -> bool:
        return value in set(self._module_names())

    def __len__(self) -> int:
        return len(self._module_names())

    def __getitem__(self, item: str) -> "Container":
        if item in self:
            return getattr(self, item)
        raise KeyError(item)

    def __repr__(self) -> str:
        return f"<shot {self.shot}>"


class Node:
    """Scalar metadata leaf fetched on repr (factory.py:1072-1101)."""

    def __init__(self, shot: Shot, container_path: str, name: str):
        self._shot = shot
        self._path = container_path
        self._name = name

    @cached_property
    def value(self) -> str | None:
        rows = (
            self._shot.machine.table("signal_nodes")
            .filter(
                (F.col("shot") == self._shot.shot)
                & (F.col("container_path") == self._path)
                & (F.col("node") == self._name)
            )
            .select("value")
            .head(1)
        )
        return rows[0]["value"] if rows else None

    def __repr__(self) -> str:
        return str(self.value)


class Container:
    """Catalog-driven node of the diagnostic tree (factory.py:689-871).
    Attribute access resolves signals, sub-containers, metadata nodes
    and bound methods, in that order (factory.py:793-818)."""

    def __init__(self, shot: Shot, entry: ContainerEntry, parent=None):
        self.shot = shot
        self._entry = entry
        self._parent = parent if parent is not None else shot
        if entry.preprocess == "efit_discovery":
            self._run_efit_discovery()
            self._entry = shot.machine._catalog.containers[entry.path]

    def _run_efit_discovery(self) -> None:
        # X3: runtime schema instantiation from the availability probe
        # (equilibria/_preprocess.py:13-43)
        cat = self.shot.machine._catalog
        for tree in self.shot.check_efit():
            cat.instantiate_efit(tree)

    def __getattr__(self, attr: str):
        if attr.startswith("_") or attr == "shot":  # no recursion pre-init
            raise AttributeError(attr)
        cat = self.shot.machine._catalog
        e = self._entry
        q = f"{e.path}.{attr}"
        if q in cat.signals:
            return SignalFrame(self.shot, cat.signals[q], parent=self)
        if q in cat.containers:
            # efit children exist in the shared catalog even when another
            # shot instantiated them; only expose trees THIS shot has
            if e.preprocess == "efit_discovery" and attr not in self.shot.check_efit():
                raise AttributeError(f"{e.path}: tree '{attr}' not available for shot {self.shot.shot}")
            return Container(self.shot, cat.containers[q], parent=self)
        if attr in e.nodes:
            return Node(self.shot, e.path, attr)
        if attr in e.methods:
            return _bind_method(self, attr)
        # X5: delegate misses up the parent chain (container → parent
        # container → shot), the reference's inheritance walk
        # (factory.py:806-818; fdf_signal.py:234-245). Terminates at Shot,
        # whose own __getattr__ raises for unknown names.
        try:
            return getattr(self._parent, attr)
        except AttributeError:
            raise AttributeError(f"{e.path} has no attribute '{attr}'") from None

    def signals(self) -> list[str]:
        return sorted(self._entry.signals)

    def __dir__(self):
        e = self._entry
        subs = [p.rsplit(".", 1)[1] for p in e.containers]
        return sorted(
            set(list(super().__dir__()) + list(e.signals) + subs + list(e.nodes) + list(e.methods))
        )

    def __repr__(self) -> str:
        return f"<container {self._entry.path} shot={self.shot.shot}>"


class SignalFrame:
    """A lazy long-format signal: DataFrame + axis/units metadata.

    The DataFrame carries one row per sample with logical axis columns
    (time-major order per parse_axes factory.py:970-987), ``value`` and
    optional ``err``. Slicing/selection return plain DataFrames — in
    long format axis lock-step propagation (fdf_signal.py:118-169) is
    inherent: a row filter slices data and every axis at once.
    """

    def __init__(self, shot: Shot, entry: CatalogEntry, parent: "Container | None" = None):
        self.shot = shot
        self.entry = entry
        self._parent = parent

    def __getattr__(self, attr: str):
        # X5: signals inherit their container's methods/nodes, rebound to
        # the signal (fdf_signal.py:234-245); then the chain continues up.
        # (__dict__ access avoids recursion during __init__.)
        if attr.startswith("_"):
            raise AttributeError(attr)
        parent = self.__dict__.get("_parent")
        if parent is not None:
            if attr in parent._entry.methods:
                return _bind_method(self, attr)
            return getattr(parent, attr)
        raise AttributeError(attr)

    # -- metadata ------------------------------------------------------------

    @property
    def axes(self) -> list[str]:
        return list(self.entry.axes)

    @property
    def units(self) -> str | None:
        return self.entry.units

    def axis_units(self, axis: str) -> str | None:
        """Units of one axis, after transform rewrites
        (mpts/_postprocess.py:12: cm → m)."""
        base = dict(self.entry.axis_units).get(axis)
        rewritten = TRANSFORM_UNITS.get(self.entry.transform or "", {})
        return rewritten.get(axis, base)

    # -- the lazy plan -------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        """shot filter + key filters + axis projection + transform —
        all Catalyst-visible (pushdown reaches the Parquet scan)."""
        e = self.entry
        df = self.shot.machine.table(e.table).filter(F.col("shot") == self.shot.shot)
        for col, val in e.where:
            df = df.filter(F.col(col) == val)
        cols = [F.col("shot")]
        for name, phys in e.axis_cols:
            cols.append(F.col(phys).alias(name))
        cols.append(F.col(e.value_col).alias("value"))
        if e.err_col:
            cols.append(F.col(e.err_col).alias("err"))
        df = df.select(*cols)
        if e.transform:
            df = TRANSFORMS[e.transform](e, df)
        return df

    # -- selection semantics (fdf_signal.py:283-302) -------------------------

    def __call__(self, **axis_sel) -> DataFrame:
        """``sig(time=0.3)`` → nearest sample; ``sig(time=[lo,hi])`` →
        nearest-snapped half-open window. Multiple axes compose."""
        df = self.df
        for axis, sel in axis_sel.items():
            if axis not in self.entry.axes:
                raise KeyError(f"{self.entry.qualified} has no axis '{axis}'")
            if isinstance(sel, (list, tuple)):
                lo, hi = sel
                df = value_window(df, axis, lo, hi, by=["shot"])
            else:
                # scalar: snap to the one nearest DISTINCT axis value,
                # keeping every sample at that coordinate (a timeslice of
                # a 2-D profile is all radii at the snapped time)
                axis_vals = df.select("shot", axis).distinct()
                snapped = nearest_sample(axis_vals, axis, sel, by=["shot"])
                df = df.join(F.broadcast(snapped), ["shot", axis])
        return df

    def __getitem__(self, idx) -> DataFrame:
        """Positional index along the axes in declared order — the full
        ``parseindex`` surface (fdf_signal.py:189-206,269-281): ints
        (incl. negative, counting from the axis end), floats (cast to
        int like the reference), slices with negative bounds/steps,
        ``Ellipsis`` (pads with ``:`` for the skipped axes), and fancy
        int-array indexes (list/tuple-of-ints selects those coordinates).
        Missing trailing axes default to ``:``."""
        axes = list(self.entry.axes)
        idx = _parse_index(idx, len(axes))
        df = self.df
        for axis, sel in zip(axes, idx):
            if isinstance(sel, int):
                # int2slc (fdf_signal.py:188): -1 needs an open stop
                sel = slice(-1, None) if sel == -1 else slice(sel, sel + 1)
            if isinstance(sel, slice):
                if sel.start is None and sel.stop is None and sel.step in (None, 1):
                    continue
            # rank DISTINCT axis values, pick the window, keep all samples
            axis_vals = df.select("shot", axis).distinct()
            if isinstance(sel, list):
                picked = positional_take(axis_vals, order=[axis], positions=sel, by=["shot"])
            else:
                picked = positional_slice(
                    axis_vals, order=[axis], start=sel.start, stop=sel.stop,
                    step=sel.step if sel.step is not None else 1, by=["shot"],
                )
            df = df.join(F.broadcast(picked.select("shot", axis).distinct()), ["shot", axis])
        return df

    # -- arithmetic (fdf_signal.py:30-92: Signal is an ndarray subclass,
    # so te - te_fit / ip / 1e6 / -sig work directly; here they compile
    # to the J3 axis-equi-join + column arithmetic via SignalExpr) -------

    def _expr(self):
        from fdf_spark.operators.arith import SignalExpr

        return SignalExpr(self.df, self.axes, self.units)

    def __add__(self, other):
        return self._expr() + other

    def __radd__(self, other):
        return other + self._expr()

    def __sub__(self, other):
        return self._expr() - other

    def __rsub__(self, other):
        return other - self._expr()

    def __mul__(self, other):
        return self._expr() * other

    def __rmul__(self, other):
        return other * self._expr()

    def __truediv__(self, other):
        return self._expr() / other

    def __rtruediv__(self, other):
        return other / self._expr()

    def __pow__(self, other):
        return self._expr() ** other

    def __neg__(self):
        return -self._expr()

    def __abs__(self):
        return abs(self._expr())

    def resample(self, axis: str, points):
        """Linear-interpolate onto explicit axis coordinates (np.interp
        semantics) — align two signals on different grids before
        arithmetic: ``te.resample('time', g) / other.resample('time', g)``."""
        return self._expr().resample(axis, points)

    # -- materialization helpers --------------------------------------------

    def to_pandas(self):
        order = ["shot"] + list(self.entry.axes)
        return self.df.orderBy(*order).toPandas()

    def to_numpy(self):
        """Dense ndarray in axis order (the reference's native form) —
        driver-side, for plotting/tests only."""
        import numpy as np

        pdf = self.to_pandas()
        axes_vals = [np.sort(pdf[a].unique()) for a in self.entry.axes]
        shape = [len(v) for v in axes_vals]
        arr = np.full(shape, np.nan)
        idx = tuple(
            np.searchsorted(vals, pdf[a].to_numpy())
            for a, vals in zip(self.entry.axes, axes_vals)
        )
        arr[idx] = pdf["value"].to_numpy()
        return arr, axes_vals

    # -- bound methods (X1) --------------------------------------------------

    def plot(self, **kwargs):
        return _plot_signal(self, **kwargs)

    def __repr__(self) -> str:
        e = self.entry
        return f"<signal {e.qualified} shot={self.shot.shot} units={e.units!r} axes={list(e.axes)}>"


# --------------------------------------------------------------------------
# Method registry (X1): parse_method factory.py:893-909 — names bound in
# the catalog resolve to engine callables at access time.
# --------------------------------------------------------------------------

def _method_myfft(owner, n_bins: int | None = 64, **kwargs) -> DataFrame:
    """bes.xml:3 ``myfft`` (modules/bes/fft.py): power spectrum per
    (shot, channel) via applyInPandas. Bound to a container it spans
    every channel; rebound to one signal (X5 inheritance) it covers just
    that channel's rows."""
    from fdf_spark.operators.fft import fft_power

    if isinstance(owner, SignalFrame):
        e = owner.entry
        df = owner.shot.machine.table(e.table).filter(F.col("shot") == owner.shot.shot)
        for col, val in e.where:
            df = df.filter(F.col(col) == val)
        return fft_power(df, by=["shot", "channel"], n_bins=n_bins, **kwargs)
    container = owner
    cat = container.shot.machine._catalog
    entries = [cat.signals[f"{container._entry.path}.{s}"] for s in container._entry.signals]
    tables = {e.table for e in entries}
    if len(tables) != 1:
        raise ValueError("myfft needs a single channel table")
    df = container.shot.machine.table(tables.pop()).filter(
        F.col("shot") == container.shot.shot
    )
    return fft_power(df, by=["shot", "channel"], n_bins=n_bins, **kwargs)


def _method_plot(container: Container, **kwargs):
    """Generic multi-line overlay (Shot.plot factory.py:469-493,
    methods.plot_multi methods.py:45-63): every 1-D signal of the
    container on one axis. Driver-side sink (S9)."""
    sigs = [
        SignalFrame(container.shot, container.shot.machine._catalog.signals[f"{container._entry.path}.{s}"])
        for s in container._entry.signals
    ]
    return _plot_overlay(sigs, **kwargs)


_METHODS = {"myfft": _method_myfft, "plot": _method_plot}


def _bind_method(container: Container, name: str):
    fn = _METHODS[name]

    def bound(*args, **kwargs):
        return fn(container, *args, **kwargs)

    bound.__name__ = name
    return bound


# --------------------------------------------------------------------------
# Plot sink (S9) — matplotlib is optional; the data path (collect via
# toPandas) is exercised even without it.
# --------------------------------------------------------------------------

def _plot_signal(sig: SignalFrame, ax=None, **kwargs):
    pdf = sig.to_pandas()
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return pdf  # headless container: return the collected frame
    if ax is None:
        _, ax = plt.subplots()
    if len(sig.entry.axes) == 1:
        ax.plot(pdf[sig.entry.axes[0]], pdf["value"], **kwargs)
        ax.set_xlabel(f"{sig.entry.axes[0]} [{sig.axis_units(sig.entry.axes[0])}]")
        ax.set_ylabel(f"{sig.entry.signal} [{sig.units}]")
    else:
        x, y = sig.entry.axes[1], sig.entry.axes[0]
        ax.tricontourf(pdf[x], pdf[y], pdf["value"])
        ax.set_xlabel(x)
        ax.set_ylabel(y)
    return ax


def _plot_overlay(sigs: list[SignalFrame], **kwargs):
    frames = [(s, s.to_pandas()) for s in sigs if len(s.entry.axes) == 1]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return {s.entry.signal: pdf for s, pdf in frames}
    _, ax = plt.subplots()
    for s, pdf in frames:
        ax.plot(pdf[s.entry.axes[0]], pdf["value"], label=s.entry.signal, **kwargs)
    ax.legend()
    return ax
