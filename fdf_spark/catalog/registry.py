"""Catalog compiler: descriptors → flat signal entries (memoized).

Mirrors the reference's one-time XML→class compilation (``Factory``
factory.py:654-686; memo ``_tree_dict`` :651, class cache ``_classes``
:673-679): ``get_catalog()`` compiles MODULES once per process and every
Machine instance shares the result. Channel templates expand here
(parse_signal factory.py:935-966) so the API layer sees only concrete
signals.

Transforms (X2, the ``_postprocess`` hooks, factory.py:198-201) are
named column-expression builders attached per container in the
descriptors; they run INSIDE the DataFrame plan — Catalyst sees plain
expressions, so pushdown/codegen still apply (no Python in the row
path). Methods (X1, parse_method factory.py:893-909) are a registry of
(name → callable) bound onto containers/signals at access time.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fdf_spark.catalog.descriptors import (
    EFIT_CANDIDATES,
    EFIT_TEMPLATE,
    MODULES,
    AxisDesc,
    ContainerDesc,
    SignalDesc,
    expand_template,
)


@dataclass(frozen=True)
class CatalogEntry:
    """One concrete signal: where it lives and how to read it."""

    diagnostic: str
    container_path: str  # e.g. 'mpts.spline'
    signal: str
    table: str
    value_col: str
    axes: tuple[str, ...]  # logical axis names, time-major
    axis_cols: tuple[tuple[str, str], ...]  # name → physical column
    axis_units: tuple[tuple[str, str | None], ...]
    units: str | None
    err_col: str | None
    where: tuple[tuple[str, object], ...]
    channel: int | None
    transform: str | None
    title: str | None = None
    desc: str | None = None

    @property
    def qualified(self) -> str:
        return f"{self.container_path}.{self.signal}"


@dataclass(frozen=True)
class ContainerEntry:
    path: str
    diagnostic: str
    signals: tuple[str, ...]
    containers: tuple[str, ...]
    methods: tuple[str, ...]
    nodes: tuple[str, ...]
    preprocess: str | None
    title: str | None


class Catalog:
    def __init__(self, modules: tuple[ContainerDesc, ...] = MODULES):
        self.signals: dict[str, CatalogEntry] = {}
        self.containers: dict[str, ContainerEntry] = {}
        for mod in modules:
            self._compile(mod, parent_path=None, diagnostic=mod.name)

    # -- compilation --------------------------------------------------------

    def _compile(
        self,
        c: ContainerDesc,
        parent_path: str | None,
        diagnostic: str,
        inherited_post: str | None = None,
        inherited_axes: tuple[AxisDesc, ...] = (),
    ) -> None:
        path = c.name if parent_path is None else f"{parent_path}.{c.name}"
        post = c.postprocess or inherited_post
        # axis inheritance: child containers see parent axes unless they
        # redeclare them (chers.spline redeclares radius, keeps time —
        # factory.py:735-752 axis attach walks the container scope)
        axis_scope = {a.name: a for a in inherited_axes}
        axis_scope.update({a.name: a for a in c.axes})
        sig_names: list[str] = []
        for s in c.signals:
            for entry in self._expand_signal(s, diagnostic, path, post, axis_scope):
                self.signals[entry.qualified] = entry
                sig_names.append(entry.signal)
        self.containers[path] = ContainerEntry(
            path=path,
            diagnostic=diagnostic,
            signals=tuple(sig_names),
            containers=tuple(f"{path}.{sub.name}" for sub in c.containers),
            methods=c.methods,
            nodes=c.nodes,
            preprocess=c.preprocess,
            title=c.title,
        )
        for sub in c.containers:
            self._compile(sub, path, diagnostic, post, tuple(axis_scope.values()))

    def _expand_signal(
        self,
        s: SignalDesc,
        diagnostic: str,
        path: str,
        post: str | None,
        axis_scope: dict[str, AxisDesc],
    ):
        axis_cols = tuple(
            (a, axis_scope[a].column if a in axis_scope else a) for a in s.axes
        )
        axis_units = tuple(
            (a, axis_scope[a].units if a in axis_scope else None) for a in s.axes
        )
        common = dict(
            diagnostic=diagnostic,
            container_path=path,
            table=s.table,
            value_col=s.value_col,
            axes=s.axes,
            axis_cols=axis_cols,
            axis_units=axis_units,
            units=s.units,
            err_col=s.err_col,
            transform=s.transform or post,
            title=s.title,
            desc=s.desc,
        )
        if s.range_spec is None:
            yield CatalogEntry(signal=s.name, where=s.where, channel=None, **common)
        else:
            for name, idx in expand_template(s.name, s.range_spec):
                yield CatalogEntry(
                    signal=name,
                    where=s.where + ((s.channel_col, idx),),
                    channel=idx,
                    **common,
                )

    # -- efit template instantiation (X3, factory.py:495-512 + _preprocess) --

    def instantiate_efit(self, tree: str) -> None:
        """Register the [efit] template under equilibria.<tree> with a
        per-tree row filter — the Spark analog of the reference's dynamic
        class synthesis (_preprocess.py:13-43)."""
        path = f"equilibria.{tree}"
        if path in self.containers:
            return
        inst = replace(EFIT_TEMPLATE, name=tree)
        self._compile(inst, "equilibria", "equilibria")
        # rebind every signal of the instance to filter on its tree
        for sig in self.containers[path].signals:
            q = f"{path}.{sig}"
            e = self.signals[q]
            self.signals[q] = replace(e, where=e.where + (("efit", tree),))
        # parent link
        eq = self.containers["equilibria"]
        if path not in eq.containers:
            self.containers["equilibria"] = replace(
                eq, containers=eq.containers + (path,)
            )

    # -- relational view of the catalog itself (S5) -------------------------

    def rows(self) -> list[tuple]:
        out = []
        for e in sorted(self.signals.values(), key=lambda e: e.qualified):
            out.append(
                (
                    e.diagnostic,
                    e.container_path,
                    e.signal,
                    list(e.axes),
                    e.units,
                    e.err_col,
                    e.transform,
                    e.channel,
                    e.table,
                )
            )
        return out

    CATALOG_SCHEMA = (
        "diagnostic string, container_path string, signal string, "
        "axes array<string>, units string, error_col string, "
        "transform string, channel int, table string"
    )

    def to_df(self, spark) -> DataFrame:
        # r14: Arrow-backed local relation — the pickle-RDD form ran
        # the catalog rows through Python workers at every execution of
        # every catalog-driven query (see sources.tables.local_df)
        from fdf_spark.sources.tables import local_df

        return local_df(spark, self.rows(), self.CATALOG_SCHEMA)


@lru_cache(maxsize=1)
def get_catalog() -> Catalog:
    """Compile-once memoization (the reference's ``_tree_dict``/_classes
    caches, factory.py:651,673-679). Note: shared instance — efit
    instantiation mutates it process-wide, like the reference's class
    cache."""
    return Catalog()


# --------------------------------------------------------------------------
# Transform registry (X2): name → (entry, df) -> df column rewrite.
# Pure column expressions / native window plans — no Python row path.
# --------------------------------------------------------------------------

def _mpts_radius_cm_to_m(entry: CatalogEntry, df: DataFrame) -> DataFrame:
    # modules/mpts/_postprocess.py:9-13 — radius/100, units cm → m
    if "radius" in df.columns:
        df = df.withColumn("radius", F.col("radius") / 100.0)
    return df


def _usxr_baseline1000(entry: CatalogEntry, df: DataFrame) -> DataFrame:
    # modules/usxr/_postprocess.py:10-12 — subtract mean of first 1000
    # samples per signal instance (per shot within this signal's filter)
    from fdf_spark.operators.windows import baseline_subtract

    out = baseline_subtract(
        df, "value", order=["time"], n=1000, by=["shot"], out="__adj"
    )
    return out.withColumn("value", F.col("__adj")).drop("__adj")


TRANSFORMS = {
    "mpts_radius_cm_to_m": _mpts_radius_cm_to_m,
    "usxr_baseline1000": _usxr_baseline1000,
}

#: units rewritten by a transform (postprocess may rewrite units,
#: mpts/_postprocess.py:12)
TRANSFORM_UNITS = {
    "mpts_radius_cm_to_m": {"radius": "m"},
}
