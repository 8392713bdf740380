"""Oracle-checked query registry.

Every operator in SURVEY §2 is exercised by at least one named query
here. Each entry pairs a Spark DataFrame program with (where
SQL-expressible) an ANSI-SQL oracle that DuckDB runs over the same
parquet; the driver hash-compares the two at sf0.01.

Registration is decorator-based so the per-domain modules
(relational / fusion / llm / streaming) stay independent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    operators: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, sql: str | None, operators: tuple[str, ...] = (), doc: str = ""):
    """Register an oracle-checked query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, operators=operators, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from fdf_spark.queries import catalog, fusion, llm, relational, streaming  # noqa: F401

    return REGISTRY
