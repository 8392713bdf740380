"""Local replica of the driver's DuckDB-oracle comparison.

The driver registers each parquet table as a DuckDB view, runs the
Spark query and the oracle SQL, and compares row-count + schema +
order-insensitive value-hash. We replicate that as: sort columns by
name, sort rows, compare cell values exactly (floats bit-exact — the
decimal-accumulation discipline in fdf_spark.functions.scalar is what
makes that feasible).
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd

from fdf_spark.sources.tables import TABLES


def register_duck_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def _col_kind(series: pd.Series) -> str:
    """Coarse value-type kind for driver-faithful dtype comparison.

    The round driver's value-hash is type-sensitive: a DuckDB HUGEINT
    (int128) arrives in pandas as ``object`` of ``Decimal`` and hashes
    differently from Spark's int64 even when ``str()`` matches (the
    exact blind spot that shipped r5's q124/q125 failures — VERDICT r5
    "What's wrong" #2).  We therefore classify each column by value
    kind and reject Decimal-vs-numeric drift outright.  int-vs-float is
    allowed (NULL-induced widening happens symmetrically on both
    engines' pandas conversions and the driver compares post-widening).
    """
    k = series.dtype.kind
    if k in "iu":
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    if k == "M":
        return "M"
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, decimal.Decimal):
            return "dec"
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return "b"
        if isinstance(v, (int, np.integer)):
            return "i"
        if isinstance(v, (float, np.floating)):
            return "f"
        if isinstance(v, str):
            return "s"
        if isinstance(v, (bytes, bytearray)):
            return "y"
        if isinstance(v, (datetime.datetime, pd.Timestamp)):
            return "M"
        if isinstance(v, datetime.date):
            return "D"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "a"
        if isinstance(v, dict):
            return "m"
        return type(v).__name__
    return "null"


_KIND_COMPAT = {frozenset({"i", "f"}), frozenset({"M", "D"})}


def assert_dtype_compatible(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    """Reject per-column value-type drift the driver's hash would see.

    In particular DuckDB HUGEINT/DECIMAL arriving as ``Decimal`` objects
    must fail here even though ``str(a) == str(b)`` — that is exactly
    the class the r5 driver caught and the local replica missed.
    """
    for col in spark_pdf.columns:
        if col not in duck_pdf.columns:
            continue
        sk, dk = _col_kind(spark_pdf[col]), _col_kind(duck_pdf[col])
        if sk == dk or "null" in (sk, dk):
            continue
        assert frozenset({sk, dk}) in _KIND_COMPAT, (
            f"{name}: col {col} value-type drift: spark kind {sk!r} vs "
            f"oracle kind {dk!r} — the driver's value-hash is "
            f"type-sensitive (DuckDB HUGEINT/DECIMAL? cast the oracle, "
            f"e.g. CAST(SUM(x) AS BIGINT))"
        )


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str, float_tol: float = 0.0):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    assert_dtype_compatible(spark_pdf, duck_pdf, name)
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                ok = b is None or (isinstance(b, float) and math.isnan(b))
            elif isinstance(a, float) and isinstance(b, float):
                ok = a == b or abs(a - b) <= float_tol * max(1.0, abs(a), abs(b))
            else:
                ok = a == b or str(a) == str(b)
            assert ok, f"{name}: col {col} row {i}: spark={a!r} oracle={b!r}"


def run_compare(spark, duck, q, sf_dir: str, float_tol: float = 0.0):
    """Run one registry Query against its oracle and compare."""
    register_duck_views(duck, sf_dir)
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    assert q.sql is not None
    duck_pdf = duck.execute(q.sql).fetch_arrow_table().to_pandas()
    compare_frames(spark_pdf, duck_pdf, q.name)
    return spark_pdf
