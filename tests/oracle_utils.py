"""Local replica of the driver's DuckDB-oracle comparison.

The driver registers each parquet table as a DuckDB view, runs the
Spark query and the oracle SQL, and compares row-count + schema +
order-insensitive value-hash. We replicate that as: sort columns by
name, sort rows, compare cell values exactly (floats bit-exact — the
decimal-accumulation discipline in fdf_spark.functions.scalar is what
makes that feasible).
"""

from __future__ import annotations

import math

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


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str, float_tol: float = 0.0):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
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
