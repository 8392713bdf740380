"""Every SQL-expressible registry query hash-matches its DuckDB oracle
(the same check the driver runs at sf0.01; here at sf0.001 for speed,
with a small marked subset also run at sf0.01 in test_oracle_sf001)."""

from __future__ import annotations

import pytest

from fdf_spark.queries import load_all
from tests.conftest import SMOKE_DIR
from tests.oracle_utils import run_compare

REGISTRY = load_all()
SQL_QUERIES = [q for q in REGISTRY.values() if q.sql is not None]
NO_SQL_QUERIES = [q for q in REGISTRY.values() if q.sql is None]


@pytest.mark.parametrize("q", SQL_QUERIES, ids=[q.name for q in SQL_QUERIES])
def test_oracle_match(spark, duck, q):
    run_compare(spark, duck, q, SMOKE_DIR)


@pytest.mark.parametrize("q", NO_SQL_QUERIES, ids=[q.name for q in NO_SQL_QUERIES])
def test_rows_only(spark, q):
    df = q.fn(spark, SMOKE_DIR)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.schema.fields) > 0


def test_approx_distinct_error(spark):
    """q22 sketch within 5% of exact counts."""
    approx = REGISTRY["q22_approx_distinct_sketch"].fn(spark, SMOKE_DIR).collect()[0]
    exact = REGISTRY["q21_distinct_counts"].fn(spark, SMOKE_DIR).collect()[0]
    assert abs(approx["approx_parts"] - exact["n_parts"]) <= 0.05 * exact["n_parts"] + 2
    assert abs(approx["approx_orders"] - exact["n_orders"]) <= 0.05 * exact["n_orders"] + 2


def test_q46_pre_agg_matches_sql_text(spark):
    # r15: the pre-aggregate-then-groupingSets shape must equal the
    # shared SQL text (single Expand over fact rows) exactly — same
    # columns, dtypes, rows incl. NULL grouping rows
    from fdf_spark.queries import load_all
    from fdf_spark.queries.relational import _Q46_SQL
    from fdf_spark.sources.tables import register_views
    from tests.conftest import SMOKE_DIR

    register_views(spark, SMOKE_DIR)
    want = spark.sql(_Q46_SQL).toPandas()
    got = load_all()["q46_grouping_sets"].fn(spark, SMOKE_DIR).toPandas()
    assert list(want.columns) == list(got.columns)
    assert list(want.dtypes) == list(got.dtypes)
    assert want.equals(got)
