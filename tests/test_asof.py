"""asof_join vs pandas.merge_asof on random non-uniform grids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fdf_spark.operators.asof import asof_join

RNG = np.random.default_rng(7)


def _mk(spark, n_left=120, n_right=80, groups=(1, 2, 3)):
    lrows, rrows = [], []
    for g in groups:
        for t in np.sort(RNG.uniform(0, 100, n_left)):
            lrows.append((g, float(t), float(RNG.normal())))
        for t in np.sort(RNG.uniform(0, 100, n_right)):
            rrows.append((g, float(t), float(RNG.normal())))
    left = spark.createDataFrame(lrows, "g int, t double, lval double")
    right = spark.createDataFrame(rrows, "g int, t double, rval double")
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 1.5])
def test_asof_matches_pandas(spark, direction, tolerance):
    left, right = _mk(spark)
    got = (
        asof_join(left, right, on="t", by=["g"], direction=direction, tolerance=tolerance)
        .orderBy("g", "t")
        .toPandas()
    )
    lp = left.orderBy("t").toPandas()
    rp = right.orderBy("t").toPandas()
    expect = pd.merge_asof(
        lp, rp, on="t", by="g", direction=direction,
        suffixes=("", "_right"), tolerance=tolerance,
    ).sort_values(["g", "t"], ignore_index=True)

    assert len(got) == len(expect)
    for col in ["rval_right" if "rval_right" in expect else "rval"]:
        pass
    g = got["rval_right"].to_numpy()
    # pandas names the right value col 'rval' (no clash) — align manually
    e = expect["rval"].to_numpy()
    mask_nan = np.isnan(e)
    assert np.array_equal(np.isnan(g), mask_nan)
    assert np.allclose(g[~mask_nan], e[~mask_nan], rtol=0, atol=0)


def test_asof_exact_match_included(spark):
    left = spark.createDataFrame([(1, 5.0, 1.0)], "g int, t double, lval double")
    right = spark.createDataFrame([(1, 5.0, 42.0), (1, 4.0, 7.0)], "g int, t double, rval double")
    row = asof_join(left, right, on="t", by=["g"], direction="backward").collect()[0]
    assert row["rval_right"] == 42.0  # allow_exact_matches semantics


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 1.0, 1.0)], "g int, t double, lval double")
    right = spark.createDataFrame([(1, 2.0, 42.0)], "g int, t double, rval double")
    row = asof_join(left, right, on="t", by=["g"], direction="backward").collect()[0]
    assert row["rval_right"] is None
