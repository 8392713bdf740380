"""Operator semantics vs numpy reference implementations — replicates
the exact conventions of fdf_signal.py:295-301 (scalar → slice(i,i+1);
range → slice(argmin|t-lo|, argmin|t-hi|), hi-nearest EXCLUDED)."""

from __future__ import annotations

import numpy as np
import pytest

from fdf_spark.operators.selection import nearest_sample, positional_slice, value_window

RNG = np.random.default_rng(42)
N = 200


@pytest.fixture(scope="module")
def sig(spark):
    """Two-group non-uniform-grid signal."""
    rows = []
    for g in (1, 2):
        t = np.sort(RNG.uniform(0.0, 10.0, N))
        v = RNG.normal(size=N)
        rows += [(g, float(tt), float(vv)) for tt, vv in zip(t, v)]
    return spark.createDataFrame(rows, "shot int, time double, value double")


def _np_axis(df, g):
    pdf = df.filter(f"shot = {g}").orderBy("time").toPandas()
    return pdf["time"].to_numpy(), pdf["value"].to_numpy()


@pytest.mark.parametrize("v", [0.0, 3.14159, 5.0, 9.999, 12.0, -3.0])
def test_nearest_sample_matches_argmin(spark, sig, v):
    out = nearest_sample(sig, "time", v, by=["shot"]).orderBy("shot").collect()
    assert len(out) == 2
    for row in out:
        t, _ = _np_axis(sig, row["shot"])
        i = int(np.abs(t - v).argmin())  # fdf_signal.py:299-300
        assert row["time"] == pytest.approx(t[i], abs=0)


@pytest.mark.parametrize(
    "lo,hi", [(2.0, 7.0), (0.0, 10.0), (-1.0, 4.2), (6.0, 6.1), (7.0, 2.0), (5.0, 5.0)]
)
def test_value_window_matches_slice(spark, sig, lo, hi):
    out = value_window(sig, "time", lo, hi, by=["shot"])
    for g in (1, 2):
        t, _ = _np_axis(sig, g)
        i_lo = int(np.abs(t - lo).argmin())
        i_hi = int(np.abs(t - hi).argmin())
        expect = t[i_lo:i_hi]  # fdf_signal.py:296-297,301 — no +1 on hi
        got = sorted(r["time"] for r in out.filter(f"shot = {g}").collect())
        assert got == pytest.approx(list(expect), abs=0)


def test_nearest_tie_takes_first(spark):
    """Equidistant straddle → numpy argmin picks the FIRST (smaller time)."""
    df = spark.createDataFrame([(1, 1.0, 10.0), (1, 3.0, 20.0)], "shot int, time double, value double")
    row = nearest_sample(df, "time", 2.0, by=["shot"]).collect()[0]
    assert row["time"] == 1.0


@pytest.mark.parametrize("start,stop,step", [(0, 50, 1), (10, 20, 2), (150, 500, 1), (5, 5, 1), (0, None, 7)])
def test_positional_slice(spark, sig, start, stop, step):
    out = positional_slice(sig, order=["time"], start=start, stop=stop, step=step, by=["shot"])
    for g in (1, 2):
        t, _ = _np_axis(sig, g)
        expect = list(t[start:stop:step])
        got = sorted(r["time"] for r in out.filter(f"shot = {g}").collect())
        assert got == pytest.approx(expect, abs=0)
