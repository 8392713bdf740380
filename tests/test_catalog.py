"""Catalog + Machine/Shot/Container/Signal API tests.

Two layers, mirroring the reference's test strategy (SURVEY §5):

1. Structural invariants lifted from the reference's own suite
   (tests/tests.py:36-131): every container holds ≥1 signal or
   sub-container, every signal has axes, every signal has a time axis,
   every signal has a callable plot.
2. What the reference never had: value-level semantics pinned against
   numpy/pandas oracles on deterministic fixtures — selection
   conventions, transforms, efit discovery, logbook algebra, FFT.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fdf_spark.catalog.api import Container, Machine, SignalFrame
from fdf_spark.catalog.descriptors import expand_template
from fdf_spark.catalog.fixtures import generate
from fdf_spark.catalog.registry import Catalog


@pytest.fixture(scope="session")
def fusion_dir(tmp_path_factory) -> str:
    return generate(str(tmp_path_factory.mktemp("fusion")))


@pytest.fixture(scope="session")
def machine(spark, fusion_dir) -> Machine:
    # fresh catalog per session: efit discovery mutates it
    return Machine(spark, fusion_dir, catalog=Catalog())


@pytest.fixture(scope="session")
def shot(machine):
    return machine.s141000


# -- 1. structural invariants (reference tests/tests.py) ---------------------


def test_every_container_nonempty(machine):
    # tests/tests.py:36-57: every container has >= 1 signal or sub-container
    for path, c in machine._catalog.containers.items():
        assert c.signals or c.containers or c.preprocess, path


def test_every_signal_has_axes_and_time(machine):
    # tests/tests.py:59-93 + 114-131: axes exist; 'time' is universal
    for q, e in machine._catalog.signals.items():
        assert e.axes, q
        assert "time" in e.axes, q
        assert e.axes[0] == "time", f"{q}: axes must be time-major (factory.py:970-987)"


def test_every_signal_resolves_and_plots(shot):
    # tests/tests.py:95-112: every signal has a callable plot; here also
    # that attribute access resolves every catalog entry
    cat = shot.machine._catalog
    for q in list(cat.signals):
        path, name = q.rsplit(".", 1)
        if path.startswith("equilibria."):
            continue  # per-shot availability, tested separately
        obj: Container = shot
        for part in path.split("."):
            obj = getattr(obj, part)
        sig = getattr(obj, name)
        assert isinstance(sig, SignalFrame)
        assert callable(sig.plot)


def test_channel_expansion_naming():
    # parse_signal zero-padding rules (factory.py:938-959)
    bes = expand_template("ch{}", "1, 32")
    assert bes[0] == ("ch01", 1) and bes[-1] == ("ch32", 32)
    usxr = expand_template("vtop{}", "16")
    assert usxr[0] == ("vtop00", 0) and usxr[-1] == ("vtop15", 15)
    highn = expand_template("highn_{}", "1,16,1")
    assert highn[0] == ("highn_1", 1) and highn[-1] == ("highn_16", 16)


def test_dir_surface(shot):
    assert "mpts" in dir(shot) and "bes" in dir(shot)
    mpts = shot.mpts
    for name in ("te", "ne", "spline", "comment", "valid"):
        assert name in dir(mpts)


# -- 2. value semantics vs numpy/pandas oracles ------------------------------


def test_signal_df_lazy_and_shaped(shot, fusion_dir):
    ip = shot.ip.data
    assert ip.axes == ["time"] and ip.units == "kA"
    assert ip.axis_units("time") == "ms"
    pdf = ip.to_pandas()
    ref = pd.read_parquet(f"{fusion_dir}/signal_ip.parquet")
    ref = ref[ref.shot == 141000].sort_values("time_ms")
    assert len(pdf) == len(ref)
    np.testing.assert_allclose(pdf["value"].to_numpy(), ref["value"].to_numpy())


def test_channel_signal_filter(shot, fusion_dir):
    ch5 = shot.bes.ch05
    pdf = ch5.to_pandas()
    ref = pd.read_parquet(f"{fusion_dir}/signal_bes.parquet")
    ref = ref[(ref.shot == 141000) & (ref.channel == 5)]
    assert len(pdf) == len(ref)


def test_nearest_scalar_selection(shot, fusion_dir):
    # fdf_signal.py:298-300: argmin(|t - v|), exactly one sample
    ref = pd.read_parquet(f"{fusion_dir}/signal_ip.parquet")
    ref = ref[ref.shot == 141000].sort_values("time_ms").reset_index(drop=True)
    v = float(ref.time_ms.iloc[100]) + 0.1
    i = int(np.abs(ref.time_ms.to_numpy() - v).argmin())
    out = shot.ip.data(time=v).collect()
    assert len(out) == 1
    assert out[0]["time"] == pytest.approx(float(ref.time_ms.iloc[i]))


def test_value_window_excludes_hi_nearest(shot, fusion_dir):
    # fdf_signal.py:296-297,301: [argmin(|t-lo|), argmin(|t-hi|)) — the
    # hi-nearest sample is EXCLUDED
    ref = pd.read_parquet(f"{fusion_dir}/signal_ip.parquet")
    t = ref[ref.shot == 141000].sort_values("time_ms").time_ms.to_numpy()
    lo, hi = float(t[50]) + 0.01, float(t[200]) - 0.01
    ilo = int(np.abs(t - lo).argmin())
    ihi = int(np.abs(t - hi).argmin())
    out = shot.ip.data(time=[lo, hi]).orderBy("time").toPandas()
    np.testing.assert_allclose(out["time"].to_numpy(), t[ilo:ihi])


def test_positional_slice_2d(shot, fusion_dir):
    # te[3:7, 10] — positional on distinct axis values, per parseindex
    ref = pd.read_parquet(f"{fusion_dir}/signal_mpts.parquet")
    ref = ref[ref.shot == 141000]
    times = np.sort(ref.time.unique())
    radii = np.sort(ref.radius_cm.unique())
    out = shot.mpts.te[3:7, 10].orderBy("time").toPandas()
    assert sorted(out.time.unique()) == pytest.approx(list(times[3:7]))
    # radius went through cm→m transform
    assert out.radius.unique() == pytest.approx([radii[10] / 100.0])


def test_parseindex_negative_ellipsis_fancy(shot, fusion_dir):
    # full parseindex surface (fdf_signal.py:189-206,269-281):
    # negative index, negative slice, Ellipsis padding, fancy int-array
    ref = pd.read_parquet(f"{fusion_dir}/signal_mpts.parquet")
    ref = ref[ref.shot == 141000]
    times = np.sort(ref.time.unique())
    radii = np.sort(ref.radius_cm.unique())

    # te[-1] — last timeslice
    out = shot.mpts.te[-1].toPandas()
    assert out.time.unique() == pytest.approx([times[-1]])

    # te[-5:-2] — negative bounds
    out = shot.mpts.te[-5:-2].toPandas()
    assert sorted(out.time.unique()) == pytest.approx(list(times[-5:-2]))

    # te[::-1] — reversed walk selects every coordinate
    out = shot.mpts.te[::-1].toPandas()
    assert sorted(out.time.unique()) == pytest.approx(list(times))

    # te[..., -1] — Ellipsis pads the time axis, -1 picks last radius
    out = shot.mpts.te[..., -1].toPandas()
    assert sorted(out.time.unique()) == pytest.approx(list(times))
    assert out.radius.unique() == pytest.approx([radii[-1] / 100.0])

    # te[[0, -1]] — fancy: first and last timeslice
    out = shot.mpts.te[[0, -1]].toPandas()
    assert sorted(out.time.unique()) == pytest.approx([times[0], times[-1]])

    # te[2.0] — float cast to int like the reference
    out = shot.mpts.te[2.0].toPandas()
    assert out.time.unique() == pytest.approx([times[2]])

    # too many indices still raises
    with pytest.raises(IndexError):
        shot.mpts.te[1, 2, 3]


def test_signal_arithmetic(shot, fusion_dir):
    # fdf_signal.py:30-92: Signal is an ndarray subclass, so arithmetic
    # works directly with axis propagation — here via SignalExpr
    ref = pd.read_parquet(f"{fusion_dir}/signal_mpts.parquet")
    ref = ref[ref.shot == 141000].sort_values(["time", "radius_cm"])

    # signal / signal on the shared (time, radius) grid — the VERDICT's
    # te/ne example
    ratio = shot.mpts.te / shot.mpts.ne
    assert ratio.axes == ["time", "radius"]
    assert ratio.units == "keV/cm^-3"
    got = ratio.to_pandas()
    np.testing.assert_allclose(
        got["value"].to_numpy(), (ref["te"] / ref["ne"]).to_numpy(), rtol=1e-12
    )

    # signal - signal == 0 everywhere, units preserved
    diff = shot.mpts.te - shot.mpts.te
    assert diff.units == "keV"
    assert diff.to_pandas()["value"].abs().max() == 0.0

    # scalar ops, reflected ops, chaining, neg/abs
    ip_ref = pd.read_parquet(f"{fusion_dir}/signal_ip.parquet")
    ip_ref = ip_ref[ip_ref.shot == 141000].sort_values("time_ms")
    ma = shot.ip.data / 1e6
    assert ma.units == shot.ip.data.units
    np.testing.assert_allclose(
        ma.to_pandas()["value"].to_numpy(), ip_ref.value.to_numpy() / 1e6, rtol=1e-12
    )
    twice = 2.0 * shot.ip.data - shot.ip.data
    np.testing.assert_allclose(
        twice.to_pandas()["value"].to_numpy(), ip_ref.value.to_numpy(), rtol=1e-12
    )
    neg = -abs(shot.ip.data)
    assert (neg.to_pandas()["value"].to_numpy() <= 0).all()

    # 2-D ∘ 1-D broadcast: te minus its own time-profile mean would need
    # a different grid; shape contract only — union of axes, no dupes
    prod = shot.mpts.te * shot.mpts.spline.te
    assert prod.axes == ["time", "radius"]
    assert prod.units == "keV*keV"


def test_signal_resample_cross_grid(shot, fusion_dir):
    # align-then-combine for signals on DIFFERENT grids: mpts.te and
    # mpts.spline.te have independent (time, radius) draws; resampling
    # both onto a shared time grid makes the arithmetic join non-empty,
    # and per-series values match np.interp
    ref = pd.read_parquet(f"{fusion_dir}/signal_ip.parquet")
    ref = ref[ref.shot == 141000].sort_values("time_ms")
    t = ref.time_ms.to_numpy(float)
    v = ref.value.to_numpy(float)
    pts = [float(t[0]), float((t[3] + t[4]) / 2), float(t[-1]) + 5.0]
    out = shot.ip.data.resample("time", pts).to_pandas()
    want = np.interp(pts, t, v)
    np.testing.assert_allclose(np.sort(out["value"].to_numpy()), np.sort(want), rtol=1e-12)

    # mpts.te and mpts.spline.te live on INDEPENDENT (time, radius)
    # draws — sequential per-axis resampling puts both on one shared
    # grid, making the arithmetic join dense (2 times × 3 radii)
    tg, rg = [0.1, 0.2], [0.5, 0.8, 1.1]
    a = shot.mpts.te.resample("time", tg).resample("radius", rg)
    b = shot.mpts.spline.te.resample("time", tg).resample("radius", rg)
    pdf = (a / b).to_pandas()
    assert len(pdf) == len(tg) * len(rg)
    assert np.isfinite(pdf["value"].to_numpy()).all()


def test_mpts_transform_units(shot, fusion_dir):
    # modules/mpts/_postprocess.py:9-13: radius/100, units 'cm' → 'm'
    te = shot.mpts.te
    assert te.axis_units("radius") == "m"
    assert dict(te.entry.axis_units)["radius"] == "cm"  # pre-transform record
    pdf = te.to_pandas()
    ref = pd.read_parquet(f"{fusion_dir}/signal_mpts.parquet")
    ref = ref[ref.shot == 141000]
    assert pdf.radius.max() == pytest.approx(ref.radius_cm.max() / 100.0)
    assert "err" in pdf.columns  # error node attached (mpts.xml:8)


def test_usxr_baseline_subtraction(shot, fusion_dir):
    # modules/usxr/_postprocess.py:10-12: value - mean(first 1000)
    sig = shot.usxr.vtop.vtop03
    pdf = sig.to_pandas()
    ref = pd.read_parquet(f"{fusion_dir}/signal_usxr.parquet")
    ref = ref[(ref.shot == 141000) & (ref.array == "vtop") & (ref.channel == 3)]
    ref = ref.sort_values("time")
    expected = ref.value.to_numpy() - ref.value.to_numpy()[:1000].mean()
    # decimal-exact engine mean vs numpy pairwise float mean: O(1e-9) apart
    np.testing.assert_allclose(pdf["value"].to_numpy(), expected, atol=1e-6)


def test_efit_discovery(machine):
    # factory.py:495-512 + equilibria/_preprocess.py:13-43
    s_even = machine.s141000  # index 0 → efit01, efit02
    assert s_even.check_efit() == ["efit01", "efit02"]
    eq = s_even.equilibria
    wmhd = eq.efit02.wmhd
    assert wmhd.units == "J" and wmhd.axes == ["time"]
    assert wmhd.df.count() > 0
    with pytest.raises(AttributeError):
        eq.lrdfit01  # not available for this shot
    s_odd = machine.s141001
    assert s_odd.check_efit() == ["efit01", "lrdfit01"]
    assert s_odd.equilibria.lrdfit01.qpsi.df.count() > 0


def test_qpsi_efit_isolation(machine, fusion_dir):
    # per-tree row filter: efit01 rows only
    q = machine.s141000.equilibria.efit01.qpsi.to_pandas()
    ref = pd.read_parquet(f"{fusion_dir}/efit_qpsi.parquet")
    ref = ref[(ref.shot == 141000) & (ref.efit == "efit01")]
    assert len(q) == len(ref)


def test_logbook_shot_algebra(machine, fusion_dir):
    # get_shotlist/addshot/filter_shots (factory.py:213-293, 596-633)
    ref = pd.read_parquet(f"{fusion_dir}/logbook.parquet")
    live = ref[ref.voided.isna()]
    want = sorted(live[live.xp == 1048].shot.unique())
    got = [r["shot"] for r in machine.get_shotlist(xp=1048).collect()]
    assert got == want
    sub = machine.filter_shots(xp=1048)
    assert list(sub) == want
    with pytest.raises(TypeError):
        sub[want[0] if want else 0] = None
    with pytest.raises(KeyError):
        bad = [s for s in machine._catalog.containers if False]
        sub[999999]
    # union of explicit list + xp query, deduped (factory.py:232-242)
    ids = machine.addshot(shotlist=[999999], xp=1048)
    assert 999999 in ids and set(want) <= set(ids)


def test_shot_xp_date_enrichment(machine, fusion_dir):
    ref = pd.read_parquet(f"{fusion_dir}/logbook.parquet")
    row = ref[(ref.shot == 141000) & ref.voided.isna()].iloc[0]
    s = machine.s141000
    assert s.xp == row.xp and s.date == row.rundate


def test_nodes(shot):
    # metadata leaves (factory.py:1072-1101)
    assert repr(shot.mpts.comment) == "shot 141000 ok"
    assert shot.mpts.valid.value == "1"


def test_filterscopes_distinct_time_axes(shot, fusion_dir):
    # filterscopes.xml:3-12: five signals, five separate time axes
    ref = pd.read_parquet(f"{fusion_dir}/signal_filterscopes.parquet")
    ref = ref[ref.shot == 141000]
    a = shot.filterscopes.bayg_dalpha_eies.to_pandas()
    b = shot.filterscopes.bayi_opipe_dalpha.to_pandas()
    assert len(a) == (ref.name == "bayg_dalpha_eies").sum()
    assert len(b) == (ref.name == "bayi_opipe_dalpha").sum()
    assert len(a) != len(b)  # different sample rates


def test_bes_fft_vs_numpy(shot, fusion_dir):
    # X4: applyInPandas FFT per (shot, channel) vs direct numpy
    out = shot.bes.myfft(n_bins=16).filter(F.col("channel") == 7).orderBy("bin").toPandas()
    ref = pd.read_parquet(f"{fusion_dir}/signal_bes.parquet")
    ref = ref[(ref.shot == 141000) & (ref.channel == 7)].sort_values("time")
    x = ref.value.to_numpy()
    x = x - x.mean()
    spec = np.fft.rfft(x)
    power = (spec.real**2 + spec.imag**2) / len(x)
    np.testing.assert_allclose(out.power.to_numpy(), power[1:17], rtol=1e-9)
    dt = np.median(np.diff(ref.time.to_numpy()))
    np.testing.assert_allclose(out.freq_hz.to_numpy(), np.fft.rfftfreq(len(x), d=dt)[1:17], rtol=1e-9)


def test_to_numpy_roundtrip(shot, fusion_dir):
    arr, (times, radii) = shot.mpts.te.to_numpy()
    ref = pd.read_parquet(f"{fusion_dir}/signal_mpts.parquet")
    ref = ref[ref.shot == 141000]
    nt, nr = ref.time.nunique(), ref.radius_cm.nunique()
    assert arr.shape == (nt, nr)
    assert not np.isnan(arr).any()
    one = ref[(ref.time == times[0])].sort_values("radius_cm").te.to_numpy()
    np.testing.assert_allclose(arr[0, :], one)


def test_get_entries(machine, fusion_dir):
    ref = pd.read_parquet(f"{fusion_dir}/logbook.parquet")
    live = ref[ref.voided.isna()]
    out = machine.get_entries(shot=141000).toPandas()
    want = live[live.shot == 141000].sort_values(["shot", "entered"])
    assert list(out.dbkey) == list(want.dbkey)
    # union path: explicit shot + xp query, deduped by the semi-join
    both = machine.get_entries(shot=141000, xp=1049).toPandas()
    want_shots = set(live[live.xp == 1049].shot) | {141000}
    assert set(both.shot) == want_shots


def test_signal_scan_pushdown(shot):
    # the SignalFrame plan must push the shot/key filters into the parquet
    # scan and prune to the signal's columns (SURVEY §4: free via Catalyst)
    plan = shot.bes.ch05.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(shot,141000)" in plan and "EqualTo(channel,5)" in plan
    assert "ReadSchema" in plan


def test_attribute_inheritance_chain(shot):
    # X5 (factory.py:806-818, fdf_signal.py:234-245): misses delegate up
    # container → parent container → shot; methods rebind to the caller
    assert repr(shot.mpts.spline.comment) == "shot 141000 ok"  # node from parent
    per_sig = shot.bes.ch03.myfft(n_bins=4)  # method inherited by signal
    rows = per_sig.select("channel").distinct().collect()
    assert [r["channel"] for r in rows] == [3]  # rebound: one channel only
    # chain terminates with a clean AttributeError
    with pytest.raises(AttributeError):
        shot.mpts.spline.not_a_thing


def test_catalog_relation(spark):
    cat = Catalog()
    df = cat.to_df(spark)
    n_template = 32 + 16 + 3 * 16  # bes + magnetics.highn + usxr
    assert df.count() == len(cat.signals) >= n_template + 20
    assert df.filter(F.col("diagnostic") == "bes").count() == 32
    # every cataloged signal is time-major with a time axis
    bad = df.filter(~F.array_contains("axes", "time")).count()
    assert bad == 0


def test_fft_batched_matches_grouped_map(spark):
    """fft_power (applyInPandas, wide-series regime) and
    fft_power_batched (collect_list + vectorized pandas_udf,
    many-small-series regime) are the same operator: bit-equal output,
    including on series with exact-duplicate timestamps (shared (t, v)
    tie-break)."""
    import numpy as np

    from fdf_spark.operators.fft import fft_power, fft_power_batched

    rng = np.random.default_rng(7)
    rows = [
        (g, float(t), float(v))
        for g in range(6)
        for t, v in zip(np.sort(rng.uniform(0, 1, 50)), rng.normal(size=50))
    ]
    # group 6: every timestamp duplicated with two distinct values —
    # exercises the tie-break path in both variants
    dup_t = np.sort(rng.uniform(0, 1, 25))
    rows += [
        (6, float(t), float(v))
        for t in dup_t
        for v in rng.normal(size=2)
    ]
    df = spark.createDataFrame(rows, "g long, t double, v double")
    a = (
        fft_power(df, value="v", time="t", by=["g"], n_bins=8)
        .toPandas().sort_values(["g", "bin"]).reset_index(drop=True)
    )
    b = (
        fft_power_batched(df, value="v", time="t", by=["g"], n_bins=8)
        .toPandas().sort_values(["g", "bin"]).reset_index(drop=True)
    )
    assert (a["bin"].values == b["bin"].values).all()
    np.testing.assert_array_equal(a["power"].values, b["power"].values)
    np.testing.assert_array_equal(a["freq_hz"].values, b["freq_hz"].values)


def test_machine_shotset_api_parity(machine):
    """factory.py:124-148,246-275 surface: membership, dir() shot attrs,
    addxp/adddate as addshot restrictions, list_shots ordering."""
    before = machine.list_shots()
    added = machine.addxp(1048)
    assert added == machine.addshot(xp=1048)  # idempotent restriction
    for s in added:
        assert s in machine
        assert f"s{s}" in dir(machine)
    assert "not-a-shot" not in machine
    assert machine.list_shots() == sorted(set(before) | set(added))
    by_date = machine.adddate(machine.shot(added[0]).date) if added else []
    assert machine.list_shots() == sorted(set(machine.list_shots()) | set(by_date))


def test_shot_module_mapping_parity(machine):
    """factory.py:416-436: a Shot iterates/contains/indexes its
    diagnostic modules like a mapping."""
    s = machine.shot(141000)
    mods = list(s)
    assert mods == sorted(mods) and len(s) == len(mods) > 0
    assert mods[0] in s and "nope" not in s
    assert s[mods[0]] is getattr(s, mods[0])  # same cached Container
    import pytest as _pytest

    with _pytest.raises(KeyError):
        s["nope"]
