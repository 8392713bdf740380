"""Module descriptors — the reference's XML schemas as Python literals.

One entry per reference module (``/root/reference/fdf/modules/*/*.xml``),
preserving every attribute that affects query semantics: axes (time-major
order, parse_axes factory.py:970-987), units (parse_units :1002-1009),
error nodes (parse_error :1012-1024), templated channel ranges
(parse_signal :935-966), per-signal axis_refs (filterscopes.xml:3-12),
method bindings (parse_method :893-909) and pre/postprocess hooks.

The physical mapping replaces MDSplus node addressing: each signal binds
to a long-format Parquet table (FIXTURES.md Group A) via ``table``, an
optional ``where`` key filter (channel / name / array discriminator
columns), a ``value_col`` and optional ``err_col``. Axes are columns of
the same table, so axis lock-step slicing (fdf_signal.py:133-168) is a
row filter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class AxisDesc:
    """An axis column: name + units (+ the column storing it)."""

    name: str
    units: str | None = None
    col: str | None = None  # physical column; defaults to name

    @property
    def column(self) -> str:
        return self.col or self.name


@dataclass(frozen=True)
class SignalDesc:
    """One logical signal bound to a long-format table.

    ``template``/``range_spec`` reproduce the reference's channel
    fan-out (parse_signal factory.py:935-966): range '1,32' → 1..32,
    '16' → 0..15, '1,16,1' → 1..16 with explicit zero-pad width 1;
    default pad width = ceil(log10(end-1)).
    """

    name: str
    units: str | None
    axes: tuple[str, ...]
    table: str
    value_col: str = "value"
    err_col: str | None = None
    where: tuple[tuple[str, object], ...] = ()
    range_spec: str | None = None  # raw XML range attribute
    channel_col: str = "channel"
    title: str | None = None
    desc: str | None = None
    transform: str | None = None  # named entry in registry.TRANSFORMS


@dataclass(frozen=True)
class ContainerDesc:
    name: str
    signals: tuple[SignalDesc, ...] = ()
    axes: tuple[AxisDesc, ...] = ()
    containers: tuple["ContainerDesc", ...] = ()
    methods: tuple[str, ...] = ()
    nodes: tuple[str, ...] = ()
    postprocess: str | None = None  # named hook applied to every signal
    preprocess: str | None = None  # container-build hook (efit discovery)
    title: str | None = None


def parse_range(range_spec: str) -> tuple[list[int], int]:
    """Replicate the reference's range parsing exactly
    (factory.py:938-948): returns (indices, zero-pad digits)."""
    parts = [p.strip() for p in range_spec.split(",")]
    if len(parts) == 1:
        start, end = 0, int(parts[0])
    else:
        start, end = int(parts[0]), int(parts[1]) + 1
    if len(parts) == 3:
        digits = int(parts[2])
    else:
        digits = int(math.ceil(math.log10(end - 1)))
    return list(range(start, end)), digits


def expand_template(name: str, range_spec: str) -> list[tuple[str, int]]:
    """'ch{}', '1,32' → [('ch01', 1), …, ('ch32', 32)] — the templated
    channel fan-out (bes.xml:5, magnetics.xml:14, usxr.xml:7-15)."""
    indices, digits = parse_range(range_spec)
    return [(name.format(str(i).zfill(digits)), i) for i in indices]


# --------------------------------------------------------------------------
# Module registry. Citations: the XML file each block mirrors.
# --------------------------------------------------------------------------

def _waveform(module: str, data_units: str) -> ContainerDesc:
    """ip.xml / vloop.xml: time axis in ms (dim_of='0'), one data signal,
    bound plot method."""
    table = f"signal_{module}"
    return ContainerDesc(
        name=module,
        axes=(AxisDesc("time", "ms", col="time_ms"),),
        signals=(
            SignalDesc("data", data_units, ("time",), table),
        ),
        methods=("plot",),
    )


MODULES: tuple[ContainerDesc, ...] = (
    # ip.xml:1-6
    _waveform("ip", "kA"),
    # vloop.xml:1-6
    _waveform("vloop", "V"),
    # bes.xml:1-7 — 32 channels on a shared time axis + myfft method
    ContainerDesc(
        name="bes",
        axes=(AxisDesc("time", "s"),),
        signals=(
            SignalDesc(
                "ch{}", "V", ("time",), "signal_bes", range_spec="1, 32"
            ),
        ),
        methods=("myfft",),
    ),
    # magnetics.xml:1-17
    ContainerDesc(
        name="magnetics",
        axes=(AxisDesc("time", "s"),),
        signals=(
            SignalDesc(
                "highf", "V", ("time",), "signal_magnetics",
                where=(("name", "highf"),),
            ),
        ),
        containers=(
            ContainerDesc(
                name="filtered",
                axes=(AxisDesc("time", "s"),),
                signals=tuple(
                    SignalDesc(
                        n, "G", ("time",), "signal_magnetics",
                        where=(("name", n),),
                    )
                    for n in ("lowf_oddn", "lowf_evenn", "midf_oddn", "midf_evenn")
                ),
            ),
            ContainerDesc(
                name="highn",
                axes=(AxisDesc("time", "s"),),
                signals=(
                    SignalDesc(
                        "highn_{}", "V", ("time",), "signal_magnetics_highn",
                        range_spec="1,16,1",
                    ),
                ),
            ),
        ),
    ),
    # mpts.xml:1-21 — 2-D profiles, cm radius rewritten to m by
    # _postprocess (modules/mpts/_postprocess.py:9-13); axes declared
    # 'radius, time' but stored time-major (parse_axes transpose,
    # factory.py:970-987)
    ContainerDesc(
        name="mpts",
        title="Multipoint Thomson Scattering",
        nodes=("comment", "valid"),
        postprocess="mpts_radius_cm_to_m",
        axes=(AxisDesc("radius", "cm", col="radius_cm"), AxisDesc("time", "s")),
        signals=(
            SignalDesc(
                "te", "keV", ("time", "radius"), "signal_mpts",
                value_col="te", err_col="te_err", title="Electron Temperature",
            ),
            SignalDesc(
                "ne", "cm^-3", ("time", "radius"), "signal_mpts",
                value_col="ne", err_col="ne_err",
            ),
        ),
        containers=(
            ContainerDesc(
                name="spline",
                axes=(AxisDesc("radius", "cm", col="radius_cm"), AxisDesc("time", "s")),
                signals=(
                    SignalDesc(
                        "te", "keV", ("time", "radius"), "signal_mpts_spline",
                        value_col="te",
                    ),
                    SignalDesc(
                        "ne", "cm^-3", ("time", "radius"), "signal_mpts_spline",
                        value_col="ne",
                    ),
                ),
                postprocess="mpts_radius_cm_to_m",
            ),
        ),
    ),
    # chers.xml:1-26
    ContainerDesc(
        name="chers",
        nodes=("valid",),
        axes=(AxisDesc("radius", "cm"), AxisDesc("time", "s")),
        signals=tuple(
            SignalDesc(
                n, u, ("time", "radius"), "signal_chers",
                value_col=n, err_col=f"d{n}",
            )
            for n, u in (("ti", "keV"), ("vt", "km/s"), ("ft", "Hz"), ("nc", "1e13/cm^3"))
        ),
        containers=(
            ContainerDesc(
                name="derived",
                nodes=("valid",),
                signals=tuple(
                    SignalDesc(
                        n, u, ("time", "radius"), "signal_chers_derived",
                        value_col=n, err_col=f"d{n}",
                    )
                    for n, u in (("zeff", ""), ("nd", "1e13/cm^3"), ("pi", "kPa"))
                ),
            ),
            ContainerDesc(
                name="spline",
                nodes=("valid",),
                axes=(AxisDesc("radius", "cm"),),
                signals=tuple(
                    SignalDesc(n, u, ("time", "radius"), "signal_chers_spline", value_col=n)
                    for n, u in (
                        ("tis", "keV"), ("vts", "km/s"), ("zeffs", ""), ("ncs", "1e13/cm^3")
                    )
                ),
            ),
        ),
    ),
    # usxr.xml:1-16 — 3 sub-arrays × 16 zero-padded channels; baseline
    # subtraction postprocess (modules/usxr/_postprocess.py:10-12)
    ContainerDesc(
        name="usxr",
        title="USXR",
        postprocess="usxr_baseline1000",
        containers=tuple(
            ContainerDesc(
                name=arr,
                title=title,
                axes=(AxisDesc("time", "s"),),
                signals=(
                    SignalDesc(
                        arr + "{}", "DN", ("time",), "signal_usxr",
                        range_spec="16", where=(("array", arr),),
                    ),
                ),
                postprocess="usxr_baseline1000",
            )
            for arr, title in (
                ("vtop", "Vertical Top"), ("hup", "Horizontal Down"), ("hdown", "Horizontal Down")
            )
        ),
    ),
    # filterscopes.xml:1-13 — five signals with five DISTINCT time axes
    # (axis_ref indirection); name-keyed table, per-name time axis
    ContainerDesc(
        name="filterscopes",
        axes=(AxisDesc("time", "s"),),
        signals=tuple(
            SignalDesc(
                n, "AU", ("time",), "signal_filterscopes",
                where=(("name", n),), desc=d,
            )
            for n, d in (
                ("bayg_dalpha_eies", "midplane tangential"),
                ("bayi_opipe_dalpha", "inner divertor"),
                ("baye_dalf_haifa", "upper divertor"),
                ("bayd_dalpha_haifa", "lower divertor"),
                ("bayi_dalpha_eies", "midplane radial"),
            )
        ),
    ),
    # equilibria.xml + efit.xml — container whose children are discovered
    # per shot from the availability table (check_efit factory.py:495-512,
    # _preprocess.py:13-43); efit.xml template instantiated per tree
    ContainerDesc(
        name="equilibria",
        preprocess="efit_discovery",
    ),
)

#: efit.xml:1-11 — the [efit] template, instantiated per available tree
EFIT_TEMPLATE = ContainerDesc(
    name="[efit]",
    axes=(
        AxisDesc("time", "s"),
        AxisDesc("psin", None),
        AxisDesc("r", "m"),
        AxisDesc("z", "m"),
    ),
    signals=(
        SignalDesc(
            "qpsi", None, ("time", "psin"), "efit_qpsi",
            value_col="qpsi", title="Q_psi",
        ),
        SignalDesc(
            "wmhd", "J", ("time",), "efit_scalar",
            value_col="wmhd", title="Stored Energy",
        ),
        SignalDesc(
            "psirz", "J", ("time", "r", "z"), "efit_psirz",
            value_col="psi", title="Psi (R, z)",
        ),
    ),
)

#: the 18 candidate equilibrium trees (factory.py:497-500)
EFIT_CANDIDATES: tuple[str, ...] = tuple(
    [f"efit{i:02d}" for i in range(1, 7)] + [f"lrdfit{i:02d}" for i in range(1, 13)]
)
