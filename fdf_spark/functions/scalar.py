"""Scalar / aggregate function library (SURVEY §2.8 F1-F12, §2.4).

Everything here is a native Column expression — JVM-side, codegen'd,
no Python UDFs — so the hot path stays inside whole-stage codegen at
any scale.

Oracle-stability note (drives the ``dsum``/``davg`` shape): summing
doubles is order-dependent, and a 1000-partition shuffle sums in a
different order than DuckDB's single-threaded fold. We therefore do
exact decimal accumulation (associative, order-independent) and cast
the final result back to double. The SQL-oracle twin of
``dsum(x)`` is ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal type used for exact accumulation where the column is STORED
#: (IVM state tables) — wide headroom, schema-stable across rounds.
ACC_DECIMAL = "decimal(25,6)"

#: decimal type for TRANSIENT sum inputs (dsum/davg — result is cast
#: back to double, so the declared precision never reaches a schema).
#: Precision 18 is Spark's compact-Decimal ceiling: the per-row cast
#: and the partial-sum adds stay on the long-backed fast path instead
#: of allocating a java BigDecimal per row (r14 measurement, q01's
#: 5-sum aggregate at sf0.1 min-of-4: 1.32 s at decimal(25,6) → 1.07 s
#: at decimal(18,6); pure-double was 0.29 s, so this claws back ~25%
#: of the exactness premium for free). Rounding to scale 6 is
#: precision-independent, so results are bit-identical to the oracle's
#: DECIMAL(25,6) twin as long as |value| < 10^12 — six orders above
#: any per-row measure in the schema; the sum BUFFER is decimal(28,6)
#: (10^22 headroom: a 10^12-row group of 10^6-magnitude values sums to
#: 10^18, four orders clear).
SUM_DECIMAL = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column (exact decimal accumulate).

    Envelope (ADVICE r14): the per-row cast is decimal(18,6) — 12
    integer digits — while the oracle twin :func:`sql_dsum` accumulates
    at DECIMAL(25,6).  Under ANSI mode (Spark 4's DEFAULT, verified on
    and relied upon here) an out-of-envelope value ``|v| >= 10^12``
    RAISES ``NUMERIC_VALUE_OUT_OF_RANGE`` at execution — the loud
    failure the envelope needs, at zero per-row guard cost (an explicit
    per-row range check measured +10% on the whole headline decimal
    family; ``tests/test_transforms.py::test_dsum_envelope_guard`` pins
    the raise so an ansi=false session can't silently reintroduce the
    drop).  NaN/Inf are the inputs ANSI still casts to NULL silently —
    and DuckDB's DECIMAL cast errors on them — so non-finite measures
    must be cleaned upstream of dsum; no fixture column carries them
    (two-SF oracle sweeps)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(SUM_DECIMAL)).cast("double")


def dsum_partials_arrow(df, keys, measures):
    """Arrow partial-sum tier for a ``groupBy(keys).agg(dsum(...)...)``
    block → ``(keys…, n long, s_<name> decimal(38,0)…)`` with ONE
    partial row per group per task.

    Each measure value contributes its exact 6-dp HALF_UP decimal as a
    scaled integer (``_scaled6_int_np`` — the same integer behind
    ``cast(double AS decimal(18,6))``), per-task sums accumulate as
    unbounded Python ints (chunked int64 adds, so no width ever
    overflows silently), and the partial crosses the wire as
    decimal(38,0).  The caller finishes with ``F.sum(s)`` (exact
    decimal adds) and ``(s / 1000000).cast("double")`` — the division
    result is decimal(38,6), exact because the value has ≤ 6
    fractional digits, and the final cast is the same
    correctly-rounded decimal→double both dsum and the DuckDB twin
    perform.  Bitwise-equal to the dsum aggregate (pinned in pytest);
    the win is that the per-row work is one numpy pass instead of a
    per-row BigDecimal allocation per measure (~0.5 s per dsum column
    at 600k rows — the r15 q48 decomposition), and the exchange
    carries groups×tasks narrow rows either way (dsum's map-side
    combine did the same).

    Envelope (same one :func:`dsum` declares, enforced loudly): every
    measure value must be finite and non-null — dsum's ANSI cast
    raises on out-of-range and the fixture contract has no NaN/Inf/
    NULL measures; this tier raises ``ValueError`` on any of them
    rather than diverging silently.

    ``measures`` is ``{name: fn(pdf) -> float64 ndarray}`` — derived
    columns (e.g. ``p*(1-d)``) compute inside the batch with the same
    IEEE op order as the Column expression they replace.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811 — local alias

    from fdf_spark.llm.similarity import _scaled6_int_np

    names = list(measures)

    def _exact_sum(arr) -> int:
        import numpy as np

        if not len(arr):
            return 0
        m = int(np.abs(arr).max())
        if m == 0:
            return 0
        step = max(1, (1 << 62) // (m + 1))
        if step >= len(arr):
            return int(arr.sum(dtype=np.int64))
        return sum(
            int(arr[i : i + step].sum(dtype=np.int64))
            for i in range(0, len(arr), step)
        )

    def partials(batches):
        import numpy as np

        acc: dict[tuple, list] = {}
        for pdf in batches:
            vals = []
            for name in names:
                v = np.asarray(measures[name](pdf), dtype=np.float64)
                if not np.isfinite(v).all():
                    raise ValueError(
                        f"dsum_partials_arrow: non-finite/null values in "
                        f"measure {name!r} — outside the dsum envelope"
                    )
                vals.append(_scaled6_int_np(v))
            # C-path grouping (pandas .indices), not a Python zip/tuple
            # factorize — with one measure the Python key pass would
            # dominate the batch (r15 q19 measurement)
            idx = pdf.groupby(keys, sort=False, dropna=False).indices
            for k, pos in idx.items():
                if not isinstance(k, tuple):
                    k = (k,)
                n = len(pos)
                sums = [_exact_sum(v[pos]) for v in vals]
                a = acc.get(k)
                if a is None:
                    acc[k] = [n, sums]
                else:
                    a[0] += n
                    a[1] = [x + y for x, y in zip(a[1], sums)]
        out = {k: [] for k in keys}
        out["n"] = []
        for name in names:
            out[f"s_{name}"] = []
        for k, (n, sums) in acc.items():
            for kc, kv in zip(keys, k):
                out[kc].append(kv)
            out["n"].append(n)
            for name, s in zip(names, sums):
                out[f"s_{name}"].append(s)
        yield pd.DataFrame(out)

    key_schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    s_schema = ", ".join(f"s_{name} decimal(38,0)" for name in names)
    return df.mapInPandas(partials, schema=f"{key_schema}, n long, {s_schema}")


def dsum_finish(name: str) -> Column:
    """The exact finish for a :func:`dsum_partials_arrow` total after
    ``F.sum(s_<name>)``: decimal(38,0)/10^6 is decimal(38,6) and EXACT
    (≤ 6 fractional digits), and the cast is the correctly-rounded
    decimal→double both dsum and the oracle twin perform."""
    return (F.col(f"s_{name}") / F.lit(1000000)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, then double.

    (Doing the division in double keeps Spark's and DuckDB's decimal
    division scale rules out of the comparison.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    """SQL twin of :func:`dsum` for DuckDB oracles."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """SQL twin of :func:`davg`."""
    return f"{sql_dsum(expr)} / COUNT({expr})"


# --- unit conversions (reference post-process hooks) -----------------------

def cm_to_m(col: Column) -> Column:
    """cm → m (modules/mpts/_postprocess.py:11 — ``data/100``)."""
    return col / F.lit(100.0)


def ms_to_s(col: Column) -> Column:
    """ms → s (ip/plot.py:19, vloop/plot.py:18 — ``t/1000``)."""
    return col / F.lit(1000.0)


# --- dates ------------------------------------------------------------------

def rundate_to_date(col: Column) -> Column:
    """Decode a ``YYYYMMDD`` int to DATE (factory.py:589-593)."""
    return F.to_date(col.cast("string"), "yyyyMMdd")


def date_to_rundate(col: Column) -> Column:
    """Inverse encode, DATE → YYYYMMDD int."""
    return F.date_format(col, "yyyyMMdd").cast("int")


# --- strings ----------------------------------------------------------------

def zero_pad(col: Column, width: int) -> Column:
    """``str(n).zfill(w)`` (factory.py:951-959 channel names)."""
    return F.lpad(col.cast("string"), width, "0")


def pad_width(maxval: Column) -> Column:
    """``int(ceil(log10(n)))`` pad-width inference (factory.py:949)."""
    return F.ceil(F.log10(maxval)).cast("int")


# --- byte packing (event payload codec, factory.py:295-320) -----------------

def encode_shot_bytes(shot: Column) -> Column:
    """Shot int → 4 little-endian base-256 bytes (factory.py:298-299:
    ``[shot / 256**i % 256 for i in range(4)]``)."""
    return F.array(
        *[F.shiftright(shot, 8 * i).bitwiseAND(F.lit(255)).cast("int") for i in range(4)]
    )


def decode_shot_bytes(bytes_col: Column) -> Column:
    """4 bytes → shot int (factory.py:317: ``sum(data * 256**arange(4))``).

    Uses ``F.aggregate`` — a fold over the array, fully JVM-side.
    """
    indexed = F.zip_with(
        bytes_col,
        F.sequence(F.lit(0), F.lit(3)),
        lambda b, i: b.cast("long") * F.pow(F.lit(256.0), i.cast("double")).cast("long"),
    )
    return F.aggregate(indexed, F.lit(0).cast("long"), lambda acc, x: acc + x)


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative int columns →
    one long clustering key (bit i of x → bit 2i, bit i of y → bit 2i+1).

    The multi-dimensional file-clustering primitive: sorting a table by
    ``morton_key(a, b)`` before writing (sinks.write_table ``sort_by``)
    gives parquet row-group min/max stats that are tight in BOTH
    dimensions, so range predicates on either column prune row groups —
    the standard lakehouse Z-ORDER, as a pure JVM expression (32
    shift/mask terms inside whole-stage codegen, no UDF).

    Callers bound the inputs into [0, 2^bits) (e.g. ``% 65536``);
    bits=16 each packs into the low 32 bits of the key.
    """
    x, y = x.cast("long"), y.cast("long")
    k = F.lit(0).cast("long")
    for i in range(bits):
        k = (
            k
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return k


def morton_key_n(cols: list, bits: int = 12) -> Column:
    """Z-order interleave of N non-negative int columns → one long
    clustering key (bit i of column j → bit ``i*N + j``) — the k-dim
    generalization of :func:`morton_key`, still a pure JVM expression
    (``bits × N`` shift/mask terms; keep ``bits * N <= 63`` so the key
    fits a long; the default 12 bits supports up to 5 columns).

    Callers bound each input into [0, 2^bits); ``optimize(zorder=[a,
    b, c])`` scales from manifest stats the same way as the 2-column
    path and uses this for 3+ clustering columns.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("morton_key_n needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a long's 63 usable bits")
    cols = [c.cast("long") for c in cols]
    k = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            k = k + F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
    return k


def sql_morton_key(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_key` (same shift/mask arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
