"""Catalog-surface queries (SURVEY §2.1 S1/S2/S5/S6, §2.2 P1, §2.10 X4).

S5/S6 are genuinely dual-implemented: the Spark side expands channel
templates with explode(sequence)+conditional-lpad (the engine's actual
catalog compiler rules), the DuckDB oracle re-derives the same
expansion relationally from the raw template specs — a real
cross-check of the reference's zfill/log10 naming (factory.py:938-959).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fdf_spark.catalog.registry import Catalog
from fdf_spark.queries import query
from fdf_spark.sources.tables import load_table as T

#: (container_path, template, start, end_inclusive, digits) — the raw
#: range attributes of every templated signal (bes.xml:5 '1, 32',
#: magnetics.xml:14 '1,16,1', usxr.xml:7-15 '16') after parse_range
#: (descriptors.parse_range ≅ factory.py:938-948)
TEMPLATE_SPECS = [
    ("bes", "ch{}", 1, 32, 2),
    ("magnetics.highn", "highn_{}", 1, 16, 1),
    ("usxr.vtop", "vtop{}", 0, 15, 2),
    ("usxr.hup", "hup{}", 0, 15, 2),
    ("usxr.hdown", "hdown{}", 0, 15, 2),
]


def _values_sql() -> str:
    rows = ", ".join(
        f"('{p}', '{t}', {a}, {b}, {d})" for p, t, a, b, d in TEMPLATE_SPECS
    )
    return f"(VALUES {rows}) AS specs(container_path, template, lo, hi, digits)"


@query(
    "q80_channel_expansion",
    f"""
    WITH expanded AS (
      SELECT container_path, template, digits, unnest(range(lo, hi + 1)) AS channel
      FROM {_values_sql()})
    SELECT container_path,
           replace(template, '{{}}',
                   CASE WHEN length(CAST(channel AS VARCHAR)) >= digits
                        THEN CAST(channel AS VARCHAR)
                        ELSE lpad(CAST(channel AS VARCHAR), digits, '0') END) AS signal,
           CAST(channel AS INTEGER) AS channel
    FROM expanded
    ORDER BY container_path, channel
    """,
    operators=("S5", "S6"),
    doc="Templated channel fan-out: one template row → N concrete signals "
    "with zfill-padded names, re-derived relationally in both engines.",
)
def q80_channel_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.sources.tables import local_df

    specs = local_df(
        spark,
        TEMPLATE_SPECS, "container_path string, template string, lo int, hi int, digits int"
    )
    i_str = F.col("channel").cast("string")
    # zfill semantics: pad only when shorter than `digits` (lpad alone would
    # TRUNCATE 'highn_16' digits=1 to '6'); lpad needs a literal width, so
    # branch on the digit values present in the catalog
    padded = (
        F.when(F.length(i_str) >= F.col("digits"), i_str)
        .when(F.col("digits") == 2, F.lpad(i_str, 2, "0"))
        .otherwise(F.lpad(i_str, 1, "0"))
    )
    return (
        specs.select(
            "container_path",
            "template",
            "digits",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("channel"),
        )
        .select(
            "container_path",
            F.replace(F.col("template"), F.lit("{}"), padded).alias("signal"),
            F.col("channel").cast("int").alias("channel"),
        )
        .orderBy("container_path", "channel")
    )


def _catalog_values_sql() -> str:
    cat = Catalog()
    rows = []
    for diag, path, sig, axes, units, err, transform, channel, table in cat.rows():
        q = lambda v: "NULL" if v is None else "'" + str(v).replace("'", "''") + "'"
        rows.append(
            f"({q(diag)}, {q(path)}, {q(sig)}, {q(','.join(axes))}, {q(units)}, "
            f"{q(err)}, {q(transform)}, {'NULL' if channel is None else channel}, {q(table)})"
        )
    return (
        "(VALUES " + ", ".join(rows) + ") AS cat(diagnostic, container_path, signal, "
        "axes, units, error_col, transform, channel, tbl)"
    )


@query(
    "q81_catalog_inventory",
    f"""
    SELECT diagnostic, container_path, signal, axes, units, error_col,
           transform, CAST(channel AS INTEGER) AS channel, tbl
    FROM {_catalog_values_sql()}
    ORDER BY container_path, signal
    """,
    operators=("S5", "P1", "J1", "F4", "X1", "X2"),
    doc="The compiled signal catalog as a relation (S5 catalog scan): every "
    "concrete signal with axes (time-major), units, error node, transform "
    "binding and physical table — the engine's analog of the XML module "
    "registry (factory.py:654-686).",
)
def q81_catalog_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog()
    return (
        cat.to_df(spark)
        .select(
            "diagnostic",
            "container_path",
            "signal",
            F.array_join("axes", ",").alias("axes"),
            "units",
            "error_col",
            "transform",
            "channel",
            F.col("table").alias("tbl"),
        )
        .orderBy("container_path", "signal")
    )


@query(
    "q82_dim_scan",
    """
    SELECT DISTINCT ts FROM events WHERE user_id = 7 ORDER BY ts
    """,
    operators=("S1", "S2", "P1", "P6"),
    doc="dim_of scan: a signal's coordinate vector as a pruned projection "
    "(factory.py:187-191) — distinct axis values under a pushed-down key "
    "predicate; .explain shows PushedFilters + 2-column ReadSchema.",
)
def q82_dim_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 7).select("ts").distinct().orderBy("ts")


@query(
    "q84_contour_levels",
    """
    WITH vmax AS (
      SELECT event_type, max(value) AS vmax
      FROM events
      WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-25 00:00:00'
      GROUP BY event_type)
    SELECT event_type, CAST(i AS INTEGER) AS level_idx, (i * vmax) / 9 AS level
    FROM vmax CROSS JOIN (SELECT unnest(range(10)) AS i) idx
    ORDER BY event_type, level_idx
    """,
    operators=("F11", "A2", "P7"),
    doc="Contour-level linspace: boolean time window, per-group max, 10 "
    "evenly spaced levels 0..max (mpts/plot.py:59-62: np.linspace(0, "
    "windowed max, levels)).",
)
def q84_contour_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    vmax = (
        ev.filter(
            F.col("ts").between("2024-01-05 00:00:00", "2024-01-25 00:00:00")
        )
        .groupBy("event_type")
        .agg(F.max("value").alias("vmax"))
    )
    return (
        vmax.select(
            "event_type", "vmax", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i")
        )
        .select(
            "event_type",
            F.col("i").cast("int").alias("level_idx"),
            ((F.col("i") * F.col("vmax")) / 9).alias("level"),
        )
        .orderBy("event_type", "level_idx")
    )


@query(
    "q85_payload_chr_decode",
    """
    SELECT event_id,
           chr(65 + CAST((event_id >> 0)  & 255 AS INTEGER) % 26) ||
           chr(65 + CAST((event_id >> 8)  & 255 AS INTEGER) % 26) ||
           chr(65 + CAST((event_id >> 16) & 255 AS INTEGER) % 26) ||
           chr(65 + CAST((event_id >> 24) & 255 AS INTEGER) % 26) AS code
    FROM events
    WHERE event_id % 97 = 0
    ORDER BY event_id
    """,
    operators=("F12", "F9"),
    doc="Byte-wise chr/join decode of a packed id (wfevent payload decode, "
    "factory.py:316-319: bytes → chr → ''.join), alphabet-folded so both "
    "engines emit printable ASCII.",
)
def q85_payload_chr_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    byte = lambda k: (F.shiftright(F.col("event_id"), k).bitwiseAND(F.lit(255))).cast("int")
    code = F.concat(*[F.char(F.lit(65) + byte(k) % 26) for k in (0, 8, 16, 24)])
    return (
        ev.filter(F.col("event_id") % 97 == 0)
        .select("event_id", code.alias("code"))
        .orderBy("event_id")
    )


def _availability_values() -> list[tuple[int, str]]:
    """Deterministic availability relation (mirrors the fixture rule):
    even shots run efit01+efit02, odd shots efit01+lrdfit01."""
    rows = []
    for i, shot in enumerate(range(141000, 141008)):
        for tree in (["efit01", "efit02"] if i % 2 == 0 else ["efit01", "lrdfit01"]):
            rows.append((shot, tree))
    return rows


@query(
    "q86_efit_discovery",
    f"""
    WITH cand AS (SELECT unnest(['efit0' || CAST(i AS VARCHAR) for i in range(1, 7)]) AS efit
                  UNION ALL
                  SELECT unnest([printf('lrdfit%02d', CAST(i AS INTEGER)) for i in range(1, 13)])),
    avail(shot, efit) AS (VALUES {", ".join(f"({s}, '{t}')" for s, t in _availability_values())}),
    shots AS (SELECT DISTINCT shot FROM avail)
    SELECT s.shot, c.efit,
           EXISTS(SELECT 1 FROM avail a WHERE a.shot = s.shot AND a.efit = c.efit) AS available
    FROM shots s CROSS JOIN cand c
    ORDER BY shot, efit
    """,
    operators=("X3", "J6", "P8"),
    doc="efit tree discovery as a relation: 18 candidate trees probed per "
    "shot against the availability table (check_efit factory.py:495-512); "
    "drives runtime view instantiation (X3, equilibria/_preprocess.py:13-43).",
)
def q86_efit_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.catalog.descriptors import EFIT_CANDIDATES

    from fdf_spark.sources.tables import local_df

    avail = local_df(spark, _availability_values(), "shot long, efit string")
    cand = local_df(spark, [(t,) for t in EFIT_CANDIDATES], "efit string")
    shots = avail.select("shot").distinct()
    probe = shots.crossJoin(F.broadcast(cand))
    hit = avail.withColumn("available", F.lit(True))
    return (
        probe.join(hit, ["shot", "efit"], "left")
        .select("shot", "efit", F.coalesce("available", F.lit(False)).alias("available"))
        .orderBy("shot", "efit")
    )


@query(
    "q87_sink_roundtrip",
    """
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM events WHERE event_type = 'view'
    GROUP BY user_id ORDER BY user_id
    """,
    operators=("S10",),
    doc="Partitioned table sink round-trip: aggregate → write parquet "
    "partitioned by user_id bucket, time-sorted within files → re-scan and "
    "return. Values must survive the engine's physical layout bit-for-bit.",
)
def q87_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from fdf_spark.functions.scalar import dsum
    from fdf_spark.sources.sinks import write_table

    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), dsum("value").alias("total")
    ).withColumn("part", (F.col("user_id") % 8).cast("int"))
    out_dir = tempfile.mkdtemp(prefix="fdf_sink_")
    write_table(agg, out_dir, partition_by=("part",), sort_by=("user_id",))
    back = spark.read.parquet(out_dir)
    from fdf_spark.queries import materialize_and_cleanup

    # the round-trip (write → physical layout → re-scan) happens inside
    # the collect; the scratch table is then removed instead of leaking
    return materialize_and_cleanup(
        back.select("user_id", "n", "total").orderBy("user_id"), out_dir
    )


@query(
    "q83_fft_per_series",
    # The FFT is SQL-expressible at fixture scale as the definitional DFT:
    # power_k = (Σ x_j·cos(2πkj/n))² + (Σ x_j·sin(2πkj/n))², x detrended,
    # j = rank by the shared (t, value) total order. numpy's butterflies
    # and the double sum agree to ~4e-11 absolute on this data (powers
    # ≥3.5), so both sides round power to 3 dp / freq to 12 dp — boundary
    # collision odds ~1e-8 per value.
    """
    WITH s AS (
      SELECT user_id, epoch_us(ts) / 1e6 AS t, value,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) / 1e6, value) AS BIGINT) - 1 AS j,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             AVG(value) OVER (PARTITION BY user_id) AS mu
      FROM events),
    d AS (
      SELECT user_id, value - mu AS x, j, n,
             t - lag(t) OVER (PARTITION BY user_id ORDER BY j) AS dt_step
      FROM s),
    dt AS (SELECT user_id,
                  CASE WHEN median(dt_step) = 0 THEN 1.0 ELSE median(dt_step) END AS dt
           FROM d WHERE dt_step IS NOT NULL GROUP BY user_id),
    spec AS (
      SELECT d.user_id, k.bin, d.n,
             SUM(d.x * cos(2 * pi() * k.bin * d.j / d.n)) AS re,
             SUM(d.x * sin(2 * pi() * k.bin * d.j / d.n)) AS im
      FROM d CROSS JOIN (SELECT unnest(range(1, 9)) AS bin) k
      WHERE d.n >= 2
      GROUP BY 1, 2, 3)
    SELECT s.user_id, CAST(s.bin AS INTEGER) AS bin,
           round(s.bin / (s.n * dt.dt), 12) AS freq_hz,
           round((s.re * s.re + s.im * s.im) / s.n, 3) AS power
    FROM spec s JOIN dt USING (user_id)
    ORDER BY user_id, bin
    """,
    operators=("X4",),
    doc="Grouped FFT: per-user power spectrum of the event value series — "
    "the reference's bes.myfft surface (bes.xml:3, modules/bes/fft.py) "
    "made real. Uses the batched variant (collect_list + one vectorized "
    "pandas_udf) since this is the many-small-series regime; the "
    "applyInPandas variant (fft_power) serves wide channels and is "
    "pinned bit-equal in tests. Oracle replays the definitional DFT "
    "double sum in DuckDB at rounded precision.",
)
def q83_fft_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.operators.fft import fft_power_batched

    ev = T(spark, sf_dir, "events").withColumn("t", F.unix_micros("ts") / 1e6)
    out = fft_power_batched(
        ev.select("user_id", "t", "value"),
        value="value",
        time="t",
        by=["user_id"],
        n_bins=8,
    )
    return out.select(
        "user_id",
        "bin",
        F.round("freq_hz", 12).alias("freq_hz"),
        F.round("power", 3).alias("power"),
    ).orderBy("user_id", "bin")
