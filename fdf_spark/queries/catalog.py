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
    specs = spark.createDataFrame(
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
    operators=("S5", "P1", "X1", "X2"),
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
    "q83_fft_per_series",
    None,  # numpy FFT is not SQL-expressible; driver does the rows-only
    # check; bitwise parity vs numpy is pinned in tests/test_catalog.py
    operators=("X4",),
    doc="Grouped-map FFT (applyInPandas): per-user power spectrum of the "
    "event value series — the reference's bes.myfft surface (bes.xml:3, "
    "modules/bes/fft.py) made real, Arrow-batched per group.",
)
def q83_fft_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.operators.fft import fft_power

    ev = T(spark, sf_dir, "events").withColumn("t", F.unix_micros("ts") / 1e6)
    out = fft_power(
        ev.select("user_id", "t", "value"),
        value="value",
        time="t",
        by=["user_id"],
        n_bins=8,
    )
    return out.orderBy("user_id", "bin")
