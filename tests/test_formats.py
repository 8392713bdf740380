"""Interchange format adapters (sources/formats.py).

Pins: (1) every supported container roundtrips the orders table
value-exact (including DATE/TIMESTAMP and quoted strings), (2) the
events ``ts`` column keeps MICROSECOND precision through CSV/JSON —
the default second-precision format would silently truncate, (3) a
cross-engine check: DuckDB reads the CSV Spark wrote and agrees cell
for cell (container correctness, not just self-consistency), (4)
schema inference is refused for schema-less containers.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.formats import (
    SUPPORTED_FORMATS,
    convert_table,
    read_table_as,
    write_table_as,
)
from tests.conftest import SMOKE_DIR
from tests.oracle_utils import compare_frames


@pytest.mark.parametrize("fmt", SUPPORTED_FORMATS)
def test_roundtrip_orders_exact(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SMOKE_DIR}/orders.parquet")
    path = str(tmp_path / fmt)
    write_table_as(src, path, fmt)
    back = read_table_as(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


@pytest.mark.parametrize("fmt", ["csv", "json", "xml"])
def test_events_ts_keeps_microseconds(spark, tmp_path, fmt):
    from fdf_spark.sources.tables import load_table

    ev = load_table(spark, SMOKE_DIR, "events").limit(500)
    path = str(tmp_path / fmt)
    write_table_as(ev, path, fmt)
    back = read_table_as(spark, path, fmt, schema=ev.schema, name="events")
    a = ev.select("event_id", F.col("ts").cast("long").alias("us")).orderBy("event_id")
    b = back.select("event_id", F.col("ts").cast("long").alias("us")).orderBy("event_id")
    assert a.collect() == b.collect()
    # micros are actually non-zero in the fixture (the test has teeth)
    assert ev.filter(F.col("ts").cast("long") % 1_000_000 != 0).count() > 0


def test_csv_cross_engine_duckdb(spark, tmp_path):
    src = spark.read.parquet(f"{SMOKE_DIR}/nation.parquet")
    path = str(tmp_path / "nation_csv")
    write_table_as(src, path, "csv")
    con = duckdb.connect()
    duck_pdf = con.execute(
        f"SELECT * FROM read_csv('{path}/*.csv', header=true) ORDER BY n_nationkey"
    ).fetch_arrow_table().to_pandas()
    spark_pdf = src.orderBy("n_nationkey").toPandas()
    compare_frames(spark_pdf, duck_pdf, "csv_cross_engine")


def test_schema_required_for_schemaless(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table_as(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table_as(spark, str(tmp_path), "avro")


def test_convert_table_ingest(spark, tmp_path):
    src = spark.read.parquet(f"{SMOKE_DIR}/region.parquet")
    csv_path = str(tmp_path / "r_csv")
    write_table_as(src, csv_path, "csv")
    n = convert_table(
        spark, csv_path, "csv", str(tmp_path / "r_parquet"), "parquet", schema=src.schema
    )
    assert n == src.count()
    back = spark.read.parquet(str(tmp_path / "r_parquet"))
    assert back.exceptAll(src).count() == 0


def test_convert_table_to_schemaless_destination(spark, tmp_path):
    # converting TO csv must re-read with the source schema, not refuse
    src = spark.read.parquet(f"{SMOKE_DIR}/region.parquet")
    n = convert_table(
        spark, f"{SMOKE_DIR}/region.parquet", "parquet",
        str(tmp_path / "r_csv"), "csv",
    )
    assert n == src.count()


def test_jsonl_gz_roundtrip(spark, tmp_path):
    # the shape text corpora actually ship in: gzipped JSON lines
    import glob

    src = spark.read.parquet(f"{SMOKE_DIR}/documents.parquet").limit(200)
    path = str(tmp_path / "docs_jsonl_gz")
    write_table_as(src, path, "json", compression="gzip")
    parts = glob.glob(f"{path}/*.json.gz")
    assert parts, "expected gzipped part files"
    back = read_table_as(spark, path, "json", schema=src.schema)
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
