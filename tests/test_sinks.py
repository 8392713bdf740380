"""Partitioned table sink (SURVEY S10 / §4 physical layout)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fdf_spark.sources.sinks import write_table


def test_write_table_layout_and_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(s, float(t), float(s * 1000 + t)) for s in (141000, 141001) for t in range(50)],
        "shot long, time double, value double",
    )
    out = str(tmp_path / "sig")
    write_table(df, out)
    # hive-style partition dirs on shot → partition pruning
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shot="))
    assert dirs == ["shot=141000", "shot=141001"]
    back = spark.read.parquet(out)
    assert back.count() == 100
    # partition-pruned single-shot read matches
    one = back.filter(F.col("shot") == 141000)
    assert one.count() == 50
    got = sorted(r["value"] for r in one.collect())
    assert got == [float(141000 * 1000 + t) for t in range(50)]


def test_write_table_time_sorted_within_partition(spark, tmp_path):
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(141000, float(t), 0.0) for t in range(999, -1, -1)],  # reversed input
        "shot long, time double, value double",
    ).coalesce(1)
    out = str(tmp_path / "sorted")
    write_table(df, out)
    part = os.path.join(out, "shot=141000")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    t = pq.read_table(os.path.join(part, files[0]), columns=["time"])["time"].to_pylist()
    assert t == sorted(t)  # min/max page stats usable for time pruning
