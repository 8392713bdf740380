"""Bucketed co-located joins: the zero-shuffle path for repeated joins
on the same key (SURVEY §4 physical layout: 'bucketed by channel for
high-channel diagnostics')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark):
    yield spark
    for t in ("b_left", "b_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_skips_shuffle(warehouse, tmp_path):
    spark = warehouse
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    # disable broadcast so the join strategy decision is about shuffles
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df in (("b_left", left), ("b_right", right)):
            # external table: bucketing needs the metastore, the files tmp_path
            (df.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
             .option("path", str(tmp_path / name)).saveAsTable(name))
        l, r = spark.table("b_left"), spark.table("b_right")
        joined = l.join(r, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and the result is right
        row = joined.agg(F.count("*").alias("n"), F.sum(F.col("lv") + F.col("rv")).alias("s")).head()
        assert row["n"] == 10_000
        assert row["s"] == sum(2 * i + 3 * i for i in range(10_000))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
