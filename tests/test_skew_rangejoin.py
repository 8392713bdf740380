"""Skew-salting and bucketed range-join operators: result equivalence
against their naive plans, which is the whole contract — same answer,
scale-safe shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdf_spark.operators.rangejoin import range_join
from fdf_spark.operators.skew import salted_count_distinct, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 'hot' holds 90% of rows and most distinct values
    rows = [("hot", i % 700) for i in range(9000)] + [
        (f"k{i % 20}", i % 50) for i in range(1000)
    ]
    return spark.createDataFrame(rows, "key string, val int")


def test_salted_count_distinct_matches_exact(spark, skewed):
    got = {
        r["key"]: r["n_distinct_val"]
        for r in salted_count_distinct(skewed, ["key"], "val", salt_n=16).collect()
    }
    want = {
        r["key"]: r["n"]
        for r in skewed.groupBy("key").agg(F.count_distinct("val").alias("n")).collect()
    }
    assert got == want
    assert got["hot"] == 700


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"k{i}", float(i)) for i in range(20)], "key string, w double"
    )
    salted = salted_join(skewed, dim, on=["key"], salt_n=8)
    plain = skewed.join(dim, "key")
    assert salted.count() == plain.count()
    gs = salted.groupBy("key").agg(F.sum("w").alias("s")).collect()
    gp = plain.groupBy("key").agg(F.sum("w").alias("s")).collect()
    assert {r["key"]: r["s"] for r in gs} == {r["key"]: r["s"] for r in gp}


def test_range_join_matches_theta_join(spark):
    pts = spark.range(0, 2000).select((F.col("id") * 0.37).alias("p"))
    ivs = spark.createDataFrame(
        [(i, i * 13.0, i * 13.0 + float(7 + (i % 5) * 11)) for i in range(50)],
        "iv long, lo double, hi double",
    )
    bucketed = range_join(pts, "p", ivs, "lo", "hi", bucket_width=13.0)
    naive = pts.join(ivs, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
    assert bucketed.count() == naive.count() > 0
    gb = {r["iv"]: r["n"] for r in bucketed.groupBy("iv").agg(F.count("*").alias("n")).collect()}
    gn = {r["iv"]: r["n"] for r in naive.groupBy("iv").agg(F.count("*").alias("n")).collect()}
    assert gb == gn


def test_range_join_boundary_exclusive(spark):
    # p exactly at hi must NOT match; p exactly at lo must match
    pts = spark.createDataFrame([(10.0,), (20.0,)], "p double")
    ivs = spark.createDataFrame([("a", 10.0, 20.0)], "iv string, lo double, hi double")
    got = sorted(r["p"] for r in range_join(pts, "p", ivs, "lo", "hi", 10.0).collect())
    assert got == [10.0]


def test_range_join_with_by_keys(spark):
    pts = spark.createDataFrame([(1, 5.0), (2, 5.0)], "uid int, p double")
    ivs = spark.createDataFrame([(1, 0.0, 10.0, "w1")], "uid int, lo double, hi double, tag string")
    out = range_join(pts, "p", ivs, "lo", "hi", 10.0, by=["uid"]).collect()
    assert len(out) == 1 and out[0]["uid"] == 1
