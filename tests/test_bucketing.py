"""Bucketed co-located joins: the zero-shuffle path for repeated joins
on the same key (SURVEY §4 physical layout: 'bucketed by channel for
high-channel diagnostics')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdf_spark.operators.bucketed import bucketed_fact_join, write_bucketed_pair
from fdf_spark.sources.sinks import write_table


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


def test_write_bucketed_pair_zero_exchange(spark):
    """The sink-helper path (write_table bucket_by= via write_bucketed_pair):
    the SMJ compiles with ZERO Exchange — the bucketed scan satisfies the
    join's distribution requirement as read, and both scans stay
    bucketed. This is the plan q148 rides. (The per-side Sort that
    remains is local over one key-sorted file per bucket — Spark >= 3.0
    dropped scan-reported bucket sortedness; the network half, the
    Exchange, is what the layout deletes.)"""
    left = spark.range(0, 5_000).select(
        F.col("id").alias("lk"), (F.col("id") % 7).alias("lv")
    )
    right = spark.range(0, 5_000, 2).select(
        F.col("id").alias("rk"), (F.col("id") % 5).alias("rv")
    )
    with write_bucketed_pair(spark, (left, "lk"), (right, "rk"), n_buckets=8) as (bl, br):
        joined = bucketed_fact_join(bl, br, "lk", "rk")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert plan.count("Bucketed: true") == 2
        assert joined.count() == 2_500

        # THE point of the layout: a SECOND, different join over the same
        # pair also compiles shuffle-free — pay the clustering once at
        # write time, every repeated fact-fact join after that is free.
        again = bucketed_fact_join(bl.filter(F.col("lv") < 3), br, "lk", "rk")
        plan2 = again._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2
        assert again.count() == sum(1 for i in range(0, 5_000, 2) if i % 7 < 3)

    # context exit cleaned the catalog
    leftovers = [t.name for t in spark.catalog.listTables() if t.name.startswith("bkt_")]
    assert leftovers == []


def test_write_table_bucket_by_validation(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="table="):
        write_table(df, str(tmp_path / "t"), bucket_by=("k", 4))
    with pytest.raises(ValueError, match="not in dataframe"):
        write_table(df, str(tmp_path / "t"), bucket_by=("nope", 4), table="t_bad")


def test_bucketed_outer_join_keeps_layout(spark):
    """how= passes through: a left outer join over the bucketed pair is
    also shuffle-free (unmatched keys emit nulls, no Exchange)."""
    left = spark.range(0, 100).select(F.col("id").alias("lk"))
    right = spark.range(0, 50).select(F.col("id").alias("rk"), F.lit(1).alias("rv"))
    with write_bucketed_pair(spark, (left, "lk"), (right, "rk"), n_buckets=4) as (bl, br):
        j = bucketed_fact_join(bl, br, "lk", "rk", how="left")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 100
        assert j.filter(F.col("rv").isNull()).count() == 50


def test_three_way_bucketed_join_zero_exchange(spark):
    """The 'repeated' claim, strongest form: a THREE-way join on the
    bucket key — e.g. fact ⋈ fact ⋈ fact — still compiles with zero
    Exchange; each additional join over the layout is free."""
    a = spark.range(0, 1_000).select(F.col("id").alias("ka"), F.lit(1).alias("va"))
    b = spark.range(0, 1_000).select(F.col("id").alias("kb"), F.lit(2).alias("vb"))
    with write_bucketed_pair(spark, (a, "ka"), (b, "kb"), n_buckets=4) as (ba, bb):
        from fdf_spark.operators.bucketed import write_bucketed
        import shutil, tempfile, uuid

        name = f"bkt_c_{uuid.uuid4().hex[:12]}"
        scratch = tempfile.mkdtemp(prefix="fdf_bucketed_c_")
        try:
            c = spark.range(0, 500).select(F.col("id").alias("kc"), F.lit(3).alias("vc"))
            bc = write_bucketed(spark, c, "kc", 4, name, scratch)
            j = bucketed_fact_join(bucketed_fact_join(ba, bb, "ka", "kb"), bc, "ka", "kc")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert plan.count("SortMergeJoin") == 2
            assert "Exchange" not in plan
            assert j.count() == 500
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(scratch, ignore_errors=True)


def test_read_bucketed_reattaches_layout(spark, tmp_path):
    """Bucketing metadata is catalog-lifetime; the files are not. After
    the catalog entries are gone (a fresh session), read_bucketed
    re-registers the external tables over the SAME files and the join
    is zero-Exchange again — no rewrite."""
    import shutil

    from fdf_spark.operators.bucketed import read_bucketed, write_bucketed

    la = str(tmp_path / "la")
    lb = str(tmp_path / "lb")
    a = spark.range(0, 2_000).select(F.col("id").alias("ka"), (F.col("id") % 9).alias("va"))
    b = spark.range(0, 2_000, 4).select(F.col("id").alias("kb"), (F.col("id") % 5).alias("vb"))
    try:
        write_bucketed(spark, a, "ka", 4, "rb_a", la)
        write_bucketed(spark, b, "kb", 4, "rb_b", lb)
        # simulate a fresh session: catalog entries gone, files remain
        spark.sql("DROP TABLE rb_a")
        spark.sql("DROP TABLE rb_b")
        # plain parquet read of the same files: the layout is invisible
        plain = spark.read.parquet(la).hint("merge").join(
            spark.read.parquet(lb), F.col("ka") == F.col("kb")
        )
        assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
        # re-attached: zero Exchange over the same bytes
        ra = read_bucketed(spark, la, "ka", 4, "ka BIGINT, va BIGINT", "rb_a2")
        rb = read_bucketed(spark, lb, "kb", 4, "kb BIGINT, vb BIGINT", "rb_b2")
        j = bucketed_fact_join(ra, rb, "ka", "kb")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 500
        # fail-loud contract: re-registering an existing name errors
        # instead of silently returning a mismatched table
        with pytest.raises(Exception, match="(?i)already exists"):
            read_bucketed(spark, la, "ka", 8, "ka BIGINT, va BIGINT", "rb_a2")
    finally:
        for t in ("rb_a", "rb_b", "rb_a2", "rb_b2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(la, ignore_errors=True)
        shutil.rmtree(lb, ignore_errors=True)

def test_read_bucketed_quotes_identifiers_and_path(spark, tmp_path):
    """The DDL is built from caller strings: a single quote in the path
    must survive (escaped literal, ADVICE r8), and the registered scan
    still carries the bucket spec."""
    import shutil

    from fdf_spark.operators.bucketed import read_bucketed, write_bucketed

    quoted = tmp_path / "it's data"
    la = str(quoted / "la")
    a = spark.range(0, 400).select(F.col("id").alias("ka"), (F.col("id") % 9).alias("va"))
    try:
        write_bucketed(spark, a, "ka", 4, "rbq_a", la)
        spark.sql("DROP TABLE rbq_a")
        ra = read_bucketed(spark, la, "ka", 4, "ka BIGINT, va BIGINT", "rbq_a2")
        assert ra.count() == 400
        # newline in a path is refused, not silently interpolated
        with pytest.raises(ValueError, match="control characters"):
            read_bucketed(spark, "/tmp/x\ny", "ka", 4, "ka BIGINT", "rbq_bad")
    finally:
        for t in ("rbq_a", "rbq_a2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(str(quoted), ignore_errors=True)
