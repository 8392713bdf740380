"""Partition transforms (hidden partitioning) for versioned tables.

Covers: the driver-side Murmur3 port's bit-for-bit fidelity to
``F.hash`` (the foundation every transform prune rests on), spec
parsing, and the end-to-end bucket/truncate lifecycle — write-side
derived stats, read/delete/merge pruning, schema-evolution interplay,
and the superset guarantee under probes that span buckets.
"""

from __future__ import annotations

import random
import tempfile

import pytest
from pyspark.sql import functions as F

from fdf_spark.functions.spark_hash import bucket_of, hash_bytes, spark_hash
from fdf_spark.sources.transforms import Transform, all_transforms_on, parse_spec_col
from fdf_spark.sources.versioned import (
    _read_manifest,
    commit_version,
    delete_keys,
    delete_where,
    diff_versions,
    merge_on_read,
    optimize,
    read_version,
    rename_column,
    set_partition_spec,
)


# --- the Murmur3 port: trusted only because the JVM agrees ---------------


def test_spark_hash_matches_jvm(spark):
    rng = random.Random(20260816)
    ints = [0, 1, -1, 2**31 - 1, -(2**31), 42] + [
        rng.randint(-(2**31), 2**31 - 1) for _ in range(50)
    ]
    longs = [0, 1, -1, 2**63 - 1, -(2**63)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(50)
    ]
    strs = ["", "a", "ab", "abc", "abcd", "abcde", "héllo", "日本語テキスト", "x" * 100] + [
        "".join(rng.choice("abcdefXYZ0189 _-é中€") for _ in range(rng.randint(0, 40)))
        for _ in range(50)
    ]
    for vals, t, pt in ((ints, "int", "int"), (longs, "long", "bigint"), (strs, "string", "string")):
        got = spark.createDataFrame([(v,) for v in vals], f"v {pt}").select(
            "v", F.hash("v").alias("h")
        ).collect()
        for r in got:
            assert spark_hash(r.v, t) == r.h, (t, r.v)
    # null hashes to the seed
    assert spark_hash(None, "int") == 42
    assert (
        spark.range(1).select(F.hash(F.lit(None).cast("int"))).first()[0] == 42
    )


def test_spark_hash_unsupported_type_raises():
    with pytest.raises(TypeError):
        spark_hash(1.5, "double")


def test_bucket_of_matches_pmod(spark):
    vals = [0, 7, -3, 999999999999]
    rows = spark.createDataFrame([(v,) for v in vals], "v long").select(
        F.pmod(F.hash("v"), F.lit(16)).alias("b")
    ).collect()
    assert [r.b for r in rows] == [bucket_of(v, "bigint", 16) for v in vals]


def test_hash_bytes_binary(spark):
    data = [b"", b"\x00", b"\xff\xfe\x01", bytes(range(37))]
    rows = spark.createDataFrame([(d,) for d in data], "v binary").select(
        F.hash("v").alias("h")
    ).collect()
    assert [r.h for r in rows] == [hash_bytes(d) for d in data]


# --- spec parsing ---------------------------------------------------------


def test_parse_spec_col():
    assert parse_spec_col("k") == Transform("identity", "k")
    assert parse_spec_col("bucket(16, k)") == Transform("bucket", "k", 16)
    assert parse_spec_col("truncate( 4 , name )") == Transform("truncate", "name", 4)
    assert parse_spec_col("days(ts)") == Transform("days", "ts")
    assert parse_spec_col("bucket(16, k)").spec_str() == "bucket(16, k)"
    for bad in ("bucket(1, k)", "truncate(0, k)", "bucket(k)", "f(x)", "a b"):
        with pytest.raises(ValueError):
            parse_spec_col(bad)


def test_set_spec_validates_transform_source(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_version(spark.range(10).select(F.col("id").alias("k")), p)
    with pytest.raises(ValueError, match="not in schema"):
        set_partition_spec(p, ["bucket(8, nope)"])
    set_partition_spec(p, ["bucket(8, k)"])  # source exists → fine


# --- bucket lifecycle -----------------------------------------------------


@pytest.fixture()
def bucketed_table(spark):
    """20k rows, v1 unclustered, spec bucket(8, k), v3 bucketed append."""
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    path = tempfile.mkdtemp(prefix="fdf_bkt_")
    commit_version(df.filter("k < 100"), path)
    set_partition_spec(path, ["bucket(8, k)"])
    commit_version(df.filter("k >= 100"), path, mode="append")
    return path


def test_bucket_write_records_derived_stats(spark, bucketed_table):
    m = _read_manifest(bucketed_table, 3)
    derived = [f for f in m["files"] if "__part__bucket_8__k" in m["stats"].get(f, {})]
    # every file of the bucketed commit carries transform stats; the
    # pre-spec v1 file legitimately has none (conservative: always read)
    assert len(derived) >= len(m["files"]) - 1 > 0
    # the hidden column never reaches the logical schema
    assert read_version(spark, bucketed_table).columns == ["k", "v"]


def test_bucket_point_lookup_prunes_and_is_exact(spark, bucketed_table):
    m = _read_manifest(bucketed_table, 3)
    probe = read_version(spark, bucketed_table, prune=("k", [5000, 5001]))
    got = {(r.k, r.v) for r in probe.filter(F.col("k").isin(5000, 5001)).collect()}
    assert got == {(5000, (5000 * 7) % 1000), (5001, (5001 * 7) % 1000)}
    # actually pruned: strictly fewer files than the snapshot holds
    assert len(probe.inputFiles()) < len(m["files"])


def test_bucket_prune_is_superset_for_every_key(spark, bucketed_table):
    # 40 random keys, each probed through the transform — none may lose rows
    rng = random.Random(7)
    keys = [rng.randrange(0, 20000) for _ in range(40)]
    probe = read_version(spark, bucketed_table, prune=("k", keys))
    got = probe.filter(F.col("k").isin(keys)).count()
    assert got == len(set(keys))


def test_bucket_delete_where_prunes_match_scan(spark, bucketed_table):
    v = delete_where(spark, bucketed_table, "k = 7777")
    meta = _read_manifest(bucketed_table, v)["meta"]["delete"]
    assert meta["rows"] == 1
    assert meta["files_pruned"] > 0
    assert read_version(spark, bucketed_table).filter("k = 7777").count() == 0


def test_bucket_delete_keys_scopes_by_membership(spark, bucketed_table):
    keys = spark.createDataFrame([(3333,), (4444,)], "k long")
    v = delete_keys(spark, bucketed_table, keys, ["k"])
    meta = _read_manifest(bucketed_table, v)["meta"]["delete_keys"]
    assert meta["files_pruned"] > 0
    df = read_version(spark, bucketed_table)
    assert df.filter("k in (3333, 4444)").count() == 0
    assert df.count() == 20000 - 2


def test_bucket_merge_on_read_prunes_match_scan(spark, bucketed_table):
    total_files = len(_read_manifest(bucketed_table, 3)["files"])
    ch = spark.createDataFrame([(1234, -1), (20001, -2)], "k long, v long")
    v = merge_on_read(spark, bucketed_table, ch, keys=["k"])
    meta = _read_manifest(bucketed_table, v)["meta"]["merge_on_read"]
    assert meta["files_scanned"] < total_files
    df = read_version(spark, bucketed_table)
    assert {(r.k, r.v) for r in df.filter("k in (1234, 20001)").collect()} == {
        (1234, -1), (20001, -2)
    }
    assert df.count() == 20001


def test_bucket_survives_source_rename(spark, bucketed_table):
    rename_column(bucketed_table, "k", "key")
    m = _read_manifest(bucketed_table, 4)
    assert "bucket(8, key)" in m["partition_specs"][str(m["current_spec"])]["cols"]
    assert all_transforms_on(m, "key")[0].source == "key"
    # pruning still rides the OLD files' derived stats (physical name unchanged)
    probe = read_version(spark, bucketed_table, prune=("key", [5000]))
    assert probe.filter("key = 5000").count() == 1
    assert len(probe.inputFiles()) < len(m["files"])
    # and a post-rename append still clusters + prunes
    commit_version(
        spark.createDataFrame([(90001, 1)], "key long, v long"),
        bucketed_table, mode="append",
    )
    m2 = _read_manifest(bucketed_table, 5)
    new = [f for f in m2["files"] if f not in m["files"]]
    assert all("__part__bucket_8__k" in m2["stats"][f] for f in new)


def test_bucket_optimize_folds_and_keeps_results(spark, bucketed_table):
    delete_where(spark, bucketed_table, "k = 11")
    before = {(r.k, r.v) for r in read_version(spark, bucketed_table).collect()}
    # small target so the fold still yields several files (at real
    # scale OPTIMIZE always does); pruning needs >1 file to show
    res = optimize(spark, bucketed_table, target_bytes=64 * 1024)
    assert res["rewritten"] > 0
    assert diff_versions(spark, bucketed_table, res["version"] - 1, res["version"]).count() == 0
    after = {(r.k, r.v) for r in read_version(spark, bucketed_table).collect()}
    assert after == before
    # the fold re-clustered under the spec: rewritten files carry fresh
    # derived stats and keep the spec stamp, so point lookups still
    # prune after OPTIMIZE (the bucketed table's full lifecycle)
    m = _read_manifest(bucketed_table, res["version"])
    assert all(
        m["file_specs"][f] == m["current_spec"]
        and "__part__bucket_8__k" in m["stats"].get(f, {})
        for f in m["files"]
        if f"/c{res['version']:08d}-" in f
    )
    probe = read_version(spark, bucketed_table, prune=("k", [5000]))
    assert probe.filter("k = 5000").count() == 1
    assert len(probe.inputFiles()) < len(m["files"])


def test_bucket_null_keys_never_lose_rows(spark, tmp_path):
    p = str(tmp_path / "nulls")
    df = spark.createDataFrame([(1, "a"), (None, "n1"), (None, "n2"), (2, "b")], "k int, v string")
    commit_version(df.filter("k = 1"), p)
    set_partition_spec(p, ["bucket(4, k)"])
    commit_version(df.filter("k is null or k = 2"), p, mode="append")
    assert read_version(spark, p).count() == 4
    # a probe prunes but the filter-side semantics (NULL never equal) hold
    probe = read_version(spark, p, prune=("k", [2]))
    assert probe.filter("k = 2").count() == 1


def test_bucket_probe_type_mismatch_still_deletes(spark, tmp_path):
    """A probe batch carrying the key as INT against a LONG table column
    must hash under the TABLE's type: hash_int(5) and hash_long(5) land
    in different buckets, so an uncast hash would scope the eq-delete
    (and merge_on_read's match scan) to the WRONG bucket and silently
    skip the key (code-review finding)."""
    p = str(tmp_path / "t")
    df = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
    commit_version(df.limit(0), p)
    set_partition_spec(p, ["bucket(8, k)"])
    commit_version(df, p, mode="append")
    keys_int = spark.createDataFrame([(5,), (1234,)], "k int")  # int, table is long
    delete_keys(spark, p, keys_int, ["k"])
    assert read_version(spark, p).filter("k in (5, 1234)").count() == 0
    ch_int = spark.createDataFrame([(77, -1)], "k int, v long")
    merge_on_read(spark, p, ch_int.select(F.col("k").cast("long"), "v"), keys=["k"])
    assert read_version(spark, p).filter("k = 77").first().v == -1


def test_predicate_bounds_reject_lossy_casts(spark, tmp_path):
    """cast(k as double) == 2^53 on a long column matches BOTH k=2^53
    and k=2^53+1 (double has 53 mantissa bits — the cast collides
    them); bounds derived through the precision-losing cast would
    prune the 2^53+1 file (its stats sit above the literal) and
    silently skip its matching row (code-review finding) — the guard
    must derive nothing instead."""
    p = str(tmp_path / "t")
    commit_version(spark.createDataFrame([(2**53, 1)], "k long, v int"), p)
    commit_version(
        spark.createDataFrame([(2**53 + 1, 2)], "k long, v int"), p, mode="append"
    )
    v = delete_where(spark, p, F.col("k").cast("double") == float(2**53))
    m = _read_manifest(p, v)
    assert m["meta"]["delete"]["rows"] == 2  # both colliding matches died
    assert m["meta"]["delete"]["files_pruned"] == 0  # nothing derivable
    assert read_version(spark, p).count() == 0
    # exact widening still prunes: k = 5 (int literal on long column)
    p2 = str(tmp_path / "t2")
    commit_version(spark.createDataFrame([(5, 1)], "k long, v int").coalesce(1), p2)
    commit_version(
        spark.createDataFrame([(10**10, 2)], "k long, v int").coalesce(1), p2, mode="append"
    )
    v2 = delete_where(spark, p2, "k = 5")
    assert _read_manifest(p2, v2)["meta"]["delete"]["files_pruned"] == 1


# --- truncate (monotonic) -------------------------------------------------


def test_truncate_int_range_prune(spark, tmp_path):
    p = str(tmp_path / "trunc")
    df = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") % 17).alias("v"))
    commit_version(df.limit(0), p)  # empty bootstrap fixes the schema
    set_partition_spec(p, ["truncate(1000, k)"], buckets=4)
    commit_version(df, p, mode="append")
    m = _read_manifest(p, 3)
    assert any("__part__truncate_1000__k" in m["stats"].get(f, {}) for f in m["files"])
    probe = read_version(spark, p, prune=("k", 2500, 2510))
    assert probe.filter("k between 2500 and 2510").count() == 11
    assert len(probe.inputFiles()) < len(m["files"])
    # python-side transform agrees with the column for negatives too
    t = parse_spec_col("truncate(1000, k)")
    assert t.apply_py(-1, "bigint") == -1000
    got = spark.createDataFrame([(-1,)], "k long").select(
        t.column(F.col("k"), "bigint").alias("t")
    ).first().t
    assert got == -1000


def test_truncate_string_prefix(spark, tmp_path):
    p = str(tmp_path / "truncs")
    df = spark.createDataFrame(
        [(f"{c}{i:04d}", i) for c in "abcdef" for i in range(200)], "name string, v int"
    )
    commit_version(df.limit(0), p)
    set_partition_spec(p, ["truncate(1, name)"], buckets=4)
    commit_version(df, p, mode="append")
    m = _read_manifest(p, 3)
    probe = read_version(spark, p, prune=("name", ["c0100"]))
    assert probe.filter("name = 'c0100'").count() == 1
    assert len(probe.inputFiles()) < len(m["files"])


def test_cluster_by_spec_hashes_under_declared_type(spark):
    """The write path must derive the hidden bucket column under the
    table's DECLARED type, not the batch's runtime type: a castable-
    but-narrower batch (int key into a long column) otherwise writes
    bucket stats in the wrong hash domain and desynchronizes every
    driver-side probe (ADVICE r11)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from fdf_spark.sources.versioned import _cluster_by_spec

    spec = {"cols": ["bucket(8, k)"]}
    t = parse_spec_col("bucket(8, k)")
    df = spark.range(0, 200).select(F.col("id").cast("int").alias("k"))
    declared = StructType([StructField("k", LongType())])
    out = _cluster_by_spec(df, spec, {}, schema=declared)
    dname = t.derived_name("k")
    got = {r.k: r[dname] for r in out.collect()}
    want = {
        r.k: r.b
        for r in spark.range(0, 200)
        .select(
            F.col("id").cast("int").alias("k"),
            F.pmod(F.hash(F.col("id").cast("long")), F.lit(8)).alias("b"),
        )
        .collect()
    }
    assert got == want
    # and int-vs-long hash domains genuinely differ (the test has teeth)
    runtime = {
        r.k: r.b
        for r in spark.range(0, 200)
        .select(
            F.col("id").cast("int").alias("k"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(8)).alias("b"),
        )
        .collect()
    }
    assert got != runtime


def test_dsum_envelope_guard(spark):
    # r15 (ADVICE r14 medium): dsum accumulates at decimal(18,6) while
    # its oracle twin uses DECIMAL(25,6).  The envelope is enforced by
    # ANSI mode (Spark 4 default): an out-of-envelope value must RAISE
    # at execution, never cast to NULL and silently vanish from the
    # sum.  This pin is what keeps an ansi=false session from
    # reintroducing the silent drop unnoticed.
    import pytest

    from fdf_spark.functions.scalar import dsum

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    ok = spark.createDataFrame([(1.5,), (None,), (-2.25,)], "x double")
    assert ok.agg(dsum("x")).first()[0] == -0.75
    for bad_val in (2e12, -1e12):
        bad = spark.createDataFrame([(1.0,), (bad_val,)], "x double")
        with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
            bad.agg(dsum("x")).collect()


def test_local_df_temporal_bitwise_classic_parity(spark):
    # r15 (VERDICT r14 #10): top-level temporal columns now take the
    # Arrow local-relation path; stored instants must equal the classic
    # pickle path BITWISE — including when the session timezone is not
    # UTC and when naive datetimes carry the OS-local interpretation.
    import datetime as dt

    from pyspark.sql import Row

    from fdf_spark.sources.tables import local_df

    schema = "k int, ts timestamp, d date, tn timestamp_ntz"
    rows = [
        Row(1, dt.datetime(2031, 3, 1, 12, 30, 45, 123456), dt.date(2031, 3, 1),
            dt.datetime(2031, 3, 1, 12, 30, 45, 123456)),
        Row(2, dt.datetime(1999, 12, 31, 23, 59, 59, 999999), dt.date(1999, 12, 31),
            dt.datetime(1999, 12, 31, 23, 59, 59, 999999)),
        Row(3, None, None, None),
        # an AWARE datetime exercises the utctimetuple branch
        Row(4, dt.datetime(2031, 6, 1, 0, 0, 0, 7, tzinfo=dt.timezone(dt.timedelta(hours=5, minutes=30))),
            dt.date(2031, 6, 1), dt.datetime(2031, 6, 1, 0, 0, 0, 7)),
    ]

    def internal(df):
        # compare the stored INSTANT (session-tz-independent micros),
        # not the collected datetime (both paths localize identically
        # on the way out)
        from pyspark.sql import functions as F
        return df.select(
            "k",
            F.unix_micros("ts").alias("tsu"),
            F.col("d").cast("string").alias("ds"),
            F.col("tn").cast("string").alias("tns"),
        ).orderBy("k").collect()

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in (prev_tz, "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            classic = spark.createDataFrame(rows, schema)
            arrow = local_df(spark, rows, schema)
            # the Arrow path must actually engage (no silent classic
            # fallback): its plan is a LocalRelation, not a python RDD
            assert "Scan ExistingRDD" not in arrow._jdf.queryExecution().executedPlan().toString()
            assert internal(classic) == internal(arrow), tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
