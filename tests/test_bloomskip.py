"""Per-file bloom skipping (sources/bloomskip.py): the compute-stats
maintenance action, probe-side pruning through read_version, executor/
driver hash agreement, and the superset guarantee."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.bloomskip import (
    BLOOM_SUFFIX,
    _hash_pair,
    _load_sidecar,
    build_blooms,
    might_contain,
)
from fdf_spark.sources.versioned import commit_version, read_version


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 20_000).select(
        (F.col("id") * 7919 % 1_000_003).alias("doc"),  # hash-scattered ids
        (F.col("id") % 50).alias("day"),
        F.concat(F.lit("u"), (F.col("id") % 4096)).alias("user"),
    )
    commit_version(df.repartition(8), p)  # 8 files, each spanning ~full doc range
    return p


def test_no_false_negatives_and_real_skipping(spark, table):
    res = build_blooms(spark, table, ["doc", "user"])
    assert res["built"] == 8
    m_files = read_version(spark, table).inputFiles()
    assert len(m_files) == 8

    # every present value is found (no false negative — row-loss check)
    for vid in (0, 7919, (137 * 7919) % 1_000_003):
        df = read_version(spark, table, prune=("doc", [vid]))
        assert df.filter(F.col("doc") == vid).count() == 1
    # an absent value prunes most files (8 blooms at 1% fpp: expected
    # ~0 survivors; allow generous slack)
    df = read_version(spark, table, prune=("doc", [999_999_999]))
    assert len(df.inputFiles() or []) <= 2
    # the present value's probe reads FEWER than all files only if its
    # own file survives — it must, and the others' blooms reject
    df = read_version(spark, table, prune=("doc", [7919]))
    assert 1 <= len(df.inputFiles()) <= 3

    # string column probes work the same way
    df = read_version(spark, table, prune=("user", ["u5"]))
    assert df.filter("user = 'u5'").count() > 0


def test_incremental_and_superset(spark, table):
    build_blooms(spark, table, ["doc"])
    assert build_blooms(spark, table, ["doc"])["built"] == 0  # idempotent
    # a new commit's files lack sidecars → probes KEEP them (superset),
    # and the next build covers exactly them
    extra = spark.createDataFrame([(424242, 1, "ux")], "doc long, day long, user string")
    commit_version(extra, table, mode="append")
    df = read_version(spark, table, prune=("doc", [424242]))
    assert df.filter("doc = 424242").count() == 1  # uncovered file kept
    res = build_blooms(spark, table, ["doc"])
    assert 0 < res["built"] <= 2  # only the new files
    df = read_version(spark, table, prune=("doc", [424242]))
    assert df.filter("doc = 424242").count() == 1  # still found post-build


def test_hash_pair_matches_executor_build(spark, table):
    """Driver-side probe hashes and the vectorized executor build agree:
    every value folded into a bloom tests positive through the scalar
    path (the property the whole scheme rests on)."""
    build_blooms(spark, table, ["doc"])
    files = read_version(spark, table).inputFiles()
    f = files[0].replace("file:", "")
    sc = _load_sidecar(f)
    assert sc is not None and "doc" in sc
    rows = spark.read.parquet(f).select("doc").limit(200).collect()
    assert all(might_contain(sc["doc"], r.doc) for r in rows)


def test_unsupported_types_and_validation(spark, table):
    with pytest.raises(ValueError, match="not in table schema"):
        build_blooms(spark, table, ["nope"])
    with pytest.raises(TypeError):
        _hash_pair(3.14)


def test_vacuum_removes_sidecars(spark, table):
    from fdf_spark.sources.versioned import vacuum

    build_blooms(spark, table, ["doc"])
    commit_version(
        spark.createDataFrame([(1, 1, "a")], "doc long, day long, user string"),
        table, mode="overwrite",
    )
    removed = vacuum(table, keep=1, orphan_grace_s=1e9)
    assert removed
    for f in removed:
        assert not os.path.exists(f + BLOOM_SUFFIX)


def test_keyed_writes_scope_through_blooms(spark, table):
    """delete_keys' eq-entry scope and merge_on_read's match scan both
    shrink through the sidecars for small key sets — the write-side
    point-lookup win on an UNclustered layout (range stats scope
    nothing for hash-scattered keys)."""
    from fdf_spark.sources.versioned import (
        _read_manifest,
        delete_keys,
        list_versions,
        merge_on_read,
        read_version,
    )

    build_blooms(spark, table, ["doc"])
    present = read_version(spark, table).select("doc").limit(2).collect()
    k0, k1 = present[0].doc, present[1].doc

    v = delete_keys(
        spark, table, spark.createDataFrame([(k0,), (k1,)], "doc long"), ["doc"]
    )
    meta = _read_manifest(table, v)["meta"]["delete_keys"]
    assert meta["files_applied"] < 8  # blooms scoped the entry
    df = read_version(spark, table)
    assert df.filter(F.col("doc").isin([k0, k1])).count() == 0
    assert df.count() == 20_000 - 2

    ch = spark.createDataFrame([(k0, 7, "back")], "doc long, day long, user string")
    v2 = merge_on_read(spark, table, ch, ["doc"])
    meta2 = _read_manifest(table, v2)["meta"]["merge_on_read"]
    assert meta2["files_scanned"] < 8  # blooms pruned the match scan
    assert read_version(spark, table).filter(F.col("doc") == k0).count() == 1
    assert list_versions(table) == [1, 2, 3]


def test_int_column_with_nulls_no_false_negatives(spark, tmp_path):
    """Code-review r12: an int64 column containing NULLs must still
    hash through the INTEGER path (Arrow preserves the validity mask;
    a pandas handler would promote to float64 and md5 '7.0') — probing
    a present value must never lose the file."""
    from fdf_spark.sources.versioned import commit_version, read_version

    p = str(tmp_path / "t")
    df = spark.range(0, 4000).select(
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") * 7919).alias("doc"),
        F.col("id").alias("ord"),
    )
    commit_version(df.repartition(4), p)
    build_blooms(spark, p, ["doc"])
    present = 7919  # id=1's value, non-null
    got = read_version(spark, p, prune=("doc", [present]))
    assert got.filter(F.col("doc") == present).count() == 1
    # absent value still prunes (blooms are real, not degenerate)
    missing = read_version(spark, p, prune=("doc", [123_456_789_123]))
    assert len(missing.inputFiles() or []) < 4


def test_second_build_covers_new_column_and_merges(spark, table):
    """Code-review r12: build_blooms on a NEW column must rebuild
    sidecars that exist but lack it — and merge, keeping the old
    column's bloom intact."""
    assert build_blooms(spark, table, ["doc"])["built"] == 8
    assert build_blooms(spark, table, ["user"])["built"] == 8  # not 0
    from fdf_spark.sources.versioned import read_version

    f = read_version(spark, table).inputFiles()[0].replace("file:", "")
    sc = _load_sidecar(f)
    assert sc is not None and "doc" in sc and "user" in sc  # merged
    assert build_blooms(spark, table, ["doc", "user"])["built"] == 0


def test_optimize_rebuilds_bloom_coverage(spark, table):
    """OPTIMIZE rewrites files; bloom coverage must follow — the
    rewritten files get fresh sidecars for every column any replaced
    file had indexed (incremental, post-publish, best-effort)."""
    from fdf_spark.sources.versioned import optimize, read_version

    build_blooms(spark, table, ["doc"])
    res = optimize(spark, table, zorder=["day"])  # rewrites ALL files
    assert res["blooms_rebuilt"] == ["doc"]
    files = [f.replace("file:", "") for f in read_version(spark, table).inputFiles()]
    assert files and all(os.path.exists(f + BLOOM_SUFFIX) for f in files)
    # probes keep pruning after the rewrite
    present = read_version(spark, table).select("doc").first().doc
    got = read_version(spark, table, prune=("doc", [present]))
    assert got.filter(F.col("doc") == present).count() >= 1
    assert len(got.inputFiles()) <= len(files)


def test_table_blooms_metadata_view(spark, table):
    from fdf_spark.sources.metatables import table_blooms

    rows = table_blooms(spark, table).collect()
    assert len(rows) == 8 and all(r.col is None for r in rows)  # uncovered
    build_blooms(spark, table, ["doc"])
    rows = table_blooms(spark, table).collect()
    assert len(rows) == 8 and all(r.col == "doc" and r.m_bits > 0 for r in rows)


def test_delete_and_update_where_scope_through_blooms(spark, table):
    """Equality predicates in delete_where / update_where bloom-prune
    their match scans — the same sidecar consult as the read path."""
    from fdf_spark.sources.versioned import (
        _read_manifest,
        delete_where,
        read_version,
        update_where,
    )

    build_blooms(spark, table, ["doc"])
    k0 = read_version(spark, table).select("doc").first().doc
    v = delete_where(spark, table, f"doc = {k0}")
    meta = _read_manifest(table, v)["meta"]["delete"]
    assert meta["files_scanned"] < 8
    assert read_version(spark, table).filter(F.col("doc") == k0).count() == 0
    k1 = read_version(spark, table).select("doc").first().doc
    v = update_where(spark, table, f"doc = {k1}", {"day": F.lit(999)})
    meta = _read_manifest(table, v)["meta"]["update"]
    assert meta["files_scanned"] < 8
    got = read_version(spark, table).filter(F.col("doc") == k1).collect()
    assert len(got) == 1 and got[0].day == 999


def test_stream_merge_sink_maintains_blooms(spark, tmp_path):
    """bloom_cols on the streaming CDC sink: every micro-batch's commit
    is followed by an incremental sidecar build, so point lookups stay
    pruned while the table ingests."""
    from fdf_spark.sources.metatables import table_blooms
    from fdf_spark.sources.versioned import read_version, stream_merge_sink

    p = str(tmp_path / "t")
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc long, payload string"
    )
    b1.write.parquet(src)
    stream = spark.readStream.schema("doc long, payload string").parquet(src)
    q = stream_merge_sink(stream, p, keys=["doc"], checkpoint=ckpt, bloom_cols=["doc"])
    q.processAllAvailable()
    q.stop()
    assert read_version(spark, p).count() == 2
    cov = table_blooms(spark, p).collect()
    covered = {r.file for r in cov if r.col == "doc"}
    from fdf_spark.sources.metatables import table_files

    nonempty = {r.file for r in table_files(spark, p).collect() if r.rows > 0}
    assert nonempty and nonempty <= covered  # every non-empty live file covered
    got = read_version(spark, p, prune=("doc", [1]))
    assert got.filter("doc = 1").count() == 1


def test_cow_merge_rebuilds_bloom_coverage(spark, table):
    """Code-review r12: bloom-follows-rewrite is a rewrite-seam hook,
    not an OPTIMIZE special case — a copy-on-write merge that replaces
    covered files rebuilds their columns' sidecars too."""
    from fdf_spark.sources.metatables import table_files
    from fdf_spark.sources.versioned import merge_versioned, read_version

    build_blooms(spark, table, ["doc"])
    k0 = read_version(spark, table).select("doc").first().doc
    ch = spark.createDataFrame([(k0, 99, "upd")], "doc long, day long, user string")
    merge_versioned(spark, table, ch, ["doc"])
    from fdf_spark.sources.bloomskip import sidecar_meta

    nonempty = [r.file for r in table_files(spark, table).collect() if r.rows > 0]
    assert nonempty and all(
        (sidecar_meta(f) or {}).get("doc") is not None for f in nonempty
    )
    got = read_version(spark, table, prune=("doc", [k0]))
    assert got.filter(F.col("doc") == k0).count() == 1


def test_stream_sink_bloom_misconfig_fails_loudly(spark, tmp_path):
    """Code-review r12: a deterministic bloom_cols misconfiguration
    (unknown column) fails the stream instead of being silently
    swallowed every batch."""
    from fdf_spark.sources.versioned import stream_merge_sink

    src = str(tmp_path / "in")
    spark.createDataFrame([(1, "a")], "doc long, payload string").write.parquet(src)
    stream = spark.readStream.schema("doc long, payload string").parquet(src)
    q = stream_merge_sink(
        stream, str(tmp_path / "t"), keys=["doc"],
        checkpoint=str(tmp_path / "ck"), bloom_cols=["nope"],
    )
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="not in table schema"):
        q.processAllAvailable()
        q.awaitTermination(30)
    q.stop()
