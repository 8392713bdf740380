"""update_where — row-level UPDATE as a merge-on-read commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.versioned import (
    _read_manifest,
    commit_version,
    diff_versions,
    list_versions,
    optimize,
    read_version,
    rename_column,
    set_partition_spec,
    update_where,
)


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        (F.col("id") % 3).alias("g"),
    )
    commit_version(df.repartition(4), p)
    return p


def test_update_values_and_isolation(spark, table):
    v = update_where(spark, table, "g = 1", {"v": F.col("v") * 10 + F.col("k")})
    assert v == 2
    df = read_version(spark, table)
    assert df.count() == 2000  # row count unchanged
    got = df.filter("k = 7").first()  # 7 % 3 == 1 → updated
    assert got.v == (7 % 7) * 10 + 7
    assert df.filter("k = 6").first().v == 6 % 7  # untouched
    # pinned reader of v1 sees pre-update values
    assert read_version(spark, table, 1).filter("k = 7").first().v == 7 % 7


def test_update_emits_cow_equivalent_deltas(spark, table):
    update_where(spark, table, "k < 10", {"v": F.lit(-1.0)})
    d = diff_versions(spark, table, 1, 2)
    rows = {(r.change, r.k, r.v) for r in d.collect()}
    assert rows == {("delete", k, float(k % 7)) for k in range(10)} | {
        ("insert", k, -1.0) for k in range(10)
    }


def test_update_nothing_matched_returns_parent(spark, table):
    assert update_where(spark, table, "k = -5", {"v": F.lit(0.0)}) == 1
    assert list_versions(table) == [1]


def test_update_set_target_validated(spark, table):
    with pytest.raises(ValueError, match="SET targets"):
        update_where(spark, table, "k = 1", {"nope": F.lit(1)})
    with pytest.raises(ValueError, match="at least one"):
        update_where(spark, table, "k = 1", {})


def test_update_prunes_through_bucket_transform(spark, tmp_path):
    p = str(tmp_path / "b")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    commit_version(df.limit(0), p)
    set_partition_spec(p, ["bucket(8, k)"])
    commit_version(df, p, mode="append")
    v = update_where(spark, p, "k = 4242", {"v": "v + 1000"})
    meta = _read_manifest(p, v)["meta"]["update"]
    assert meta["rows"] == 1 and meta["files_pruned"] > 0
    assert read_version(spark, p).filter("k = 4242").first().v == (4242 % 97) + 1000


def test_update_after_rename_and_optimize_fold(spark, table):
    rename_column(table, "v", "value")
    update_where(spark, table, "g = 2", {"value": "value + 0.5"})
    before = {(r.k, r.value) for r in read_version(spark, table).collect()}
    assert all(val == (k % 7) + 0.5 for k, val in before if k % 3 == 2)
    res = optimize(spark, table)
    assert diff_versions(spark, table, res["version"] - 1, res["version"]).count() == 0
    after = {(r.k, r.value) for r in read_version(spark, table).collect()}
    assert after == before


def test_delete_race_vs_append_rebases_manifest_only(spark, table, monkeypatch):
    """A concurrent blind APPEND is compatible with a row-level delete:
    the tombstones address immutable files, so the loser re-bases
    manifest-only — no re-scan, no re-write (the tombstone files still
    carry the version-2 stage prefix they were staged under)."""
    import fdf_spark.sources.versioned as V

    real_publish = V._publish_manifest_atomic
    state = {"raced": False}

    def racing_publish(staged, dst):
        if not state["raced"]:
            state["raced"] = True
            commit_version(
                spark.createDataFrame([(9001, 0.0, 0)], "k long, v double, g long"),
                table, mode="append",
            )
        real_publish(staged, dst)

    monkeypatch.setattr(V, "_publish_manifest_atomic", racing_publish)
    v = V.delete_where(spark, table, "k < 5")
    monkeypatch.undo()
    assert v == 3  # racer took v2, the delete re-based onto it
    df = read_version(spark, table)
    assert df.filter("k < 5").count() == 0
    assert df.filter("k = 9001").count() == 1  # racer's row live
    assert df.count() == 2000 - 5 + 1
    # manifest-only: the tombstones still live under their v2 stage dir
    m3 = _read_manifest(table, 3)
    tombs = {t for ts in m3["delete_files"].values() for t in ts}
    assert tombs and all("/d00000002-" in t for t in tombs)


def test_delete_race_vs_delete_other_files_rebases(spark, tmp_path, monkeypatch):
    """Two concurrent deletes touching DISJOINT files both land: the
    loser's touched files kept identical masks, so it re-bases and
    carries the winner's masks forward."""
    import fdf_spark.sources.versioned as V

    p = str(tmp_path / "t")
    lo = spark.range(0, 1000).select(F.col("id").alias("k"))
    hi = spark.range(1000, 2000).select(F.col("id").alias("k"))
    commit_version(lo.coalesce(1), p)
    commit_version(hi.coalesce(1), p, mode="append")  # v2: two files

    real_publish = V._publish_manifest_atomic
    state = {"raced": False}

    def racing_publish(staged, dst):
        if not state["raced"]:
            state["raced"] = True
            V.delete_where(spark, p, "k = 1500")  # touches only the hi file
        real_publish(staged, dst)

    monkeypatch.setattr(V, "_publish_manifest_atomic", racing_publish)
    v = V.delete_where(spark, p, "k = 5")  # touches only the lo file
    monkeypatch.undo()
    assert v == 4
    df = read_version(spark, p)
    assert df.filter("k in (5, 1500)").count() == 0  # BOTH deletes applied
    assert df.count() == 1998


def test_delete_race_vs_same_file_delete_raises(spark, table, monkeypatch):
    """A concurrent delete that re-masked the SAME file is a real
    conflict — positions were computed against a stale mask."""
    import fdf_spark.sources.versioned as V

    real_publish = V._publish_manifest_atomic
    state = {"raced": False}

    def racing_publish(staged, dst):
        if not state["raced"]:
            state["raced"] = True
            V.delete_where(spark, table, "g = 0")  # touches every file
        real_publish(staged, dst)

    monkeypatch.setattr(V, "_publish_manifest_atomic", racing_publish)
    with pytest.raises(V.ConcurrentCommitError):
        V.delete_where(spark, table, "g = 1")  # same files, stale masks
    monkeypatch.undo()
    # the caller's documented recovery: re-run against the new head
    V.delete_where(spark, table, "g = 1")
    df = read_version(spark, table)
    assert df.filter("g in (0, 1)").count() == 0
    assert df.count() == 2000 - 2 * 667


def test_update_race_vs_append_rebases(spark, table, monkeypatch):
    import fdf_spark.sources.versioned as V

    real_publish = V._publish_manifest_atomic
    state = {"raced": False}

    def racing_publish(staged, dst):
        if not state["raced"]:
            state["raced"] = True
            commit_version(
                spark.createDataFrame([(9002, 1.5, 1)], "k long, v double, g long"),
                table, mode="append",
            )
        real_publish(staged, dst)

    monkeypatch.setattr(V, "_publish_manifest_atomic", racing_publish)
    v = update_where(spark, table, "k = 42", {"v": F.lit(-42.0)})
    monkeypatch.undo()
    assert v == 3
    df = read_version(spark, table)
    assert df.filter("k = 42").first().v == -42.0
    assert df.filter("k = 9002").count() == 1
    assert df.count() == 2001
    # the staged images were NOT rewritten: still under their v2 stage dir
    m2, m3 = _read_manifest(table, 2), _read_manifest(table, 3)
    new = set(m3["files"]) - set(m2["files"])
    assert new and all("/c00000002-" in f for f in new)


def test_update_type_cast_keeps_schema(spark, table):
    # integer-valued expression on a double column stays double
    update_where(spark, table, "k = 3", {"v": F.lit(9)})
    df = read_version(spark, table)
    assert dict(df.dtypes)["v"] == "double"
    assert df.filter("k = 3").first().v == 9.0


def test_update_race_vs_set_spec_stamps_parent_spec(spark, tmp_path, monkeypatch):
    """A racing set_partition_spec is mask-compatible (manifest-only),
    so the update re-bases — and the staged images keep the PARENT's
    spec stamp, which is what they were actually clustered under
    (VERDICT r11 #7: the stamp must never overstate the layout; a
    later OPTIMIZE re-clusters them under the current spec because
    their stamp differs from it)."""
    import fdf_spark.sources.versioned as V

    p = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 9 + 0.0).alias("v")
    )
    commit_version(df.repartition(2), p)  # v1, spec 0

    real_publish = V._publish_manifest_atomic
    state = {"raced": False}

    def racing_publish(staged, dst):
        if not state["raced"] and "_versions" in dst and "v00000002" in dst:
            state["raced"] = True
            set_partition_spec(p, ["bucket(4, k)"])  # head moves the spec
        real_publish(staged, dst)

    monkeypatch.setattr(V, "_publish_manifest_atomic", racing_publish)
    v = update_where(spark, p, "k < 10", {"v": F.lit(-1.0)})
    monkeypatch.undo()
    assert v == 3  # racer took v2 (set-spec), the update re-based
    m = V._read_manifest(p, 3)
    assert m["current_spec"] == 1  # head's spec governs FUTURE writes
    new_files = [f for f in m["files"] if "/c00000002-" in f]
    assert new_files and all(m["file_specs"][f] == 0 for f in new_files)
    got = read_version(spark, p)
    assert got.filter("k < 10").count() == 10
    assert got.filter("v = -1.0").count() == 10
    assert got.count() == 1000
    # OPTIMIZE re-clusters the spec-0-stamped images under the current
    # spec — after it, every live file claims the layout it really has
    res = optimize(spark, p)
    mo = V._read_manifest(p, res["version"])
    assert all(
        int(mo["file_specs"].get(f, 0)) == 1
        for f in mo["files"]
        if f"/c{res['version']:08d}-" in f
    )
    assert diff_versions(spark, p, 3, res["version"]).count() == 0
