"""clone_table (Delta CLONE analog): shallow manifest-only forks with
two-sided vacuum safety, and deep self-contained copies."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.versioned import (
    clone_table,
    commit_version,
    delete_where,
    list_refs,
    list_versions,
    read_version,
    vacuum,
)


@pytest.fixture()
def src(spark, tmp_path):
    p = str(tmp_path / "src")
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
    commit_version(df.repartition(3), p)            # v1
    delete_where(spark, p, "k < 50")                # v2: DV mask rides along
    return p


def test_shallow_clone_zero_copy_and_isolation(spark, tmp_path, src):
    dst = str(tmp_path / "fork")
    assert clone_table(src, dst) == 1
    got = read_version(spark, dst)
    assert got.count() == 950  # data AND delete mask came across
    # zero bytes copied: the clone owns no data files of its own
    assert not os.path.isdir(os.path.join(dst, "data"))
    # the source is pinned by an immutable tag at the cloned version
    refs = list_refs(src)
    assert any(n.startswith("clone-fork-v") and r["version"] == 2 for n, r in refs.items())
    # writes to the clone never touch the source
    delete_where(spark, dst, "k >= 900")
    commit_version(
        spark.createDataFrame([(5000, 1)], "k long, v long"), dst, mode="append"
    )
    assert read_version(spark, dst).count() == 950 - 100 + 1
    assert read_version(spark, src).count() == 950  # source untouched
    assert list_versions(src) == [1, 2]


def test_clone_side_vacuum_never_deletes_source_bytes(spark, tmp_path, src):
    dst = str(tmp_path / "fork")
    clone_table(src, dst)
    # clone diverges: overwrite makes the shared snapshot dead at dst
    commit_version(
        spark.range(0, 10).select(F.col("id").alias("k"), F.lit(0).alias("v")),
        dst, mode="overwrite",
    )
    removed = vacuum(dst, keep=1, orphan_grace_s=1e9)
    # the ownership guard: nothing under the SOURCE root was deleted
    assert all(not f.startswith(os.path.abspath(src)) for f in removed)
    assert read_version(spark, src).count() == 950  # source intact


def test_source_vacuum_respects_clone_tag(spark, tmp_path, src):
    dst = str(tmp_path / "fork")
    clone_table(src, dst, version=2)
    # source moves on; vacuum keeps the tagged (cloned) version alive
    commit_version(
        spark.range(0, 5).select(F.col("id").alias("k"), F.lit(0).alias("v")),
        src, mode="overwrite",
    )
    vacuum(src, keep=1, orphan_grace_s=1e9)
    assert read_version(spark, dst).count() == 950  # clone still reads


def test_deep_clone_is_self_contained(spark, tmp_path, src):
    dst = str(tmp_path / "deep")
    clone_table(src, dst, deep=True)
    assert read_version(spark, dst).count() == 950
    # every referenced file lives under the clone's own root
    from fdf_spark.sources.versioned import _read_manifest

    m = _read_manifest(dst, 1)
    root = os.path.abspath(dst)
    assert all(f.startswith(root) for f in m["files"])
    assert all(t.startswith(root) for ts in m["delete_files"].values() for t in ts)
    # no tag needed at the source; nuking the source doesn't break it
    import shutil

    shutil.rmtree(src)
    assert read_version(spark, dst).count() == 950


def test_clone_rejects_existing_destination(spark, tmp_path, src):
    dst = str(tmp_path / "fork")
    clone_table(src, dst)
    with pytest.raises(ValueError, match="already has versions"):
        clone_table(src, dst)


def test_two_clones_same_basename_and_failed_publish_rollback(
    spark, tmp_path, src, monkeypatch
):
    """Code-review r12: two clones to same-basename destinations get
    distinct source tags; a failed clone publish drops its tag instead
    of leaking a vacuum-blocking pin."""
    import fdf_spark.sources.versioned as V

    a, b = str(tmp_path / "x" / "fork"), str(tmp_path / "y" / "fork")
    clone_table(src, a)
    clone_table(src, b)  # must not collide on the tag name
    tags = [n for n in list_refs(src) if n.startswith("clone-fork-")]
    assert len(tags) == 2

    real_publish = V._publish_manifest_atomic

    def failing_publish(staged, dst):
        if "/fail/" in dst:
            raise OSError("publish rejected")
        real_publish(staged, dst)

    monkeypatch.setattr(V, "_publish_manifest_atomic", failing_publish)
    with pytest.raises(OSError):
        clone_table(src, str(tmp_path / "fail" / "fork"))
    monkeypatch.undo()
    assert len([n for n in list_refs(src) if n.startswith("clone-fork-")]) == 2
