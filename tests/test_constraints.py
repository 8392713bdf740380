"""CHECK constraints — Delta-style write-time enforcement on versioned
tables, gating every write seam (commit/WAP, CoW merge, MoR merge,
UPDATE images) before anything publishes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.versioned import (
    ConstraintViolationError,
    add_check_constraint,
    commit_version,
    drop_check_constraint,
    list_check_constraints,
    list_versions,
    merge_on_read,
    merge_versioned,
    publish_staged,
    read_version,
    stage_commit,
    update_where,
)


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(1, 501).select(F.col("id").alias("k"), (F.col("id") % 9 + 1.0).alias("v"))
    commit_version(df, p)
    add_check_constraint(spark, p, "v_positive", "v > 0")
    return p


def test_add_rejects_preexisting_violations(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_version(spark.createDataFrame([(1, -1.0)], "k long, v double"), p)
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        add_check_constraint(spark, p, "v_positive", "v > 0")
    assert list_check_constraints(p) == {}


def test_commit_gated_and_nothing_published(spark, table):
    head = list_versions(table)[-1]
    bad = spark.createDataFrame([(9001, 1.0), (9002, -3.0)], "k long, v double")
    with pytest.raises(ConstraintViolationError, match=r"v_positive.*1 violating"):
        commit_version(bad, table, mode="append")
    assert list_versions(table)[-1] == head  # nothing landed
    good = spark.createDataFrame([(9001, 1.0)], "k long, v double")
    assert commit_version(good, table, mode="append") == head + 1


def test_null_counts_as_violation(spark, table):
    batch = spark.createDataFrame([(9001, None)], "k long, v double")
    with pytest.raises(ConstraintViolationError):
        commit_version(batch, table, mode="append")


def test_update_images_gated(spark, table):
    with pytest.raises(ConstraintViolationError):
        update_where(spark, table, "k = 7", {"v": F.lit(-1.0)})
    assert read_version(spark, table).filter("k = 7").first().v > 0
    update_where(spark, table, "k = 7", {"v": F.lit(42.0)})
    assert read_version(spark, table).filter("k = 7").first().v == 42.0


def test_merge_paths_gated(spark, table):
    head = list_versions(table)[-1]
    bad = spark.createDataFrame([(3, -5.0)], "k long, v double")
    with pytest.raises(ConstraintViolationError):
        merge_on_read(spark, table, bad, keys=["k"])
    with pytest.raises(ConstraintViolationError):
        merge_versioned(spark, table, bad, keys=["k"])
    assert list_versions(table)[-1] == head


def test_schema_evolution_append_evaluates_missing_as_null(spark, table):
    # constraint on a column the batch doesn't carry: readers will see
    # NULL for those rows, so the write must fail the CHECK
    add_check_constraint(spark, table, "v_small", "v < 100")
    batch = spark.createDataFrame([(9100,)], "k long")  # no v column
    with pytest.raises(ConstraintViolationError, match="v_positive"):
        commit_version(batch, table, mode="append")


def test_publish_staged_rechecks(spark, table):
    bad = spark.createDataFrame([(9200, 5.0)], "k long, v double")
    stage_commit(bad, table, wap_id="w1")
    # existing rows (k <= 500) satisfy the new CHECK; the staged batch
    # predates it and must be re-gated at publish time
    add_check_constraint(spark, table, "k_small", "k < 9000")
    with pytest.raises(ConstraintViolationError, match="k_small"):
        publish_staged(spark, table, "w1")
    drop_check_constraint(table, "k_small")
    assert publish_staged(spark, table, "w1") > 0


def test_drop_column_blocked_by_constraint(spark, table):
    from fdf_spark.sources.versioned import drop_column

    with pytest.raises(ValueError, match="referenced by CHECK constraint"):
        drop_column(table, "v")
    drop_check_constraint(table, "v_positive")
    drop_column(table, "v")  # unblocked
    assert read_version(spark, table).columns == ["k"]


def test_drop_constraint_unblocks(spark, table):
    drop_check_constraint(table, "v_positive")
    bad = spark.createDataFrame([(9300, -1.0)], "k long, v double")
    commit_version(bad, table, mode="append")
    assert read_version(spark, table).filter("v < 0").count() == 1
