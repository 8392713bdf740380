"""Metadata tables (sources/metatables.py) — Iceberg history/files/refs
parity, derived from the manifest chain with zero data reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.metatables import (
    table_eq_deletes,
    table_files,
    table_history,
    table_refs,
)
from fdf_spark.sources.versioned import (
    commit_version,
    create_branch,
    create_tag,
    delete_keys,
    delete_where,
    optimize,
    publish_staged,
    stage_commit,
)


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    commit_version(df.filter("k < 600"), p)                       # v1
    commit_version(df.filter("k >= 600"), p, mode="append")      # v2
    delete_where(spark, p, "k between 100 and 149")               # v3: 50 tombstones
    return p


def test_history_rows_and_debt(spark, table):
    h = {r.version: r for r in table_history(spark, table).collect()}
    assert h[1].mode == "append" and h[1].n_rows == 600 and h[1].rows_added == 600
    assert h[2].n_rows == 1000 and h[2].rows_added == 400
    assert h[3].mode == "delete" and h[3].n_rows == 1000  # physical rows unchanged
    assert h[3].delete_debt == 50
    # optimize folds the debt away
    optimize(spark, table)
    h4 = table_history(spark, table).orderBy("version").collect()[-1]
    assert h4.mode == "optimize" and h4.delete_debt == 0 and h4.n_rows == 950


def test_history_timestamps_monotonic_enough(spark, table):
    ts = [r.ts for r in table_history(spark, table).orderBy("version").collect()]
    assert all(t is not None for t in ts)


def test_files_reports_debt_and_eq_entries(spark, table):
    f = table_files(spark, table)
    rows = f.collect()
    assert sum(r.rows for r in rows) == 1000
    assert sum(r.dv_tombstones for r in rows) == 50
    assert all(r.bytes > 0 for r in rows)
    keys = spark.createDataFrame([(200,), (201,)], "k long")
    delete_keys(spark, table, keys, ["k"])
    f2 = table_files(spark, table).collect()
    assert sum(r.eq_entries for r in f2) > 0
    eq = table_eq_deletes(spark, table).collect()
    assert len(eq) == 1 and eq[0].keys == 2 and eq[0].cols == "k"
    assert eq[0].files_scoped == sum(1 for r in f2 if r.eq_entries)


def test_refs_table(spark, table):
    create_tag(table, "release-1", version=2)
    create_branch(table, "dev")
    r = {x.name: x for x in table_refs(spark, table).collect()}
    assert r["release-1"].kind == "tag" and r["release-1"].version == 2
    assert r["dev"].kind == "branch" and r["dev"].version == 3


def test_debt_counts_positions_not_tombstone_rows(spark, tmp_path):
    """One tombstone parquet carries positions for MANY data files (the
    delete scan packs small files into one partition): per-file debt
    must count only that file's positions, never the tombstone's full
    row count once per referencing file (code-review finding)."""
    p = str(tmp_path / "t")
    commit_version(spark.createDataFrame([(i, 0) for i in range(100)], "k long, v long").coalesce(1), p)
    commit_version(
        spark.createDataFrame([(i, 0) for i in range(100, 200)], "k long, v long").coalesce(1),
        p, mode="append",
    )
    delete_where(spark, p, "k in (5, 150)")  # one row in EACH file
    m = __import__("fdf_spark.sources.versioned", fromlist=["_read_manifest"])._read_manifest(p, 3)
    tombs = {t for ts in m["delete_files"].values() for t in ts}
    h = table_history(spark, p).orderBy("version").collect()[-1]
    assert h.delete_debt == 2  # 4 under the over-count bug when len(tombs)==1
    f = table_files(spark, p).collect()
    assert sorted(r.dv_tombstones for r in f) == [1, 1]
    assert len(tombs) >= 1  # shape sanity: the masks exist


def test_partitions_table_groups_by_bucket(spark, tmp_path):
    from fdf_spark.sources.versioned import set_partition_spec

    p = str(tmp_path / "b")
    df = spark.range(0, 8000).select(F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
    commit_version(df.limit(0), p)
    set_partition_spec(p, ["bucket(4, k)"])
    commit_version(df, p, mode="append")
    from fdf_spark.sources.metatables import table_partitions

    rows = table_partitions(spark, p).collect()
    bucketed = [r for r in rows if r.partition.startswith("bucket(4, k)=")]
    assert sum(r.n_rows for r in rows) == 8000
    assert len(bucketed) >= 2  # per-bucket groups visible
    assert all(r.bytes > 0 and r.n_files >= 1 for r in bucketed)


def test_vacuum_time_retention(spark, tmp_path, monkeypatch):
    import fdf_spark.sources.versioned as V

    p = str(tmp_path / "t")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    commit_version(df, p)                                      # v1
    commit_version(df.filter("k < 50"), p, mode="overwrite")   # v2
    commit_version(df.filter("k < 10"), p, mode="overwrite")   # v3
    # retain everything: all stamps are "recent"
    assert V.vacuum(p, keep=1, retain_last_s=3600) == []
    assert V.list_versions(p) == [1, 2, 3]
    # age v1/v2 out by restamping the clock forward is invasive; instead
    # a zero-window retention degrades to pure count-based keep
    removed = V.vacuum(p, keep=1, retain_last_s=-1)
    assert V.list_versions(p) == [3]
    assert removed  # v1/v2-only files reclaimed


def test_history_carries_wap_id(spark, table):
    extra = spark.createDataFrame([(5000, 1)], "k long, v long")
    stage_commit(extra, table, wap_id="batch-77")
    publish_staged(spark, table, "batch-77")
    last = table_history(spark, table).orderBy("version").collect()[-1]
    assert last.wap_id == "batch-77" and last.rows_added == 1


def test_vacuum_time_retention_keeps_window_boundary(spark, tmp_path, monkeypatch):
    """retain_last_s must keep the snapshot CURRENT at the window's
    start: an as_of stamp inside the advertised window but older than
    the earliest in-window commit still resolves (ADVICE r11 — before
    the fix the boundary version was dropped and 'keep a week of time
    travel' failed for the window's oldest span)."""
    import time as _time

    import fdf_spark.sources.versioned as V
    from fdf_spark.sources.versioned import read_version

    p = str(tmp_path / "tb")
    now = _time.time()
    stamps = iter([now - 10 * 86400, now - 9 * 86400, now - 86400])

    class _Clock:
        @staticmethod
        def time():
            try:
                return next(stamps)
            except StopIteration:
                return _time.time()

    monkeypatch.setattr(V, "time", _Clock)
    df = spark.range(0, 30).select(F.col("id").alias("k"))
    commit_version(df.filter("k < 10"), p)                 # v1 @ now-10d
    commit_version(df.filter("k < 20"), p, "overwrite")    # v2 @ now-9d
    commit_version(df, p, "overwrite")                     # v3 @ now-1d
    V.vacuum(p, keep=1, retain_last_s=7 * 86400, orphan_grace_s=1e12)
    # v2 is the boundary (newest pre-cutoff stamp): it was the table at
    # the window's start and must survive; v1 is strictly older and dies
    assert V.list_versions(p) == [2, 3]
    assert V.resolve_as_of(p, now - 5 * 86400) == 2
    assert read_version(spark, p, as_of_ts=now - 5 * 86400).count() == 20


def test_history_falls_back_to_footers_on_legacy_manifest(spark, tmp_path):
    """A pre-upgrade manifest without a file_rows map: table_history
    must agree with table_files (footer fallback), not report 0
    (ADVICE r11)."""
    import json
    import os

    from fdf_spark.sources.versioned import _manifest_path

    p = str(tmp_path / "legacy")
    commit_version(
        spark.range(0, 123).select(F.col("id").alias("k")), p
    )  # v1 — stored FULL (no parent)
    mp = _manifest_path(p, 1)
    with open(mp) as fh:
        raw = json.load(fh)
    raw.pop("file_rows", None)
    tmp = mp + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(raw, fh)
    os.replace(tmp, mp)
    h = table_history(spark, p).collect()[0]
    assert h.n_rows == 123 and h.rows_added == 123
    assert sum(r.rows for r in table_files(spark, p).collect()) == 123


def test_metadata_tables_use_manifest_tomb_rows(spark, table, monkeypatch):
    """New-format manifests carry delete-debt counts (``tomb_rows``,
    recorded once at commit time by the publish seam), so history/files
    answer with ZERO tombstone re-reads (VERDICT r11 #4): with the
    footer path hard-failed, both tables still report exact debt."""
    import fdf_spark.sources.metatables as MT
    import fdf_spark.sources.versioned as V

    def boom(tomb_file):
        raise AssertionError("tombstone footer re-read on a new-format table")

    monkeypatch.setattr(V, "_tomb_counts_footer", boom)
    monkeypatch.setattr(MT, "_tomb_counts", boom)
    h = {r.version: r for r in table_history(spark, table).collect()}
    assert h[3].delete_debt == 50 and h[2].delete_debt == 0
    f = table_files(spark, table).collect()
    assert sum(r.dv_tombstones for r in f) == 50


def test_plan_maintenance_all_actions_and_metadata_only(spark, tmp_path):
    """plan_maintenance (VERDICT r12 #6): a table engineered to need
    bin-pack, fold-deletes, build_blooms AND vacuum yields one row per
    action; the plan is metadata-only — it still answers after every
    data file is deleted from disk (the q160 trick), because byte
    sizes ride the manifest (file_bytes, recorded at commit)."""
    import glob
    import os

    from fdf_spark.sources.bloomskip import build_blooms
    from fdf_spark.sources.metatables import plan_maintenance

    p = str(tmp_path / "t")
    df = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
    commit_version(
        spark.createDataFrame([(-1, 0)], "k long, v long").coalesce(1), p
    )                                             # v1: junk → vacuum target
    commit_version(df.repartition(6), p, mode="overwrite")  # v2: six SMALL files
    build_blooms(spark, p, ["k"])                 # full coverage at v2
    commit_version(
        spark.createDataFrame([(10_000, 1)], "k long, v long"), p, mode="append"
    )                                             # v3: uncovered file → bloom gap
    delete_where(spark, p, "k < 2500")            # v4: ~50% dv debt
    plan = {r.action + "/" + r.target: r for r in plan_maintenance(
        spark, p, small_file_bytes=32 << 20, min_small_files=4,
        max_debt_ratio=0.10, keep=1, retain_last_s=0.0,
    ).collect()}
    assert "optimize/bin-pack" in plan and plan["optimize/bin-pack"].files >= 6
    assert plan["optimize/bin-pack"].bytes > 0
    assert "optimize/fold-deletes" in plan and plan["optimize/fold-deletes"].rows >= 2000
    assert "build_blooms/k" in plan and plan["build_blooms/k"].files == 1
    assert "vacuum/" in plan and plan["vacuum/"].files >= 1 and plan["vacuum/"].bytes > 0
    # closing the bloom gap removes exactly that row
    build_blooms(spark, p, ["k"])
    plan2 = plan_maintenance(
        spark, p, small_file_bytes=32 << 20, min_small_files=4,
        max_debt_ratio=0.10, keep=1, retain_last_s=0.0,
    ).collect()
    assert not [r for r in plan2 if r.action == "build_blooms"]
    # the q160 trick: every data page gone → the plan still answers
    # (sizes from manifest file_bytes, debt from tomb_rows, coverage
    # from sidecar JSONs)
    for f in glob.glob(os.path.join(p, "data", "*", "*.parquet")):
        os.remove(f)
    plan3 = {r.action + "/" + r.target: r for r in plan_maintenance(
        spark, p, small_file_bytes=32 << 20, min_small_files=4,
        max_debt_ratio=0.10, keep=1, retain_last_s=0.0,
    ).collect()}
    assert plan3["optimize/bin-pack"].bytes == plan["optimize/bin-pack"].bytes
    assert plan3["optimize/fold-deletes"].rows == plan["optimize/fold-deletes"].rows


def test_plan_maintenance_empty_on_healthy_table(spark, tmp_path):
    """A freshly-optimized single-version table recommends nothing
    (with default thresholds and no history to reclaim)."""
    from fdf_spark.sources.metatables import plan_maintenance

    p = str(tmp_path / "t")
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    commit_version(df.coalesce(1), p)
    plan = plan_maintenance(spark, p, min_small_files=4).collect()
    assert plan == []


def test_table_files_bytes_from_manifest(spark, tmp_path):
    """table_files serves byte sizes from the manifest's commit-time
    file_bytes — identical to the stat, and still present after the
    file is gone."""
    import os

    p = str(tmp_path / "t")
    commit_version(spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1), p)
    rows = table_files(spark, p).collect()
    assert len(rows) == 1
    f = rows[0].file
    assert rows[0].bytes == os.path.getsize(f)
    os.remove(f)
    assert table_files(spark, p).collect()[0].bytes == rows[0].bytes


def test_apply_maintenance_closes_the_loop(spark, tmp_path):
    """apply_maintenance executes exactly what plan_maintenance
    recommends, under the same thresholds — and a fresh plan afterwards
    recommends (almost) nothing: optimize folded the debt and packed
    the small files (bloom coverage followed the rewrite), build_blooms
    closed any remaining gap, vacuum reclaimed dead versions."""
    from fdf_spark.sources.bloomskip import build_blooms
    from fdf_spark.sources.metatables import apply_maintenance, plan_maintenance
    from fdf_spark.sources.versioned import read_version

    p = str(tmp_path / "t")
    df = spark.range(0, 5000).select(F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
    commit_version(
        spark.createDataFrame([(-1, 0)], "k long, v long").coalesce(1), p
    )
    commit_version(df.repartition(6), p, mode="overwrite")
    build_blooms(spark, p, ["k"])
    commit_version(
        spark.createDataFrame([(10_000, 1)], "k long, v long"), p, mode="append"
    )
    delete_where(spark, p, "k < 2500")
    kw = dict(small_file_bytes=32 << 20, min_small_files=4,
              max_debt_ratio=0.10, keep=1, retain_last_s=0.0)
    before = plan_maintenance(spark, p, **kw).collect()
    assert {r.action for r in before} >= {"optimize", "build_blooms", "vacuum"}
    out = apply_maintenance(spark, p, **kw)
    assert set(out) == {"optimize", "build_blooms", "vacuum"}
    assert out["optimize"]["rewritten"] > 0 and out["vacuum"] > 0
    # rows survived intact through the whole cycle
    got = read_version(spark, p)
    assert got.count() == 5000 - 2500 + 1
    assert got.filter("k = 10000").count() == 1
    # the fresh plan is empty except (possibly) a vacuum row for the
    # just-replaced files still inside their own retention arithmetic
    after = plan_maintenance(spark, p, **kw).collect()
    assert not [r for r in after if r.action in ("optimize", "build_blooms")]


def test_plan_maintenance_clustering_drift(spark, tmp_path):
    """r14 (VERDICT r13 missing #5): interleaved ingest against a
    declared spec raises the per-dimension overlap depth (avg files
    covering a point, from manifest stats only) past drift_factor ×
    the ideal Z-ORDER depth → a ('optimize', 'zorder:<cols>') row;
    apply_maintenance executes the Z-ORDER; the re-clustered table is
    SILENT."""
    from fdf_spark.sources.metatables import apply_maintenance, plan_maintenance
    from fdf_spark.sources.versioned import set_partition_spec

    from fdf_spark.sources.versioned import (
        clone_table,
        list_versions,
        optimize,
        read_version,
    )

    p = str(tmp_path / "t")
    commit_version(
        spark.range(0, 1).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("g"),
            F.lit(0.0).alias("v"),
        ),
        p,
    )
    set_partition_spec(p, ["k", "g"])
    # twelve appends, EACH spanning the full key range: across commits
    # every file overlaps every point in both dimensions — the drifted
    # shape continuous ingest produces
    for i in range(12):
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), ((F.col("id") * 7 + i) % 97).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
        commit_version(df, p)
    plan = plan_maintenance(spark, p).collect()
    drift = [r for r in plan if r.action == "optimize" and r.target.startswith("zorder:")]
    assert len(drift) == 1
    assert drift[0].target == "zorder:g,k"
    assert "drift" in drift[0].detail
    # counterfactual: the SAME data freshly Z-ORDERed (shallow clone,
    # small target so the file count stays comparable) is SILENT —
    # per-dim depth ≈ N^(1/2), the Morton ideal, not ≈ N
    p2 = str(tmp_path / "t2")
    clone_table(p, p2)
    res = optimize(spark, p2, zorder=["g", "k"], target_bytes=60_000)
    import fdf_spark.sources.versioned as V

    n2 = len(V._read_manifest(p2, res["version"])["files"])
    assert n2 >= 8  # enough files that silence is the METRIC, not the floor
    assert not [
        r for r in plan_maintenance(spark, p2).collect()
        if r.target.startswith("zorder:")
    ]
    # apply_maintenance executes the recommendation on the drifted table
    out = apply_maintenance(spark, p)
    assert out["optimize"]["version"] == list_versions(p)[-1]
    replan = plan_maintenance(spark, p).collect()
    assert not [r for r in replan if r.target.startswith("zorder:")]
    # and nothing was lost in the rewrite
    assert read_version(spark, p).count() == 48001


def test_plan_maintenance_no_drift_without_spec_or_files(spark, tmp_path):
    """No spec → no drift signal; a spec but fewer than drift_min_files
    stat-covered files → silent (a rewrite cannot matter)."""
    from fdf_spark.sources.metatables import plan_maintenance
    from fdf_spark.sources.versioned import set_partition_spec

    p = str(tmp_path / "t")
    for i in range(3):
        commit_version(
            spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1), p
        )
    assert not [
        r for r in plan_maintenance(spark, p).collect()
        if r.target.startswith("zorder:")
    ]
    set_partition_spec(p, ["k"])
    commit_version(spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1), p)
    assert not [
        r for r in plan_maintenance(spark, p).collect()
        if r.target.startswith("zorder:")
    ]


def test_plan_maintenance_analyze_and_ndv_bloom_nomination(spark, tmp_path):
    from fdf_spark.sources.bloomskip import build_blooms
    from fdf_spark.sources.metatables import apply_maintenance, plan_maintenance
    from fdf_spark.sources.versioned import analyze_table, commit_version

    p = str(tmp_path / "plan_an")
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),                       # key-like -> nominate
        (F.col("id") % 4).alias("g"),                 # low NDV -> never
        (F.col("id") / 2.0).alias("x"),               # double -> not bloomable
    )
    commit_version(df.repartition(2), p)
    # never-analyzed tables are SILENT (opt-in-then-maintained, like
    # the bloom gap rule)
    assert not plan_maintenance(spark, p).collect()
    analyze_table(spark, p, mode="exact")
    recs = plan_maintenance(spark, p).collect()
    noms = {r.target for r in recs if r.action == "build_blooms"}
    assert noms == {"k"}                              # not g (low NDV), not x (type)
    assert not any(r.action == "analyze" for r in recs)
    # once k HAS sidecars, the NDV rule hands off to the gap rule
    build_blooms(spark, p, ["k"])
    assert not plan_maintenance(spark, p).collect()
    # staleness: head moves past the threshold -> analyze again
    for _ in range(3):
        commit_version(
            spark.range(1).select(
                F.col("id").alias("k"), F.lit(0).alias("g"), F.lit(0.0).alias("x")
            ),
            p,
        )
    recs = plan_maintenance(spark, p, analyze_stale_commits=3).collect()
    assert any(
        r.action == "analyze" and "commits old" in r.detail for r in recs
    )
    # apply closes the loop: blooms for the ingests' gaps + fresh stats
    out = apply_maintenance(spark, p, analyze_stale_commits=3)
    assert "analyze" in out and out["analyze"]["of_version"] > 1
    assert not any(
        r.action == "analyze"
        for r in plan_maintenance(spark, p, analyze_stale_commits=3).collect()
    )


def test_maintenance_policy_from_table_properties(spark, tmp_path):
    from fdf_spark.sources.metatables import apply_maintenance, plan_maintenance
    from fdf_spark.sources.versioned import commit_version, set_properties

    p = str(tmp_path / "pol")
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    # 6 small files -> bin-pack fires at the default min_small_files=4
    commit_version(df.repartition(6), p)
    assert any(
        r.target == "bin-pack" for r in plan_maintenance(spark, p).collect()
    )
    # the table's own policy raises the threshold -> silent, NO args
    set_properties(p, {"fdf.maintenance.minSmallFiles": "50"})
    assert not plan_maintenance(spark, p).collect()
    # explicit argument overrides the property
    assert any(
        r.target == "bin-pack"
        for r in plan_maintenance(spark, p, min_small_files=4).collect()
    )
    # apply resolves the SAME way: property-silenced table does nothing
    assert apply_maintenance(spark, p) == {}
    out = apply_maintenance(spark, p, min_small_files=4)
    assert out["optimize"]["rewritten"] >= 6
