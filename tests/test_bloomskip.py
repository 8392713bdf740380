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


# --- r13: executor-side writes, typed probes, temporal keys, FNV ----------


def test_build_collects_only_flags_no_bitsets(spark, table, monkeypatch):
    """VERDICT r12 #1: the build's driver collect carries ONLY
    (file, built) rows — never a bitset payload.  At 10^12 rows the
    old design funneled ~terabytes of base64 through driver memory;
    this pins collected-bytes ≈ 0 mechanically."""
    cls = type(spark.range(1))  # concrete (classic) DataFrame class
    seen: list[list[str]] = []
    orig = cls.collect

    def spying_collect(self):
        seen.append(list(self.columns))
        return orig(self)

    monkeypatch.setattr(cls, "collect", spying_collect)
    res = build_blooms(spark, table, ["doc"])
    assert res["built"] == 8
    build_cols = [c for c in seen if "file" in c]
    assert build_cols and all(set(c) <= {"file", "built"} for c in build_cols)
    # executor wrote the sidecars; no tmp debris survives the rename
    d = os.path.dirname(read_version(spark, table).inputFiles()[0].replace("file:", ""))
    assert not [f for f in os.listdir(d) if ".bloom.json.tmp" in f]


def test_typed_probe_string_key_against_int_bloom(spark, table):
    """ADVICE r12 (medium): probe values hash under the table's
    DECLARED type, not their runtime Python type.  A string-typed key
    frame against an int column — which Spark's join coercion matches
    — must not falsely reject files (silently missed deletes)."""
    from fdf_spark.sources.versioned import delete_keys, read_version

    build_blooms(spark, table, ["doc"])
    k0 = read_version(spark, table).select("doc").first().doc
    # the ADVICE scenario verbatim: delete_keys with a STRING key frame
    v = delete_keys(
        spark, table, spark.createDataFrame([(str(k0),)], "doc string"), ["doc"]
    )
    assert v > 1
    assert read_version(spark, table).filter(F.col("doc") == k0).count() == 0


def test_typed_probe_read_version_and_merge(spark, table):
    """read_version prune and merge_on_read change keys coerce to the
    declared family too; an UNcoercible value degrades to no pruning
    (superset), never a false negative."""
    from fdf_spark.sources.versioned import merge_on_read, read_version

    build_blooms(spark, table, ["doc"])
    k0 = read_version(spark, table).select("doc").first().doc
    got = read_version(spark, table, prune=("doc", [str(k0)]))  # string probe
    assert got.filter(F.col("doc") == k0).count() == 1
    # uncoercible value → keep all files (no pruning, no loss)
    got = read_version(spark, table, prune=("doc", ["not-a-number"]))
    assert len(got.inputFiles()) == 8
    # merge_on_read with string-typed change keys still updates the row
    ch = spark.createDataFrame([(str(k0), 123, "x")], "doc string, day long, user string")
    merge_on_read(spark, table, ch, ["doc"])
    live = read_version(spark, table).filter(F.col("doc") == k0).collect()
    assert len(live) == 1 and live[0].day == 123


def test_probe_cap_degrades_to_no_pruning(spark, table):
    """VERDICT r12 #2: a probe list past BLOOM_PROBE_CAP skips the
    bloom consult entirely (stats pruning already ran) instead of
    stalling the driver — and stays correct."""
    from fdf_spark.sources.bloomskip import BLOOM_PROBE_CAP

    build_blooms(spark, table, ["doc"])
    k0 = read_version(spark, table).select("doc").first().doc
    big = [k0] + list(range(10_000_000, 10_000_000 + BLOOM_PROBE_CAP))
    got = read_version(spark, table, prune=("doc", big))
    assert len(got.inputFiles()) == 8  # cap hit: no bloom pruning
    assert got.filter(F.col("doc") == k0).count() == 1


def test_date_and_timestamp_bloom_keys(spark, tmp_path):
    """VERDICT r12 #5: date/timestamp bloom columns map losslessly to
    epoch-day / epoch-micros int64 on both build and probe sides —
    including a date-keyed delete_keys scope."""
    import datetime as dt

    from fdf_spark.sources.versioned import (
        _read_manifest,
        commit_version,
        delete_keys,
        list_versions,
        read_version,
    )

    p = str(tmp_path / "t")
    df = spark.range(0, 8000).select(
        F.date_add(F.lit("2020-01-01").cast("date"), ((F.col("id") * 37) % 3000).cast("int")).alias("d"),
        F.timestamp_seconds(F.lit(1_500_000_000) + F.col("id") * 7919).alias("ts"),
        F.col("id").alias("v"),
    )
    commit_version(df.repartition(6), p)
    res = build_blooms(spark, p, ["d", "ts"])
    assert res["built"] == 6
    # date probe: present value found, absent date prunes
    d0 = dt.date(2020, 1, 1) + dt.timedelta(days=37)  # id=1's date
    got = read_version(spark, p, prune=("d", [d0]))
    assert got.filter(F.col("d") == F.lit(d0)).count() >= 1
    missing = read_version(spark, p, prune=("d", [dt.date(1999, 1, 1)]))
    assert len(missing.inputFiles() or []) < 6
    # timestamp probe via the engine's own writer: date-keyed delete
    n_before = read_version(spark, p).count()
    keys = spark.createDataFrame([(d0,)], "d date")
    v = delete_keys(spark, p, keys, ["d"])
    meta = _read_manifest(p, v)["meta"]["delete_keys"]
    assert meta["files_applied"] < 6  # blooms scoped a date key
    after = read_version(spark, p)
    assert after.filter(F.col("d") == F.lit(d0)).count() == 0
    assert after.count() < n_before
    # timestamp point probe (aware UTC datetime — the exact instant)
    t0 = dt.datetime.fromtimestamp(1_500_000_000 + 7919, dt.timezone.utc)
    got = read_version(spark, p, prune=("ts", [t0]))
    assert got.filter(F.col("ts") == F.lit(t0.replace(tzinfo=None)).cast("timestamp")).count() >= 0
    assert len(got.inputFiles()) <= 6


def test_fnv_scalar_matches_vectorized():
    """Property pin: the scalar probe FNV pair and the vectorized
    executor build agree bit-for-bit over unicode/empty/binary-ish
    strings."""
    import numpy as np

    from fdf_spark.sources.bloomskip import _fnv_pair_vec, _hash_pair_str_fnv

    strs = ["", "a", "hello world", "ünïcødé-éxample", "x" * 400,
            "é中文", "key-123456789", " "]
    enc = [s.encode("utf-8") for s in strs]
    data = np.frombuffer(b"".join(enc), dtype=np.uint8)
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    h1v, h2v = _fnv_pair_vec(starts, lens, data)
    for i, s in enumerate(strs):
        h1, h2 = _hash_pair_str_fnv(s)
        assert (int(h1v[i]), int(h2v[i])) == (h1, h2), s


def test_long_string_falls_back_to_md5(spark, tmp_path):
    """Strings past _FNV_MAX_LEN build through C md5; the sidecar
    records the algo so probes dispatch identically."""
    from fdf_spark.sources.versioned import commit_version, read_version

    p = str(tmp_path / "t")
    rows = [(i, "doc-" + str(i) * 2000) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, body string")
    commit_version(df.repartition(2), p)
    build_blooms(spark, p, ["body"])
    f = read_version(spark, p).inputFiles()[0].replace("file:", "")
    sc = _load_sidecar(f)
    assert sc["body"].get("algo") == "md5"
    probe = rows[7][1]
    got = read_version(spark, p, prune=("body", [probe]))
    assert got.filter(F.col("id") == 7).count() == 1


def test_mixed_schema_evolution_build(spark, tmp_path):
    """ADVICE r12 (low): build_blooms over files that PREDATE a schema
    evolution reads under the explicit physical schema — pre-evolution
    files yield NULL for the new column instead of failing inference."""
    from fdf_spark.sources.versioned import commit_version, read_version

    p = str(tmp_path / "t")
    commit_version(
        spark.createDataFrame([(i,) for i in range(100)], "id long"), p
    )
    # append-mode evolution: the new batch carries an added column
    commit_version(
        spark.createDataFrame([(1000, "t1000")], "id long, tag string"),
        p, mode="append",
    )
    res = build_blooms(spark, p, ["tag"])  # first-listed file lacks `tag`
    assert res["built"] >= 2
    got = read_version(spark, p, prune=("tag", ["t1000"]))
    assert got.filter(F.col("tag") == "t1000").count() == 1


def test_session_tz_override_naive_probe_keeps_files(spark, tmp_path):
    """VERDICT r13 #1 / ADVICE r13: a NAIVE timestamp probe under a
    session-timezone override is provenance-AMBIGUOUS — a classic
    collect()/lit() round-trip is OS-local wall while toPandas()/SQL
    literals are session wall (measured on this Spark, not assumed) —
    so the bloom consult SKIPS (keeps files) instead of guessing an
    instant that could falsely prune the other provenance's files.
    Aware probes keep pruning exactly under any session zone."""
    import datetime as dt

    from fdf_spark.sources.bloomskip import coerce_probe_values
    from fdf_spark.sources.versioned import commit_version, read_version

    p = str(tmp_path / "t")
    df = spark.range(0, 8000).select(
        F.timestamp_seconds(F.lit(1_500_000_000) + F.col("id") * 7919).alias("ts"),
        F.col("id").alias("v"),
    )
    commit_version(df.repartition(6), p)
    assert build_blooms(spark, p, ["ts"])["built"] == 6
    t0 = read_version(spark, p).filter("v = 1").first().ts  # naive (collect)
    assert t0.tzinfo is None
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    override = "Etc/GMT-14" if old != "Etc/GMT-14" else "Etc/GMT+12"
    spark.conf.set(key, override)
    try:
        # the ADVICE scenario verbatim: session zone != OS zone, naive
        # collected datetime probed — the row must never be lost
        assert coerce_probe_values("timestamp", [t0]) is None  # consult skipped
        got = read_version(spark, p, prune=("ts", [t0]))
        assert len(got.inputFiles()) == 6  # kept, not falsely pruned
        assert got.filter(F.col("ts") == F.lit(t0)).count() == 1
        # an AWARE probe of the same instant prunes through the bloom
        aware = t0.astimezone()  # classic collect provenance → OS-local
        exact = read_version(spark, p, prune=("ts", [aware]))
        assert len(exact.inputFiles()) < 6
        assert exact.filter(F.col("ts") == F.lit(t0)).count() == 1
    finally:
        spark.conf.set(key, old)
    # back under the matching config the naive probe is exact again
    vals = coerce_probe_values("timestamp", [t0])
    assert vals is not None and isinstance(vals[0], int)
    got = read_version(spark, p, prune=("ts", [t0]))
    assert len(got.inputFiles()) < 6
    assert got.filter(F.col("ts") == F.lit(t0)).count() == 1


def test_session_tz_override_delete_keys_still_exact(spark, tmp_path):
    """The engine's own keyed writers are IMMUNE to the naive-probe
    ambiguity under a session-tz override: delete_keys probes the
    STAGED key parquet via pyarrow, which (written as
    TIMESTAMP_MICROS) yields timezone-AWARE instants — the delete
    lands exactly and bloom scoping still engages."""
    from fdf_spark.sources.versioned import (
        _read_manifest,
        commit_version,
        delete_keys,
        read_version,
    )

    p = str(tmp_path / "t")
    df = spark.range(0, 8000).select(
        F.timestamp_seconds(F.lit(1_500_000_000) + F.col("id") * 7919).alias("ts"),
        F.col("id").alias("v"),
    )
    commit_version(df.repartition(6), p)
    assert build_blooms(spark, p, ["ts"])["built"] == 6
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    spark.conf.set(key, "Etc/GMT-14" if old != "Etc/GMT-14" else "Etc/GMT+12")
    try:
        keys = spark.sql(
            "SELECT timestamp_seconds(1500000000 + 7919) AS ts"
        )
        n_before = read_version(spark, p).count()
        v = delete_keys(spark, p, keys, ["ts"])
        meta = _read_manifest(p, v)["meta"]["delete_keys"]
        assert meta["files_applied"] < 6  # bloom/stats scoped an exact instant
        assert read_version(spark, p).count() == n_before - 1
    finally:
        spark.conf.set(key, old)


def test_sidecar_write_seam_whole_or_nothing(tmp_path):
    """VERDICT r13 #2: the sidecar write routes through ONE seam
    (_write_sidecar_atomic — stage + os.replace, last-writer-wins).
    A reader interleaved with a replace sees a COMPLETE old or new
    payload, never a torn mix; a crash between stage and replace
    leaves the published sidecar untouched."""
    import json
    import os

    from fdf_spark.sources.bloomskip import _write_sidecar_atomic

    sp = str(tmp_path / "part-0.parquet.bloom.json")
    a = json.dumps({"col": {"m": 64, "k": 3, "algo": "splitmix64"}})
    b = json.dumps({"col": {"m": 128, "k": 5, "algo": "fnv64"}, "other": {"m": 64, "k": 1}})
    _write_sidecar_atomic(sp, a)
    assert json.load(open(sp)) == json.loads(a)
    # crash-between-stage-and-replace: fail the replace, payload intact
    real_replace = os.replace
    def boom(src, dst):
        raise OSError("simulated crash")
    os.replace = boom
    try:
        with pytest.raises(OSError):
            _write_sidecar_atomic(sp, b)
    finally:
        os.replace = real_replace
    assert json.load(open(sp)) == json.loads(a)  # old payload untouched
    _write_sidecar_atomic(sp, b)  # last writer wins with the whole payload
    assert json.load(open(sp)) == json.loads(b)
    # no stray tmp files survive a successful publish
    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []


def test_build_blooms_reports_unreachable_sidecars(spark, table, monkeypatch):
    """ADVICE r13: if executors wrote sidecars somewhere the driver
    cannot see (non-shared scratch), build_blooms must NOT count them
    as built — coverage reporting stays honest, pruning stays a
    superset (files without visible sidecars are always kept)."""
    import fdf_spark.sources.bloomskip as B

    monkeypatch.setattr(B, "_sidecar_visible", lambda f: False)
    res = build_blooms(spark, table, ["doc"])
    assert res["built"] == 0 and res["unreachable"] == 8
    monkeypatch.undo()
    # the real filesystem IS shared here: a re-run sees full coverage
    res2 = build_blooms(spark, table, ["doc"])
    assert res2["built"] + res2["skipped"] >= 8 and "unreachable" not in res2
