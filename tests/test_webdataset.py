"""WebDataset tar-shard container (llm/webdataset.py).

Pins: (1) docs + sidecar members roundtrip byte-exact through real tar
shards, (2) a sample's members never split across shards even under a
tiny byte budget, (3) the manifest accounts for every written shard,
(4) group_samples reassembles the trainer view, (5) shards are honest
USTAR — python's tarfile reads them from disk with no custom reader.
"""

from __future__ import annotations

import json
import os
import tarfile

from pyspark.sql import functions as F

from fdf_spark.llm.webdataset import group_samples, read_webdataset, write_webdataset
from tests.conftest import SMOKE_DIR


def _members_df(spark, n=100):
    docs = (
        spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
        .filter(F.col("doc_id") < n)
        .select(
            F.format_string("%06d", F.col("doc_id")).alias("key"),
            F.col("text"),
            F.col("source"),
        )
    )
    txt = docs.select("key", F.lit("txt").alias("ext"), F.encode("text", "UTF-8").alias("payload"))
    meta = docs.select(
        "key",
        F.lit("json").alias("ext"),
        F.encode(F.to_json(F.struct("source")), "UTF-8").alias("payload"),
    )
    # adjacency within a partition: union then sort by key
    return txt.unionByName(meta).repartition(4, "key").sortWithinPartitions("key")


def test_roundtrip_and_manifest(spark, tmp_path):
    p = str(tmp_path / "wds")
    members = _members_df(spark)
    manifest = write_webdataset(members, p).collect()
    written = sorted(r.shard for r in manifest)
    on_disk = sorted(f for f in os.listdir(p) if f.endswith(".tar"))
    assert written == on_disk and len(on_disk) >= 1
    assert sum(r.n_samples for r in manifest) == 100
    assert sum(r.n_members for r in manifest) == 200
    back = read_webdataset(spark, p)
    assert back.count() == 200
    # byte-exact payloads
    src = {(r.key, r.ext): bytes(r.payload) for r in members.collect()}
    got = {(r.key, r.ext): bytes(r.payload) for r in back.collect()}
    assert got == src


def test_samples_never_split_under_tiny_budget(spark, tmp_path):
    p = str(tmp_path / "wds_small")
    members = _members_df(spark, n=40)
    manifest = write_webdataset(members, p, shard_max_bytes=4096).collect()
    assert len(manifest) > 2  # budget actually forced multiple shards
    back = read_webdataset(spark, p)
    spread = (
        back.groupBy("key").agg(F.countDistinct("shard").alias("n_shards")).collect()
    )
    assert all(r.n_shards == 1 for r in spread)  # no sample straddles shards
    assert back.count() == 80


def test_group_samples_trainer_view(spark, tmp_path):
    p = str(tmp_path / "wds_g")
    write_webdataset(_members_df(spark, n=20), p).collect()
    samples = group_samples(read_webdataset(spark, p))
    rows = samples.collect()
    assert len(rows) == 20
    for r in rows:
        assert set(r.parts.keys()) == {"txt", "json"}
        meta = json.loads(bytes(r.parts["json"]).decode())
        assert meta["source"].startswith("src")


def test_shards_are_honest_ustar(spark, tmp_path):
    p = str(tmp_path / "wds_t")
    write_webdataset(_members_df(spark, n=10), p).collect()
    shard = [f for f in os.listdir(p) if f.endswith(".tar")][0]
    with tarfile.open(os.path.join(p, shard)) as tar:  # plain stdlib read
        names = tar.getnames()
    assert names and all("." in n for n in names)


# --- binary token shards (llm/tokenbin.py) -----------------------------------


def test_tokenbin_roundtrip_exact(spark, tmp_path):
    from fdf_spark.llm.tokenbin import (
        codepoint_tokenize,
        read_token_bin_shards,
        write_token_bin_shards,
    )

    docs = spark.read.parquet(f"{SMOKE_DIR}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    toks = codepoint_tokenize(docs).withColumn(
        "shard", (F.col("doc_id") % 4).cast("int")
    )
    p = str(tmp_path / "tb")
    manifest = write_token_bin_shards(toks, p).collect()
    assert sorted(r.shard for r in manifest) == [0, 1, 2, 3]
    assert sum(r.n_docs for r in manifest) == 60
    src = {r.doc_id: list(r.ids) for r in toks.collect()}
    back = {r.doc_id: list(r.ids) for r in read_token_bin_shards(spark, p).collect()}
    assert back == src  # every token id of every doc, exactly
    # deterministic bytes: rewriting produces identical files
    import hashlib, os

    h1 = {
        f: hashlib.sha256(open(os.path.join(p, f), "rb").read()).hexdigest()
        for f in os.listdir(p)
    }
    p2 = str(tmp_path / "tb2")
    write_token_bin_shards(toks, p2).collect()
    h2 = {
        f: hashlib.sha256(open(os.path.join(p2, f), "rb").read()).hexdigest()
        for f in os.listdir(p2)
    }
    assert h1 == h2


def test_tokenbin_rejects_corruption(spark, tmp_path):
    import os

    from fdf_spark.llm.tokenbin import (
        codepoint_tokenize,
        read_token_bin_shards,
        write_token_bin_shards,
    )

    docs = spark.read.parquet(f"{SMOKE_DIR}/documents.parquet").filter(
        F.col("doc_id") < 10
    )
    toks = codepoint_tokenize(docs).withColumn("shard", F.lit(0).cast("int"))
    p = str(tmp_path / "tbc")
    write_token_bin_shards(toks, p).collect()
    f = os.path.join(p, os.listdir(p)[0])
    blob = open(f, "rb").read()
    open(f, "wb").write(blob[:-4] + b"XXXX")  # clobber magic
    try:
        read_token_bin_shards(spark, p).collect()
        raise AssertionError("corrupt magic must be rejected")
    except Exception as e:
        assert "magic" in str(e)


# --- streaming shard landing (stream_webdataset_sink) ------------------------


def test_stream_webdataset_sink_and_committed_reader(spark, tmp_path):
    from fdf_spark.llm.webdataset import read_webdataset_committed, stream_webdataset_sink

    src_dir = str(tmp_path / "src")
    docs = (
        spark.read.parquet(f"{SMOKE_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 30)
        .select(
            F.format_string("%06d", F.col("doc_id")).alias("key"),
            F.lit("txt").alias("ext"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    )
    docs.repartition(2).write.parquet(src_dir)
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    q = stream_webdataset_sink(stream, land, checkpoint=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # ledger exists and the committed reader sees every sample exactly once
    assert os.path.isdir(os.path.join(land, "_batches"))
    back = read_webdataset_committed(spark, land)
    assert back.count() == 30
    src = {r.key: bytes(r.payload) for r in docs.collect()}
    got = {r.key: bytes(r.payload) for r in back.collect()}
    assert got == src


def test_stream_webdataset_replay_is_idempotent(spark, tmp_path):
    from fdf_spark.llm.webdataset import read_webdataset_committed, write_webdataset
    from fdf_spark.sources.atomic import publish_json_atomic

    # simulate the foreachBatch replay directly: same batch twice,
    # through the REAL ledger publish path (the shared atomic seam)
    land = str(tmp_path / "land2")
    members = _members_df(spark, n=10)
    results = []
    for _ in range(2):
        manifest = write_webdataset(members, land, prefix="shard-b000000").collect()
        lp = os.path.join(land, "_batches", "b000000.json")
        results.append(
            publish_json_atomic({"batch_id": 0, "shards": [r.shard for r in manifest]}, lp)
        )
    assert results == [True, False]  # second publish is the no-op replay
    back = read_webdataset_committed(spark, land)
    assert back.count() == 20  # 10 samples x 2 members, counted ONCE


def test_ledger_publish_through_swapped_seam(tmp_path, monkeypatch):
    """The ledger publish rests ONLY on sources/atomic.publish_atomic —
    the same seam the versioned-table manifest uses (and that
    test_versioned.py race-tests). Swap in a simulated object-store
    conditional PUT: the ledger's create-if-absent/replay behavior must
    be unchanged, content lands whole, and no staging file survives."""
    import shutil

    import fdf_spark.sources.atomic as A

    store_keys: set[str] = set()

    def conditional_put(staged: str, dst: str) -> None:
        if dst in store_keys or os.path.exists(dst):
            raise FileExistsError(dst)
        store_keys.add(dst)
        shutil.copyfile(staged, dst)

    monkeypatch.setattr(A, "publish_atomic", conditional_put)
    lp = os.path.join(str(tmp_path), "_batches", "b000007.json")
    entry = {"batch_id": 7, "shards": ["shard-b000007-00000.tar"]}
    assert A.publish_json_atomic(entry, lp) is True
    assert json.load(open(lp)) == entry  # content visible whole
    # replay: existing key -> no-op False, winner's content untouched
    assert A.publish_json_atomic({"batch_id": 7, "shards": []}, lp) is False
    assert json.load(open(lp)) == entry
    # staging files never survive either path
    assert [f for f in os.listdir(os.path.dirname(lp)) if f.endswith(".tmp")] == []
