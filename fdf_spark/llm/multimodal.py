"""Multimodal column plumbing (SURVEY §2.11 / project brief).

Images/audio/video are opaque ``binary`` columns plus typed metadata
(a struct column), processed by Arrow-batched ``mapInPandas`` UDFs —
the real Spark-side machinery (schemas, partitioning, batch iteration)
with the codec itself stubbed: the image/audio libraries are not in
this container, so ``decode_image`` raises ``NotImplementedError``
unless the deterministic fake codec is requested (tests use the fake).

At scale: binary payloads dominate row size → keep them in their own
table keyed by content hash, partition by size class so Arrow batches
stay bounded (``spark.sql.execution.arrow.maxRecordsPerBatch``), and
push metadata-only predicates BEFORE any decode stage.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset table
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "asset_id long, media_type string, n_bytes long, header_u32 long, feat array<double>"


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real codec: 8 'features' from the
    payload bytes (length + first/last words). Lets the full pipeline
    run and be asserted on without image/audio libs."""
    n = len(payload)
    head = struct.unpack("<I", payload[:4].ljust(4, b"\0"))[0] if n else 0
    tail = struct.unpack("<I", payload[-4:].rjust(4, b"\0"))[0] if n else 0
    return [float(n), float(head % 997), float(tail % 991), float(head ^ tail)] + [
        float(payload[i] if i < n else 0) for i in (0, 1, 2, 3)
    ]


def extract_features(assets: DataFrame, codec: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``codec='stub'`` raises (real decoders not in this container);
    ``codec='fake'`` runs the deterministic fake — identical plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "stub":
                raise NotImplementedError(
                    "real image/audio decoding requires PIL/torchaudio; "
                    "use codec='fake' for the deterministic test codec"
                )
            feats = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "header_u32": feats.map(lambda f: int(f[1])),
                    "feat": feats,
                }
            )

    # metadata-only pruning happens BEFORE this operator; here we only
    # carry the columns the codec needs (column pruning keeps payload
    # out of any upstream exchange)
    return assets.select("asset_id", "media_type", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling *plan*: explode frame indices 0..n_frames
    step ``every_n`` from metadata — no decode; the decode of selected
    frames is a second, pruned ``extract_features`` pass."""
    idx = F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
    return (
        assets.filter(F.col("media_type") == "video")
        .select("asset_id", F.explode(idx).alias("frame_idx"))
    )


RESIZE_SCHEMA = (
    "asset_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def resize_images(assets: DataFrame, width: int, height: int, codec: str = "stub") -> DataFrame:
    """Arrow-batched image resize: same asset schema out, payload
    re-encoded at (width, height) and metadata rewritten.

    ``codec='stub'`` raises (PIL not in this container); ``codec='fake'``
    deterministically re-synthesizes a payload of ``width*height`` bytes
    by tiling the source bytes — byte-for-byte reproducible, so tests
    assert the full pipeline (schema, metadata rewrite, batch shapes)
    without an image library. Non-image rows pass through untouched.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "stub":
                raise NotImplementedError(
                    "real image resize requires PIL; use codec='fake' "
                    "for the deterministic test codec"
                )

            def one(row):
                if row["media_type"] != "image":
                    return row["payload"], row["meta"]
                src = bytes(row["payload"]) or b"\0"
                n = width * height
                out = (src * (n // len(src) + 1))[:n]
                meta = dict(row["meta"] or {})
                meta["width"], meta["height"] = width, height
                return out, meta

            resized = pdf.apply(one, axis=1, result_type="expand")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized[0],
                    "meta": resized[1],
                }
            )

    return assets.select("asset_id", "media_type", "payload", "meta").mapInPandas(
        run, RESIZE_SCHEMA
    )
