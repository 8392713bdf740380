"""Per-file BLOOM-FILTER skipping for versioned tables (r12) — point
lookups on columns the layout does NOT cluster.

Manifest [min, max] stats prune range probes, and hidden bucket
transforms prune equality probes on the CLUSTERED key — but a point
lookup on any OTHER high-cardinality column (find a document by id in
a table clustered by date) reads every file whose range happens to
overlap, which for a hash-distributed value is ALL of them.  The
standard answer (Delta's bloom indexes, Iceberg's puffin sketches,
parquet's own bloom pages) is a per-file Bloom filter: ~10 bits/row
buys a ~1% false-positive file-skip test with zero false negatives —
the superset guarantee pruning requires.

Shape (Iceberg's compute-stats action, not a write-path tax):

- :func:`build_blooms` is a MAINTENANCE op: one Spark job over the
  live files that don't have a sidecar yet (incremental — re-run it
  after ingest batches; already-covered files are skipped by a pure
  metadata check).  Each data file gets an immutable
  ``<file>.bloom.json`` sidecar (base64 bitset per column); vacuum
  removes sidecars with their data files.
- Probe side: ``read_version(spark, path, prune=(col, values))``
  consults sidecars AFTER stats/transform pruning, dropping any file
  whose bloom rejects every probed value.  Files without a sidecar
  (not yet built, pre-upgrade) are KEPT — conservative, never a row
  lost.

Hashing is double-hashed splitmix64 (ints) / md5 (strings) — pure,
portable functions computed identically by the executor-side build
(vectorized numpy over Arrow batches) and the driver-side probe, and
pinned against each other by property tests.  Supported column types:
integers and strings (bloom equality on floats is not meaningful).

Reference parity: none (read-only client); this is engine-native
north-star surface for the "fetch one doc by id out of 100 TB" shape.
"""

from __future__ import annotations

import base64
import json
import math
import os

from pyspark.sql import SparkSession

BLOOM_SUFFIX = ".bloom.json"

_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Scalar splitmix64 — must match the executor-side numpy ``mix``
    in :func:`build_blooms` bit-for-bit (property-pinned in tests)."""
    z = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return (z ^ (z >> 31)) & _MASK


def _hash_pair_int(v: int) -> tuple[int, int]:
    """Two independent 64-bit hashes of an integer value."""
    h1 = _splitmix64(v & _MASK)
    h2 = _splitmix64((v ^ 0xA5A5A5A5A5A5A5A5) & _MASK) | 1  # odd → full cycle
    return h1, h2


def _hash_pair_str(v: str) -> tuple[int, int]:
    """Two independent 64-bit hashes of a string value (md5 halves)."""
    import hashlib

    d = hashlib.md5(v.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return h1, h2


def _hash_pair(v) -> tuple[int, int]:
    if isinstance(v, bool):
        raise TypeError("bloom columns must be int or string, not bool")
    if isinstance(v, int):
        return _hash_pair_int(v)
    if isinstance(v, str):
        return _hash_pair_str(v)
    raise TypeError(f"bloom probe supports int and str values, got {type(v).__name__}")


def _params(n_rows: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_rows`` at target false-positive rate."""
    n = max(1, n_rows)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)  # whole 64-bit words
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def might_contain(sidecar_col: dict, value) -> bool:
    """Probe one column's bloom in a decoded sidecar entry."""
    m, k = sidecar_col["m"], sidecar_col["k"]
    bits = sidecar_col["_bits"]  # decoded numpy array, cached by _load_sidecar
    h1, h2 = _hash_pair(value)
    for i in range(k):
        # 64-bit wrap BEFORE the modulo — the executor build runs this
        # arithmetic in uint64 numpy, where h1 + i*h2 wraps; Python's
        # big ints would not (the one place the two paths could diverge)
        pos = ((h1 + i * h2) & _MASK) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


#: decoded sidecar cache — sidecars are immutable, keyed by path
_SIDECAR_CACHE: dict = {}
_SIDECAR_CACHE_CAP = 1024


def _load_sidecar(data_file: str) -> dict | None:
    """Decoded sidecar for a data file, or None if absent/unreadable."""
    sp = data_file + BLOOM_SUFFIX
    hit = _SIDECAR_CACHE.get(sp)
    if hit is not None:
        return hit
    if not os.path.exists(sp):
        return None
    import numpy as np

    try:
        with open(sp) as fh:
            raw = json.load(fh)
        for col in raw.values():
            col["_bits"] = np.frombuffer(
                base64.b64decode(col.pop("bits")), dtype=np.uint8
            )
    except Exception:
        return None  # unreadable sidecar → no pruning from it, never a loss
    if len(_SIDECAR_CACHE) >= _SIDECAR_CACHE_CAP:
        _SIDECAR_CACHE.pop(next(iter(_SIDECAR_CACHE)))
    _SIDECAR_CACHE[sp] = raw
    return raw


def sidecar_meta(data_file: str) -> dict | None:
    """Sidecar PARAMETERS only ({col: {m, k, n, fpp}}) — JSON parse
    without the base64/numpy bitset decode and without touching the
    probe cache, for metadata consumers (table_blooms, coverage
    checks) that never probe (code-review r12: decoding bitsets to
    read six scalars, and caching soon-dead files, was waste)."""
    sp = data_file + BLOOM_SUFFIX
    if not os.path.exists(sp):
        return None
    try:
        with open(sp) as fh:
            raw = json.load(fh)
        return {
            c: {k: v for k, v in e.items() if k != "bits"} for c, e in raw.items()
        }
    except Exception:
        return None


def bloom_prune(files: list[str], phys_col: str, values) -> list[str]:
    """Drop files whose bloom REJECTS every probed value; files without
    a sidecar (or without this column's bloom) are kept — the superset
    guarantee.  ``phys_col`` is the PHYSICAL column name recorded at
    build time (a rename never detaches the sidecar)."""
    out = []
    for f in files:
        sc = _load_sidecar(f)
        col = sc.get(phys_col) if sc else None
        if col is None:
            out.append(f)
            continue
        try:
            if any(might_contain(col, v) for v in values):
                out.append(f)
        except TypeError:
            out.append(f)  # unsupported probe type → keep
    return out


def build_blooms(
    spark: SparkSession,
    path: str,
    cols,
    fpp: float = 0.01,
    version: int | None = None,
) -> dict:
    """Build missing ``<file>.bloom.json`` sidecars for a snapshot's
    live files — ONE Spark job over exactly the uncovered files (an
    already-covered file is skipped by a driver-side stat, so steady-
    state re-runs after each ingest batch cost O(new files)).  Returns
    ``{"built": n, "skipped": n, "cols": [...]}``.

    Executor side: the uncovered files are read with their row-group
    projection pruned to ``cols`` + ``_metadata.file_path``, grouped
    per file, and each group folds its values into the bitset with
    vectorized numpy splitmix64 (ints) / md5 (strings) — the SAME
    functions the driver-side probe applies, property-pinned.  One
    sidecar JSON per file rides back to the driver (~``10·rows/8``
    bytes each) and is written atomically next to its data file.
    """
    from pyspark.sql import functions as F

    from fdf_spark.sources.versioned import (
        _logical_schema,
        _mapping,
        _read_manifest,
        list_versions,
    )

    cols = list(cols)
    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no versions at {path}")
    v = versions[-1] if version is None else version
    m = _read_manifest(path, v)
    schema = _logical_schema(m)
    if schema is not None:
        ok = {"tinyint", "smallint", "int", "bigint", "string"}
        for c in cols:
            if c not in schema.fieldNames():
                raise ValueError(f"bloom column {c!r} not in table schema")
            t = schema[c].dataType.simpleString()
            if t not in ok:
                raise ValueError(
                    f"bloom column {c!r} has type {t}; supported: int/long/string"
                )
    mapping = _mapping(m)
    phys = [mapping.get(c, c) for c in cols]
    fr = m.get("file_rows", {})

    def _covered(f: str) -> bool:
        # a sidecar counts only if it carries EVERY requested column —
        # adding a bloom on a new column must rebuild existing files'
        # sidecars too (code-review r12 finding: mere existence let a
        # second build_blooms call silently index nothing); params-only
        # read — no bitset decode, no cache churn
        sc = sidecar_meta(f)
        return sc is not None and all(p in sc for p in phys)

    todo = [f for f in m["files"] if fr.get(f, 1) != 0 and not _covered(f)]
    if not todo:
        return {"built": 0, "skipped": len(m["files"]), "cols": cols}

    fpp_ = fpp
    phys_ = list(phys)

    def _fold(tbl):
        # ARROW group handler (one call per file): pyarrow preserves
        # int64-with-nulls exactly (validity mask), where a pandas
        # handler would promote the column to float64 and hash "7.0"
        # through the string path — a bloom false NEGATIVE, i.e. silent
        # row loss on probe (code-review r12 finding).
        import base64 as b64
        import hashlib
        import json as _json

        import numpy as np
        import pyarrow as pa

        fname = tbl.column("__file")[0].as_py()
        n = tbl.num_rows
        mbits, k = _params(n, fpp_)
        sidecar = {}
        for pc in phys_:
            col = tbl.column(pc).combine_chunks()
            vals = col.drop_null()
            bits = np.zeros(mbits // 8, dtype=np.uint8)
            if pa.types.is_integer(col.type):
                x = vals.to_numpy(zero_copy_only=False).astype(np.int64).astype(np.uint64)
                with np.errstate(over="ignore"):
                    def mix(z):
                        z = z + np.uint64(0x9E3779B97F4A7C15)
                        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
                        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
                        return z ^ (z >> np.uint64(31))

                    h1 = mix(x)
                    h2 = mix(x ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
                for i in range(k):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(mbits)
                    np.bitwise_or.at(
                        bits, (pos >> np.uint64(3)).astype(np.int64),
                        np.left_shift(
                            np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                        ),
                    )
            else:
                for sv in vals.to_pylist():
                    d = hashlib.md5(str(sv).encode("utf-8")).digest()
                    h1 = int.from_bytes(d[:8], "little")
                    h2 = int.from_bytes(d[8:], "little") | 1
                    for i in range(k):
                        # same 64-bit wrap as the probe (see
                        # might_contain) — both paths must agree
                        pos = ((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % mbits
                        bits[pos >> 3] |= 1 << (pos & 7)
            sidecar[pc] = {
                "m": mbits, "k": k, "n": int(n), "fpp": fpp_,
                "bits": b64.b64encode(bits.tobytes()).decode("ascii"),
            }
        return pa.table({"file": [fname], "sidecar": [_json.dumps(sidecar)]})

    from fdf_spark.sources.versioned import _norm_file_path

    df = (
        spark.read.parquet(*todo)
        .select(
            *[F.col(p) for p in phys_],
            _norm_file_path(F.col("_metadata.file_path")).alias("__file"),
        )
        .groupBy("__file")
        .applyInArrow(_fold, schema="file string, sidecar string")
    )
    built = 0
    for row in df.collect():
        sp = row["file"] + BLOOM_SUFFIX
        payload = row["sidecar"]
        if os.path.exists(sp):
            # merge: keep columns an earlier build indexed that this
            # call didn't request (sidecars are per-column immutable)
            try:
                with open(sp) as fh:
                    prev = json.load(fh)
            except Exception:
                prev = {}
            merged = {**prev, **json.loads(payload)}
            payload = json.dumps(merged)
        tmp = sp + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, sp)  # atomic: readers see whole sidecars or none
        _SIDECAR_CACHE.pop(sp, None)  # the decode cache must never go stale
        built += 1
    return {"built": built, "skipped": len(m["files"]) - len(todo), "cols": cols}
