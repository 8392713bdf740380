"""Partition TRANSFORMS for versioned tables — Iceberg's hidden
partitioning, realized on the manifest model.

A partition-spec column may be a bare column name (identity — range
clustering, the pre-r11 behavior, unchanged) or a TRANSFORM of one:

- ``bucket(N, col)``  — ``pmod(hash(col), N)``; the layout for POINT
  lookups and keyed deletes on a high-cardinality key.  Range stats on
  a key nothing is sorted by prune nothing; a bucket routes every
  occurrence of one key value into 1/N of the files regardless of
  value distribution, and an equality probe prunes to exactly those.
- ``truncate(W, col)`` — ``floor(col / W) * W`` (ints) / ``substr(col,
  1, W)`` (strings); coarse range grouping that composes with a
  second spec column.
- ``days(col)`` / ``hours(col)`` — calendar grouping of a timestamp.

How it stays hidden (the Iceberg property — users query the RAW
column, never the transform): at commit time the writer derives the
transform value as an extra PHYSICAL column (``__part__…``), clusters
the new files on it, and writes it into the parquet bytes — so the
manifest's footer-stat collection picks up tight per-file [min, max]
for the transform with zero extra jobs.  The logical schema never
contains the derived column (readers select logical fields
explicitly), so no query ever sees it; it costs ~nothing on disk
(constant-per-file → RLE).  Pruning then works in three places:

- ``read_version(prune=("col", values))`` maps each probe value
  through the transform DRIVER-SIDE (``functions/spark_hash.py`` — the
  property-tested Murmur3 port) and drops files whose transform stats
  can't hold any mapped value;
- ``delete_where(col = lit)`` derives a transform bound from the
  predicate's equality bounds (``_prune_files_by_bounds``);
- ``merge_on_read`` maps the CDC batch's distinct keys through the
  transform (one tiny agg over the already-cached batch) and prunes
  the match scan by membership.

Monotonic transforms (truncate/days/hours) additionally prune from
RANGE bounds — ``T(lo) <= T(x) <= T(hi)`` for monotone T — which
``bucket`` deliberately never does (hash order is meaningless).

Reference parity: none (the reference has no storage layer); this is
part of the engine's declared versioned-table surface (SURVEY §2 N17).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_BUCKET_RE = re.compile(r"^bucket\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_TRUNC_RE = re.compile(r"^truncate\(\s*(\d+)\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")
_UNARY_RE = re.compile(r"^(days|hours)\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")

_INT_TYPES = ("int", "integer", "short", "smallint", "byte", "tinyint", "long", "bigint")


@dataclass(frozen=True)
class Transform:
    """One parsed spec column: ``kind`` in {identity, bucket, truncate,
    days, hours}; ``param`` is N/W (None for unary kinds); ``source``
    is the LOGICAL column the transform reads."""

    kind: str
    source: str
    param: int | None = None

    @property
    def is_identity(self) -> bool:
        return self.kind == "identity"

    @property
    def monotonic(self) -> bool:
        """Order-preserving in the source (range bounds map through)."""
        return self.kind in ("identity", "truncate", "days", "hours")

    def spec_str(self) -> str:
        if self.kind == "identity":
            return self.source
        if self.param is not None:
            return f"{self.kind}({self.param}, {self.source})"
        return f"{self.kind}({self.source})"

    def derived_name(self, phys_src: str) -> str:
        """The hidden physical column carrying the transform value.
        Keyed by the PHYSICAL source name so a logical rename never
        detaches old files' stats."""
        if self.kind == "identity":
            return phys_src
        if self.param is not None:
            return f"__part__{self.kind}_{self.param}__{phys_src}"
        return f"__part__{self.kind}__{phys_src}"

    def column(self, col, src_type: str):
        """The Spark Column computing the transform of ``col`` (a
        Column over the physical source), given the source's Spark SQL
        type name."""
        from pyspark.sql import functions as F

        t = src_type.lower()
        if self.kind == "identity":
            return col
        if self.kind == "bucket":
            # hash under the TABLE's declared type, never the caller's
            # runtime type: Spark hashes int and long values differently
            # (hash_int(5) != hash_long(5)), so a probe batch carrying
            # the key as int against a long table column would compute
            # wrong buckets and silently prune the files that hold the
            # keys (code-review finding).  src_type is the table type;
            # the cast is a no-op on the write path.
            return F.pmod(F.hash(col.cast(src_type)), F.lit(self.param))
        if self.kind == "truncate":
            if t in _INT_TYPES:
                w = self.param
                # floor-to-multiple, correct for negatives (pmod, not %)
                return (col - F.pmod(col, F.lit(w))).cast("long")
            if t in ("string", "varchar"):
                return F.substring(col, 1, self.param)
            raise TypeError(f"truncate() needs an int or string column, got {src_type}")
        if self.kind == "days":
            return F.to_date(col)
        if self.kind == "hours":
            return F.date_trunc("hour", col)
        raise ValueError(f"unknown transform {self.kind!r}")

    def apply_py(self, value, src_type: str):
        """Driver-side transform of one LITERAL value — what prunes a
        probe through the transform without a Spark job.  Raises
        TypeError when the (value, type) pair isn't portable; callers
        skip the prune (superset guarantee), never guess."""
        if value is None:
            raise TypeError("cannot map NULL through a partition transform")
        t = src_type.lower()
        if self.kind == "identity":
            return value
        if self.kind == "bucket":
            from fdf_spark.functions.spark_hash import spark_hash

            return spark_hash(value, t) % self.param
        if self.kind == "truncate":
            if t in _INT_TYPES:
                v = int(value)
                return v - (v % self.param)  # Python % is already pmod
            if t in ("string", "varchar"):
                return str(value)[: self.param]
            raise TypeError(f"truncate() not portable for type {src_type}")
        if self.kind in ("days", "hours"):
            # F.to_date / F.date_trunc evaluate in the SESSION timezone,
            # so the driver-side image must too (r14): an aware probe
            # instant converts to the session wall clock exactly; a
            # naive one resolves only when the session and OS zones
            # agree (bloomskip._resolve_naive_ts) — else TypeError and
            # the caller skips this check (superset guarantee)
            import datetime as _dt

            if t == "date" and self.kind == "days":
                if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
                    return value  # to_date on a date is identity
                raise TypeError("days() on a date column needs a date probe")
            if t != "timestamp" or not isinstance(value, _dt.datetime):
                raise TypeError(f"{self.kind}() not portable for type {src_type}")
            from fdf_spark.sources.bloomskip import _resolve_naive_ts, _session_tzinfo

            if value.tzinfo is None:
                value = _resolve_naive_ts(value)
                if value is None:
                    raise TypeError("ambiguous naive timestamp probe")
            stz = _session_tzinfo()
            if stz is None:
                raise TypeError("session timezone unknowable")
            local = value.astimezone(stz)
            if self.kind == "days":
                return local.date()
            return local.replace(minute=0, second=0, microsecond=0)
        raise TypeError(f"{self.kind}() has no driver-side form here")


def parse_spec_col(s: str) -> Transform:
    """Parse one partition-spec entry; a bare name is identity."""
    s = s.strip()
    m = _BUCKET_RE.match(s)
    if m:
        n = int(m.group(1))
        if n < 2:
            raise ValueError(f"bucket() needs at least 2 buckets: {s!r}")
        return Transform("bucket", m.group(2), n)
    m = _TRUNC_RE.match(s)
    if m:
        w = int(m.group(1))
        if w < 1:
            raise ValueError(f"truncate() needs a positive width: {s!r}")
        return Transform("truncate", m.group(2), w)
    m = _UNARY_RE.match(s)
    if m:
        return Transform(m.group(1), m.group(2))
    if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", s):
        return Transform("identity", s)
    raise ValueError(
        f"unparseable partition-spec column {s!r} — expected a column "
        "name, bucket(N, col), truncate(W, col), days(col) or hours(col)"
    )


def spec_transforms(spec: dict) -> list[Transform]:
    return [parse_spec_col(c) for c in spec.get("cols", [])]


def all_transforms_on(m: dict, source: str) -> list[Transform]:
    """Every non-identity transform of ``source`` any spec in the
    manifest has ever declared — the set a prune on ``source`` should
    try.  Presence of derived stats per file is the real guard (a file
    written under another spec simply lacks them), so consulting all
    specs is safe and spec-bookkeeping-free."""
    out: dict[str, Transform] = {}
    for spec in m.get("partition_specs", {"0": {"cols": []}}).values():
        for t in spec_transforms(spec):
            if not t.is_identity and t.source == source:
                out[t.spec_str()] = t
    return list(out.values())
