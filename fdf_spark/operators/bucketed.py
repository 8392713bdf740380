"""Bucketed (storage-partitioned) co-located fact-fact joins.

SURVEY §4's physical-layout contract promises "bucketed by channel for
high-channel diagnostics": the reference's hot access pattern is the
same (tree, shot) pair over and over (reference factory.py:149-167 —
one connection per (tree, shot), reused for every signal read), and
the relational translation of that pattern is the REPEATED join of two
fact tables on the same key.  On Spark the default plan pays a full
shuffle of both sides on every such join; at 100 TB that shuffle is
the single largest recurring cost a layout choice can delete.

The bucketed layout deletes it.  ``write_bucketed_pair`` writes both
fact tables hash-clustered into the same number of key-buckets (one
key-sorted file per bucket), registers them in the session catalog
(bucket metadata lives there; the files live under scratch dirs), and
every subsequent equi-join on the bucket key compiles as a
SortMergeJoin with ZERO Exchange on either side — the scan itself
satisfies the join's distribution requirement.  Pay the clustering
once at write time; every join afterwards is shuffle-free.
tests/test_bucketing.py pins the plan.

Scale notes:

- the one-file-per-bucket repartition before the write uses the SAME
  Murmur3 ``pmod(hash(key), n)`` routing as the bucket assignment, so
  each write task holds exactly one bucket's rows — without it each of
  the W write tasks emits a file into every bucket it touches (up to
  W×n small files per table);
- the SMJ keeps a per-side Sort node: since Spark 3.0 the scan no
  longer REPORTS bucket sortedness (a bucket may span several files,
  and the legacy opt-in conf is gone in Spark 4), so Catalyst must
  re-establish ordering.  That Sort is LOCAL — it runs inside the
  bucket partition over a single already-key-sorted file, no network,
  and is the cheap half of the join; the Exchange it replaces is the
  expensive half (both fact tables over the wire), and THAT is zero;
- at 100 TB n_buckets is sized so one bucket ≈ one executor-digestible
  split (e.g. 4096 buckets for a 4 TB fact table), and the write-side
  repartition is the LAST shuffle that key ever pays;
- the ``merge`` hint only forces join STRATEGY (SMJ vs broadcast); it
  cannot hide a shuffle — if the bucketing were wrong the Exchange
  would reappear in the plan, which is exactly what the plan pin
  watches.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fdf_spark.sources.sinks import write_table


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    key: str,
    n_buckets: int,
    table: str,
    path: str,
) -> DataFrame:
    """Write ``df`` bucketed on ``key`` and return the catalog-backed scan.

    One file per bucket: the pre-write repartition routes rows with the
    same Murmur3 ``pmod(hash(key), n)`` the bucket writer uses, so each
    task emits exactly one key-sorted bucket file (see module
    docstring).
    """
    clustered = df.repartition(n_buckets, F.col(key))
    write_table(
        clustered,
        path,
        partition_by=(),
        sort_by=(),
        bucket_by=(key, n_buckets),
        table=table,
    )
    return spark.table(table)


@contextmanager
def write_bucketed_pair(
    spark: SparkSession,
    left: tuple[DataFrame, str],
    right: tuple[DataFrame, str],
    n_buckets: int = 8,
):
    """Context manager: bucket-write two fact tables on their join keys.

    Yields ``(left_scan, right_scan)`` — catalog-backed DataFrames whose
    bucketed layout makes any equi-join on the keys shuffle-free.  On
    exit the catalog entries and scratch files are removed, so callers
    (driver queries) leak nothing into the session catalog.
    """
    tables: list[str] = []
    dirs: list[str] = []
    try:
        scans = []
        for side, (df, key) in zip(("l", "r"), (left, right)):
            name = f"bkt_{side}_{uuid.uuid4().hex[:12]}"
            scratch = tempfile.mkdtemp(prefix=f"fdf_bucketed_{side}_")
            tables.append(name)
            dirs.append(scratch)
            scans.append(write_bucketed(spark, df, key, n_buckets, name, scratch))
        yield tuple(scans)
    finally:
        for name in tables:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        for scratch in dirs:
            shutil.rmtree(scratch, ignore_errors=True)


def read_bucketed(
    spark: SparkSession,
    path: str,
    key: str,
    n_buckets: int,
    schema: str,
    table: str,
) -> DataFrame:
    """Re-attach an existing bucketed table in a FRESH session.

    The FILES of a bucketed write persist, but the bucketing METADATA
    lives in the session catalog — a new session reading the same path
    with ``spark.read.parquet`` gets a plain scan and pays the shuffle
    again.  This registers an external table over the existing files
    with the same ``CLUSTERED BY (key) SORTED BY (key) INTO n BUCKETS``
    spec, restoring the zero-Exchange join property without touching a
    byte.  ``schema`` is the column list DDL (``"k BIGINT, v DOUBLE"``)
    — bucketing DDL cannot infer it.  The spec must match what the
    files were written with: a WRONG n_buckets mis-routes the join
    (same failure mode as lying to any metastore), which is why
    production keeps the catalog durable (Hive metastore / Glue) and
    this helper exists for session-scoped catalogs and disaster
    recovery.
    """
    # identifiers are backtick-quoted and the path single-quote-escaped
    # before interpolation: this DDL is built from caller strings, and a
    # quote in a path (or a key needing quoting) must not break — or
    # silently rewrite — the statement (ADVICE r8)
    if "\n" in path or "\x00" in path:
        raise ValueError(f"path contains control characters: {path!r}")

    def _ident(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    # the schema column list is interpolated VERBATIM: it is DDL by
    # contract (column names may need their own backticks, and types
    # like DECIMAL(10,2) / MAP<k,v> contain commas no splitter should
    # touch) — the quoting fix here is for the identifier/path slots
    # plain CREATE (no IF NOT EXISTS): silently returning a pre-existing
    # table whose location/bucket spec differs from the arguments would
    # be exactly the mis-routing this helper warns about — fail loudly
    spark.sql(
        f"CREATE TABLE {_ident(table)} ({schema}) USING parquet "
        f"CLUSTERED BY ({_ident(key)}) SORTED BY ({_ident(key)}) "
        f"INTO {int(n_buckets)} BUCKETS "
        f"LOCATION '{_sql_str(path)}'"
    )
    return spark.table(table)


def _sql_str(s: str) -> str:
    """Escape a python string for a Spark SQL single-quoted literal
    (backslash escaping — Spark's default string-literal dialect)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def bucketed_fact_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two bucketed scans on their bucket keys.

    The ``merge`` hint pins the STRATEGY to SortMergeJoin (a broadcast
    at test scale would hide the layout's effect); the bucketed scans
    supply the distribution, so the physical plan carries zero
    Exchange — pinned in tests/test_bucketing.py.  The per-side Sort
    that remains is local (single key-sorted file per bucket, no
    network; see module docstring).
    """
    cond = left[left_key] == right[right_key]
    return left.hint("merge").join(right.hint("merge"), cond, how)
