"""CDC merge / upsert — ``MERGE INTO`` emulation on plain parquet.

Reference parity: none — fdf is a read-only access layer (the logbook
and MDSplus trees are mutated by the experiment, never by fdf; see
`/root/reference/fdf/factory.py` which exposes no write surface).  This
operator belongs to the declared north-star extension surface
(SURVEY §2.11): a 100 TB training corpus is maintained by periodic CDC
merges (late-arriving crawls, re-scored documents, takedown deletes),
not by full rewrites.

Semantics (Delta/Iceberg ``MERGE INTO`` subset):

- matched (key present in both)   → update ``update_cols`` from changes,
  keep every other column from base;
- not-matched-by-target (key only in changes) → insert the change row
  (base-only columns become NULL);
- matched + ``delete_flag`` true  → drop the row;
- not-matched-by-source (key only in base)    → keep unchanged.

Scale design — the two physical strategies:

``strategy="broadcast"`` (default; CDC batch ≪ base, the 100 TB case):
the base relation is NEVER shuffled.  Three broadcast joins do all the
work — base ⟕̸ keys (anti: untouched rows), base ⨝ changes (matched
rows, updated column-wise), changes ⟕̸ matched-keys (inserts) — and the
result is their union.  Base is scanned twice (anti + inner), which at
scale is far cheaper than one full-outer shuffle of 100 TB; with the
partition-level wrapper below the two scans are partition-pruned to the
touched partitions only.

``strategy="shuffle"`` (change set comparable to base): one full outer
join on the keys — both sides exchange once, no broadcast.  This is the
backfill/bulk-restate path.

``merge_into_partitioned`` is the copy-on-write wrapper: it prunes base
to the partitions the change set touches (collected from the tiny change
relation), merges only those, and rewrites them with dynamic partition
overwrite — untouched partitions are never read or written, so merge
cost is O(touched data), not O(table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BASE = "__merge_base__"
_CHG = "__merge_chg__"
_RN = "__merge_rn__"


def _reduce_changes_last_wins(
    changes: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Deterministically reduce ``changes`` to the LATEST row per key.

    CDC last-state semantics: the surviving row per key is the one with
    the greatest ``order_col`` (sequence number / event time), so a
    delete followed by a later re-insert resurrects the key and an
    update followed by a later delete drops it.  Ties on ``order_col``
    break on the remaining ORDERABLE change columns (descending, nulls
    last) so the reduction is a pure function of the row multiset — no
    first-row-wins nondeterminism.  Map-typed columns are excluded
    from the tiebreak (Spark cannot sort them); two change rows that
    are identical except for a map column therefore tie arbitrarily —
    callers needing full determinism there should make ``order_col``
    unique per key (the normal CDC sequence-number contract).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    if order_col not in changes.columns:
        raise ValueError(f"order_col {order_col!r} not in changes columns")
    unorderable = {f.name for f in changes.schema.fields if _has_map(f.dataType)}
    tiebreak = [
        F.col(c).desc_nulls_last()
        for c in changes.columns
        if c != order_col and c not in unorderable
    ]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc_nulls_last(), *tiebreak)
    return (
        changes.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def _check_unique_live_keys(
    changes: DataFrame, keys: Sequence[str], delete_flag: str | None
) -> None:
    """Raise if any key carries more than one live (non-delete) change row.

    With duplicate keys the broadcast strategy's inner join duplicates
    matched base rows and the shuffle strategy's full-outer join
    multiplies them — silent snapshot corruption.  Delta's MERGE raises
    the same way ("multiple source rows matched").  A delete row plus
    one update row for the same key stays legal (delete wins).  This is
    an eager check (one Spark action over the change relation — tiny by
    contract on the broadcast path); pass
    ``on_duplicate_keys="assume_unique"`` to skip it or
    ``"last_wins"`` with an ``order_col`` to reduce instead.
    """
    live = changes
    if delete_flag is not None:
        live = changes.filter(~F.coalesce(F.col(delete_flag), F.lit(False)))
    dup = (
        live.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        kv = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"merge_upsert: multiple live change rows for key {kv} — a merge "
            f"would duplicate matched base rows. Deduplicate the change set, "
            f"or pass on_duplicate_keys='last_wins' with order_col=<sequence "
            f"column> for CDC last-state reduction."
        )


def _resolve_update_cols(
    base: DataFrame, changes: DataFrame, keys: Sequence[str], update_cols: Sequence[str] | None
) -> list[str]:
    if update_cols is None:
        update_cols = [c for c in changes.columns if c in set(base.columns) and c not in set(keys)]
    missing = [c for c in update_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"update_cols not in changes: {missing}")
    return list(update_cols)


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
    delete_flag: str | None = None,
    strategy: str = "broadcast",
    on_duplicate_keys: str = "error",
    order_col: str | None = None,
) -> DataFrame:
    """Merge ``changes`` into ``base`` on ``keys``; returns the new snapshot.

    Output schema == base schema (column order preserved).  ``changes``
    may carry a subset of base's columns plus the key columns and the
    optional boolean ``delete_flag``.

    CONTRACT: at most one live (non-delete) change row per key.
    ``on_duplicate_keys`` picks the enforcement:

    - ``"error"`` (default): eager uniqueness check, raises
      ``ValueError`` on violation (Delta MERGE's multiple-matches
      error).  Costs one action over the change relation.
    - ``"last_wins"``: reduce changes to the row with the greatest
      ``order_col`` per key BEFORE merging (CDC last-state semantics —
      the natural choice for ``stream_merge_sink`` micro-batches that
      carry several changes for one key).  Requires ``order_col``.
    - ``"assume_unique"``: skip the check (caller guarantees it).
    """
    keys = list(keys)
    if on_duplicate_keys == "last_wins":
        if order_col is None:
            raise ValueError("on_duplicate_keys='last_wins' requires order_col")
        changes = _reduce_changes_last_wins(changes, keys, order_col)
    elif on_duplicate_keys == "error":
        _check_unique_live_keys(changes, keys, delete_flag)
    elif on_duplicate_keys != "assume_unique":
        raise ValueError(f"unknown on_duplicate_keys {on_duplicate_keys!r}")
    update_cols = _resolve_update_cols(base, changes, keys, update_cols)
    chg_payload = keys + [c for c in update_cols if c not in keys]
    live = changes
    if delete_flag is not None:
        deletes = changes.filter(F.col(delete_flag)).select(*keys)
        live = changes.filter(~F.coalesce(F.col(delete_flag), F.lit(False)))
    live = live.select(*chg_payload)

    if strategy == "broadcast":
        touched = changes.select(*keys)  # deletes prune matched rows too
        untouched = base.join(F.broadcast(touched), keys, "left_anti")
        b = base.alias("b")
        c = live.withColumn(_CHG, F.lit(1)).alias("c")
        cond = [F.col(f"b.{k}") == F.col(f"c.{k}") for k in keys]
        matched = b.join(F.broadcast(c), cond, "inner")
        updated = matched.select(
            *[
                (F.col(f"c.{col}") if col in update_cols else F.col(f"b.{col}")).alias(col)
                for col in base.columns
            ]
        )
        matched_keys = matched.select(*[F.col(f"b.{k}").alias(k) for k in keys]).distinct()
        inserts = live.join(F.broadcast(matched_keys), keys, "left_anti")
        if delete_flag is not None:
            # delete wins when a key carries both an update and a delete row
            updated = updated.join(F.broadcast(deletes), keys, "left_anti")
            inserts = inserts.join(F.broadcast(deletes), keys, "left_anti")
        inserts = inserts.select(
            *[
                (F.col(col) if col in chg_payload else F.lit(None).cast(base.schema[col].dataType)).alias(col)
                for col in base.columns
            ]
        )
        return untouched.unionByName(updated).unionByName(inserts)

    if strategy != "shuffle":
        raise ValueError(f"unknown strategy {strategy!r}")

    b = base.withColumn(_BASE, F.lit(1)).alias("b")
    c = live.withColumn(_CHG, F.lit(1)).alias("c")
    cond = [F.col(f"b.{k}") == F.col(f"c.{k}") for k in keys]
    j = b.join(c, cond, "full_outer")
    base_here = F.col(f"b.{_BASE}").isNotNull()
    chg_here = F.col(f"c.{_CHG}").isNotNull()

    def out(col: str):
        key_or_chg = F.coalesce(F.col(f"b.{col}"), F.col(f"c.{col}")) if col in keys else None
        if col in keys:
            return key_or_chg.alias(col)
        chg_val = F.col(f"c.{col}") if col in chg_payload else F.lit(None).cast(base.schema[col].dataType)
        return (
            F.when(~base_here, chg_val)  # insert
            .when(~chg_here, F.col(f"b.{col}"))  # untouched
            .otherwise(chg_val if col in update_cols else F.col(f"b.{col}"))
            .alias(col)
        )

    merged = j.select(*[out(col) for col in base.columns])
    if delete_flag is not None:
        merged = merged.join(deletes, keys, "left_anti")
    return merged


def merge_into_partitioned(
    spark: SparkSession,
    base_path: str,
    changes: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    update_cols: Sequence[str] | None = None,
    delete_flag: str | None = None,
    on_duplicate_keys: str = "error",
    order_col: str | None = None,
) -> list:
    """Copy-on-write merge into a parquet table partitioned by ``partition_col``.

    Collects the (tiny) set of partition values the change set touches,
    prunes the base scan to those partitions, merges, and rewrites ONLY
    those partitions via dynamic partition overwrite.  Returns the
    touched partition values.  Cost is O(touched partitions), never
    O(table) — the 100 TB contract.

    CONTRACT: the partition column is part of the record identity — a
    change row must carry its base row's partition value. A
    "partition-moving" update (same key, different partition) must be
    expressed as an explicit delete (old partition) + insert (new
    partition) pair; a bare update would land the key in the new
    partition while the pruned merge never sees — and so never
    retracts — the stale row in the old one. (Detecting that case
    would require probing the base OUTSIDE the touched partitions,
    which is exactly the O(table) scan this operator exists to avoid;
    partitioned MERGE in Hive/Delta carries the same restriction.)
    """
    touched = [r[0] for r in changes.select(partition_col).distinct().collect()]
    base = spark.read.parquet(base_path)
    pruned = base.filter(F.col(partition_col).isin(touched))
    merged = merge_upsert(
        pruned, changes, keys, update_cols, delete_flag,
        on_duplicate_keys=on_duplicate_keys, order_col=order_col,
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(base_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return touched
