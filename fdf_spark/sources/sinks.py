"""Table sinks: the engine's physical-layout writer (SURVEY §4).

The reference never writes data (it is read-only over MDSplus/SQL
Server), but an engine that replaces it must persist derived tables.
This writer encodes the layout contract the scan side assumes:

- **partition by ``shot``** (or any coarse key): partition pruning
  turns per-shot access (the reference's (tree, shot) connection
  pattern, factory.py:149-167) into directory pruning before file
  listing;
- **sort by ``time`` within files**: parquet min/max page stats then
  give time-range pruning — the moral equivalent of server-side
  ``dim_of`` windows;
- parquet + snappy defaults; at 100 TB the same call with
  ``bucket_by`` co-locates join keys so repeated channel joins skip
  the shuffle (requires ``saveAsTable`` with a metastore).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("shot",),
    sort_by: Sequence[str] = ("time",),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a long-format signal/fact table with the engine layout."""
    out = df
    if sort_by:
        cols = [c for c in sort_by if c in df.columns]
        if cols:
            out = out.sortWithinPartitions(*[c for c in partition_by if c in df.columns], *cols)
    writer = out.write.mode(mode).format(fmt)
    part_cols = [c for c in partition_by if c in df.columns]
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.save(path)


def write_stream_sink(df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet"):
    """S8-adjacent: append a streaming DataFrame to a partitioned table
    (the durable twin of the memory/foreachBatch sinks in
    fdf_spark.streaming.events)."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
