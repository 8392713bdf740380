"""Count–Min frequency sketch + heavy-hitter estimation (N20).

A Count–Min sketch (Cormode & Muthukrishnan 2005) summarizes token
frequencies in ``depth × width`` counters: each of ``depth``
independent hash rows maps a token to one of ``width`` buckets;
``estimate(t) = min over rows of cell(row, hash_row(t))`` is an upper
bound on the true count (collisions only ever ADD). At corpus scale
this is how you detect hot tokens / boilerplate n-grams / hot join
keys WITHOUT materializing the full token distribution: the sketch is
fixed-size (``depth·width`` cells) no matter how many distinct tokens
the corpus has, and it is mergeable (cell-wise +) across partitions,
files, days, or whole corpora.

Reference parity: none (no reference counterpart); part of the
training-data-pipeline surface the build brief adds (N5 covers
*distinct-count* sketches; this is the *frequency* sketch family).

Scale design (100 TB):

- Building the sketch is ONE pass: tokens explode map-side, each
  occurrence emits ``depth`` (row, bucket) cells via an in-row array
  literal (no per-row Python, no extra scan per hash row), and the
  groupBy combines map-side — the only shuffle carries at most
  ``depth·width`` cells per map partition, regardless of corpus size.
- Estimation joins the probe set against the sketch on (row, bucket):
  the sketch is at most ``depth·width`` rows, so the join is always a
  broadcast; the probe relation is never shuffled.
- Hashes are the portable 60-bit md5 family (fdf_spark.llm.hashing)
  seeded per row, so the sketch is bit-reproducible in any engine —
  the DuckDB oracle replays it exactly.

The classic guarantee: with ``width = ⌈e/ε⌉`` and ``depth = ⌈ln 1/δ⌉``,
``est ≤ true + ε·N`` with probability ``1−δ`` (N = total token count).
``tests/test_properties.py`` asserts the hard direction (est ≥ true)
for every probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fdf_spark.llm.hashing import portable_hash60

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1024


def cm_bucket(token: Column, row: int, width: int) -> Column:
    """Bucket of ``token`` under hash row ``row`` (portable)."""
    return F.pmod(portable_hash60(token, seed=row), F.lit(width))


def countmin_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build a Count–Min sketch over a token relation.

    Returns ``(row int, bucket bigint, cnt bigint)`` — at most
    ``depth·width`` rows. One scan, one map-side-combining groupBy;
    the ×depth cell fan-out happens inside the row (array + explode),
    never as repeated scans.
    """
    t = F.col(token_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    cm_bucket(t, r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("cell")
    return (
        tokens.select(cells)
        .select(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count–Min sketches built with the same (depth, width).

    Cell-wise addition — the property that makes the sketch a
    distributed-systems primitive: per-partition / per-day / per-corpus
    sketches built independently combine into the sketch of the union
    stream exactly. Output stays ≤ depth·width rows.
    """
    if not sketches:
        raise ValueError("cm_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-estimate counts for every probe token.

    Each probe expands to its ``depth`` (row, bucket) addresses in-row,
    joins the (broadcast, ≤ depth·width-row) sketch, and takes the min
    across rows — the Count–Min upper-bound estimate. A probe address
    with no sketch cell means count 0 (only possible for tokens absent
    from the sketched corpus); the min-fold treats it as 0.
    """
    t = F.col(token_col)
    addr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    cm_bucket(t, r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("a")
    addressed = probes.select(t.alias(token_col), addr).select(
        token_col, F.col("a.row").alias("row"), F.col("a.bucket").alias("bucket")
    )
    joined = addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
