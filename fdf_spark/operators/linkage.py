"""Record linkage / entity resolution via blocked fuzzy matching (N22).

The classic two-stage ER shape (Fellegi–Sunter blocking + pairwise
comparison): a cheap deterministic BLOCKING key partitions the corpus
so that plausible matches land in the same block, then an edit-distance
comparator scores only within-block pairs. The point at scale is the
block structure: candidate generation is an equi-join on the block key
— linear in corpus + output — never an all-pairs cross join. This is
the entity-level sibling of the text near-dup stack
(fdf_spark.llm.dedup): LSH blocks by signature bands; ER blocks by a
domain key (first tokens, normalized prefix, phonetic code, …).

Reference parity: none (no reference counterpart); part of the
training-data-pipeline surface the build brief adds (catalog/entity
cleanup before joins — duplicate suppliers, product variants, author
aliases).

Scale design (100 TB):

- Candidate pairs = self-equi-join on the block key: shuffles each
  side once on the key, no CartesianProduct (plan-pinned). Block-size
  skew is the operative risk — a too-coarse key makes one block
  quadratic; pick keys whose block sizes stay O(1)-ish in corpus size
  (multi-token prefixes, key + length bucket), and audit with
  :func:`block_profile` before running the comparator.
- ``a_id < b_id`` dedups the pair space inside the join condition
  (each unordered pair scored once, no post-hoc distinct).
- ``levenshtein`` is a JVM builtin (whole-stage codegen); no Python
  in the pair loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_words_block(name: Column, n: int = 1) -> Column:
    """Blocking key: first ``n`` lowercase words of a name."""
    parts = [F.split_part(F.lower(name), F.lit(" "), F.lit(i + 1)) for i in range(n)]
    return F.concat_ws(" ", *parts)


def block_profile(df: DataFrame, block: Column) -> DataFrame:
    """Per-block candidate-pair cost audit: ``n·(n−1)/2`` by block.

    Run this before the comparator at a new scale — the sum of
    ``n_pairs`` is the exact join output size, and the max row is the
    skew you would salt or re-key away.
    """
    return (
        df.groupBy(block.alias("block"))
        .agg(F.count("*").alias("n_rows"))
        .select(
            "block",
            "n_rows",
            (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("bigint").alias("n_pairs"),
        )
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int | None = None,
) -> DataFrame:
    """Within-block fuzzy candidate pairs scored by edit distance.

    Returns ``(a_id, b_id, a_name, b_name, dist int, sim double)``
    with ``sim = 1 − dist / max(len_a, len_b)`` rounded to 6 dp.
    ``max_dist`` (if given) filters pairs after scoring — the filter
    runs inside the join stage, so the full pair space is never
    materialized.
    """
    sides = df.select(
        F.col(id_col).alias("rid"), F.col(name_col).alias("rname"), block.alias("rblock")
    )
    a = sides.select(
        F.col("rid").alias("a_id"), F.col("rname").alias("a_name"), F.col("rblock").alias("block")
    )
    b = sides.select(
        F.col("rid").alias("b_id"), F.col("rname").alias("b_name"), F.col("rblock").alias("block")
    )
    pairs = a.join(b, ["block"], "inner").filter(F.col("a_id") < F.col("b_id"))
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"))
    scored = pairs.select(
        "a_id",
        "b_id",
        "a_name",
        "b_name",
        dist.cast("int").alias("dist"),
        F.round(
            1.0 - dist / F.greatest(F.length("a_name"), F.length("b_name")), 6
        ).alias("sim"),
    )
    if max_dist is not None:
        scored = scored.filter(F.col("dist") <= max_dist)
    return scored
