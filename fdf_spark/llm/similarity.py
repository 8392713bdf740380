"""Similarity search over embedding columns (N3).

- **cosine_topk** — exact brute force: broadcast the (small) query
  set against the corpus, JVM-side fold for the dot product, rank
  window per query. The oracle-checkable baseline; at 100 TB it is
  one corpus scan per query batch — viable for offline joins, and the
  reference point every ANN variant is measured against.
- **lsh_ann_topk** — random-hyperplane LSH: signature per vector
  (sign of dot with R random planes), candidates = same bucket (or
  Hamming-adjacent probes), exact re-rank inside buckets. Corpus scan
  → bucketed join; never all-pairs. Recall is tested against the
  brute-force baseline in pytest (approximate ⇒ no driver oracle).
- **knn_predict** — majority label of the top-k (deterministic
  tie-break: higher count, then smaller label).

All float math: cast elements to double BEFORE multiplying, fold
sequentially — matches DuckDB's list arithmetic so cosines agree to
the last ulp (then rounded to 6 dp for rank stability).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column, decimals: int | None = 6) -> Column:
    c = _dot(a, b) / (_norm(a) * _norm(b))
    return F.round(c, decimals) if decimals is not None else c


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, vec_id, cos_sim, rank)."""
    joined = corpus.join(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(query_id) != F.col(corpus_id))
    scored = joined.withColumn("cos_sim", cosine(F.col(query_vec), F.col(corpus_vec)))
    w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def knn_predict(
    topk: DataFrame,
    labels: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    label: str = "label",
) -> DataFrame:
    """Majority label among each query's neighbors → (query_id, pred_label)."""
    counts = (
        topk.join(labels.select(corpus_id, label), corpus_id)
        .groupBy(query_id, label)
        .agg(F.count("*").alias("votes"))
    )
    w = W.partitionBy(query_id).orderBy(F.col("votes").desc(), F.col(label))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(query_id, F.col(label).alias("pred_label"))
    )


def ivf_assign(
    corpus: DataFrame,
    num_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: (centroids, corpus-with-cell).

    Centroids are the ``num_cells`` smallest-id corpus vectors —
    deterministic, so the whole index replays in a SQL oracle (a
    k-means refinement would drop in here at scale without changing
    the query shape). Assignment is one broadcast join: the corpus is
    scanned once, never shuffled; each vector lands in exactly one
    cell (nearest centroid by cosine, ties to the smaller centroid id).
    """
    cents = (
        corpus.orderBy(corpus_id)
        .limit(num_cells)
        .select(F.col(corpus_id).alias("cent_id"), F.col(corpus_vec).alias("cent_vec"))
    )
    w = W.partitionBy(corpus_id).orderBy(F.col("cent_sim").desc(), F.col("cent_id"))
    assigned = (
        corpus.join(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col(corpus_vec), F.col("cent_vec")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(corpus_id, corpus_vec, F.col("cent_id").alias("cell"))
    )
    return cents, assigned


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) coarse quantizer.

    Each query probes its ``nprobe`` nearest cells and re-ranks
    exactly inside them, touching ~``nprobe/num_cells`` of the corpus
    instead of all of it. At 100 TB the assigned corpus is written
    partitioned by ``cell`` so a probe is a partition-pruned scan.
    Deterministic centroids ⇒ unlike LSH, this variant has a full
    DuckDB oracle (q73).
    """
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec)
    wq = W.partitionBy(query_id).orderBy(F.col("cent_sim").desc(), F.col("cent_id"))
    probes = (
        queries.join(F.broadcast(cents))
        .withColumn("cent_sim", cosine(F.col(query_vec), F.col("cent_vec")))
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(query_id, query_vec, F.col("cent_id").alias("cell"))
    )
    cand = assigned.join(F.broadcast(probes), "cell")
    if exclude_self:
        cand = cand.filter(F.col(query_id) != F.col(corpus_id))
    w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        cand.withColumn("cos_sim", cosine(F.col(query_vec), F.col(corpus_vec)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    ``num_tables`` independent tables of ``num_planes`` sign bits each
    (planes generated driver-side from ``seed``, shipped as literals —
    tiny). Candidates share a full bucket in ANY table, or any 1-bit
    multiprobe flip of the query's bucket; exact cosine re-rank on the
    candidate set only. Recall/cost dial: more tables → higher recall,
    more candidates; fewer planes → bigger buckets.
    """
    rng = random.Random(seed)
    tables = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]

    def signature(vec: Column, planes: list[list[float]]) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(w) for w in p]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit(1),
            ).otherwise(F.lit(0)).cast("long")
            for p in planes
        ]
        sig = F.lit(0).cast("long")
        for i, b in enumerate(bits):
            sig = sig + F.shiftleft(b, i)
        return sig

    # corpus rows fan out to one (table, bucket) per table; query rows
    # to (table, bucket) plus all 1-bit probes — join on both.
    c_buckets = F.array(
        *[F.struct(F.lit(t).alias("tbl"), signature(F.col(corpus_vec), p).alias("b"))
          for t, p in enumerate(tables)]
    )
    c = corpus.withColumn("__tb", F.explode(c_buckets))
    q_probes = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), probe.alias("b"))
            for t, p in enumerate(tables)
            for probe in [signature(F.col(query_vec), p)]
            + [signature(F.col(query_vec), p).bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)]
        ]
    )
    q = queries.withColumn("__tb", F.explode(q_probes))
    cand = c.join(F.broadcast(q), c["__tb"] == q["__tb"]).filter(
        F.col(query_id) != F.col(corpus_id)
    )
    scored = cand.withColumn("cos_sim", cosine(F.col(query_vec), F.col(corpus_vec))).dropDuplicates(
        [query_id, corpus_id]
    )
    w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )
