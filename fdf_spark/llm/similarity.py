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


def _cell_scores(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """array<struct<neg_sim, cent_id>> of (−cosine, id) per centroid.

    Negated similarity so that plain ascending struct ordering
    (array_min / array_sort) means "most similar first, ties to the
    smaller centroid id" — the same order the oracle's
    ``ROW_NUMBER() ... ORDER BY cos DESC, cent_id`` produces.
    """
    return F.array(
        *[
            F.struct(
                (-cosine(vec, F.array(*[F.lit(float(x)) for x in cvec]))).alias("neg_sim"),
                F.lit(int(cid)).cast("long").alias("cent_id"),
            )
            for cid, cvec in cents
        ]
    )


def ivf_assign(
    corpus: DataFrame,
    num_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """IVF index build: (centroids, corpus-with-cell).

    Centroids are the ``num_cells`` smallest-id corpus vectors —
    deterministic, so the whole index replays in a SQL oracle (a
    k-means refinement would drop in here at scale without changing
    the query shape). They are collected to the driver (tiny: cells ×
    dim floats) and shipped as literals, making assignment a pure
    per-row expression — the corpus is scanned once and NEVER
    shuffled (the join+window formulation would hash-exchange the
    whole corpus on row id just to run a per-row argmin).
    """
    cents = [
        (r[corpus_id], list(r[corpus_vec]))
        for r in corpus.orderBy(corpus_id).limit(num_cells).select(corpus_id, corpus_vec).collect()
    ]
    assigned = corpus.select(
        corpus_id,
        corpus_vec,
        F.array_min(_cell_scores(F.col(corpus_vec), cents))["cent_id"].alias("cell"),
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
    partitioned by ``cell`` so a probe is a partition-pruned scan; in
    one plan (here) the probe set broadcasts onto an unshuffled corpus
    scan. Deterministic centroids ⇒ unlike LSH, this variant has a
    full DuckDB oracle (q73).
    """
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec)
    probes = queries.select(
        query_id,
        query_vec,
        F.explode(
            F.slice(F.array_sort(_cell_scores(F.col(query_vec), cents)), 1, nprobe)
        ).alias("__pr"),
    ).select(query_id, query_vec, F.col("__pr")["cent_id"].alias("cell"))
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


def semantic_dedup(
    corpus: DataFrame,
    num_cells: int = 16,
    threshold: float = 0.3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Embedding-level near-duplicate removal (N14) — SemDeDup,
    Abbas et al. 2023 (arXiv:2303.09540): cluster the corpus coarsely,
    call two documents semantic duplicates when their embeddings'
    cosine within a cluster reaches ``threshold``, keep one per
    duplicate group (smallest id — the same survivor rule as the
    text-level ``near_dedup``). Returns surviving (corpus_id, cell).

    Scale shape: cell assignment reuses :func:`ivf_assign` (centroid
    literals, corpus scanned once, NO shuffle); the pairwise stage is
    an equi-join on ``cell`` — cluster-bounded Σ|cell|² work, never an
    all-pairs corpus join, exactly the trick that makes SemDeDup
    tractable where a global pairwise pass is not. At 100 TB,
    ``num_cells`` scales with the corpus so a cell stays ~constant
    (the paper uses k ≈ √N clusters); a skewed giant cell is split by
    recursing the same operator over that cell.
    """
    _, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec)
    a = assigned.select(
        F.col("cell"),
        F.col(corpus_id).alias("__ida"),
        F.col(corpus_vec).alias("__va"),
    )
    b = assigned.select(
        F.col("cell"),
        F.col(corpus_id).alias("__idb"),
        F.col(corpus_vec).alias("__vb"),
    )
    removed = (
        a.join(b, "cell")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(cosine(F.col("__va"), F.col("__vb")) >= threshold)
        .select(F.col("__idb").alias(corpus_id))
        .distinct()
    )
    return assigned.join(removed, corpus_id, "left_anti").select(corpus_id, "cell")


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    num_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Materialize the IVF index as a **cell-partitioned** parquet layout.

    ``<path>/corpus/cell=N/`` holds each inverted list as its own
    hive partition; ``<path>/centroids/`` is the tiny (cells × dim)
    sidecar the prober needs to route queries. This is the 100 TB
    layout SCALE.md describes: an ``nprobe`` query touches only the
    probed cells' files — a partition-pruned scan, not a corpus scan.
    """
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec)
    assigned.write.partitionBy("cell").mode("overwrite").parquet(f"{path}/corpus")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in cents],
        "cent_id long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe_pruned(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe a :func:`write_ivf_index` layout with static partition pruning.

    The probe-cell set is computed driver-side (tiny: ≤ |queries| ×
    ``nprobe`` ints — the one collect that converts the probe into a
    compile-time ``cell IN (...)`` predicate) and pushed into the scan
    as a partition filter, so Spark lists and reads ONLY the probed
    ``cell=N`` directories. Same result as :func:`ivf_ann_topk`;
    different physical shape — this is the scale path, and
    ``tests/test_sinks.py::test_ivf_index_partition_pruned_probe``
    pins both the equivalence and the pruned plan.
    """
    cents = [
        (int(r["cent_id"]), list(r["centroid"]))
        for r in sorted(
            spark.read.parquet(f"{index_path}/centroids").collect(),
            key=lambda r: r["cent_id"],
        )
    ]
    probes = queries.select(
        query_id,
        query_vec,
        F.explode(
            F.slice(F.array_sort(_cell_scores(F.col(query_vec), cents)), 1, nprobe)
        ).alias("__pr"),
    ).select(query_id, query_vec, F.col("__pr")["cent_id"].alias("cell"))
    cells = sorted({r["cell"] for r in probes.select("cell").distinct().collect()})
    corpus = spark.read.parquet(f"{index_path}/corpus").filter(F.col("cell").isin(cells))
    cand = corpus.join(F.broadcast(probes), "cell")
    if exclude_self:
        cand = cand.filter(F.col(query_id) != F.col(corpus_id))
    w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        cand.withColumn("cos_sim", cosine(F.col(query_vec), F.col(corpus_vec)))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def embedding_quantize(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Per-dimension linear int8 quantization of an embedding column →
    (corpus_id, codes array<int>, mse double rounded to 10 dp).

    The standard storage/IO reduction for vector corpora (4 bytes →
    1 byte per dim): per-dim [min, max] over the corpus defines the
    scale, ``code = round((x − min)/(max − min)·255) − 128``, and the
    reconstruction MSE quantifies the loss.

    Scale shape: dims explode to (pos, x) and reduce to a 64-row
    min/max relation (map-side combine) that broadcast-joins back —
    the corpus shuffles only by (id) for the final re-pack; at 100 TB
    the stats pass is a cheap extra scan and the pack is map-local.
    """
    pos = corpus.select(
        F.col(corpus_id), F.posexplode(F.col(corpus_vec)).alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    stats = pos.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    q = pos.join(F.broadcast(stats), "pos").select(
        corpus_id,
        "pos",
        "x",
        (F.round((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255) - 128)
        .cast("int")
        .alias("code"),
        F.col("mn"),
        F.col("mx"),
    )
    deq = (F.col("code") + 128) / 255.0 * (F.col("mx") - F.col("mn")) + F.col("mn")
    per_el = q.withColumn("sqerr", (F.col("x") - deq) * (F.col("x") - deq))
    return (
        per_el.groupBy(corpus_id)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "code"))), lambda s: s["code"]
            ).alias("codes"),
            F.round(F.avg("sqerr"), 10).alias("mse"),
        )
    )


def lsh_planes(
    num_planes: int = 8, num_tables: int = 4, dim: int = 64, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic random-hyperplane tables for :func:`lsh_ann_topk`.

    Exposed so the DuckDB oracle can embed the identical constants as SQL
    literals (repr round-trips each double exactly) and replay the
    signature computation bit-for-bit.
    """
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
        for _ in range(num_tables)
    ]


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
    tables = lsh_planes(num_planes, num_tables, dim, seed)

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


def kmeans_refine(
    corpus: DataFrame,
    num_cells: int = 16,
    iters: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Lloyd k-means refinement of the deterministic IVF seed centroids.

    Drop-in upgrade for :func:`ivf_assign`: same (centroids, assigned)
    contract, but the centroids are trained — ``iters`` rounds of
    (assign to nearest-by-cosine, recompute per-cell per-dim mean).
    Everything stays deterministic and engine-portable (a DuckDB oracle
    replays it bit-for-bit): seeds are the ``num_cells`` smallest-id
    vectors (no rand()), assignment rounds cosine to 6 dp with
    ties-to-smaller-centroid, and the mean update accumulates each
    dimension in exact decimal(25,6) before one double division, so the
    refined centroid doubles are identical regardless of partitioning.

    Scale shape (classic distributed Lloyd, what MLlib's KMeans also
    does): per iteration ONE corpus scan + one map-side-combining
    groupBy with ``dim`` decimal accumulators per cell — the exchange
    carries ≤ cells rows of (dim+1) accumulators, and the (cells × dim)
    model state collected to the driver is a few KB. The corpus is
    never shuffled and there is no per-dimension row fan-out (the
    posexplode formulation would multiply corpus rows × dim before
    aggregating). Empty cells drop out of the model, mirroring the SQL
    replay.
    """
    dim = len(corpus.select(corpus_vec).first()[0])
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec)
    for _ in range(iters):
        aggs = [
            (
                F.sum(F.col(corpus_vec)[i].cast("double").cast("decimal(25,6)")).cast("double")
                / F.count("*")
            ).alias(f"m{i}")
            for i in range(dim)
        ]
        rows = assigned.groupBy("cell").agg(*aggs).collect()
        cents = sorted((int(r["cell"]), [r[f"m{i}"] for i in range(dim)]) for r in rows)
        assigned = corpus.select(
            corpus_id,
            corpus_vec,
            F.array_min(_cell_scores(F.col(corpus_vec), cents))["cent_id"].alias("cell"),
        )
    return cents, assigned
