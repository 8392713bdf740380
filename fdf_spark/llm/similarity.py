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


def _lit_vec(xs) -> Column:
    """Literal double-array column in ONE py4j/parser round trip.

    ``F.array(*[F.lit(float(x)) for x in xs])`` costs one py4j call per
    element (~0.7 ms each on this stack) — a cells×dim centroid tree
    spends seconds of DRIVER time just constructing Column objects
    before Catalyst ever sees them (measured: 128 64-wide literal
    arrays = 5.9 s as per-element lits vs 0.4 s via one parsed
    ``array(…)`` expression). Values are bit-identical: ``repr`` of a
    Python float is the shortest decimal that round-trips, and Spark's
    ``1.5D`` double literal parses with ``Double.parseDouble`` —
    bitwise equality is asserted in test_llm.  Non-finite elements
    (``repr`` gives ``nan``/``inf``, which the SQL parser rejects as
    ``nanD``) fall back to the per-element ``F.lit`` path, which
    builds valid NaN/Infinity literals (ADVICE r14)."""
    vals = [float(x) for x in xs]
    if not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


def _round6_np(a):
    """Vectorized 6-dp round matching ``F.round`` EXACTLY — including
    at the ×1e6 half-way boundary (VERDICT r14 #8 / ADVICE r14).

    Fast path: ``sign(x)·floor(|x|·1e6+0.5)/1e6`` (half-away-from-zero
    in binary float64).  Spark's ``Round`` on a double is
    ``BigDecimal.valueOf(x).setScale(6, HALF_UP)`` — DECIMAL arithmetic
    on the shortest repr — so a value whose shortest decimal repr
    terminates exactly at a 7th-digit 5 (e.g. ``5e-07``: scaled binary
    product is 0.4999…94, floors DOWN; BigDecimal rounds UP) can
    diverge.  Elements within ~an ulp of a half boundary therefore take
    a scalar fixup through Python ``Decimal(repr(x))`` —
    ``repr``/``Double.toString`` are both shortest-round-trip and
    ``ROUND_HALF_UP`` matches Java's (away from zero) — which replays
    the JVM result bit-for-bit.  The band is empty on real cosine/L2
    folds (pytest boundary pin + two-SF oracle sweeps), so the hot path
    stays one vectorized pass."""
    import numpy as np

    r = np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6
    y = np.abs(a) * 1e6
    frac = y - np.floor(y)
    near = (np.abs(frac - 0.5) < 1e-8) & np.isfinite(a)
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        r[near] = [
            float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))
            for v in np.asarray(a)[near]
        ]
    return r


def _scaled6_int_np(a):
    """Vectorized int64 of ``round6(x) × 1e6`` — the exact integer
    behind Spark's ``cast(double AS decimal(p,6))`` (HALF_UP at 6 dp of
    the shortest repr, the same contract :func:`_round6_np` pins).
    Same fast path + half-boundary Decimal fixup; used by the Arrow
    mean-partials tier so per-partition sums are plain int64 adds."""
    import numpy as np

    y = np.abs(a) * 1e6
    k = np.floor(y + 0.5)
    frac = y - np.floor(y)
    near = (np.abs(frac - 0.5) < 1e-8) & np.isfinite(a)
    if near.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        k[near] = [
            float(
                Decimal(repr(abs(float(v)))).quantize(q, rounding=ROUND_HALF_UP)
                * 1_000_000
            )
            for v in np.asarray(a)[near]
        ]
    return (np.sign(a) * k).astype(np.int64)


def _cell_means_arrow(assigned: DataFrame, corpus_vec: str, dim: int):
    """Per-cell per-dimension decimal-exact means, Arrow tier →
    sorted ``[(cell, [mean_0..mean_dim-1]), ...]``.

    Numerically identical to the ``cast(sum(cast(x as decimal(*,6)))
    as double) / count(*)`` expression aggregate (pinned in pytest):
    each element contributes its 6-dp HALF_UP decimal
    (:func:`_scaled6_int_np` — an exact scaled int64), per-BATCH sums
    stay within int64 (10k-row batches × |scaled| ≤ 1e12), cross-batch
    totals accumulate as Python ints (unbounded), and the final
    ``float(Decimal(total).scaleb(-6)) / n`` replays the JVM's
    decimal→double nearest rounding then double division.  Why: the
    expression form plans+codegens ``dim`` aggregate columns per Lloyd
    iteration — 1.24 s per iteration at 64 dims on a 2k-row fixture,
    ~all of it driver/codegen, none of it data (r15 measurement) —
    while this tier ships one (cell, n, sums) row per cell per batch
    (KB; the same O(cells×dim) driver state the model collect already
    is).  Shuffle shape at scale: NO exchange at all — partials ride
    the collect, the same contract as the expression groupBy's
    map-side combine."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            cells = pdf["cell"].to_numpy()
            x = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]]
            )
            s = _scaled6_int_np(x)
            out_c, out_n, out_s = [], [], []
            for c in np.unique(cells):
                m = cells == c
                out_c.append(int(c))
                out_n.append(int(m.sum()))
                out_s.append(s[m].sum(axis=0, dtype=np.int64))
            yield pd.DataFrame({"cell": out_c, "n": out_n, "sums": out_s})

    parts = assigned.select("cell", corpus_vec).mapInPandas(
        gen, schema="cell long, n long, sums array<long>"
    )
    from decimal import Decimal

    acc: dict[int, tuple[int, list[int]]] = {}
    for r in parts.collect():
        n, sums = acc.get(r.cell, (0, [0] * dim))
        acc[r.cell] = (n + r.n, [a + b for a, b in zip(sums, r.sums)])
    return sorted(
        (c, [float(Decimal(t).scaleb(-6)) / n for t in sums])
        for c, (n, sums) in acc.items()
    )


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
                (-cosine(vec, _lit_vec(cvec))).alias("neg_sim"),
                F.lit(int(cid)).cast("long").alias("cent_id"),
            )
            for cid, cvec in cents
        ]
    )


def _assign_arrow(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    corpus_id: str,
    corpus_vec: str,
) -> DataFrame:
    """Arrow-batched nearest-centroid assignment, numerically identical
    to the ``_cell_scores`` expression path: dot/norm accumulation runs
    SEQUENTIALLY over dimensions (matching the zip_with fold), cosine
    rounds 6 dp half-away-from-zero (matching F.round/HALF_UP), and
    argmax-first-occurrence over ascending-id centroids reproduces the
    ties-to-smaller-centroid rule.  Measured ~7x end-to-end on a 2-iter
    kmeans_refine (200k vecs/30.5 s expr vs 1M/22.3 s arrow; the
    cells*dim lambda tree falls out of codegen, numpy does not).
    Equivalence is pytest-asserted on the fixtures."""
    import numpy as np
    import pandas as pd

    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    ids = np.array([cents[i][0] for i in order], dtype=np.int64)
    c = np.array([cents[i][1] for i in order], dtype=np.float64)  # (k, d)
    d = c.shape[1]
    cn = np.zeros(len(ids))
    for i in range(d):  # sequential fold == _norm
        cn += c[:, i] * c[:, i]
    cn = np.sqrt(cn)

    def assign(batches):
        for pdf in batches:
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]])
            dot = np.zeros((len(pdf), len(ids)))
            xn = np.zeros(len(pdf))
            for i in range(d):
                dot += x[:, i : i + 1] * c[None, :, i]
                xn += x[:, i] * x[:, i]
            cos = dot / (np.sqrt(xn)[:, None] * cn[None, :])
            cos = _round6_np(cos)  # 6 dp, F.round-exact incl. half boundaries
            yield pd.DataFrame(
                {
                    corpus_id: pdf[corpus_id],
                    corpus_vec: pdf[corpus_vec],
                    "cell": ids[np.argmax(cos, axis=1)],
                }
            )

    vec_type = corpus.schema[corpus_vec].dataType.simpleString()
    return corpus.select(corpus_id, corpus_vec).mapInPandas(
        assign, schema=f"{corpus_id} long, {corpus_vec} {vec_type}, cell long"
    )


def all_pairs_cosine(
    corpus: DataFrame,
    threshold: float,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Exact all-pairs cosine ≥ ``threshold`` → (id_a, id_b, cos_sim),
    id_a < id_b — the oracle-checkable twin of the LSH/IVF candidate
    tiers (r14, replacing the BroadcastNestedLoopJoin + per-pair HOF
    fold that evaluated three interpreted 64-element array passes per
    pair, cosine re-running in both the join condition and the
    projection: measured 187 s → 1.0 s at 2 k vectors / sf0.1 with
    bit-identical output).

    Numeric contract (the same one :func:`_assign_arrow` pins):
    elements widen to float64 exactly like the fold's per-element
    ``cast("double")``; dot/norm accumulate SEQUENTIALLY over
    dimensions (one fused multiply-add per dim — IEEE-identical to the
    zip_with/aggregate left fold); cosine divides by
    ``norm(a) * norm(b)`` in that order and rounds 6 dp
    half-away-from-zero, matching ``F.round``/HALF_UP. Equality with
    the expression path is pytest-pinned (test_llm).

    Scale shape: all-pairs is the EXACT tier — quadratic because the
    answer is (every qualifying pair must be scored); at 100 TB the
    pair stage is LSH (q75) / IVF (q73) / SemDeDup cells
    (:func:`semantic_dedup`) with this operator's survivor semantics.
    The corpus broadcast here is the same relation Spark's BNLJ
    broadcast built; each task scores its row block against it with
    one vectorized pass per dimension, blocked to bound the score
    matrix, and ships only qualifying pairs back.  Because the
    relation is COLLECTED to the driver before broadcasting,
    ``max_rows`` fails fast (one cheap count, before any vector bytes
    move) when the corpus outgrows the exact tier — rather than
    silently OOMing the driver on an input the LSH/IVF tiers should
    own.  Rounding caveat: the numpy half-away emulation
    (``floor(|x|·1e6+0.5)``) matches ``F.round``'s
    BigDecimal-on-shortest-repr semantics on every fixture and is
    pytest-pinned, but a value whose shortest decimal repr terminates
    exactly at a 7th-digit 5 could in principle round differently —
    see ``test_round6_half_boundary_parity``.
    """
    import numpy as np
    import pandas as pd

    from fdf_spark.sources.tables import spread

    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"all_pairs_cosine is the exact (quadratic, driver-collected) "
            f"tier: corpus has {n} rows > max_rows={max_rows}. Use the "
            f"LSH (lsh_ann_topk), IVF (ivf_ann_topk/ivf_pq_ann_topk) or "
            f"SemDeDup (semantic_dedup) candidate tiers at this scale, "
            f"or raise max_rows explicitly if the driver truly has the "
            f"memory."
        )
    rows = corpus.select(corpus_id, corpus_vec).collect()
    rows.sort(key=lambda r: r[0])
    ids_all = np.array([r[0] for r in rows], dtype=np.int64)
    B = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    d = B.shape[1] if len(rows) else 0
    bn = np.zeros(len(ids_all))
    for i in range(d):  # sequential fold == _norm
        bn += B[:, i] * B[:, i]
    bn = np.sqrt(bn)
    bc = corpus.sparkSession.sparkContext.broadcast((ids_all, B, bn))
    # rows per score-matrix block: ~32 MB of float64 against the corpus
    blk = max(1, (4 << 20) // max(1, len(ids_all)))

    def gen(batches):
        ids_b, B, bn = bc.value
        for pdf in batches:
            for lo in range(0, len(pdf), blk):
                chunk = pdf.iloc[lo : lo + blk]
                X = np.array([np.asarray(v, dtype=np.float64) for v in chunk[corpus_vec]])
                ida = chunk[corpus_id].to_numpy(dtype=np.int64)
                dot = np.zeros((len(chunk), len(ids_b)))
                xn = np.zeros(len(chunk))
                for i in range(B.shape[1]):  # sequential fold == _dot
                    dot += X[:, i : i + 1] * B[None, :, i]
                    xn += X[:, i] * X[:, i]
                cos = dot / (np.sqrt(xn)[:, None] * bn[None, :])
                cos = _round6_np(cos)  # 6 dp, F.round-exact incl. half boundaries
                mask = (ida[:, None] < ids_b[None, :]) & (cos >= threshold)
                ai, bi = np.nonzero(mask)
                yield pd.DataFrame(
                    {"id_a": ida[ai], "id_b": ids_b[bi], "cos_sim": cos[ai, bi]}
                )

    return spread(corpus.select(corpus_id, corpus_vec)).mapInPandas(
        gen, schema="id_a long, id_b long, cos_sim double"
    )


def ivf_assign(
    corpus: DataFrame,
    num_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    assign_mode: str = "expr",
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
    ``assign_mode="arrow"`` swaps the expression argmin for the
    numerically-identical numpy path (:func:`_assign_arrow`) — the
    throughput tier for big cells×dim products.
    """
    cents = [
        (r[corpus_id], list(r[corpus_vec]))
        for r in corpus.orderBy(corpus_id).limit(num_cells).select(corpus_id, corpus_vec).collect()
    ]
    assigned = _assign(corpus, cents, corpus_id, corpus_vec, assign_mode)
    return cents, assigned


def _assign(corpus, cents, corpus_id, corpus_vec, assign_mode):
    if assign_mode == "arrow":
        return _assign_arrow(corpus, cents, corpus_id, corpus_vec)
    if assign_mode != "expr":
        raise ValueError(f"unknown assign_mode {assign_mode!r}")
    return corpus.select(
        corpus_id,
        corpus_vec,
        F.array_min(_cell_scores(F.col(corpus_vec), cents))["cent_id"].alias("cell"),
    )


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
    assign_mode: str = "expr",
    probe_mode: str = "expr",
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) coarse quantizer.

    Each query probes its ``nprobe`` nearest cells and re-ranks
    exactly inside them, touching ~``nprobe/num_cells`` of the corpus
    instead of all of it. At 100 TB the assigned corpus is written
    partitioned by ``cell`` so a probe is a partition-pruned scan; in
    one plan (here) the probe set broadcasts onto an unshuffled corpus
    scan. Deterministic centroids ⇒ unlike LSH, this variant has a
    full DuckDB oracle (q73). ``assign_mode="arrow"`` swaps the
    cell-assignment argmin for the numerically-identical Arrow tier
    (the right choice once cells×dim outgrows codegen — see
    :func:`ivf_assign`).
    """
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec, assign_mode)
    if probe_mode not in ("expr", "arrow"):
        raise ValueError(f"unknown probe_mode {probe_mode!r}")  # ADVICE r14
    if probe_mode == "arrow":
        probes = _cells_arrow(queries, cents, nprobe, query_id, query_vec)
    else:
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
    assign_mode: str = "expr",
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
    import numpy as np
    import pandas as pd

    _, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec, assign_mode)

    # Within-cell pairwise stage, vectorized (r14): the old cell-keyed
    # self-join scored every within-cell pair with the interpreted HOF
    # cosine fold (3 × dim lambda passes per pair — measured 6.3 s of
    # the query's 6.6 s at sf0.1; 0.4 s vectorized, identical removed
    # set). Each cell's rows land in one pandas group and numpy scores
    # the pairwise matrix with the SAME numeric contract as
    # :func:`all_pairs_cosine` (sequential per-dimension fold,
    # norm(a)*norm(b) division order, 6 dp half-away rounding) —
    # equivalence to the join+fold path is pytest-pinned. Same scale
    # shape as before: work is cluster-bounded Σ|cell|² either way, and
    # the A-side is blocked so a skewed giant cell bounds its score
    # matrix instead of materializing |cell|² at once.
    def cell_removed(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(corpus_id)
        ids = pdf[corpus_id].to_numpy(dtype=np.int64)
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]])
        d = X.shape[1] if len(ids) else 0
        nn = np.zeros(len(ids))
        for i in range(d):  # sequential fold == _norm
            nn += X[:, i] * X[:, i]
        n = np.sqrt(nn)
        blk = max(1, (4 << 20) // max(1, len(ids)))
        hit = np.zeros(len(ids), dtype=bool)
        for lo in range(0, len(ids), blk):
            hi = min(lo + blk, len(ids))
            dot = np.zeros((hi - lo, len(ids)))
            for i in range(d):  # sequential fold == _dot
                dot += X[lo:hi, i : i + 1] * X[None, :, i]
            cos = dot / (n[lo:hi, None] * n[None, :])
            cos = _round6_np(cos)  # 6 dp, F.round-exact incl. half boundaries
            mask = (ids[lo:hi, None] < ids[None, :]) & (cos >= threshold)
            hit |= mask.any(axis=0)
        return pd.DataFrame({corpus_id: ids[hit]})

    removed = (
        assigned.select("cell", corpus_id, corpus_vec)
        .groupBy("cell")
        .applyInPandas(cell_removed, schema=f"{corpus_id} long")
    )  # ids are unique per cell and cells partition the corpus — no distinct needed
    return assigned.join(removed, corpus_id, "left_anti").select(corpus_id, "cell")


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    num_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    assign_mode: str = "expr",
) -> None:
    """Materialize the IVF index as a **cell-partitioned** parquet layout.

    ``<path>/corpus/cell=N/`` holds each inverted list as its own
    hive partition; ``<path>/centroids/`` is the tiny (cells × dim)
    sidecar the prober needs to route queries. This is the 100 TB
    layout SCALE.md describes: an ``nprobe`` query touches only the
    probed cells' files — a partition-pruned scan, not a corpus scan.
    """
    from fdf_spark.sources.tables import local_df

    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec, assign_mode)
    assigned.write.partitionBy("cell").mode("overwrite").parquet(f"{path}/corpus")
    spark = corpus.sparkSession
    # r14: Arrow-backed local frame — coalesce(1) over the pickle-RDD
    # form computed its 32 parent partitions sequentially through
    # Python workers (~5 s for 16 rows, every build)
    local_df(
        spark,
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
    probes, cells = _ivf_index_probes(spark, index_path, queries, query_id, query_vec, nprobe)
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


def _ivf_index_probes(
    spark, index_path: str, df: DataFrame, id_col: str, vec_col: str, nprobe: int,
    probe_mode: str = "expr",
) -> tuple[DataFrame, list[int]]:
    """Shared probe construction over a :func:`write_ivf_index` layout:
    load the centroid sidecar, build the per-row (id, vec, cell) probe
    relation, and return it with the distinct probed-cell list.  The
    probe relation is materialized ONCE (localCheckpoint — tiny:
    |rows| × nprobe) so the collected cell set and any downstream join
    read the same evaluation, and the query pipeline never runs twice.
    Used by :func:`ivf_probe_pruned` and
    ``llm/decontam.semantic_decontaminate_indexed``."""
    cents = [
        (int(r["cent_id"]), list(r["centroid"]))
        for r in sorted(
            spark.read.parquet(f"{index_path}/centroids").collect(),
            key=lambda r: r["cent_id"],
        )
    ]
    if probe_mode not in ("expr", "arrow"):
        raise ValueError(f"unknown probe_mode {probe_mode!r}")  # ADVICE r14
    if probe_mode == "arrow":
        probes = _cells_arrow(df, cents, nprobe, id_col, vec_col).localCheckpoint()
    else:
        probes = df.select(
            id_col,
            vec_col,
            F.explode(
                F.slice(F.array_sort(_cell_scores(F.col(vec_col), cents)), 1, nprobe)
            ).alias("__pr"),
        ).select(id_col, vec_col, F.col("__pr")["cent_id"].alias("cell")).localCheckpoint()
    cells = sorted({r["cell"] for r in probes.select("cell").distinct().collect()})
    return probes, cells


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


def _lsh_sig_arrow(df: DataFrame, tables, id_col: str, vec_col: str) -> DataFrame:
    """Arrow LSH signature tier (r15, VERDICT r14 #6): the per-(row,
    table) bucket relation of :func:`lsh_ann_topk`, numerically
    identical to the expression fold — each plane bit is the SAME
    sequential per-dimension fold (``acc += x[i]·p[i]`` from 0.0, the
    :func:`_assign_arrow` convention) compared ``>= 0`` (IEEE: −0.0
    qualifies on both engines), signatures are exact integer bit sums.
    Equality with the expression path is pytest-pinned.  The win is the
    same class as the ANN family's assign/probe tiers: tables×planes
    zip_with/aggregate folds are CodegenFallback trees that cost more
    in Catalyst analysis per plan build than the query executes
    (q75 profile: 3.3 s build / 1.2 s exec at sf0.1)."""
    import numpy as np
    import pandas as pd

    P = np.array(tables, dtype=np.float64)  # (tables, planes, dim)
    n_tables, n_planes, d = P.shape

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            sigs = np.zeros((len(pdf), n_tables), dtype=np.int64)
            for t in range(n_tables):
                for j in range(n_planes):
                    acc = np.zeros(len(pdf))
                    for i in range(d):  # sequential fold == signature()
                        acc += x[:, i] * P[t, j, i]
                    sigs[:, t] |= (acc >= 0).astype(np.int64) << j
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                    vec_col: [v for v in pdf[vec_col] for _ in range(n_tables)],
                    "__tbl": np.tile(np.arange(n_tables, dtype=np.int64), len(pdf)),
                    "__b": sigs.reshape(-1),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, {vec_col} {vec_type}, __tbl long, __b long"
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
    sig_mode: str = "expr",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    ``num_tables`` independent tables of ``num_planes`` sign bits each
    (planes generated driver-side from ``seed``, shipped as literals —
    tiny). Candidates share a full bucket in ANY table, or any 1-bit
    multiprobe flip of the query's bucket; exact cosine re-rank on the
    candidate set only. Recall/cost dial: more tables → higher recall,
    more candidates; fewer planes → bigger buckets.
    ``sig_mode="arrow"`` computes the signatures in the pinned
    numerically-identical numpy tier (:func:`_lsh_sig_arrow`).
    """
    tables = lsh_planes(num_planes, num_tables, dim, seed)
    if sig_mode not in ("expr", "arrow"):
        raise ValueError(f"unknown sig_mode {sig_mode!r}")
    if sig_mode == "arrow":
        # only (id, vec) ever reach the output/re-rank — project early
        # (guide §2.3) so the opaque Arrow stage ships two columns
        c = _lsh_sig_arrow(
            corpus.select(corpus_id, corpus_vec), tables, corpus_id, corpus_vec
        )
        qsig = _lsh_sig_arrow(
            queries.select(query_id, query_vec), tables, query_id, query_vec
        )
        # probes are 1-bit flips of the signature COLUMN — identical
        # (tbl, bucket) pairs to the expression path's struct array
        q = qsig.withColumn(
            "__b",
            F.explode(
                F.array(
                    F.col("__b"),
                    *[F.col("__b").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)],
                )
            ),
        )
        cand = c.join(F.broadcast(q), ["__tbl", "__b"]).filter(
            F.col(query_id) != F.col(corpus_id)
        ).drop("__tbl", "__b")
        scored = cand.withColumn(
            "cos_sim", cosine(F.col(query_vec), F.col(corpus_vec))
        ).dropDuplicates([query_id, corpus_id])
        w = W.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, corpus_id, "cos_sim", "rank")
        )

    def signature(vec: Column, planes: list[list[float]]) -> Column:
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        _lit_vec(p),
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
    # each table's signature is computed ONCE into a column and the
    # (num_planes+1) probes are bit-flips of that column — the old form
    # re-embedded the full planes×dim fold tree per probe
    # ((num_planes+1)×num_tables copies), which cost more in Catalyst
    # analysis of the replicated tree than the query ran in total
    # (26.9 s build / 3.9 s exec at sf0.1 → 3.3 s end-to-end).
    # CollapseProject keeps the staging projection because the
    # aggregate fold is non-cheap and multiply-referenced; values and
    # join semantics are unchanged (same bits, same XOR probes).
    q_sigs = queries.select(
        "*", *[signature(F.col(query_vec), p).alias(f"__sig{t}") for t, p in enumerate(tables)]
    )
    q_probes = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), probe.alias("b"))
            for t in range(len(tables))
            for probe in [F.col(f"__sig{t}")]
            + [F.col(f"__sig{t}").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)]
        ]
    )
    q = q_sigs.withColumn("__tb", F.explode(q_probes)).drop(
        *[f"__sig{t}" for t in range(len(tables))]
    )
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
    assign_mode: str = "expr",
    mean_mode: str = "expr",
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
    if mean_mode not in ("arrow", "expr"):
        raise ValueError(f"unknown mean_mode {mean_mode!r}")
    dim = len(corpus.select(corpus_vec).first()[0])
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec, assign_mode)
    for _ in range(iters):
        if mean_mode == "arrow":
            # r15: one mapInPandas partial-sum pass instead of `dim`
            # aggregate columns — the expression form's cost is the
            # per-iteration plan/codegen of 64 aggregates (1.24 s at
            # sf0.1, ~none of it data); numerically identical
            # (_cell_means_arrow, pinned in pytest)
            cents = _cell_means_arrow(assigned, corpus_vec, dim)
        else:
            # parsed expressions (r14): dim Column-composed aggregates
            # cost more py4j/driver time per iteration than the scan
            # they drive; the parsed tree is the identical expression
            aggs = [
                F.expr(
                    f"cast(sum(cast(cast(`{corpus_vec}`[{i}] as double) as decimal(25,6))) "
                    f"as double) / count(*)"
                ).alias(f"m{i}")
                for i in range(dim)
            ]
            rows = assigned.groupBy("cell").agg(*aggs).collect()
            cents = sorted(
                (int(r["cell"]), [r[f"m{i}"] for i in range(dim)]) for r in rows
            )
        assigned = _assign(corpus, cents, corpus_id, corpus_vec, assign_mode)
    return cents, assigned


def _l2(a: Column, b: Column, decimals: int | None = 6) -> Column:
    """Squared L2 distance, double-cast elements, sequential fold (the
    same evaluation-order contract as :func:`cosine` so a DuckDB
    ``list_sum`` replays it to the last ulp), rounded for rank
    stability."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    d = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    return F.round(d, decimals) if decimals is not None else d


def _l2_flat(vec: Column, base: int, cvec: list[float]) -> Column:
    """Squared L2 of ``vec[base:base+len(cvec)]`` against literal
    ``cvec`` as a FLAT scalar expression — bit-identical to :func:`_l2`
    (left-assoc sum; 0.0+d0==d0) but whole-stage-codegen friendly: no
    lambda, no slice/array allocation per evaluation."""
    s: Column | None = None
    for i, c in enumerate(cvec):
        x = vec.getItem(base + i).cast("double") - F.lit(float(c))
        t = x * x
        s = t if s is None else s + t
    return F.round(s, 6)


def _l2_sub(qsub: Column, c: Column) -> Column:
    """Squared L2 of a pre-cast double subvector against a RUNTIME
    array (a codebook row iterated by ``F.transform``) — bit-identical
    to :func:`_l2_flat`: zip_with squares element-wise, aggregate sums
    left-assoc from 0.0 (exact: 0.0+d0==d0, and every term is a square
    so never −0.0), same round(…, 6)."""
    return F.round(
        F.aggregate(
            F.zip_with(qsub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )


def pq_encode(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    dim: int = 64,
    encode_mode: str = "expr",
    keep: tuple[str, ...] = (),
    codebooks: list[list[list[float]]] | None = None,
) -> tuple[list[list[list[float]]], DataFrame]:
    """Product-quantization encode: split each vector into ``m``
    subvectors of ``dim/m`` components; quantize each against a
    per-subspace codebook of ``ks`` centroids; a vector becomes ``m``
    small integer codes (here ≤1 byte each — a 64-float embedding
    compresses 32:1).

    Codebooks are deterministic (the ``ks`` smallest-id vectors'
    subvectors, same convention as :func:`ivf_assign` — no rand(), so
    the whole encode replays in a SQL oracle; :func:`kmeans_refine`'s
    Lloyd step applies per-subspace when trained codebooks are wanted
    and changes nothing structural). Returns ``(codebooks, codes)``
    where ``codebooks[j][c]`` is centroid ``c`` of subspace ``j`` and
    ``codes`` has an ``array<int> code`` column of length ``m``.

    Scale — two encode strategies, both one corpus scan, zero shuffles,
    output 100-1000x smaller than the embeddings (the ADC scan in
    :func:`pq_ann_topk` then reads codes instead of vectors):

    - ``encode_mode="expr"`` (default): pure column expressions —
      bit-exact against the DuckDB oracle, but the m×ks×(dim/m)-term
      tree exceeds janino's method limit and falls back to interpreted
      eval, ~0.03 Mvec/s/node.
    - ``encode_mode="arrow"``: Arrow-batched ``mapInPandas`` — numpy
      does (B, ks) distance accumulation per subspace with the SAME
      sequential i-order as the expr fold and half-away-from-zero
      rounding, ~30x faster (tools/stress.py).  Equivalence to expr
      mode is asserted on the fixtures in pytest; the only conceivable
      divergence is a distance landing within one float ulp of a
      0.5e-6 rounding boundary (Java BigDecimal vs scaled-float
      rounding), which the equivalence test would catch.
    """
    sub = dim // m
    if codebooks is not None:
        books = codebooks  # externally supplied (trained, or residual-seeded)
    else:
        books = _pq_seed_books(corpus, corpus_vec, corpus_id, m, ks, sub)

    if encode_mode == "arrow":
        import numpy as np
        import pandas as pd

        books_np = np.array(books)  # (m, ks, sub)
        id_type = corpus.schema[corpus_id].dataType.simpleString()
        vec_type = corpus.schema[corpus_vec].dataType.simpleString()
        keep_schema = "".join(
            f", {c} {corpus.schema[c].dataType.simpleString()}" for c in keep
        )
        out_schema = f"{corpus_id} {id_type}, {corpus_vec} {vec_type}{keep_schema}, code array<int>"

        def encode_iter(batches):
            for pdf in batches:
                x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[corpus_vec]])
                codes = np.empty((len(pdf), m), dtype=np.int32)
                for j in range(m):
                    xj = x[:, j * sub : (j + 1) * sub]
                    acc = np.zeros((len(pdf), ks))
                    for i in range(sub):  # sequential i-order == expr fold
                        d = xj[:, i : i + 1] - books_np[j][None, :, i]
                        acc += d * d
                    dist = _round6_np(acc)  # half-up (dists >= 0), F.round-exact
                    codes[:, j] = np.argmin(dist, axis=1)  # first min == smaller ord
                yield pd.DataFrame(
                    {
                        corpus_id: pdf[corpus_id],
                        corpus_vec: pdf[corpus_vec],
                        **{c: pdf[c] for c in keep},
                        "code": list(codes),
                    }
                )

        return books, corpus.select(corpus_id, corpus_vec, *keep).mapInPandas(
            encode_iter, schema=out_schema
        )

    if encode_mode != "expr":
        raise ValueError(f"unknown encode_mode {encode_mode!r}")

    codes = corpus.select(
        corpus_id,
        corpus_vec,
        *keep,
        F.array(
            *[_pq_code_col(F.col(corpus_vec), books[j], j * sub) for j in range(m)]
        ).alias("code"),
    )
    return books, codes


def _pq_seed_books(
    df: DataFrame, vec_col: str, id_col: str, m: int, ks: int, sub: int, skip: int = 0
) -> list[list[list[float]]]:
    """Deterministic seed codebooks: the ``ks`` smallest-id rows'
    subvectors, optionally skipping the first ``skip`` rows (the
    residual tier skips the IVF centroid rows, whose residuals are
    exactly zero — an all-zero codebook ties every distance)."""
    seeds = [
        list(r[vec_col])
        for r in df.orderBy(id_col).limit(ks + skip).select(vec_col).collect()[skip:]
    ]
    return [[[float(v[j * sub + i]) for i in range(sub)] for v in seeds] for j in range(m)]


def _pq_code_col(vec: Column, book_j, base: int) -> Column:
    """Nearest-centroid code for one subspace.

    The codebook rides as ONE constant-folded literal array and
    ``F.transform`` computes the per-centroid distance with a single
    lambda body — identical IEEE order to the old flat expansion
    (:func:`_l2_sub`) but O(sub) generated code instead of O(ks·sub):
    the flat form's m·ks·sub terms blew janino's 64 KB method limit
    and silently dropped the whole encode projection to INTERPRETED
    evaluation (VERDICT r10 #5 — the 'ERROR CodeGenerator' in the
    sweep), which costs far more than the per-row array the fold
    allocates."""
    sub = len(book_j[0])
    qsub = F.array(*[vec.getItem(base + i).cast("double") for i in range(sub)])
    cents = F.array(*[_lit_vec(cvec) for cvec in book_j])
    scores = F.transform(
        cents,
        lambda c, i: F.struct(_l2_sub(qsub, c).alias("dist"), i.alias("cent_ord")),
    )
    return F.array_min(scores)["cent_ord"]


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    initial: list[list[list[float]]],
    iters: int = 2,
    mode: str = "arrow",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd training of PQ codebooks — what FAISS's
    ProductQuantizer::train does, in the engine's deterministic
    arithmetic (decimal(25,6) accumulation + one double division, the
    kmeans_refine recipe — partition-order independent, so the trained
    books replay in a SQL oracle).

    Scale shape: per iteration ONE scan of ``df`` — a projection
    computes all ``m`` subspace codes per row once, then a single
    global aggregate with m*ks*(sub+1) conditional accumulators
    (map-side combine; the exchange carries ONE row).  The corpus is
    never shuffled and there is no per-subspace row fan-out.  At
    100 TB you train on a deterministic hash-sample (llm/hashing) —
    the FAISS convention too — so the scan is of the sample, not the
    corpus.  Empty codebook entries keep their previous value.

    Why this matters (measured, tests/test_llm.py): seed codebooks
    only resolve the structure the seeds happen to span; on residuals
    (``ivf_pq_ann_topk(by_residual=True)``) training tightens the
    codebook around the actual noise distribution and recall rises
    with no query-time cost.
    """
    # shape is the initial codebooks' shape — a separate m/ks that
    # disagreed would silently truncate or crash mid-aggregation
    if mode not in ("arrow", "expr"):
        raise ValueError(f"unknown train mode {mode!r}")
    m, ks, sub = len(initial), len(initial[0]), len(initial[0][0])
    books = [list(b) for b in initial]
    if mode == "arrow":
        # r15 (VERDICT r14 #7): the expression iteration builds
        # m·ks·(sub+1) Column-composed aggregates — the construction
        # alone is thousands of py4j round trips and the resulting
        # plan/codegen dwarfs the data (the q111 Lloyd finding at 18×
        # the width).  One mapInPandas pass per iteration instead:
        # codes via the pinned numpy encoder (same sequential i-order
        # + _round6_np as encode_mode="arrow"), per-(j,c) partials as
        # (n, scaled-int64 sums) — _scaled6_int_np is the exact integer
        # behind the decimal(25,6) cast — combined on the driver with
        # Decimal scaleb + the same Python float division the expr path
        # already does.  Bit-identical (pinned in pytest); expr kept.
        import numpy as np
        import pandas as pd

        from decimal import Decimal

        for _ in range(iters):
            books_np = np.array(books)  # (m, ks, sub)

            def partials(batches):
                for pdf in batches:
                    x = np.array(
                        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                    )
                    out_j, out_c, out_n, out_s = [], [], [], []
                    for j in range(m):
                        xj = x[:, j * sub : (j + 1) * sub]
                        acc = np.zeros((len(pdf), ks))
                        for i in range(sub):  # sequential i-order == expr fold
                            dlt = xj[:, i : i + 1] - books_np[j][None, :, i]
                            acc += dlt * dlt
                        dist = _round6_np(acc)
                        codes = np.argmin(dist, axis=1)
                        sj = _scaled6_int_np(xj)  # (rows, sub) exact ints
                        for c in np.unique(codes):
                            msk = codes == c
                            out_j.append(j)
                            out_c.append(int(c))
                            out_n.append(int(msk.sum()))
                            out_s.append(sj[msk].sum(axis=0, dtype=np.int64))
                    yield pd.DataFrame(
                        {"j": out_j, "c": out_c, "n": out_n, "s": out_s}
                    )

            parts = df.select(vec_col).mapInPandas(
                partials, schema="j int, c int, n long, s array<long>"
            )
            acc: dict[tuple[int, int], tuple[int, list[int]]] = {}
            for r in parts.collect():
                n0, s0 = acc.get((r.j, r.c), (0, [0] * sub))
                acc[(r.j, r.c)] = (n0 + r.n, [a + b for a, b in zip(s0, r.s)])
            books = [
                [
                    (
                        [
                            float(Decimal(t).scaleb(-6)) / acc[(j, c)][0]
                            for t in acc[(j, c)][1]
                        ]
                        if (j, c) in acc
                        else books[j][c]
                    )
                    for c in range(ks)
                ]
                for j in range(m)
            ]
        return books
    for _ in range(iters):
        sel = df.select(
            F.col(vec_col).alias("__v"),
            *[
                _pq_code_col(F.col(vec_col), books[j], j * sub).alias(f"__c{j}")
                for j in range(m)
            ],
        )
        aggs = []
        for j in range(m):
            for c in range(ks):
                cond = F.col(f"__c{j}") == c
                aggs.append(F.count(F.when(cond, 1)).alias(f"n_{j}_{c}"))
                for i in range(sub):
                    aggs.append(
                        F.sum(
                            F.when(
                                cond,
                                F.col("__v")[j * sub + i]
                                .cast("double")
                                .cast("decimal(25,6)"),
                            )
                        )
                        .cast("double")
                        .alias(f"s_{j}_{c}_{i}")
                    )
        row = sel.agg(*aggs).collect()[0]
        books = [
            [
                (
                    [row[f"s_{j}_{c}_{i}"] / row[f"n_{j}_{c}"] for i in range(sub)]
                    if row[f"n_{j}_{c}"]
                    else books[j][c]
                )
                for c in range(ks)
            ]
            for j in range(m)
        ]
    return books


def pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 16,
    rerank: int = 0,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    dim: int = 64,
    exclude_self: bool = True,
    exact_decimal: bool = True,
    encode_mode: str = "expr",
) -> DataFrame:
    """ANN top-k by PQ asymmetric distance (ADC): per query, a lookup
    table of (subspace, centroid) → partial distance is precomputed
    once, and scoring a corpus vector is ``m`` table lookups summed —
    no float vector math on the scan.

    Scale shape: the LUT is queries × m × ks doubles (KB), shipped as
    literals inside the broadcast query row; the corpus side reads the
    CODES relation (32x smaller than the embeddings), stays map-side
    through scoring, and only the per-query top-k window shuffles.
    ``rerank > 0`` re-scores the top ``rerank*k`` ADC candidates with
    exact distances on the (partition-pruned) embedding rows — the
    standard recall knob.

    Exactly replayable: partial distances round at 6 dp and, with
    ``exact_decimal=True`` (default), accumulate in decimal so the
    DuckDB oracle's SUM matches the fold here bit-for-bit (no
    float-order dependence).  ``exact_decimal=False`` folds in double —
    still deterministic WITHIN Spark (fixed j-order fold), just not
    oracle-bit-matched, and ~2x faster on the scan (decimal math is the
    hot cost at millions of rows; measured in tools/stress.py) — the
    production setting.
    """
    books, codes = pq_encode(corpus, m, ks, corpus_id, corpus_vec, dim, encode_mode)
    q = queries.select(
        query_id, query_vec, _pq_lut(books, query_vec, m, ks, dim).alias("lut")
    )
    scored = codes.join(F.broadcast(q))
    return _adc_score_topk(
        scored, queries, corpus, k, m, rerank,
        query_id, corpus_id, query_vec, corpus_vec, exclude_self, exact_decimal,
    )


def _pq_lut(books, query_vec: str | Column, m: int, ks: int, dim: int) -> Column:
    """Per-query ADC lookup table: computed by the same Spark
    expressions that encode the corpus (never in Python — keeps
    rounding semantics identical).  ``query_vec`` may be a column
    name or an expression (the residual tier passes q − centroid)."""
    sub = dim // m
    vec = F.col(query_vec) if isinstance(query_vec, str) else query_vec
    luts = []
    for j in range(m):
        # constant-folded literal codebook + one transform lambda: the
        # old per-entry flat expansion generated m·ks·sub terms in one
        # projection and tripped janino's 64 KB method limit (VERDICT
        # r10 #5) — interpreted fallback on the probe's hottest column
        qsub = F.array(*[vec.getItem(j * sub + i).cast("double") for i in range(sub)])
        cents = F.array(*[_lit_vec(books[j][c]) for c in range(ks)])
        # closure factory, NOT a default arg: pyspark counts lambda
        # params, and a defaulted second param reads as (element, index)
        luts.append(F.transform(cents, (lambda q: lambda c: _l2_sub(q, c))(qsub)))
    return F.array(*luts)


def _adc_score_topk(
    scored: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    m: int,
    rerank: int,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    exclude_self: bool,
    exact_decimal: bool,
) -> DataFrame:
    """Shared ADC tail: fold the m LUT lookups into adist, take the
    per-query top-k, optionally re-rank exactly (pq_ann_topk and
    ivf_pq_ann_topk differ only in how candidates reach ``scored``)."""
    if exclude_self:
        scored = scored.filter(F.col(query_id) != F.col(corpus_id))

    def lookup(j):
        return F.element_at(F.element_at("lut", j + 1), F.element_at("code", j + 1) + 1)

    if exact_decimal:
        adist = F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("decimal(25,6)"),
            lambda acc, j: (acc + lookup(j).cast("decimal(25,6)")).cast("decimal(25,6)"),
        ).cast("double")
    else:
        adist = F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0), lambda acc, j: acc + lookup(j)
        )
    # project down to 3 narrow columns BEFORE the top-k window: the
    # exchange must carry (qid, vid, adist), never the 1 KB lut / code /
    # vector payload (measured 4x on the 1M-vector stress run: 54->14 s)
    scored = scored.select(F.col(query_id), F.col(corpus_id), adist.alias("adist"))
    w = W.partitionBy(query_id).orderBy(F.col("adist").asc(), F.col(corpus_id))
    pool = max(k, rerank * k) if rerank else k
    top = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= pool)
    if not rerank:
        return top.select(query_id, corpus_id, "adist", "rank")
    # exact re-rank: broadcast the tiny candidate pool back against the
    # corpus (BHJ — the corpus is scanned, never shuffled) and the
    # query vectors, then re-window inside the pool
    cand = top.select(query_id, corpus_id)
    exact = (
        corpus.select(corpus_id, corpus_vec)
        .join(F.broadcast(cand), corpus_id)
        .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
        .withColumn("edist", _l2(F.col(query_vec), F.col(corpus_vec)))
    )
    w2 = W.partitionBy(query_id).orderBy(F.col("edist").asc(), F.col(corpus_id))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "edist", "rank")
    )


def _centroid_array(cents, cell_col: Column) -> Column:
    """Per-row centroid vector as a literal CASE chain on the cell id
    (cells × dim literal nodes — the same budget _cell_scores already
    spends; stays whole-stage codegen, no join)."""
    expr = None
    for cid, cvec in cents:
        arr = _lit_vec(cvec)
        cond = cell_col == int(cid)
        expr = F.when(cond, arr) if expr is None else expr.when(cond, arr)
    return expr


def _residual(vec: Column, cvec: Column) -> Column:
    """v − centroid, element-wise in double (exact float32→double
    widening both engines, so the oracle replays it bit-for-bit)."""
    return F.zip_with(vec, cvec, lambda a, b: a.cast("double") - b)


def ivf_pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 2,
    m: int = 8,
    ks: int = 16,
    rerank: int = 0,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    dim: int = 64,
    exclude_self: bool = True,
    exact_decimal: bool = True,
    assign_mode: str = "expr",
    encode_mode: str = "expr",
    by_residual: bool = False,
    train_iters: int = 0,
    probe_mode: str = "expr",
) -> DataFrame:
    """IVF-PQ composition — the FAISS ``IVFx,PQy`` layout actually
    deployed at 100 TB: the coarse quantizer prunes WHICH vectors are
    scored (each query touches ~``nprobe/num_cells`` of the corpus,
    a partition-pruned scan once the codes land partitioned by
    ``cell``), and PQ compresses WHAT is read for scoring (the
    32:1-smaller codes relation; ADC = ``m`` lookups per candidate,
    no float vector math on the scan).  The two index structures
    multiply: IVF cuts candidate COUNT, PQ cuts candidate WIDTH —
    at 100 TB of embeddings neither alone keeps the scan I/O-bound.

    Composition of :func:`ivf_assign` (cells) + :func:`pq_encode`
    (codes, ``keep=cell``) + the shared ADC tail; ONE corpus scan
    builds both structures map-side (no shuffle).  Deterministic
    seed centroids and codebooks ⇒ fully SQL-replayable (q151's
    DuckDB oracle replays assignment, probing, encoding AND the
    decimal ADC fold); ``rerank`` re-scores top ``rerank*k``
    exactly — the recall knob, measured in tools/stress.py
    alongside a brute-force recall@10 with a CI floor.

    ``by_residual=True`` (FAISS's default) PQ-encodes the RESIDUAL
    ``v − centroid(cell)`` instead of the raw vector — the fix for
    PQ's tie-group failure on clustered data: raw-vector codebooks
    resolve inter-cluster structure only (every member of a tight
    cluster takes identical codes, so ADC cannot rank within the
    cluster and the rerank pool must swallow the whole tie group —
    measured in tests/test_llm.py), while residuals spread each
    cluster's noise ball around the origin where the codebook's
    resolution actually lands.  The LUT becomes per (query, probed
    cell) — q's residual differs per cell — which is the documented
    FAISS query-time cost of residual ADC; still KB-scale broadcast.
    Equally SQL-replayable: the residual is exact double arithmetic
    in both engines (q152's oracle).
    """
    cents, books, codes = _ivf_pq_build(
        corpus, num_cells, m, ks, dim, by_residual, train_iters,
        assign_mode, encode_mode, corpus_id, corpus_vec,
    )
    probes = _ivf_pq_probes(
        queries, cents, books, nprobe, m, ks, dim, by_residual, query_id, query_vec,
        probe_mode,
    )
    scored = codes.join(F.broadcast(probes), "cell")
    return _adc_score_topk(
        scored, queries, corpus, k, m, rerank,
        query_id, corpus_id, query_vec, corpus_vec, exclude_self, exact_decimal,
    )


def _ivf_pq_build(
    corpus: DataFrame,
    num_cells: int,
    m: int,
    ks: int,
    dim: int,
    by_residual: bool,
    train_iters: int,
    assign_mode: str,
    encode_mode: str,
    corpus_id: str,
    corpus_vec: str,
) -> tuple[list, list, DataFrame]:
    """IVF-PQ index construction — (centroids, codebooks, codes with
    cell).  ONE corpus scan builds both structures map-side; shared by
    the inline query path (:func:`ivf_pq_ann_topk`) and the persisted
    index writer (:func:`write_ivf_pq_index`)."""
    cents, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec, assign_mode)
    if by_residual:
        rcol = _residual(F.col(corpus_vec), _centroid_array(cents, F.col("cell")))
        src, vcol = assigned.select(corpus_id, rcol.alias("__rvec"), "cell"), "__rvec"
        seed_skip = num_cells  # the centroid rows' residuals are exactly zero
    else:
        src, vcol, seed_skip = assigned, corpus_vec, 0
    # Seed books need only the ks+skip smallest-id rows, and assignment/
    # residual are row-wise — so take the head off the RAW corpus scan
    # (TakeOrdered, no full-corpus assignment pass: collecting seeds
    # from ``src`` forced every row through cell assignment just to
    # keep 16-32 of them; r14, measured as the dominant build job) and
    # transform just those rows. Identical rows, identical books.
    head = corpus.select(corpus_id, corpus_vec).orderBy(corpus_id).limit(ks + seed_skip)
    if by_residual:
        head_src = _assign(head, cents, corpus_id, corpus_vec, assign_mode).select(
            corpus_id,
            _residual(F.col(corpus_vec), _centroid_array(cents, F.col("cell"))).alias(vcol),
        )
    else:
        head_src = head
    books = _pq_seed_books(head_src, vcol, corpus_id, m, ks, dim // m, skip=seed_skip)
    if train_iters:
        books = train_pq_codebooks(src, vcol, books, train_iters)
    books, codes = pq_encode(
        src, m, ks, corpus_id, vcol, dim, encode_mode, keep=("cell",), codebooks=books
    )
    return cents, books, codes


def _probes_arrow(
    queries: DataFrame,
    cents,
    books,
    nprobe: int,
    m: int,
    ks: int,
    dim: int,
    by_residual: bool,
    query_id: str,
    query_vec: str,
) -> DataFrame:
    """Arrow probe tier (r14): numerically identical to the expression
    path of :func:`_ivf_pq_probes` — cosine cell routing uses the
    :func:`_assign_arrow` contract (sequential fold, 6 dp half-away
    rounding; −0.0 and +0.0 order equal under numpy exactly as the
    rounded expression path's BigDecimal zero does under Java), probe
    order is ascending (−cos, cent_id) like the expr path's struct
    sort, the residual is the same float64 subtraction, and LUT
    entries replay the ``_l2_sub`` fold (sequential squared-diff sum,
    round 6 dp half-up — non-negative, so half-away == half-up; the
    :func:`pq_encode` arrow convention). Equivalence to the expr path
    is pytest-pinned for both residual modes. The win is DRIVER time:
    the expr probe tree (cells×dim cosine structs + m×ks×sub LUT
    lambdas, per projection step) cost ~3.6 s of construction/analysis
    per plan build against ~0.3 s of execution (q152 profile)."""
    import numpy as np
    import pandas as pd

    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    ids = np.array([cents[i][0] for i in order], dtype=np.int64)
    C = np.array([cents[i][1] for i in order], dtype=np.float64)  # (k, d)
    d = C.shape[1]
    cn = np.zeros(len(ids))
    for i in range(d):  # sequential fold == _norm
        cn += C[:, i] * C[:, i]
    cn = np.sqrt(cn)
    books_np = np.array(books)  # (m, ks, sub)
    sub = dim // m
    npr = min(nprobe, len(ids))

    def gen(batches):
        for pdf in batches:
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[query_vec]])
            if not len(pdf):
                continue
            dot = np.zeros((len(pdf), len(ids)))
            for i in range(d):  # sequential fold == _dot
                dot += x[:, i : i + 1] * C[None, :, i]
            qn = np.zeros(len(pdf))
            for i in range(d):
                qn += x[:, i] * x[:, i]
            cos = dot / (np.sqrt(qn)[:, None] * cn[None, :])
            cos = _round6_np(cos)  # 6 dp, F.round-exact incl. half boundaries
            out = {query_id: [], query_vec: [], "cell": [], "lut": []}
            for r in range(len(pdf)):
                probe_idx = np.lexsort((ids, -cos[r]))[:npr]
                for ci in probe_idx:
                    src = x[r] - C[ci] if by_residual else x[r]
                    lut = []
                    for j in range(m):
                        qsub = src[j * sub : (j + 1) * sub]
                        acc = np.zeros(ks)
                        for i in range(sub):  # sequential fold == _l2_sub
                            t = qsub[i] - books_np[j, :, i]
                            acc += t * t
                        lut.append(list(_round6_np(acc)))
                    out[query_id].append(pdf[query_id].iloc[r])
                    out[query_vec].append(pdf[query_vec].iloc[r])
                    out["cell"].append(ids[ci])
                    out["lut"].append(lut)
            yield pd.DataFrame(out)

    id_type = queries.schema[query_id].dataType.simpleString()
    vec_type = queries.schema[query_vec].dataType.simpleString()
    return queries.select(query_id, query_vec).mapInPandas(
        gen,
        schema=(
            f"{query_id} {id_type}, {query_vec} {vec_type}, "
            "cell long, lut array<array<double>>"
        ),
    )


def _cells_arrow(
    df: DataFrame,
    cents,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow cell ROUTER (r14): the (id, vec, cell) probe relation of
    the non-PQ paths, numerically identical to
    ``explode(slice(array_sort(_cell_scores(…)), 1, nprobe))`` — same
    rounded-cosine order, ties to the smaller cent_id (the
    :func:`_probes_arrow` contract, pytest-pinned)."""
    import numpy as np
    import pandas as pd

    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    ids = np.array([cents[i][0] for i in order], dtype=np.int64)
    C = np.array([cents[i][1] for i in order], dtype=np.float64)
    d = C.shape[1]
    cn = np.zeros(len(ids))
    for i in range(d):  # sequential fold == _norm
        cn += C[:, i] * C[:, i]
    cn = np.sqrt(cn)
    npr = min(nprobe, len(ids))

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            dot = np.zeros((len(pdf), len(ids)))
            qn = np.zeros(len(pdf))
            for i in range(d):  # sequential fold == _dot
                dot += x[:, i : i + 1] * C[None, :, i]
                qn += x[:, i] * x[:, i]
            cos = dot / (np.sqrt(qn)[:, None] * cn[None, :])
            cos = _round6_np(cos)  # 6 dp, F.round-exact incl. half boundaries
            out = {id_col: [], vec_col: [], "cell": []}
            for r in range(len(pdf)):
                for ci in np.lexsort((ids, -cos[r]))[:npr]:
                    out[id_col].append(pdf[id_col].iloc[r])
                    out[vec_col].append(pdf[vec_col].iloc[r])
                    out["cell"].append(ids[ci])
            yield pd.DataFrame(out)

    id_type = df.schema[id_col].dataType.simpleString()
    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, {vec_col} {vec_type}, cell long"
    )


def _ivf_pq_probes(
    queries: DataFrame,
    cents,
    books,
    nprobe: int,
    m: int,
    ks: int,
    dim: int,
    by_residual: bool,
    query_id: str,
    query_vec: str,
    probe_mode: str = "expr",
) -> DataFrame:
    """Per-query probe relation (query_id, query_vec, lut, cell) —
    shared by the inline and persisted-index paths."""
    if probe_mode == "arrow":
        return _probes_arrow(
            queries, cents, books, nprobe, m, ks, dim, by_residual, query_id, query_vec
        )
    if probe_mode != "expr":
        raise ValueError(f"unknown probe_mode {probe_mode!r}")
    if by_residual:
        # per-(query, probed cell) LUT over the query's residual — must
        # compute after the explode (it genuinely differs per cell).
        # The residual is materialized as its OWN projection before the
        # m*ks*sub element accesses of the LUT expand: inlined, each
        # access would re-embed the whole zip_with+centroid-CASE tree
        # (millions of expression nodes — measured driver OOM);
        # CollapseProject keeps the split because zip_with is non-cheap
        # and multiply-referenced.
        probes = queries.select(
            query_id,
            query_vec,
            F.explode(
                F.slice(F.array_sort(_cell_scores(F.col(query_vec), cents)), 1, nprobe)
            ).alias("__pr"),
        ).select(query_id, query_vec, F.col("__pr")["cent_id"].alias("cell"))
        qres = _residual(F.col(query_vec), _centroid_array(cents, F.col("cell")))
        return probes.withColumn("__qres", qres).select(
            query_id, query_vec, "cell", _pq_lut(books, "__qres", m, ks, dim).alias("lut")
        )
    # LUT computed BEFORE the probe explode: once per query, and
    # Generate just duplicates the value per probed cell
    # (post-explode it would re-evaluate the m*ks tree nprobe times)
    return queries.select(
        query_id,
        query_vec,
        _pq_lut(books, query_vec, m, ks, dim).alias("lut"),
        F.explode(
            F.slice(F.array_sort(_cell_scores(F.col(query_vec), cents)), 1, nprobe)
        ).alias("__pr"),
    ).select(query_id, query_vec, "lut", F.col("__pr")["cent_id"].alias("cell"))


def write_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    num_cells: int = 16,
    m: int = 8,
    ks: int = 16,
    dim: int = 64,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    by_residual: bool = False,
    train_iters: int = 0,
    assign_mode: str = "expr",
    encode_mode: str = "expr",
) -> int:
    """Persist an IVF-PQ index as a VERSIONED TABLE — the build-once /
    probe-many contract every production ANN deployment runs (FAISS
    builds codes+codebooks once and serves thousands of probes; the
    reference's analog is the compile-once memoized catalog,
    factory.py:651,673-679).  VERDICT r8's #1 gap.

    Layout: ONE versioned table at ``path`` whose rows are the PQ
    codes ``(corpus_id, cell, code array<int>)`` — range-clustered by
    ``cell`` so each data file covers ~one cell and the manifest's
    per-file [min, max] stats make a probe a partition-pruned scan
    (``read_version(prune=("cell", cells))`` hands Spark ONLY the
    probed cells' files).  The tiny model state — centroids, trained
    codebooks, every build parameter — rides in the manifest's
    ``meta`` (a few KB of JSON), so a prober needs ZERO Spark jobs to
    route queries, and time travel pins the exact index a training
    job probed.  Returns the committed version.

    The corpus itself is scanned once (cells + codes map-side, no
    shuffle) and the only exchange is the cell-clustering write — the
    LAST shuffle those codes ever pay.
    """
    from fdf_spark.sources.versioned import (
        commit_version,
        list_versions,
        partition_spec,
        set_partition_spec,
    )

    cents, books, codes = _ivf_pq_build(
        corpus, num_cells, m, ks, dim, by_residual, train_iters,
        assign_mode, encode_mode, corpus_id, corpus_vec,
    )
    out = codes.select(corpus_id, "cell", "code")
    # the layout rides the table's PARTITION SPEC: every writer — this
    # build, ivf_pq_add, or a plain commit_version — cell-clusters its
    # new files through commit_version's one spec mechanism.  Only a
    # path whose spec doesn't already say so needs the explicit
    # clustering + set-spec (a REBUILD on an indexed path would
    # otherwise range-shuffle the codes twice and append a duplicate
    # spec entry per rebuild).
    want = {"cols": ["cell"], "buckets": num_cells}
    has_spec = bool(list_versions(path)) and {
        k: partition_spec(path)[k] for k in ("cols", "buckets")
    } == want
    if not has_spec:
        out = out.repartitionByRange(num_cells, "cell").sortWithinPartitions("cell")
    meta = {
        "ivf_pq": {
            "cents": [[int(cid), [float(x) for x in vec]] for cid, vec in cents],
            "books": books,
            "params": {
                "num_cells": num_cells, "m": m, "ks": ks, "dim": dim,
                "corpus_id": corpus_id, "by_residual": by_residual,
                "train_iters": train_iters,
            },
        }
    }
    v = commit_version(out, path, mode="overwrite", meta=meta)
    if not has_spec:
        set_partition_spec(path, ["cell"], buckets=num_cells)
    return v


def read_ivf_pq_meta(path: str, version: int | None = None) -> dict:
    """The persisted index's model state (cents, books, params) in
    force at ``version`` (latest if None) — metadata only, zero Spark
    jobs.  Walks back to the nearest ancestor DATA commit carrying the
    model: metadata-only commits in the chain (set-spec at index
    creation, a later rename/optimize) don't re-state the model and
    must not break probes."""
    from fdf_spark.sources.versioned import _read_manifest, list_versions

    versions = list_versions(path)
    if not versions:
        raise FileNotFoundError(f"no index versions at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"version {v} not in {versions}")
    # walk back ONLY through commits that cannot have REPURPOSED the
    # table: metadata-only modes, OPTIMIZE (content-preserving), and
    # row DELETES (positional or equality — the sync path's masking
    # step removes code rows but the model still describes the rest).
    # A data commit without ivf_pq meta means the table was repurposed
    # — probing stale model state against unrelated rows must fail
    # loudly, not score garbage
    for cand in reversed([x for x in versions if x <= v]):
        m = _read_manifest(path, cand)
        meta = m["meta"].get("ivf_pq")
        if meta is not None:
            return {**meta, "version": v}
        if m.get("mode") not in (
            "rename", "drop", "widen", "set-spec", "optimize",
            "delete", "delete-eq", "analyze", "set-properties", "add_column",
        ):
            break
    raise ValueError(f"{path} v{v} is not an IVF-PQ index (no ivf_pq meta in chain)")


def ivf_pq_add(
    path: str,
    new_vectors: DataFrame,
    corpus_vec: str = "embedding",
    assign_mode: str = "expr",
    encode_mode: str = "expr",
) -> int:
    """Incrementally extend a persisted IVF-PQ index — FAISS ``add``:
    assign new vectors to the EXISTING cells, encode with the EXISTING
    codebooks, commit the new codes as an append.  No retraining, no
    rewrite of prior files; the appended files are cell-clustered like
    the originals so probes stay partition-pruned across commits, and
    the model meta is carried forward so a later ``ivf_pq_add`` /
    probe sees one consistent index.  Cost is one scan of the NEW
    vectors only.  Returns the committed version.
    """
    from fdf_spark.sources.versioned import commit_version

    idx = read_ivf_pq_meta(path)
    p = idx["params"]
    cents = [(cid, vec) for cid, vec in idx["cents"]]
    corpus_id = p["corpus_id"]
    assigned = _assign(new_vectors, cents, corpus_id, corpus_vec, assign_mode)
    if p["by_residual"]:
        rcol = _residual(F.col(corpus_vec), _centroid_array(cents, F.col("cell")))
        src, vcol = assigned.select(corpus_id, rcol.alias("__rvec"), "cell"), "__rvec"
    else:
        src, vcol = assigned, corpus_vec
    _, codes = pq_encode(
        src, p["m"], p["ks"], corpus_id, vcol, p["dim"], encode_mode,
        keep=("cell",), codebooks=idx["books"],
    )
    out = codes.select(corpus_id, "cell", "code")
    # the index's PARTITION SPEC normally makes commit_version
    # range-cluster the new files by cell (one clustering contract for
    # every writer); an index persisted BEFORE the spec wiring has no
    # set-spec commit in its chain, so fall back to explicit
    # clustering — the partition-pruned-probe invariant must hold for
    # appends to any index vintage
    from fdf_spark.sources.versioned import partition_spec

    if partition_spec(path)["cols"] != ["cell"]:
        out = out.repartitionByRange(p["num_cells"], "cell").sortWithinPartitions("cell")
    # the model meta is re-stated so each data commit is
    # self-describing (read_ivf_pq_meta walks back to the nearest one)
    model = {kk: vv for kk, vv in idx.items() if kk != "version"}
    return commit_version(out, path, mode="append", meta={"ivf_pq": model})


def sync_ivf_pq_index(
    spark,
    corpus_path: str,
    index_path: str,
    consumer_id: str = "ivf-pq-sync",
    corpus_vec: str = "embedding",
    assign_mode: str = "expr",
    encode_mode: str = "expr",
) -> dict:
    """Keep a persisted IVF-PQ index FOLLOWING a versioned corpus via
    the change feed (r14 — the composition the 100 TB embedding
    pipeline actually runs: the corpus table takes appends/updates/
    deletes all day; the index must track it without rebuilds).

    One sync = one poll of the corpus's per-commit feed
    (:func:`fdf_spark.sources.versioned.poll_changes`, keyed on the
    index's ``corpus_id``), then:

    1. EVERY changed id is equality-deleted from the index — the key
       relation is the tombstone, zero index scan; the sequence rule
       scopes the mask to code files present NOW, so codes added in
       step 2 stay live;
    2. inserted/updated vectors append through :func:`ivf_pq_add`
       (assign to existing cells, encode with existing codebooks —
       FAISS ``add``, no retrain);
    3. the feed offset is acknowledged LAST.

    At-least-once safe BY ORDER: a crash anywhere before the ack
    re-delivers the batch, and because step 1 deletes every changed id
    (including plain inserts — a no-op mask on first delivery), a
    replay converges to ONE live code row per id; acks themselves are
    create-if-absent markers, so racing sync workers cannot rewind
    each other.  Probes see a consistent index at every point: both
    steps are atomic commits, and between them the index is merely
    missing the batch (the same state as before the sync).  Delete
    debt accumulates as equality entries until ``optimize`` folds them
    — ``plan_maintenance`` surfaces that.  Cost per sync is
    O(changed rows) + O(that commit range's touched corpus files) —
    never O(corpus), never O(index).

    Returns ``{"synced_through", "added", "deleted"}`` (deleted counts
    changed IDS masked, not code rows).
    """
    from fdf_spark.sources.versioned import ack_changes, delete_keys, poll_changes

    idx = read_ivf_pq_meta(index_path)
    corpus_id = idx["params"]["corpus_id"]
    feed, thru = poll_changes(spark, corpus_path, consumer_id, keys=[corpus_id])
    if feed is None:
        return {"synced_through": thru, "added": 0, "deleted": 0}
    feed = feed.persist()
    try:
        changed = feed.select(corpus_id).distinct()
        n_changed = changed.count()
        if n_changed:
            delete_keys(spark, index_path, changed, [corpus_id])
        # the poll may span MANY commits, so one id can appear several
        # times (inserted in one commit, updated in a later one): the
        # index gets each id's FINAL image only — the newest
        # insert/postimage, and nothing if the id's last change is a
        # delete.  O(changed rows) window, never O(corpus).
        last = (
            feed.filter(F.col("_change_type") != "update_preimage")
            .withColumn(
                "__rn",
                F.row_number().over(
                    W.partitionBy(corpus_id).orderBy(
                        F.col("_commit_version").desc()
                    )
                ),
            )
            .filter(F.col("__rn") == 1)
        )
        adds = last.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(corpus_id, corpus_vec)
        n_add = adds.count()
        if n_add:
            ivf_pq_add(
                index_path, adds, corpus_vec=corpus_vec,
                assign_mode=assign_mode, encode_mode=encode_mode,
            )
    finally:
        feed.unpersist()  # own pin only
    ack_changes(corpus_path, consumer_id, thru)
    return {"synced_through": thru, "added": n_add, "deleted": n_changed}


def ivf_pq_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    version: int | None = None,
    rerank: int = 0,
    corpus: DataFrame | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
    exact_decimal: bool = True,
    probe_mode: str = "expr",
) -> DataFrame:
    """Probe a persisted IVF-PQ index (:func:`write_ivf_pq_index`) —
    identical results to the inline :func:`ivf_pq_ann_topk` with the
    same parameters, but the build never runs: centroids + codebooks
    come from the manifest meta (zero Spark jobs) and the codes scan
    is PARTITION-PRUNED to the probed cells via the manifest's
    per-file stats (``read_version(prune=("cell", cells))`` — the
    probe lists only the probed cells' files; pinned by
    ``tests/test_llm.py::test_ivf_pq_persisted_probe_pruned``).
    This is the O(probe) vs O(index build) difference measured in
    tools/stress.py.  ``version`` pins a snapshot (time travel);
    ``rerank`` needs the raw ``corpus`` vectors passed explicitly —
    the index stores codes only (32:1 smaller by design).
    """
    from fdf_spark.sources.versioned import read_version

    idx = read_ivf_pq_meta(path, version)
    p = idx["params"]
    if rerank and corpus is None:
        raise ValueError("rerank re-scores exact distances; pass the raw corpus")
    cents = [(cid, vec) for cid, vec in idx["cents"]]
    # the probe relation is materialized ONCE (localCheckpoint — it is
    # |queries| × nprobe narrow rows): the probed-cell set collected
    # below and the broadcast join both read the same evaluation, so a
    # nondeterministic queries source can never route a query to a
    # cell whose files were pruned away, and the query pipeline is not
    # computed twice
    probes = _ivf_pq_probes(
        queries, cents, idx["books"], nprobe, p["m"], p["ks"], p["dim"],
        p["by_residual"], query_id, query_vec, probe_mode,
    ).localCheckpoint()
    # the probed-cell set (bounded: ≤ num_cells values) prunes the
    # manifest file list before Spark ever plans the codes scan
    cells = sorted({r["cell"] for r in probes.select("cell").distinct().collect()})
    codes = read_version(spark, path, version, prune=("cell", cells)).filter(
        F.col("cell").isin(cells)
    )
    scored = codes.join(F.broadcast(probes), "cell")
    return _adc_score_topk(
        scored, queries, corpus, k, p["m"], rerank,
        query_id, p["corpus_id"], query_vec, corpus_vec, exclude_self, exact_decimal,
    )
