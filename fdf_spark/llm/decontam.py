"""Benchmark decontamination (N12): flag training documents whose
word n-grams overlap a held-out evaluation/benchmark set.

Reference parity: none (no reference counterpart); part of the
training-data-pipeline surface the build brief adds. This is the
standard "n-gram decontamination" pass run before LLM pretraining:
any training document sharing enough n-grams with a benchmark document
leaks eval data and must be dropped.

Scale design (100 TB corpus vs a ~MB benchmark set):

- The benchmark shingle set is tiny (benchmarks are thousands of
  documents, not billions), so it is the **broadcast** side of the
  join — the corpus is never shuffled for the probe.
- Corpus shingles join against the broadcast set map-side on the
  8-byte portable hash; after the per-document dedup below, the only
  remaining exchange is the per-document aggregation, whose partial
  (map-side combine) reduces each task's output to one row per doc.
- The per-document DISTINCT shingle set needs one real exchange —
  but shingles are hashed to 8-byte keys BEFORE that distinct (the
  ``ngram_jaccard_pairs`` trick), so the shuffle moves fixed-width
  (doc_id, int64) pairs instead of raw ~25-byte shingle text, and a
  plain COUNT suffices afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fdf_spark.llm.dedup import word_shingles
from fdf_spark.llm.hashing import portable_hash60


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document benchmark-overlap profile.

    Returns ``(doc_id, n_shingles, n_hits, contamination, contaminated)``
    where ``contamination = n_hits / n_shingles`` over the document's
    *distinct* ``n``-gram set and ``contaminated`` flags documents at or
    above ``threshold``. Documents with fewer than ``n`` words have no
    shingles and report a zero profile (never flagged).
    """
    # hash BEFORE distinct: the dedup shuffle then moves 8-byte keys,
    # not shingle text (a 2^-60 collision is mirrored by the oracle's
    # identical hashing, never a mismatch)
    corpus_sh = (
        word_shingles(docs, text, id_col, n, distinct=False)
        .select(F.col(id_col), portable_hash60(F.col("shingle")).alias("sh"))
        .distinct()
    )
    bench_sh = (
        word_shingles(benchmark, text, id_col, n, distinct=False)
        .select(portable_hash60(F.col("shingle")).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    profile = (
        corpus_sh.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hits"),
        )
        .withColumn(
            "contamination", F.round(F.col("n_hits") / F.col("n_shingles"), 6)
        )
    )
    # documents too short to have any n-gram still get a row
    base = docs.select(F.col(id_col)).join(profile, id_col, "left")
    return base.select(
        id_col,
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.coalesce("contamination", F.lit(0.0)).alias("contamination"),
        (F.coalesce("contamination", F.lit(0.0)) >= threshold).alias("contaminated"),
    )
