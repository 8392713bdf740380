"""LLM-data-pipeline operators (SURVEY §2.11 N1-N5) — the north-star
extension surface: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding), similarity search (brute-force + LSH ANN), text
analysis, and multimodal column plumbing, all designed for 100 TB
document corpora.
"""

from fdf_spark.llm.dedup import (  # noqa: F401
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from fdf_spark.llm.similarity import cosine_topk, knn_predict, lsh_ann_topk  # noqa: F401
from fdf_spark.llm.textstats import fingerprint, language_id, text_stats  # noqa: F401
