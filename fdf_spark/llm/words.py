"""THE corpus word tokenizer — single definition shared by every
corpus-level operator (BM25/inverted index, unigram-LM scoring, shard
export, block packing, word top-k).

Oracle-parity contract (pinned here once, not per call site):

    Spark : filter(split(lower(text), '[^a-z]+'), w -> w <> '')
    DuckDB: list_filter(string_split_regex(lower(text), '[^a-z]+'),
                        x -> x <> '')

A tokenization change MUST happen here and in every oracle SQL string
together, or Spark and DuckDB silently diverge. (The per-doc stats
operators in ``textstats`` intentionally use the *whitespace* splitter
``\\s+`` instead — that family counts raw whitespace-delimited tokens,
not letter runs.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT_RE = "[^a-z]+"


def corpus_words(text: Column | str) -> Column:
    """Array of lowercase letter-run words, empties removed."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), WORD_SPLIT_RE), lambda w: w != F.lit(""))
