"""Tokenization to token IDS (not just counts — textstats.py does
counting): the encode step a training-data pipeline runs last, after
curation, to emit model-ready sequences.

Two tiers, mirroring the repo's oracle discipline:

- :func:`tokenize_vocab` — word-level vocabulary encode with
  character fallback (each word → its vocab id, else its characters'
  ids, else UNK).  Fully declarative (map literal + higher-order array
  functions, zero Python row code, zero shuffles) and exactly
  replayable in a DuckDB oracle — the driver-checkable tier.
- :func:`tokenize_bpe` — real byte-pair-encoding with a learned merge
  list, Arrow-batched ``mapInPandas`` (the merge loop is inherently
  iterative per word — not expressible as finite column algebra).
  Property-tested against a pure-Python reference implementation;
  :func:`learn_bpe` trains the merge list with a distributed pair-count
  corpus scan per merge.

Scale: both encoders are map-side over a broadcast vocabulary (vocab
and merge lists are KBs–MBs; real 50k-token vocabs still broadcast
trivially).  ``learn_bpe``'s per-merge cost is one corpus scan + one
pair-count aggregate — at 100 TB one trains on a hash-sampled slice
(llm/hashing.py) exactly as production tokenizers do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNK_ID = 0


def _word_split(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda w: w != F.lit(""))


def tokenize_vocab(
    df: DataFrame,
    vocab: dict[str, int],
    text: str = "text",
    id_col: str = "doc_id",
    mode: str = "expr",
) -> DataFrame:
    """→ (id_col, token_ids array<int>): greedy word-level encode with
    per-character fallback — word in vocab → its id; else each char's
    id; unknown chars → UNK_ID (0).  ``vocab`` ids must be ≥ 1.

    Both modes are one scan, zero shuffles; the split is vocab SIZE:

    - ``mode="expr"``: pure column algebra over a ``create_map``
      literal — no Python anywhere, exactly SQL-replayable.  Only for
      small vocabs: Catalyst chokes on a 50k-entry map literal
      (analysis/codegen blow up — measured a >10 min hang at 100k
      expressions), so this tier is for the oracle-checked shape and
      char-level/POC vocabs.
    - ``mode="arrow"``: Arrow-batched ``mapInPandas`` with the vocab
      dict closure-shipped (pickled once per task, like a broadcast
      var) — the production tier for real 50k+ vocabs; equivalence to
      expr mode is pytest-asserted on a shared small vocab.
    """
    if any(v <= UNK_ID for v in vocab.values()):
        raise ValueError("vocab ids must be >= 1 (0 is reserved for UNK)")
    if mode == "arrow":
        import pandas as pd

        def encode(batches):
            get = vocab.get
            for pdf in batches:
                out = []
                for t in pdf[text]:
                    ids: list[int] = []
                    for w in _py_word_split(t):
                        wid = get(w)
                        if wid is not None:
                            ids.append(wid)
                        else:
                            ids.extend(get(c, UNK_ID) for c in w)
                    out.append(ids)
                yield pd.DataFrame({id_col: pdf[id_col], "token_ids": out})

        return df.select(id_col, text).mapInPandas(
            encode, schema=f"{id_col} long, token_ids array<int>"
        )
    if mode != "expr":
        raise ValueError(f"unknown mode {mode!r}")
    vmap = F.create_map(*[F.lit(x) for kv in vocab.items() for x in kv])
    words = _word_split(F.col(text))
    per_word = F.transform(
        words,
        lambda w: F.when(vmap[w].isNotNull(), F.array(vmap[w].cast("int"))).otherwise(
            F.transform(
                F.split(w, ""),
                lambda c: F.coalesce(vmap[c].cast("int"), F.lit(UNK_ID)),
            )
        ),
    )
    return df.select(F.col(id_col), F.flatten(per_word).alias("token_ids"))


# --- real BPE ---------------------------------------------------------------


def _bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference merge loop (also used inside the UDF): repeatedly merge
    the lowest-rank adjacent pair, leftmost first on rank ties."""
    pieces = list(word)
    while len(pieces) > 1:
        best, best_rank = None, None
        for i in range(len(pieces) - 1):
            r = ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        pieces[best : best + 2] = [pieces[best] + pieces[best + 1]]
    return pieces


def tokenize_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, pieces array<string>): byte-pair encoding with the
    learned ``merges`` list (rank = list position), Arrow-batched.

    The merge loop is per-word iterative — the honest UDF case.  The
    ranks dict is closure-captured (broadcast with the task), and the
    output is pieces per document in word order.
    """
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for t in pdf[text]:
                pieces: list[str] = []
                for w in _py_word_split(t):
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _bpe_encode_word(w, ranks)
                    pieces.extend(got)
                out.append(pieces)
            yield pd.DataFrame({id_col: pdf[id_col], "pieces": out})

    return df.select(id_col, text).mapInPandas(encode, schema=f"{id_col} long, pieces array<string>")


def _py_word_split(t: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _pruned_vocab(df: DataFrame, text: str, min_count: int) -> DataFrame:
    """The (word, count) relation :func:`learn_bpe` collects — pruning
    pushed into the counted relation so the junk tail never crosses to
    the driver.  Exposed so the collected-row bound
    (rows ≤ corpus_tokens / min_count for min_count > 1) is pinned by
    a property test against the ACTUAL collect path, not re-derived."""
    words = df.select(F.explode(_word_split(F.col(text))).alias("w")).groupBy("w").count()
    if min_count > 1:
        # the filter runs on the executors; words seen fewer than
        # min_count times are dropped distributed-side
        words = words.filter(F.col("count") >= min_count)
    return words


def learn_bpe(
    df: DataFrame, num_merges: int = 50, text: str = "text", min_count: int = 1
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from the corpus: ``num_merges`` rounds of
    (count adjacent pairs weighted by word frequency, merge the most
    frequent — ties to the lexicographically smaller pair, for
    determinism).

    The corpus is scanned ONCE: a distributed word-frequency count
    (explode → map-side-combining groupBy).  The merge loop then runs
    driver-side over the (distinct word, count) vocabulary — tiny
    relative to the corpus by Zipf's law for CLEAN text, which is how
    fastBPE-style trainers work too.  But 100 TB of web text has a
    heavy junk tail (unicode soup, base64 blobs) where the distinct
    vocabulary itself stops fitting a driver, so ``min_count`` prunes
    the count relation DISTRIBUTED-side before the collect: words
    seen fewer than ``min_count`` times are dropped.  The driver then
    holds O(words with count >= min_count) <= corpus_tokens/min_count
    rows — a bound the CALLER controls regardless of how pathological
    the tail is.  ``min_count=1`` (default) collects the full
    vocabulary, bit-identical to the unpruned trainer.  Deterministic:
    no sampling inside; at 100 TB the caller feeds a hash-sampled
    slice (llm/hashing.py) and a min_count matched to it.
    """
    merges: list[tuple[str, str]] = []
    word_counts = [
        (r["w"], r["count"]) for r in _pruned_vocab(df, text, min_count).collect()
    ]
    # the vocab of distinct words is tiny relative to the corpus (Zipf);
    # the merge loop itself runs driver-side over (word, count) pairs —
    # the distributed part is the word count above. This is how fastBPE
    # and friends train; the corpus is scanned ONCE.
    enc = {w: list(w) for w, _ in word_counts}
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts:
            p = enc[w]
            for i in range(len(p) - 1):
                pair_counts[(p[i], p[i + 1])] = pair_counts.get((p[i], p[i + 1]), 0) + c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        for w in enc:
            p = enc[w]
            i, out = 0, []
            while i < len(p):
                if i < len(p) - 1 and p[i] == a and p[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(p[i])
                    i += 1
            enc[w] = out
    return merges
