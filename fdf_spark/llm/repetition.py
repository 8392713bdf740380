"""Intra-document repetition metrics and the quality-filter funnel (N4).

Standard web-corpus curation signals (the Gopher/MassiveText and C4
filter families, public literature): highly repetitive documents —
boilerplate, keyword stuffing, scraper loops — are poor training data,
and the canonical detectors are duplicate-token and duplicate-n-gram
fractions. ``quality_funnel`` composes them into the ordered
keep/drop pipeline every corpus pass runs, attributing each dropped
document to the FIRST rule it fails (so rule counts are disjoint and
sum to total − kept, like a real funnel report).

Scale: one explode + (doc_id, gram) groupBy per n-gram order — the
same shuffle shape as word_shingles; per-doc outputs re-aggregate
map-side. The funnel is a single conditional aggregation over the
stats relation (no per-rule passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", mode: str = "arrow"
) -> DataFrame:
    """Per-document repetition profile → (id_col, n_words,
    dup_word_ratio, top_2gram_frac, dup_2gram_frac), ratios rounded to
    6 dp (oracle-portable int/int divisions).

    - ``dup_word_ratio``  = 1 − |distinct words| / |words|
    - ``top_2gram_frac``  = occurrences of the most frequent word
      2-gram / total 2-gram occurrences
    - ``dup_2gram_frac``  = fraction of 2-gram occurrences that are
      repeats (1 − distinct/total)

    Documents with fewer than 2 words have no 2-grams → null fracs.

    ``mode="arrow"`` (default, r15): all five counters are per-document
    quantities, so they compute in ONE Python pass inside the row's
    partition — no interpreted 2-gram ``transform`` (CodegenFallback),
    no (doc, gram) explode, no exchanges at all (the expression plan
    shuffled the exploded gram relation twice). Counts are exact ints
    either way and the ratio arithmetic/rounding stays in the JVM —
    bit-identical, pinned in pytest + oracle. ``mode="expr"`` keeps the
    expression plan.
    """
    if mode not in ("arrow", "expr"):
        raise ValueError(f"unknown repetition mode {mode!r}")
    from fdf_spark.sources.tables import spread

    if mode == "arrow":
        import pandas as pd

        def counters(batches):
            import re

            ws = re.compile(r"\s+", re.ASCII)
            for pdf in batches:
                ids, nw, nd, t2, top2, d2 = [], [], [], [], [], []
                for did, txt in zip(pdf[id_col], pdf[text]):
                    ids.append(did)
                    if txt is None:
                        nw.append(None); nd.append(None)
                        t2.append(None); top2.append(None); d2.append(None)
                        continue
                    w = ws.split(txt.lower())
                    nw.append(len(w))
                    nd.append(len(set(w)))
                    if len(w) >= 2:
                        counts: dict[str, int] = {}
                        for i in range(len(w) - 1):
                            g = w[i] + " " + w[i + 1]
                            counts[g] = counts.get(g, 0) + 1
                        t2.append(len(w) - 1)
                        top2.append(max(counts.values()))
                        d2.append(len(counts))
                    else:
                        t2.append(None); top2.append(None); d2.append(None)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "n_words": pd.Series(nw, dtype="Int32"),
                        "n_distinct_words": pd.Series(nd, dtype="Int32"),
                        "total2": pd.Series(t2, dtype="Int64"),
                        "top2": pd.Series(top2, dtype="Int64"),
                        "distinct2": pd.Series(d2, dtype="Int64"),
                    }
                )

        src = spread(df)
        id_type = src.schema[id_col].dataType.simpleString()
        out = src.select(id_col, text).mapInPandas(
            counters,
            schema=(
                f"{id_col} {id_type}, n_words int, n_distinct_words int,"
                " total2 long, top2 long, distinct2 long"
            ),
        )
    else:
        words = F.split(F.lower(F.col(text)), r"\s+")
        base = spread(df).select(F.col(id_col), words.alias("w"))
        uni = base.select(
            id_col,
            F.size("w").alias("n_words"),
            F.size(F.array_distinct("w")).alias("n_distinct_words"),
        )
        grams = base.select(
            F.col(id_col),
            F.explode(
                F.when(
                    F.size("w") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - 1),
                        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i, 2)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
        per_doc = per_gram.groupBy(id_col).agg(
            F.sum("c").alias("total2"),
            F.max("c").alias("top2"),
            F.count(F.lit(1)).alias("distinct2"),
        )
        out = uni.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "n_words",
        F.round(1.0 - F.col("n_distinct_words") / F.col("n_words"), 6).alias("dup_word_ratio"),
        F.round(F.col("top2") / F.col("total2"), 6).alias("top_2gram_frac"),
        F.round(1.0 - F.col("distinct2") / F.col("total2"), 6).alias("dup_2gram_frac"),
    )


#: (rule_name, SQL-ish predicate doc) in funnel order — a doc is dropped
#: by the FIRST rule it fails. Thresholds sit inside the fixture's value
#: ranges so every stage is exercised (see SCALE.md for the 100 TB rationale).
FUNNEL_RULES = (
    ("too_short", "n_words < 20"),
    ("dup_words", "dup_word_ratio > 0.6"),
    ("dup_2grams", "dup_2gram_frac > 0.1"),
)


def quality_funnel(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Ordered keep/drop funnel over :func:`repetition_stats` →
    (stage, rule, n_dropped, n_remaining), one row per rule plus the
    final ``kept`` row. ``n_remaining`` is the survivor count after the
    stage; attribution is first-failing-rule, so ``sum(n_dropped) +
    kept == total``."""
    stats = repetition_stats(df, text, id_col)
    first_fail = (
        F.when(F.col("n_words") < 20, F.lit("too_short"))
        .when(F.col("dup_word_ratio") > 0.6, F.lit("dup_words"))
        .when(F.col("dup_2gram_frac") > 0.1, F.lit("dup_2grams"))
        .otherwise(F.lit("kept"))
    )
    counts = stats.select(first_fail.alias("rule")).groupBy("rule").agg(
        F.count(F.lit(1)).alias("n")
    )
    stages = [(i + 1, name) for i, (name, _) in enumerate(FUNNEL_RULES)] + [
        (len(FUNNEL_RULES) + 1, "kept")
    ]
    from fdf_spark.sources.tables import local_df

    order = local_df(df.sparkSession, stages, "stage int, rule string")
    joined = order.join(counts, "rule", "left").select(
        "stage",
        "rule",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    # total and running drops from the same 4-row relation — no driver
    # action, no second pass over the stats
    total = F.sum("n").over(W.partitionBy())
    dropped = F.when(F.col("rule") != "kept", F.col("n")).otherwise(0)
    running = F.sum(dropped).over(W.orderBy("stage").rowsBetween(W.unboundedPreceding, 0))
    return (
        joined.select(
            "stage",
            "rule",
            dropped.cast("bigint").alias("n_dropped"),
            (total - running).cast("bigint").alias("n_remaining"),
        )
        .orderBy("stage")
    )
