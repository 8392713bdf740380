"""End-to-end training-data pipeline demo.

``python tools/pipeline_demo.py [sf_dir] [out_dir]`` — runs the full
curation chain on the fixture corpus and lands TRAINER-READY artifacts:

    documents
      → exact dedup                 (llm/dedup.py, N1)
      → benchmark decontamination   (llm/decontam.py, N12)
      → PII redaction               (llm/pii.py, N13)
      → quality scoring + cut       (llm/lmscore.py, N21)
      → weighted mixture sample     (llm/mixing.py, N7)
      → token-balanced shard ids    (llm/sharding.py, N24)
      → webdataset tar shards       (llm/webdataset.py)   out/wds/
      → binary token shards         (llm/tokenbin.py)     out/tokbin/

Every stage is the same oracle-checked operator the query registry
drives; this script only composes them and prints the manifests.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fdf_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01", out_dir: str = "/tmp/fdf_pipeline_demo") -> None:
    from fdf_spark.llm.decontam import decontaminate
    from fdf_spark.llm.dedup import exact_dedup
    from fdf_spark.llm.lmscore import score_docs, train_unigram_lm
    from fdf_spark.llm.mixing import mix_corpus
    from fdf_spark.llm.pii import redact_text
    from fdf_spark.llm.sharding import assign_token_shards
    from fdf_spark.llm.tokenbin import codepoint_tokenize, write_token_bin_shards
    from fdf_spark.llm.webdataset import write_webdataset
    from fdf_spark.sources.tables import load_table

    spark = get_spark("pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    surv = exact_dedup(docs).select("doc_id").persist()
    sdocs = docs.join(surv, "doc_id", "left_semi")
    n1 = sdocs.count()

    bench = sdocs.filter(F.col("doc_id") % 97 == 0)
    prof = decontaminate(sdocs, bench, n=3, threshold=0.2)
    clean_ids = prof.filter(~F.col("contaminated")).select("doc_id").persist()
    clean = sdocs.join(clean_ids, "doc_id", "left_semi")
    n2 = clean.count()

    clean = clean.withColumn("text", redact_text(F.col("text")))

    lm = train_unigram_lm(clean)
    scored = score_docs(clean, lm)
    keep = scored.orderBy(F.desc("avg_logp")).limit(int(n2 * 0.9)).select("doc_id")
    quality = clean.join(F.broadcast(keep), "doc_id", "left_semi")
    n3 = quality.count()

    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    mixed = mix_corpus(quality, weights, budget_tokens=50_000)
    shards = assign_token_shards(mixed, n_shards=8, tokens_col="n_tokens")
    final = quality.join(shards.select("doc_id", "shard"), "doc_id")
    n4 = final.count()

    # container tier 1: webdataset tar shards (text + json sidecar)
    wds_dir = os.path.join(out_dir, "wds")
    members = (
        final.select(
            F.format_string("%08d", F.col("doc_id")).alias("key"),
            F.lit("txt").alias("ext"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        .unionByName(
            final.select(
                F.format_string("%08d", F.col("doc_id")).alias("key"),
                F.lit("json").alias("ext"),
                F.encode(F.to_json(F.struct("source", "shard")), "UTF-8").alias("payload"),
            )
        )
        .repartition(8, "key")
        .sortWithinPartitions("key")
    )
    wds_manifest = [r.asDict() for r in write_webdataset(members, wds_dir).collect()]

    # container tier 2: binary token shards
    tok_dir = os.path.join(out_dir, "tokbin")
    toks = codepoint_tokenize(final).join(final.select("doc_id", "shard"), "doc_id")
    tok_manifest = [
        r.asDict() for r in write_token_bin_shards(toks, tok_dir).collect()
    ]

    summary = {
        "sf_dir": sf_dir,
        "docs_in": n0,
        "after_exact_dedup": n1,
        "after_decontamination": n2,
        "after_quality_cut": n3,
        "in_final_mixture": n4,
        "webdataset_shards": wds_manifest,
        "tokenbin_shards": tok_manifest,
        "wall_sec": round(time.time() - t0, 2),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "pipeline_manifest.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
