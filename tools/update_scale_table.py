"""Regenerate SCALE.md's stress table from a tools/stress.py log.

Usage: python tools/update_scale_table.py /tmp/stress.log "vintage note"

Keeps the hand-written row descriptions (keyed by the log's operator
name) and swaps in the measured rows/wall/throughput — so a vintage
refresh is one command and the table can never mix runs.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: log name -> table description (left column). New log rows missing
#: here fail loudly so the table never silently drops an operator.
DESCRIPTIONS = {
    "filter+groupBy agg": "filter + groupBy agg (q01)",
    "baseline subtract (A1)": "windowed baseline subtract (A1)",
    "as-of join (J4)": "as-of join, 1k keys (J4)",
    "exact dedup (N1)": "exact dedup, binary sha2 keys (N1)",
    "minhash 16 sigs (N2)": "MinHash 16-sig (N2)",
    "capped Jaccard pairs (N2)": "capped Jaccard pairs (N2), every doc sharing one boilerplate trigram",
    "capped Jaccard zipf-skew (N2)": "capped Jaccard, Zipf-skewed shingle frequencies (N2)",
    "CUBE 2-dim agg (q31)": "CUBE 2-dim agg (q31)",
    "explode+word topk (q34)": "explode + word top-k (q34)",
    "hash-Bernoulli 10% sample (q37)": "hash-Bernoulli 10% sample (q37)",
    "trailing range window (q33)": "trailing RANGE-frame window (q33)",
    "interval join 100k keys (ST4)": "interval join, 100k keys (ST4 batch twin)",
    "gradient (A10)": "non-uniform-grid gradient, 10k series (A10)",
    "simhash 48-bit (N2)": "SimHash 48-bit map-side fold (N2)",
    "pii detect+redact (N13)": "PII detect+redact, 6-regex chain (N13)",
    "decontaminate (N12)": "decontaminate vs 50k-doc benchmark (N12)",
    "dup spans (N2)": "span-level substring dedup (N2), 1% planted boilerplate",
    "mixture sample (N7)": "mixture sample, 100 sources (N7)",
    "semantic dedup (N14)": "semantic dedup, 64 cells (N14)",
    "cdc merge (N15)": "CDC merge, 1M-row change batch (N15)",
    "inverted index (N10)": "inverted index, 32 segments + hot stop-word (N10)",
    "pq adc topk (N3)": "PQ encode + ADC top-k, arrow encode (N3)",
    "kmeans 2 iters (N3)": "k-means 2 Lloyd iters, 32 cells, arrow assign (N3)",
    "pagerank 3 iters (N16)": "PageRank 3 iterations, 100k nodes (N16)",
    "vocab tokenize (N19)": "vocab tokenize, 50k vocab, arrow (N19)",
    "streaming dedup (ST5)": "streaming stateful dedup (ST5)",
    "count-min sketch (N20)": "Count–Min sketch build, 4×1024 (N20)",
    "lm train+score (N21)": "unigram-LM train + score, 100k vocab (N21)",
    "blocked fuzzy ER (N22)": "blocked fuzzy ER, 65k blocks (~29 M levenshtein pairs) (N22)",
    "ivm refresh (N23)": "IVM refresh, 1M-row signed delta (N23)",
    "shard assignment (N24)": "shard assignment, 256 token-balanced shards (N24)",
    "logreg 3-epoch train (N25)": "logreg 3-epoch batch-GD train, 8 dims (N25)",
    "logreg score (N25)": "logreg score, broadcast-literal weights (N25)",
    "pipeline dedup->shard (N24)": "COMPOSED pipeline: exact dedup → decontam → mixture → 64-shard assignment (q125 shape, N1+N12+N7+N24)",
    "webdataset write+read (N24)": "webdataset tar shards: write (parallel shard writers) + read + sample regroup, 1M two-member samples (N24 container tier)",
    "png decode (N6)": "REAL PNG decode (zlib inflate + unfilter), small gradient images (N6)",
    "jpeg decode (N6)": "REAL baseline-JPEG decode (python huffman + IDCT — correctness reference, not SIMD) (N6)",
    "gif decode (N6)": "REAL GIF/LZW decode + palette map (N6)",
    "adpcm decode (N6)": "REAL IMA-ADPCM decode, multi-block nibble streams (N6)",
    "flac decode (N6)": "REAL FLAC decode (rice + fixed predictors + CRC/MD5 verify) (N6)",
    "bloom build+prefilter (N5)": "Bloom join-prune: build over 1 M keys + zero-shuffle map-side prefilter of the probe side (N5)",
    "hll distinct sketch (N5)": "HLL distinct sketch + estimate, 20 M distinct keys (N5)",
}

#: rows column overrides where "Mrows" alone under-describes the input
ROWS_TEXT = {
    "as-of join (J4)": "50 M probes",
    "minhash 16 sigs (N2)": "2 M docs (24 M shingles)",
    "capped Jaccard pairs (N2)": "500 k docs",
    "capped Jaccard zipf-skew (N2)": "500 k docs",
    "explode+word topk (q34)": "240 M words",
    "trailing range window (q33)": "100 M, 10k series",
    "simhash 48-bit (N2)": "2 M docs (24 M tokens)",
    "pii detect+redact (N13)": "20 M docs",
    "decontaminate (N12)": "5 M docs (40 M shingles)",
    "dup spans (N2)": "2 M docs (34 M grams)",
    "mixture sample (N7)": "50 M docs",
    "semantic dedup (N14)": "50 k vectors",
    "cdc merge (N15)": "100 M base",
    "inverted index (N10)": "5 M docs",
    "pq adc topk (N3)": "1 M × 64-dim",
    "kmeans 2 iters (N3)": "1 M × 64-dim",
    "pagerank 3 iters (N16)": "5 M edges",
    "vocab tokenize (N19)": "5 M docs",
    "streaming dedup (ST5)": "5 M rows / 4 micro-batches",
    "count-min sketch (N20)": "50 M tokens",
    "lm train+score (N21)": "5 M docs (60 M tokens)",
    "blocked fuzzy ER (N22)": "2 M names",
    "ivm refresh (N23)": "100 M base",
    "shard assignment (N24)": "20 M docs",
    "logreg 3-epoch train (N25)": "20 M rows ×3 epochs",
    "logreg score (N25)": "20 M rows",
    "pipeline dedup->shard (N24)": "5 M docs",
    "webdataset write+read (N24)": "1 M samples (2 M members)",
    "png decode (N6)": "100 k images",
    "jpeg decode (N6)": "20 k images",
    "gif decode (N6)": "100 k images",
    "adpcm decode (N6)": "100 k clips",
    "flac decode (N6)": "50 k clips",
    "bloom build+prefilter (N5)": "100 M probe rows",
    "hll distinct sketch (N5)": "200 M rows",
}

ROW_RE = re.compile(r"^(.*?)\s{2,}([\d.]+) Mrows\s+([\d.]+) s\s+([\d.]+) Mrows/s")


def main(log_path: str, note: str) -> None:
    rows = []
    seen = []
    for line in Path(log_path).read_text().splitlines():
        m = ROW_RE.match(line.strip())
        if not m:
            continue
        name = m.group(1).strip()
        if name not in DESCRIPTIONS:
            raise SystemExit(f"no table description for stress row {name!r}")
        seen.append(name)
        mrows, wall, thr = float(m.group(2)), float(m.group(3)), m.group(4)
        rows_text = ROWS_TEXT.get(name, f"{mrows:g} M")
        thr_text = "\u2014" if float(thr) == 0.0 else thr
        rows.append(
            f"| {DESCRIPTIONS[name]} | {rows_text} | {wall:.1f} s | {thr_text} |"
        )
    missing = set(DESCRIPTIONS) - set(seen)
    if missing:
        raise SystemExit(f"log is missing stress rows: {sorted(missing)}")
    scale = (REPO / "SCALE.md").read_text()
    header = "| operator (plan shape) | rows | wall | Mrows/s |"
    pre, rest = scale.split(header, 1)
    # drop everything from the header through the old vintage paragraph
    # (the first blank-line-separated paragraph after the table)
    lines = rest.splitlines()
    i = 1  # skip the |---| separator handled below
    # skip separator + table rows
    while i < len(lines) and (lines[i].startswith("|") or not lines[i].strip()):
        if lines[i].startswith("|"):
            i += 1
        else:
            break
    # lines[i] is the blank line after the table; the vintage paragraph
    # follows until the next blank line
    while i < len(lines) and not lines[i].strip():
        i += 1
    while i < len(lines) and lines[i].strip():
        i += 1
    after = "\n".join(lines[i:])
    new = (
        pre
        + header
        + "\n|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n\n"
        + note
        + "\n\n"
        + after.lstrip("\n")
    )
    (REPO / "SCALE.md").write_text(new)
    print(f"SCALE.md table refreshed: {len(rows)} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
