"""In-engine linear-model training: logistic regression by batch
gradient descent (N25) — the trained-classifier tier of quality
filtering (the FineWeb/DCLM recipe: a small trained model, not a
heuristic, decides what enters the corpus).

This closes the train/score loop INSIDE the engine the same way the
k-means quantizer (similarity.kmeans_refine) and BPE learner
(tokenize.learn_bpe) do: each GD iteration is ONE distributed
aggregate over the feature relation (map-side combined, a (dim+1)-value
result row collected to the driver), the weight update is driver-side
arithmetic on that tiny vector, and the next iteration broadcasts the
new weights back as literals. Iterations × one-pass-per-iteration —
the textbook distributed batch-GD shape; at 100 TB you persist the
feature relation once and each epoch is one scan.

Engine-replayable determinism (the PageRank pattern): per-row gradient
contributions are rounded to 6 dp BEFORE the decimal(25,6) sum, so
sums are order-independent and the DuckDB oracle replays training
bit-for-bit; the learning rate is a power of two (0.5) so the driver-
side update multiplies exactly; weight updates round HALF_UP to 6 dp
via ``decimal`` (NOT python's banker's ``round``), matching Spark's
and DuckDB's ``round`` semantics.

Reference parity: none (no reference counterpart); part of the
training-data-pipeline surface the build brief adds.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fdf_spark.functions.scalar import dsum

DEFAULT_LR = 0.5  # power of two: driver-side w + lr*g multiplies exactly


def _round6(x: float) -> float:
    """HALF_UP 6-dp round matching Spark/DuckDB ``round`` (python's
    built-in round is banker's and would diverge on .5 boundaries)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _z(cols: list[Column], w: list[float], bias: float) -> Column:
    """round-6dp linear score w·x + b (rounding pins the sigmoid input
    so a 1-ulp exp() difference between engines cannot surface)."""
    if len(cols) != len(w):
        raise ValueError(f"weight/feature dimension mismatch: {len(w)} vs {len(cols)}")
    z = F.lit(float(bias))
    for c, wj in zip(cols, w):
        z = z + F.lit(float(wj)) * c
    return F.round(z, 6)


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    feats: DataFrame,
    x_cols: list[str],
    y_col: str,
    iters: int = 3,
    lr: float = DEFAULT_LR,
) -> tuple[list[float], float]:
    """Batch-GD logistic regression; returns (weights, bias).

    One aggregate scan per iteration; gradient = mean over rows of
    ``(y − σ(w·x+b))·x_j`` with per-row 6-dp rounding before the
    decimal sum. Persist ``feats`` for multi-iteration training — each
    iteration is one pass over it.
    """
    dim = len(x_cols)
    w, b = [0.0] * dim, 0.0
    xs = [F.col(c) for c in x_cols]
    y = F.col(y_col)
    for _ in range(iters):
        resid = F.round((y - _sigmoid(_z(xs, w, b))), 6)
        aggs = [dsum(F.round(resid * c, 6)).alias(f"g{j}") for j, c in enumerate(xs)]
        aggs.append(dsum(resid).alias("gb"))
        aggs.append(F.count("*").alias("n"))
        row = feats.agg(*aggs).collect()[0]
        n = row["n"]
        if not n:
            raise ValueError("train_logreg: empty feature relation")
        w = [_round6(wj + lr * row[f"g{j}"] / n) for j, wj in enumerate(w)]
        b = _round6(b + lr * row["gb"] / n)
    return w, b


def score_logreg(
    feats: DataFrame,
    x_cols: list[str],
    w: list[float],
    bias: float,
) -> DataFrame:
    """Append ``p`` (round-6dp probability) and ``pred`` (p ≥ 0.5)."""
    p = F.round(_sigmoid(_z([F.col(c) for c in x_cols], w, bias)), 6)
    return feats.withColumn("p", p).withColumn("pred", F.col("p") >= 0.5)
