"""Property pinning for the transform-pruning foundations.

Two invariants everything in hidden partitioning rests on:

1. The driver-side Murmur3 port is BIT-FOR-BIT ``F.hash`` — checked
   over a large randomized + boundary-value corpus in one Spark job per
   type (a single wrong bucket image silently prunes the file holding a
   key, so breadth matters more here than in any other port).
2. ``_predicate_bounds`` is a SUPERSET guarantee: for randomized
   conjunctive predicates, every row SATISFYING the predicate must lie
   inside the derived per-column bounds — a bound that excludes a
   matching row is precisely the bug class that makes delete_where
   silently skip rows (the lossy-cast finding).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fdf_spark.functions.spark_hash import spark_hash
from fdf_spark.sources.versioned import _predicate_bounds


def test_murmur3_port_bulk(spark):
    rng = random.Random(0xFDF11)
    ints = (
        [0, 1, -1, 2**31 - 1, -(2**31), 42, -42, 2**16, -(2**16)]
        + [rng.randint(-(2**31), 2**31 - 1) for _ in range(400)]
    )
    longs = (
        [0, 1, -1, 2**63 - 1, -(2**63), 2**32, -(2**32), 2**53, 2**53 + 1]
        + [rng.randint(-(2**63), 2**63 - 1) for _ in range(400)]
    )
    alphabet = "abcdefghijklmnopqrstuvwxyzABCXYZ 0123456789_-.,;é€中日ß😀"
    strs = ["", " ", "a" * 1, "ab", "abc", "abcd", "abcde", "é", "😀", "x" * 257] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 64)))
        for _ in range(400)
    ]
    bins = [b"", b"\x00", b"\x7f\x80\xff", bytes(range(256))] + [
        bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 64))) for _ in range(200)
    ]
    for vals, pt, t in (
        (ints, "int", "int"),
        (longs, "bigint", "long"),
        (strs, "string", "string"),
        (bins, "binary", "binary"),
    ):
        rows = spark.createDataFrame([(v,) for v in vals], f"v {pt}").select(
            "v", F.hash("v").alias("h")
        ).collect()
        for r in rows:
            assert spark_hash(r.v, t) == r.h, (t, r.v)


def _rand_predicate(rng):
    """A random conjunction of atoms over (k long, g int, s string),
    mixing derivable atoms with ones _predicate_bounds must ignore."""
    atoms = []
    for _ in range(rng.randint(1, 4)):
        col = rng.choice(["k", "g", "s"])
        if col == "s":
            atoms.append(rng.choice([
                F.col("s") == "c3", F.col("s") >= "c1", F.col("s").isNotNull(),
            ]))
        else:
            v = rng.randint(-5, 25)
            c = F.col(col)
            atoms.append(rng.choice([
                c == v, c < v, c <= v, c > v, c >= v,
                c.isin(v, v + 3, v + 7),
                (c % 3) == 1,          # non-derivable: must contribute nothing
                c.cast("double") < float(v),  # exact widening: derivable
            ]))
    pred = atoms[0]
    for a in atoms[1:]:
        pred = pred & a
    return pred


def test_predicate_bounds_superset_property(spark):
    rows = [(k, k % 13 - 3, f"c{k % 7}") for k in range(-20, 40)]
    df = spark.createDataFrame(rows, "k long, g int, s string")
    schema = df.schema
    rng = random.Random(20260816)
    checked = 0
    for _ in range(40):
        pred = _rand_predicate(rng)
        bounds = _predicate_bounds(spark, schema, pred)
        matching = df.filter(pred).collect()
        for r in matching:
            for col, (lo, hi) in bounds.items():
                v = r[col]
                assert v is not None, (str(pred), col)
                if lo is not None:
                    assert not v < lo, (str(pred), col, v, lo)
                if hi is not None:
                    assert not v > hi, (str(pred), col, v, hi)
        checked += len(matching)
    assert checked > 50  # the corpus actually exercised the bounds
