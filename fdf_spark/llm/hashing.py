"""Engine-portable hashing for dedup/sketch operators.

Spark's native ``F.hash``/``F.xxhash64`` are fast but engine-specific;
oracle-checked operators instead use a 60-bit hash derived from MD5
(first 15 hex digits), which any engine can reproduce:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

60 bits keeps the value inside a signed int64 in both engines. The
non-oracle scale paths (LSH bucketing, ANN) are free to use
``F.xxhash64`` — collisions there only affect candidate generation,
not correctness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column, seed: Column | int | None = None) -> Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    if seed is not None:
        seed_col = F.lit(seed) if isinstance(seed, int) else seed
        col = F.concat(seed_col.cast("string"), F.lit(":"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str, seed_expr: str | None = None) -> str:
    """DuckDB twin of :func:`portable_hash60`."""
    if seed_expr is not None:
        expr = f"CAST(({seed_expr}) AS VARCHAR) || ':' || ({expr})"
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
