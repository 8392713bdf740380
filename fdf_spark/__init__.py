"""fdf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Fusion-Data-Framework/fdf.

The reference (/root/reference, cited throughout as ``factory.py:NN`` etc.)
is a lazy, metadata-driven signal-access layer for fusion experiments.
This package re-expresses its semantics Spark-first:

- signals are long-format partitioned tables (shot, time[, axis...], value)
  instead of dense numpy arrays with attached axis objects;
- the XML module catalog becomes a declarative catalog registry compiled
  to DataFrame view definitions (``fdf_spark.catalog``);
- lazy-until-indexed materialization is Spark's own lazy plan + action;
- nearest-sample selection / as-of alignment / positional slicing are
  library operators compiling to native Catalyst plans
  (``fdf_spark.operators``);
- the logbook is a plain DataFrame with pushed-down predicates;
- the event bus is Structured Streaming (``fdf_spark.streaming``);
- beyond the reference: LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) in ``fdf_spark.llm``.

Everything is designed for a 1000-executor / 100 TB deployment and
tested locally against deterministic parquet fixtures with a DuckDB
oracle.
"""

__version__ = "0.1.0"

from fdf_spark.session import get_spark  # noqa: F401
