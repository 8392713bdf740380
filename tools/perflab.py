"""Optimization lab (r14; plans dir r15 since r15): per-query timing + plan capture.

``python tools/perflab.py [--sf DIR] [--runs N] [--plans-to SUBDIR] [names...]``

For each named query (default: the bench HEADLINE set) on the bench
session (same confs/master/core count as bench.py):

- times ``N`` noop-sink executions (guide §1.4) and prints min/median,
- writes ``plans/r15/<name>_<suffix>.txt`` with the
  ``explain("formatted")`` output (suffix from ``--plans-to``,
  default ``before``), so plan-shape claims in OPTIMIZATION_r15.md are
  checkable without running Spark.

Jobs are labelled (guide §1.5) so the UI/event log attributes stages.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdf_spark.queries import load_all
from fdf_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench

    names = args.names or bench.HEADLINE
    spark = get_spark("perflab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r15"
    plans_dir.mkdir(parents=True, exist_ok=True)

    # same warmup as bench.py so timings are comparable
    import os

    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(args.sf, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")), F.count("*")
    ).write.format("noop").mode("overwrite").save()
    warm = spark.range(0, 64, 1, 32).groupBy(F.col("id") % 32)
    warm.applyInPandas(lambda pdf: pdf, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        q = registry[name]
        if not args.no_plans:
            df = q.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}_{args.suffix}.txt").write_text(plan)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": min(runs),
            "med": round(statistics.median(runs), 4),
            "runs": runs,
        }
        print(name, json.dumps(out[name]), flush=True)
    print("TOTAL_MIN", round(sum(v["min"] for v in out.values()), 4))
    spark.stop()


if __name__ == "__main__":
    main()
