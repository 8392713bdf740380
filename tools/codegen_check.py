"""Whole-stage-codegen compile guard over the full query registry.

``python tools/codegen_check.py [sf_dir] [names...]`` — runs every
registered query with ``spark.sql.codegen.fallback=false`` so a janino
compile failure (normally a silent fall-back to interpreted evaluation
— a real perf cliff at scale, VERDICT r10 #5) raises instead, and the
offending query is named.  Compile failures are plan-size-dependent,
not data-dependent, so sf0.001 reproduces what the sf0.01 sweep saw.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdf_spark.queries import load_all
from fdf_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(
        "codegen_check",
        extra_conf={
            "spark.sql.codegen.fallback": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[tuple[str, str]] = []
    for name, q in load_all().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"OK   {name} {time.perf_counter() - t0:5.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — reporting tool
            msg = " ".join(str(e).split())
            bad.append((name, msg))
            print(f"FAIL {name}: {msg[:500]}", flush=True)
    print(f"\n{len(bad)} compile-strict failures")
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
