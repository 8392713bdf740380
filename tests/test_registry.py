"""Pins the driver-visibility invariant: the external correctness driver
checks only the FIRST 50 registry entries, so those 50 must cover every
SURVEY §2 operator id (S3/O5 are n/a-by-design — pool management is
platform-owned on Spark; S9/X5 are pytest-only by design — plot sink and
method-inheritance have no tabular oracle surface).
"""

from __future__ import annotations

from fdf_spark.queries import PRIORITY, load_all

DRIVER_BUDGET = 50

# every §2 operator id that needs a driver-checked representative
REQUIRED_OPS = {
    "S1", "S2", "S4", "S5", "S6", "S7", "S8", "S10",
    "P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8",
    "J1", "J2", "J3", "J4", "J5", "J6", "J7",
    "A1", "A2", "A3", "A4", "A5", "A6", "A7", "A8", "A9",
    "O1", "O2", "O3", "O4",
    "U1", "U2", "U3",
    "F1", "F2", "F3", "F4", "F5", "F6", "F7", "F8", "F9",
    "F10", "F11", "F12", "F13",
    "ST1", "ST2", "ST3", "ST4",
    "X1", "X2", "X3", "X4",
    "N1", "N2", "N3", "N4", "N5", "N6", "N7", "N8", "N9", "N10",
    # round-4 additions: gradient, decontamination, PII redaction
    "A10", "N12", "N13",
    # round-5 guard hardening: chunking/packing and stateful streaming
    # dedup were the two newest SURVEY rows with no mechanical window
    # protection (VERDICT r4 "What's missing" #1)
    "N11", "ST5",
    # round-5 addition: semantic (embedding-level) dedup — SemDeDup
    "N14",
    # round-5 addition: CDC merge / upsert (MERGE INTO emulation)
    "N15",
    # round-5 addition: iterative graph analytics (PageRank; components
    # were already in via q74's N2 coverage, now declared first-class)
    "N16",
    # round-5 addition: table versioning / time travel (manifest model)
    "N17",
    # round-5 addition: data-quality expectations audit
    "N18",
    # round-5 addition: tokenization to token ids (vocab tier; BPE in pytest)
    "N19",
    # round-5 additions: Count-Min frequency sketch / heavy hitters,
    # unigram-LM quality scoring, blocked fuzzy record linkage, and
    # incremental materialized-view maintenance
    "N20", "N21", "N22", "N23",
    # round-5 addition: token-balanced training-shard export
    "N24",
    # round-5 addition: in-engine trained linear classifier (batch GD)
    "N25",
}


def test_priority_is_exactly_the_driver_window():
    # if PRIORITY grew past the budget, its tail would silently fall
    # OUTSIDE the driver's checked window while looking curated-in
    assert len(PRIORITY) == DRIVER_BUDGET


def test_priority_names_all_registered():
    reg = load_all()
    missing = [n for n in PRIORITY if n not in reg]
    assert not missing, f"PRIORITY references unregistered queries: {missing}"


def test_first_50_cover_all_operators():
    reg = load_all()
    window = list(reg.values())[:DRIVER_BUDGET]
    covered = {op for q in window for op in q.operators}
    missing = sorted(REQUIRED_OPS - covered)
    assert not missing, f"operators with no query in the driver's first-{DRIVER_BUDGET} window: {missing}"


def test_first_50_all_oracle_checked():
    # every query in the checked window carries a DuckDB oracle — even the
    # "approximate" operators (LSH banding, seeded-hyperplane ANN, DFT)
    # are deterministic and replayed exactly
    reg = load_all()
    window = list(reg.items())[:DRIVER_BUDGET]
    no_oracle = [n for n, q in window if q.sql is None]
    assert not no_oracle, f"rows-only queries in the checked window: {no_oracle}"


def test_registry_order_is_priority_prefix():
    reg = load_all()
    names = list(reg)
    expected = [n for n in PRIORITY if n in reg]
    assert names[: len(expected)] == expected


def test_oracle_output_types_are_driver_hashable(duck):
    """DESCRIBE every registered oracle and reject output columns whose
    DuckDB type arrives in pandas as ``Decimal`` objects (HUGEINT /
    UHUGEINT / DECIMAL).  The driver's value-hash is type-sensitive:
    an uncast ``SUM(bigint_col)`` types as HUGEINT and hash-mismatches
    a value-identical Spark int64 — the exact bug that shipped r5's
    q124/q125 failures.  Oracles must ``CAST(SUM(x) AS BIGINT)`` (the
    repo convention).  DESCRIBE only plans, so this lint is cheap and
    covers ALL registered oracles, not just the driver window.
    """
    from fdf_spark.queries import load_all
    from tests.conftest import SMOKE_DIR
    from tests.oracle_utils import register_duck_views

    register_duck_views(duck, SMOKE_DIR)
    offenders = []
    for name, q in load_all().items():
        if q.sql is None:
            continue
        for col, typ, *_ in duck.execute(f"DESCRIBE ({q.sql})").fetchall():
            if any(t in typ.upper() for t in ("HUGEINT", "UHUGEINT", "DECIMAL")):
                offenders.append((name, col, typ))
    assert not offenders, (
        f"oracle columns with driver-hash-hostile DuckDB types "
        f"(cast them, e.g. CAST(SUM(x) AS BIGINT)): {offenders}"
    )
