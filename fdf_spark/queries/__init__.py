"""Oracle-checked query registry.

Every operator in SURVEY §2 is exercised by at least one named query
here. Each entry pairs a Spark DataFrame program with (where
SQL-expressible) an ANSI-SQL oracle that DuckDB runs over the same
parquet; the driver hash-compares the two at sf0.01.

Registration is decorator-based so the per-domain modules
(relational / fusion / llm / streaming) stay independent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    operators: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids
    doc: str = ""


REGISTRY: dict[str, Query] = {}


#: hard ceiling on what materialize_and_cleanup will drag through the
#: driver — audit relations are dozens of rows; anything near this is a
#: query wired through the wrong path, and failing loudly here beats a
#: silent driver-side materialization of a large relation (ADVICE r8)
MATERIALIZE_ROW_CAP = 100_000


def materialize_and_cleanup(df: DataFrame, scratch_path: str) -> DataFrame:
    """Collect a (tiny, audit-sized) result and delete its scratch dir.

    Queries that exercise the write path (versioned tables, partitioned
    sinks) build a throwaway table under ``tempfile.mkdtemp``; returning
    a lazy plan over it would leak one table copy per invocation
    (correctness sweep + bench + pytest each leave several at sf0.1 —
    ADVICE r6).  The audit relations are a handful of rows, so eager
    materialization is free and lets the scratch dir be removed before
    the caller ever acts on the result.  A result past
    ``MATERIALIZE_ROW_CAP`` rows raises — this path is for audit-sized
    relations only, and a big frame reaching it is a wiring bug.
    """
    try:
        # cap enforced THROUGH the collect (limit cap+1), not after it:
        # a 500M-row mis-wired result must trip the guard, not OOM the
        # driver first; under the cap, limit() returns identical rows
        rows = df.limit(MATERIALIZE_ROW_CAP + 1).collect()
        if len(rows) > MATERIALIZE_ROW_CAP:
            raise ValueError(
                f"materialize_and_cleanup collected over {MATERIALIZE_ROW_CAP} "
                "rows — this eager audit path is for tiny results; return "
                "the lazy plan for large relations"
            )
    finally:
        import shutil

        shutil.rmtree(scratch_path, ignore_errors=True)
    # r14: Arrow-backed local frame — the pickle-RDD form re-ran every
    # audit row through Python workers at each downstream execution
    from fdf_spark.sources.tables import local_df

    return local_df(df.sparkSession, rows, df.schema)


def query(name: str, sql: str | None, operators: tuple[str, ...] = (), doc: str = ""):
    """Register an oracle-checked query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, operators=operators, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The external correctness driver checks at most the FIRST 50 registry
# entries (insertion order).  This curated order guarantees every SURVEY §2
# operator id has at least one oracle-checked representative inside that
# window; queries past position 50 remain registered (and pytest-checked)
# but are redundant coverage-wise.  tests/test_registry.py pins the
# invariant mechanically.
PRIORITY: tuple[str, ...] = (
    # -- minimal operator cover (every §2 family represented) --
    "q81_catalog_inventory",        # S5 P1 J1 F4 X1 X2
    "q82_dim_scan",                 # S1 S2 P6
    "q80_channel_expansion",        # S6
    "q04_top_orders",               # S4 O1 O2 O3 J2
    "q119_countmin_hot_tokens",     # N20 Count-Min sketch (r5; displaced q87 — S10 triple-covered by q116/q110)
    "q53_stream_event_decode",      # S7 S8 ST1 ST2 F9 A7
    "q40_nearest_event",            # P5 A4 O4 J4
    "q43_positional_slice",         # P2 P3
    "q42_value_window_snap",        # P4
    "q01_pricing_summary",          # A2 A5 A6 P7
    "q86_efit_discovery",           # X3 J6
    "q44_baseline_subtract",        # A1 F2
    "q08_union_dedup_custkeys",     # U1 U2 U3 A3
    "q19_rollup_revenue",           # A8
    "q159_deletion_vector_merge",   # N15+N17 deletion vectors / merge-on-read (r10; displaced q127 — N20 stays covered in-window by q119, N5 by q119/q134). The write-amplification answer for CDC at 100 TB now sits inside the driver hash gate.
    "q16_scalar_functions",         # F1 F3 F6 F7 F8 F10
    "q57_date_functions",           # F5 F13
    "q84_contour_levels",           # F11
    "q85_payload_chr_decode",       # F12
    "q83_fft_per_series",           # X4
    "q126_logreg_quality",          # N25 in-engine trained classifier (r5; displaced q24 — N5 keeps the frequency-sketch rep q119; percentiles stay pytest-oracle)
    "q187_index_sync_via_feed",     # N3+N17+N23 persisted IVF-PQ index FOLLOWING the corpus via the change feed (r14; displaced q155, whose persisted-probe story this subsumes — the probe here IS a persisted-index probe, after a poll/ack sync applied an insert+delete+update commit range; q155 stays sweep-green)
    "q70_text_quality",             # N4
    "q129_jpeg_codec_roundtrip",    # N6 REAL baseline-JPEG decode (r6; displaced q68 — same single N6 tag, but q129 exercises the real compressed codec instead of the deterministic fake)
    "q120_lm_quality",              # N21 unigram-LM scoring (r5; displaced q37 — N7/P6/N4 all triple-covered, q120 re-tags N7+N4)
    "q39_json_roundtrip",           # N8
    "q121_fuzzy_match",             # N22 blocked ER (r5; displaced q34 — N9 covered by q118+q119, N4 by q70/q103)
    # -- breadth fillers, all oracle-checked --
    "q54_stateful_dedup_count",
    "q149_stream_left_outer_join",  # ST4 outer tier + J7 batch-horizon oracle (r8; displaced q25 — its J7 tag stays double-covered by q55+q149, and q149's oracle IS a batch interval join)
    "q98_bm25_topk",               # N10 (J4's second rep q41 demoted below)
    "q101_gradient",               # A10 (r4; displaced q31 — A8 double-cover)
    "q148_bucketed_colocated_join",  # S10 bucketed layout: zero-exchange fact-fact SMJ (r8; displaced q102 — N12 stays covered by q125, N2 by q61/q108)
    "q103_pii_redact",             # N13 (r4; displaced q21 — N5 double-cover)
    "q100_pack_blocks",            # N11 (r5; displaced q20 — A8 triple-cover, q19 keeps A8)
    "q125_pipeline_export",        # N1+N12+N7+N24 full pipeline incl. shard export (r5; supersedes q106 as the in-window acceptance test)
    "q185_feed_consumer_offsets",  # N23+N17+S4 poll/ack incremental consumption (r14; displaced q122 — N23 stays covered here, q122 sweep-green)
    "q118_tokenize",               # N19 (q90 F8/P6 covered by q16/q70 and q01/q82)
    "q163_wap_audit_publish",       # N17+N18 write-audit-publish + named refs (r11; displaced q124 — N24 stays in-window via q125_pipeline_export's shard-export stage, q124 remains sweep-green). The stage-invisible/audit/fast-forward-publish lifecycle and the tag pin enter the driver hash gate.
    "q108_semantic_dedup",          # N14 SemDeDup (r5; displaced q17 — F5 double-covered by q57)
    "q115_pagerank",                # N16 (q92 J3/F1/F2/P3 all covered by q148/q16/q44/q42)
    # -- r12 rotation remnant (VERDICT r11 #2/#3); q160/q164/q166/q167/
    # q169 rotated back out in r13 (below), all sweep-green.
    "q168_check_constraint_gate",   # N17+N18 write-time CHECK enforcement
    # -- r13 rotation (VERDICT r12 #2 + the round's headline features).
    # Displaced, all sweep-green and coverage-neutral (checked
    # mechanically by test_registry): q160 (A6 via q19/q100/q122),
    # q164 (N17 via ~12 reps), q165 (S10 via q148/q159/q163, P6 via
    # q82/q121/q171), q166 (S5 via q81/q80/q175), q167 (N15 via
    # q159/q156/q162/q170/q173), q169 (S4 via q04/q170/q173).
    "q182_change_data_feed",        # N17+N15+S4 per-commit keyed CDF (r14; displaced q170 — N15 via q159/q173, S4 via q04/q176/q178, q170 sweep-green)
    "q171_bloom_point_lookup",      # N17+P6 per-file bloom sidecar skipping (r12)
    "q173_sql_merge_clauses",       # N15+N17+S4 general MERGE: conditional clauses (r13)
    "q174_html_extract",            # N4 HTML→text regexp chain, oracle IS the same chain (r13)
    "q183_analyze_table_stats",     # N17+A9+S4 ANALYZE TABLE one-pass column stats (r14; displaced q175 — S5 via q81/q80, planner loop stays pytest-pinned, q175 sweep-green)
    # -- r14 rotation (VERDICT r13 #2 + the round's headline features).
    # Displaced, all sweep-green and coverage-neutral (checked
    # mechanically by test_registry): q60 (N1 via q125/q108), q156
    # (ST1 via q53/q54, N15/N17 via q159/q170/q173), q162 (J6 via
    # q86, N15/N17 many reps), q172 (N17 ~12 reps).
    "q176_sql_ddl_lifecycle",       # N17+S4 CTAS/RENAME/ADD COLUMN/SPEC/CONSTRAINT, one table (r13+r14)
    "q184_table_properties_audit",  # N17+S4+N18 TBLPROPERTIES + enforced append-only (r14; displaced q177 — P6 via q82/q171, F13 via q57/q179, q177 sweep-green)
    "q178_sql_time_travel",         # N17+S4 inline VERSION AS OF + cross-version anti-join (r14)
    "q179_event_time_range_scan",   # N17+P6+F13 timestamp-stats range pruning (r14)
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY).

    Returns the registry re-keyed so PRIORITY names come first, in order;
    the remainder follow in original registration order.
    """
    from fdf_spark.queries import catalog, fusion, llm, relational, streaming  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
