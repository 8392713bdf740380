"""HTML → text extraction (N4 ingest tier, r13 — VERDICT r12 #7): the
most common real ingest step for a web corpus, as a DETERMINISTIC
JVM-side ``regexp_replace`` chain — no parser dependency, no Python in
the hot path, and every step replayable bit-for-bit by DuckDB (the
same RE2∩Java regex discipline as the N13 PII spans: only syntax both
engines implement identically — inline ``(?is)`` flags, lazy ``.*?``,
character classes; no backrefs, no lookaround).

Tiers:

1. :func:`html_to_text` — script/style/comment block removal, tag
   strip (block-level tags break lines so downstream line heuristics
   see document structure), a fixed named/numeric entity subset, and
   whitespace normalization.  ``sql_html_to_text`` emits the SAME
   chain as DuckDB SQL — the oracle replay is the function itself,
   so q174's hash gate pins the two implementations against each
   other.
2. :func:`boilerplate_line_filter` — the classic line-level
   boilerplate heuristic (drop short navigation-ish lines by
   word count), expressed as explode-free array ops so it stays
   whole-stage-codegen'd; equally SQL-replayable.

Scale: a pure column→column expression — no shuffle, no UDF; at
100 TB this runs at scan speed inside whole-stage codegen, and
Catalyst pushes the projection into the parquet scan.

Reference parity: none (the reference has no web-ingest surface);
engine-native north-star for LLM corpus preparation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tag-strip steps, applied IN ORDER (block removal before tag strip;
#: each is (java_and_re2_pattern, replacement)).  Block-level closers
#: become newlines so line structure survives for tier 2; inline tags
#: become spaces.
_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr|/table)\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
)

#: entity subset, applied IN ORDER — ``&amp;`` LAST, the standard rule
#: that keeps ``&amp;lt;`` decoding to ``&lt;`` (one level), never
#: double-decoding to ``<``.
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&#34;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_to_text(col: Column | str) -> Column:
    """Strip HTML to readable text: block removal → tag strip → entity
    decode → whitespace normalization.  Pure JVM expression chain."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _STRIP_STEPS:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    # collapse runs of spaces/tabs, then trim each line, then collapse
    # blank-line runs to one newline, then trim the whole
    c = F.regexp_replace(c, r"[ \t\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    # trim() strips spaces only — leading/trailing newlines go by regex
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def sql_html_to_text(expr: str) -> str:
    """The SAME chain as DuckDB SQL (regexp_replace with the ``g``
    option; RE2 accepts the inline flags verbatim) — q174's oracle
    calls this, so the two implementations are pinned against each
    other by the driver hash gate."""
    out = expr
    for pat, repl in _STRIP_STEPS:
        p = pat.replace("'", "''")
        # DuckDB string literals keep backslashes LITERAL, so regex
        # escapes (\b, \n in PATTERNS) pass through to RE2 verbatim;
        # a newline in the REPLACEMENT must be chr(10) — RE2's rewrite
        # string only knows group references, not escapes
        r = "chr(10)" if repl == "\n" else "'" + repl.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r}, 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    out = f"regexp_replace({out}, '[ \\t\\r]+', ' ', 'g')"
    out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
    out = f"regexp_replace({out}, '\\n+', chr(10), 'g')"
    out = f"regexp_replace({out}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({out})"


def boilerplate_line_filter(col: Column | str, min_words: int = 4) -> Column:
    """Tier 2 (optional): drop boilerplate-ish lines — the classic
    heuristic that navigation/footer cruft comes as SHORT lines (under
    ``min_words`` words) while body prose comes as long ones.  Pure
    array ops (split → filter → join): no explode, no shuffle, stays
    in whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda ln: F.size(F.split(F.trim(ln), r" +")) >= min_words,
    )
    return F.array_join(kept, "\n")


def sql_boilerplate_line_filter(expr: str, min_words: int = 4) -> str:
    """DuckDB replay of :func:`boilerplate_line_filter`."""
    return (
        # coalesce: DuckDB's array_to_string yields NULL for an empty
        # list where Spark's array_join yields '' — pin the Spark shape
        f"coalesce(array_to_string(list_filter(string_split({expr}, chr(10)), "
        f"ln -> len(string_split_regex(trim(ln), ' +')) >= {min_words}), chr(10)), '')"
    )
