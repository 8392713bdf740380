"""SQL DML over versioned tables — the write-side complement of
``register_versioned_view`` (VERDICT r11 #3 follow-through): route the
four ANSI DML verbs, as plain SQL strings, at a versioned table path.

    execute_dml(spark, path, "DELETE FROM t WHERE k < 10")
    execute_dml(spark, path, "UPDATE t SET v = v + 1 WHERE g = 2")
    execute_dml(spark, path, "INSERT INTO t SELECT ...")
    execute_dml(spark, path, "INSERT OVERWRITE t SELECT ...")
    execute_dml(spark, path, \"\"\"
        MERGE INTO t USING changes s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    \"\"\")

Deliberate scope (documented, loudly enforced):

- The statement's table name is cosmetic — the TARGET is ``path``
  (there is no mutable global catalog; the caller names the table).
- WHERE / SET expressions pass VERBATIM to Spark (``F.expr``), so the
  full Spark SQL expression language works; only the statement SHAPE
  is parsed here, with a quote/paren-aware scanner (never a blind
  regex over expression text — a ``WHERE`` inside a string literal
  cannot derail the split).
- MERGE supports the canonical CDC form: equality ``ON`` conjunction,
  ``WHEN MATCHED THEN UPDATE SET *``, ``WHEN NOT MATCHED THEN INSERT
  *``, optional ``WHEN MATCHED AND <boolcol> THEN DELETE`` — which
  routes 1:1 onto :func:`merge_on_read` (merge-on-read write
  amplification, the 100 TB CDC landing path).  Arbitrary per-clause
  projections raise with a pointer to the Python API.

Every verb lands through the SAME engine seams as the Python API
(delete_where / update_where / commit_version / merge_on_read): CHECK
constraints, optimistic concurrency + lost-race rebase, manifest
stats, change feed — nothing is bypassed.  Reference parity: the
reference's only SQL surface is the read-side logbook
(factory.py:537-542); this extends SQL to the engine's write side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _scan_split(s: str, keyword: str) -> tuple[str, str | None]:
    """Split ``s`` at the FIRST occurrence of ``keyword`` that sits at
    paren-depth 0 and outside quotes; returns (before, after) or
    (s, None).  Keyword must be identifier-bounded."""
    up = s.upper()
    kw = keyword.upper()
    n, L = len(s), len(kw)
    depth = 0
    i = 0
    while i < n:
        c = s[i]
        if c == "'" or c == '"':
            q = c
            i += 1
            while i < n:
                if s[i] == q:
                    if i + 1 < n and s[i + 1] == q:  # '' escape
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith(kw, i)
            and (i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_"))
            and (i + L == n or not (up[i + L].isalnum() or up[i + L] == "_"))
        ):
            return s[:i], s[i + L:]
        i += 1
    return s, None


def _scan_split_commas(s: str) -> list[str]:
    """Split on commas at depth 0 outside quotes."""
    parts, buf, depth, i, n = [], [], 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'" or c == '"':
            q = c
            buf.append(c)
            i += 1
            while i < n:
                buf.append(s[i])
                if s[i] == q:
                    if i + 1 < n and s[i + 1] == q:
                        buf.append(s[i + 1])
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return parts


_IDENT = r"[A-Za-z_][\w]*(?:\.[\w]+)*"
_DELETE_RE = re.compile(rf"^\s*DELETE\s+FROM\s+({_IDENT})\s*(.*)$", re.I | re.S)
_UPDATE_RE = re.compile(rf"^\s*UPDATE\s+({_IDENT})\s+SET\s+(.*)$", re.I | re.S)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+(INTO|OVERWRITE)\s+({_IDENT})\s*(\(([^)]*)\))?\s*(.*)$", re.I | re.S
)
_MERGE_RE = re.compile(
    rf"^\s*MERGE\s+INTO\s+({_IDENT})(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+(.*)$", re.I | re.S
)
_EQ_RE = re.compile(rf"^\s*({_IDENT})\s*=\s*({_IDENT})\s*$", re.S)


def _insert_frame(spark: SparkSession, path: str, cols_txt, query: str) -> DataFrame:
    from pyspark.sql import functions as F

    from fdf_spark.sources.versioned import (
        _logical_schema,
        _read_manifest,
        list_versions,
    )

    q = query.strip()
    if not q:
        raise ValueError("INSERT needs a source query (SELECT … or VALUES …)")
    df = spark.sql(q)
    versions = list_versions(path)
    schema = _logical_schema(_read_manifest(path, versions[-1])) if versions else None
    if cols_txt:
        names = [c.strip().strip("`") for c in cols_txt.split(",")]
        if len(names) != len(df.columns):
            raise ValueError(
                f"INSERT column list has {len(names)} names but the query "
                f"produces {len(df.columns)} columns"
            )
        df = df.toDF(*names)  # positional rename — robust to odd source names
        if schema is not None:
            # NULL-fill unlisted columns, order to the table schema and
            # CAST listed ones to the declared types — same never-drift
            # rule as the positional branch (code-review r12 finding:
            # an un-cast int into a double column writes bytes the
            # declared-schema reader cannot decode)
            have = set(names)
            df = df.select(
                *[
                    (
                        F.col(f.name).cast(f.dataType) if f.name in have
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in schema.fields
                ]
            )
    elif schema is not None:
        # positional: the query's columns map onto the table schema in
        # order (ANSI INSERT semantics), cast to the declared types
        if len(df.columns) != len(schema.fields):
            raise ValueError(
                f"INSERT query produces {len(df.columns)} columns; table has "
                f"{len(schema.fields)} — list the target columns explicitly"
            )
        safe = [f"_c{i}" for i in range(len(df.columns))]
        df = df.toDF(*safe).select(  # ordinal rename first: source names
            *[                        # may be literals like `2.0`
                F.col(c).cast(f.dataType).alias(f.name)
                for c, f in zip(safe, schema.fields)
            ]
        )
    return df


def _parse_merge(spark: SparkSession, rest: str):
    """``rest`` = everything after USING.  Returns (changes_df, keys,
    delete_flag) for :func:`merge_on_read`."""
    src_txt, after_on = _scan_split(rest, "ON")
    if after_on is None:
        raise ValueError("MERGE needs an ON clause")
    src_txt = src_txt.strip()
    # source: `(subquery) [AS] alias` or `name [AS] alias`
    m = re.match(r"^\((.*)\)\s*(?:AS\s+)?(\w+)?\s*$", src_txt, re.S | re.I)
    if m:
        changes = spark.sql(m.group(1))
        src_alias = m.group(2)
    else:
        m = re.match(rf"^({_IDENT})\s*(?:AS\s+)?(\w+)?\s*$", src_txt, re.I)
        if not m:
            raise ValueError(f"cannot parse MERGE source {src_txt!r}")
        changes = spark.table(m.group(1))
        src_alias = m.group(2) or m.group(1)
    on_txt, clauses_txt = _scan_split(after_on, "WHEN")
    if clauses_txt is None:
        raise ValueError("MERGE needs WHEN clauses")
    # ON: conjunction of target.k = source.k equalities → the key list
    keys = []
    for conj in re.split(r"\bAND\b", on_txt, flags=re.I):
        m = _EQ_RE.match(conj)
        if not m:
            raise ValueError(
                f"MERGE ON supports only equality conjunctions on key columns; "
                f"got {conj.strip()!r} (use merge_on_read for general conditions)"
            )
        keys.append(m.group(1).split(".")[-1].strip("`"))
        rhs = m.group(2).split(".")[-1].strip("`")
        if rhs != keys[-1]:
            raise ValueError(
                f"MERGE ON key names must match on both sides (got "
                f"{m.group(1)!r} = {m.group(2)!r}); rename in the source query"
            )
    # WHEN clauses: canonical CDC form only (case- and whitespace-
    # insensitive split, like every other keyword here — code-review
    # r12 finding: the literal "WHEN " split rejected lowercase DML)
    delete_flag = None
    saw_update = saw_insert = False
    for clause in re.split(r"(?i)\bWHEN\b", clauses_txt):
        c = clause.strip().rstrip(";").strip()
        if not c:
            continue
        if re.fullmatch(r"MATCHED\s+THEN\s+UPDATE\s+SET\s+\*", c, re.I):
            saw_update = True
        elif re.fullmatch(r"NOT\s+MATCHED\s+THEN\s+INSERT\s+\*", c, re.I):
            saw_insert = True
        else:
            m = re.fullmatch(r"MATCHED\s+AND\s+(\S+)\s+THEN\s+DELETE", c, re.I)
            if m:
                delete_flag = m.group(1).split(".")[-1].strip("`")
            else:
                raise ValueError(
                    f"unsupported MERGE clause {c!r} — supported: WHEN MATCHED "
                    "THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT *, WHEN "
                    "MATCHED AND <boolcol> THEN DELETE (general projections: "
                    "use merge_on_read / merge_versioned)"
                )
    if not (saw_update and saw_insert):
        raise ValueError(
            "MERGE needs both WHEN MATCHED THEN UPDATE SET * and "
            "WHEN NOT MATCHED THEN INSERT * (the canonical CDC upsert)"
        )
    _ = src_alias  # alias is cosmetic: ON names are reduced to bare columns
    return changes, keys, delete_flag


def execute_dml(spark: SparkSession, path: str, statement: str) -> int:
    """Execute one DML statement against the versioned table at
    ``path``; returns the new version number (the unchanged head when
    nothing matched) — except ``VACUUM``, which returns the number of
    files reclaimed.  Utility verbs: ``OPTIMIZE t [ZORDER BY (a, b)]``,
    ``VACUUM t [RETAIN n HOURS]`` (bare VACUUM keeps 7 days of time
    travel, Delta's default; ``RETAIN 0 HOURS`` is the explicit
    destructive form), ``RESTORE [TABLE] t TO VERSION AS OF n`` /
    ``TO TIMESTAMP AS OF <epoch-or-ISO-datetime>``.  See module
    docstring for the DML grammar.
    """
    from fdf_spark.sources.versioned import (
        commit_version,
        delete_where,
        merge_on_read,
        update_where,
    )

    stmt = statement.strip().rstrip(";")
    m = _DELETE_RE.match(stmt)
    if m:
        rest = m.group(2).strip()
        if rest:
            _, cond = _scan_split(rest, "WHERE")
            if cond is None or _scan_split(rest, "WHERE")[0].strip():
                raise ValueError(f"cannot parse DELETE tail {rest!r}")
        else:
            cond = "true"  # ANSI: DELETE without WHERE removes all rows
        return delete_where(spark, path, cond.strip())
    m = _UPDATE_RE.match(stmt)
    if m:
        set_and_where = m.group(2)
        set_txt, cond = _scan_split(set_and_where, "WHERE")
        sets = {}
        for a in _scan_split_commas(set_txt):
            col, _, expr = a.partition("=")
            if not _ or not col.strip() or not expr.strip():
                raise ValueError(f"cannot parse SET assignment {a!r}")
            sets[col.strip().strip("`")] = expr.strip()
        if not sets:
            raise ValueError("UPDATE needs at least one SET assignment")
        return update_where(
            spark, path, (cond or "true").strip(), sets
        )
    m = _INSERT_RE.match(stmt)
    if m:
        mode = "overwrite" if m.group(1).upper() == "OVERWRITE" else "append"
        df = _insert_frame(spark, path, m.group(4), m.group(5))
        return commit_version(df, path, mode=mode)
    m = _MERGE_RE.match(stmt)
    if m:
        changes, keys, delete_flag = _parse_merge(spark, m.group(3))
        return merge_on_read(spark, path, changes, keys, delete_flag=delete_flag)
    v = _utility_statement(spark, path, stmt)
    if v is not None:
        return v
    raise ValueError(
        "unsupported DML statement (DELETE/UPDATE/INSERT/MERGE/"
        f"OPTIMIZE/VACUUM/RESTORE): {stmt[:80]!r}"
    )


_OPTIMIZE_RE = re.compile(
    rf"^\s*OPTIMIZE\s+({_IDENT})\s*(?:ZORDER\s+BY\s*\(([^)]*)\))?\s*$", re.I | re.S
)
_VACUUM_RE = re.compile(
    rf"^\s*VACUUM\s+({_IDENT})\s*(?:RETAIN\s+(\d+)\s+HOURS)?\s*$", re.I | re.S
)
_RESTORE_RE = re.compile(
    rf"^\s*RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+"
    r"(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+?)\s*$",
    re.I | re.S,
)


def _utility_statement(spark: SparkSession, path: str, stmt: str):
    """Delta's SQL utility verbs, routed onto the maintenance ops:

        OPTIMIZE t [ZORDER BY (a, b)]
        VACUUM t [RETAIN <n> HOURS]
        RESTORE [TABLE] t TO VERSION AS OF <n>
        RESTORE [TABLE] t TO TIMESTAMP AS OF <epoch-seconds>

    Returns the resulting version number (OPTIMIZE/RESTORE) or the
    number of files reclaimed (VACUUM); ``None`` when the statement is
    not a utility verb (the caller raises its combined error).
    """
    from fdf_spark.sources.versioned import optimize, restore_table, vacuum

    m = _OPTIMIZE_RE.match(stmt)
    if m:
        z = None
        if m.group(2) is not None:
            z = [c.strip().strip("`") for c in m.group(2).split(",")]
            if not z or not all(z):
                # an empty list or trailing comma must fail AT PARSE
                # time, not silently bin-pack without z-ordering
                raise ValueError(f"empty column in ZORDER BY: {stmt[:80]!r}")
        return optimize(spark, path, zorder=z)["version"]
    m = _VACUUM_RE.match(stmt)
    if m:
        # Delta parity: bare VACUUM keeps 7 days of time travel — the
        # destructive form must be EXPLICIT (RETAIN 0 HOURS)
        retain = float(m.group(2)) * 3600.0 if m.group(2) is not None else 168 * 3600.0
        return len(vacuum(path, keep=1, retain_last_s=retain))
    m = _RESTORE_RE.match(stmt)
    if m:
        kind, val = m.group(2).upper(), m.group(3).strip().strip("'\"")
        if kind == "VERSION":
            return restore_table(path, version=int(val))
        try:
            ts = float(val)  # epoch seconds
        except ValueError:
            from datetime import datetime

            try:
                ts = datetime.fromisoformat(val).timestamp()  # '2026-08-15 00:00:00'
            except ValueError:
                raise ValueError(
                    f"TIMESTAMP AS OF takes epoch seconds or an ISO "
                    f"datetime string, got {val!r}"
                ) from None
        return restore_table(path, as_of_ts=ts)
    return None
