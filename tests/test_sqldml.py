"""SQL DML router (sources/sqldml.py) — DELETE/UPDATE/INSERT/MERGE as
plain SQL strings, landing through the same engine seams as the Python
API (constraints, optimistic concurrency, manifest stats, change feed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fdf_spark.sources.sqldml import execute_dml
from fdf_spark.sources.versioned import (
    commit_version,
    list_versions,
    read_version,
)


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("row "), F.col("id")).alias("s"),
    )
    commit_version(df, p)
    return p


def test_delete_where_sql(spark, table):
    v = execute_dml(spark, table, "DELETE FROM t WHERE k < 10")
    assert v == 2
    df = read_version(spark, table)
    assert df.count() == 90 and df.filter("k < 10").count() == 0


def test_delete_all_sql(spark, table):
    execute_dml(spark, table, "DELETE FROM t")
    assert read_version(spark, table).count() == 0


def test_update_sql_multiple_sets_and_quoted_where(spark, table):
    # the string literal contains both a comma and the word WHERE — the
    # quote-aware scanner must not split on either
    v = execute_dml(
        spark, table,
        "UPDATE t SET v = v * 2 + 1, s = 'a, where b' WHERE k BETWEEN 10 AND 12",
    )
    assert v == 2
    got = {r.k: (r.v, r.s) for r in read_version(spark, table).filter("k <= 13").collect()}
    for k in (10, 11, 12):
        assert got[k] == ((k % 7) * 2 + 1, "a, where b")
    assert got[13] == (13 % 7, "row 13")


def test_update_without_where_touches_all(spark, table):
    execute_dml(spark, table, "UPDATE t SET v = 0.5")
    df = read_version(spark, table)
    assert df.filter("v = 0.5").count() == 100


def test_insert_select_positional_casts(spark, table):
    # query yields (int, int, string) — cast to the declared (long,
    # double, string) schema positionally
    v = execute_dml(
        spark, table,
        "INSERT INTO t SELECT 1000 + id, CAST(id AS INT), 'new' FROM RANGE(3)",
    )
    assert v == 2
    got = read_version(spark, table).filter("k >= 1000").orderBy("k").collect()
    assert [(r.k, r.v, r.s) for r in got] == [
        (1000, 0.0, "new"), (1001, 1.0, "new"), (1002, 2.0, "new"),
    ]


def test_insert_column_list_null_fills(spark, table):
    execute_dml(spark, table, "INSERT INTO t (k, s) VALUES (2000, 'partial')")
    r = read_version(spark, table).filter("k = 2000").first()
    assert r.s == "partial" and r.v is None


def test_insert_overwrite(spark, table):
    execute_dml(
        spark, table, "INSERT OVERWRITE t SELECT CAST(1 AS LONG), 2.0, 'only'"
    )
    got = read_version(spark, table).collect()
    assert len(got) == 1 and got[0].k == 1
    # time travel to the pre-overwrite snapshot still works
    assert read_version(spark, table, 1).count() == 100


def test_merge_canonical_cdc(spark, table):
    ch = spark.createDataFrame(
        [(5, 99.0, "upd", False), (500, 1.0, "ins", False), (7, None, None, True)],
        "k long, v double, s string, is_del boolean",
    )
    ch.createOrReplaceTempView("dml_changes")
    v = execute_dml(
        spark, table,
        """
        MERGE INTO t USING dml_changes c ON t.k = c.k
        WHEN MATCHED AND is_del THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert v == 2
    df = read_version(spark, table)
    assert df.count() == 100 - 1 + 1  # k=7 deleted, k=500 inserted
    assert df.filter("k = 5").first().v == 99.0
    assert df.filter("k = 7").count() == 0
    assert df.filter("k = 500").first().s == "ins"
    spark.catalog.dropTempView("dml_changes")


def test_merge_subquery_source(spark, table):
    v = execute_dml(
        spark, table,
        "MERGE INTO t USING (SELECT CAST(3 AS LONG) AS k, 7.5 AS v, 'x' AS s, "
        "false AS is_del) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
    )
    assert v == 2
    assert read_version(spark, table).filter("k = 3").first().v == 7.5


def test_dml_respects_check_constraints(spark, table):
    from fdf_spark.sources.versioned import (
        ConstraintViolationError,
        add_check_constraint,
    )

    add_check_constraint(spark, table, "v_nonneg", "v >= 0 OR v IS NULL")
    with pytest.raises(ConstraintViolationError):
        execute_dml(spark, table, "UPDATE t SET v = -1.0 WHERE k = 1")
    assert list_versions(table) == [1]  # nothing landed


def test_unsupported_shapes_raise(spark, table):
    with pytest.raises(ValueError, match="unsupported DML"):
        execute_dml(spark, table, "TRUNCATE TABLE t")
    with pytest.raises(ValueError, match="cannot UPDATE"):
        execute_dml(
            spark, table,
            "MERGE INTO t USING (SELECT CAST(1 AS LONG) AS k) s ON t.k = s.k "
            "WHEN NOT MATCHED THEN UPDATE SET v = 1",
        )
    with pytest.raises(ValueError, match="equality conjunctions"):
        execute_dml(
            spark, table,
            "MERGE INTO t USING (SELECT CAST(1 AS LONG) AS k) s ON t.k > s.k "
            "WHEN MATCHED THEN UPDATE SET *",
        )
    with pytest.raises(ValueError, match="SET assignment"):
        execute_dml(spark, table, "UPDATE t SET WHERE k = 1")


def test_merge_lowercase_and_multiline(spark, table):
    """Code-review r12: WHEN-clause splitting is case- and whitespace-
    insensitive like the rest of the grammar."""
    ch = spark.createDataFrame([(3, 7.5, "x", False)], "k long, v double, s string, is_del boolean")
    ch.createOrReplaceTempView("dml_lc")
    v = execute_dml(
        spark, table,
        "merge into t using dml_lc c on t.k = c.k\nwhen\nmatched and is_del then delete\n"
        "when matched then update set *\nwhen not matched then insert *",
    )
    assert v == 2
    assert read_version(spark, table).filter("k = 3").first().v == 7.5
    spark.catalog.dropTempView("dml_lc")


def test_insert_column_list_casts_to_declared_types(spark, table):
    """Code-review r12: listed columns cast to the declared schema —
    an int literal into the double column must not write int bytes."""
    execute_dml(spark, table, "INSERT INTO t (k, v) VALUES (3000, 7)")
    r = read_version(spark, table).filter("k = 3000").first()
    assert r.v == 7.0 and r.s is None


def test_utility_verbs_optimize_vacuum_restore(spark, table):
    """Delta's SQL maintenance verbs route onto the engine ops:
    OPTIMIZE (bin-pack/zorder → new version), RESTORE TO VERSION AS OF
    (manifest-only rollback), VACUUM RETAIN n HOURS (time-retention)."""
    execute_dml(spark, table, "DELETE FROM t WHERE k < 10")           # v2
    v = execute_dml(spark, table, "OPTIMIZE t ZORDER BY (k)")
    assert v == 3
    assert read_version(spark, table).count() == 90
    v = execute_dml(spark, table, "RESTORE TABLE t TO VERSION AS OF 1")
    assert v == 4
    assert read_version(spark, table).count() == 100  # rollback restored rows
    # bare VACUUM defaults to Delta's 7-day retention (code-review
    # r12: the destructive form must be explicit) → nothing reclaimed
    assert execute_dml(spark, table, "VACUUM t") == 0
    assert len(list_versions(table)) == 4
    # the explicit zero-retention form drops history; pre-restore
    # files stay because the restored head references v1's bytes
    execute_dml(spark, table, "VACUUM t RETAIN 0 HOURS")
    assert list_versions(table) == [4]
    assert read_version(spark, table).count() == 100
    # parse-time guards
    with pytest.raises(ValueError, match="empty column in ZORDER"):
        execute_dml(spark, table, "OPTIMIZE t ZORDER BY (k,)")
    with pytest.raises(ValueError, match="epoch seconds or an ISO"):
        execute_dml(spark, table, "RESTORE t TO TIMESTAMP AS OF 'yesterday'")


# --- r13: general MERGE (conditional clauses, explicit assignments) --------


def test_merge_general_conditional_clauses(spark, table):
    """VERDICT r12 #3: multiple WHEN MATCHED [AND cond] with explicit
    UPDATE SET col = expr, conditional NOT MATCHED INSERT (cols)
    VALUES (…), first-matching-clause-wins precedence."""
    ch = spark.createDataFrame(
        [(5, 50.0), (6, 1.0), (500, 9.0), (600, -1.0)],
        "k long, nv double",
    )
    ch.createOrReplaceTempView("gm_src")
    v = execute_dml(
        spark, table,
        """
        MERGE INTO t AS t USING gm_src AS s ON t.k = s.k
        WHEN MATCHED AND s.nv > 10 THEN UPDATE SET v = s.nv, s = 'big'
        WHEN MATCHED THEN UPDATE SET s = 'small'
        WHEN NOT MATCHED AND s.nv > 0 THEN INSERT (k, v, s) VALUES (s.k, s.nv * 2, 'new')
        """,
    )
    assert v == 2
    df = read_version(spark, table)
    r5 = df.filter("k = 5").first()
    assert (r5.v, r5.s) == (50.0, "big")  # first clause wins
    r6 = df.filter("k = 6").first()
    assert (r6.v, r6.s) == (6 % 7, "small")  # second clause: v untouched
    r500 = df.filter("k = 500").first()
    assert (r500.v, r500.s) == (18.0, "new")
    assert df.filter("k = 600").count() == 0  # no clause matched → dropped
    assert df.count() == 101
    spark.catalog.dropTempView("gm_src")


def test_merge_general_cross_side_condition_and_delete(spark, table):
    """Conditions referencing BOTH aliases (s.v > t.v) and a
    conditional DELETE clause, compiled onto merge_on_read."""
    ch = spark.createDataFrame(
        [(10, 100.0, False), (11, -5.0, False), (12, 0.0, True)],
        "k long, v double, drop boolean",
    )
    ch.createOrReplaceTempView("gm_src2")
    execute_dml(
        spark, table,
        """
        MERGE INTO t USING gm_src2 AS s ON t.k = s.k
        WHEN MATCHED AND s.drop THEN DELETE
        WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v
        """,
    )
    df = read_version(spark, table)
    assert df.filter("k = 10").first().v == 100.0  # s.v 100 > t.v 3
    assert df.filter("k = 11").first().v == 11 % 7  # s.v -5 < t.v: untouched
    assert df.filter("k = 12").count() == 0  # deleted
    assert df.count() == 99
    spark.catalog.dropTempView("gm_src2")


def test_merge_general_precedence_is_clause_order(spark, table):
    """Swapping clause order flips the outcome — first-match-wins is
    the statement's order, not specificity."""
    ch = spark.createDataFrame([(20, 99.0)], "k long, nv double")
    ch.createOrReplaceTempView("gm_src3")
    execute_dml(
        spark, table,
        """
        MERGE INTO t USING gm_src3 AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET s = 'generic'
        WHEN MATCHED AND s.nv > 10 THEN UPDATE SET s = 'specific'
        """,
    )
    assert read_version(spark, table).filter("k = 20").first().s == "generic"
    spark.catalog.dropTempView("gm_src3")


def test_merge_general_multiple_matches_error(spark, table):
    """Two source rows hitting the same target key raise (Delta's
    multiple-matches error, via merge_on_read's uniqueness check)."""
    ch = spark.createDataFrame([(30, 1.0), (30, 2.0)], "k long, nv double")
    ch.createOrReplaceTempView("gm_src4")
    with pytest.raises(Exception, match="[Dd]uplicate|unique"):
        execute_dml(
            spark, table,
            "MERGE INTO t USING gm_src4 AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv",
        )
    assert list_versions(table) == [1]  # nothing landed
    spark.catalog.dropTempView("gm_src4")


def test_merge_general_key_discipline(spark, table):
    ch = spark.createDataFrame([(40, 1.0)], "k long, nv double")
    ch.createOrReplaceTempView("gm_src5")
    with pytest.raises(ValueError, match="may not SET a join key"):
        execute_dml(
            spark, table,
            "MERGE INTO t USING gm_src5 AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET k = s.k + 1",
        )
    with pytest.raises(ValueError, match="verbatim from the"):
        execute_dml(
            spark, table,
            "MERGE INTO t USING gm_src5 AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.nv "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k + 1000, s.nv)",
        )
    spark.catalog.dropTempView("gm_src5")


# --- r13: DDL verbs --------------------------------------------------------


def test_ctas_and_or_replace(spark, tmp_path):
    p = str(tmp_path / "ctas")
    v = execute_dml(spark, p, "CREATE TABLE t AS SELECT id AS k, id * 2 AS v FROM RANGE(10)")
    assert v == 1
    assert read_version(spark, p).count() == 10
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(spark, p, "CREATE TABLE t AS SELECT 1 AS k, 2 AS v")
    v = execute_dml(spark, p, "CREATE OR REPLACE TABLE t AS SELECT 1 AS k, 2 AS v")
    assert v == 2
    assert read_version(spark, p).count() == 1
    assert read_version(spark, p, 1).count() == 10  # time travel intact


def test_alter_table_ddl_roundtrip(spark, table):
    """ALTER TABLE verbs route onto the manifest-only evolution seams:
    rename/drop/widen columns, constraints, partition spec."""
    from fdf_spark.sources.versioned import (
        ConstraintViolationError,
        list_check_constraints,
        partition_spec,
    )

    v = execute_dml(spark, table, "ALTER TABLE t RENAME COLUMN v TO val")
    assert v == 2
    assert "val" in read_version(spark, table).columns
    v = execute_dml(spark, table, "ALTER TABLE t ADD CONSTRAINT pos CHECK (val >= 0 OR val IS NULL)")
    assert v == 2  # constraints publish no snapshot
    assert "pos" in list_check_constraints(table)
    with pytest.raises(ConstraintViolationError):
        execute_dml(spark, table, "UPDATE t SET val = -1.0 WHERE k = 1")
    execute_dml(spark, table, "ALTER TABLE t DROP CONSTRAINT pos")
    assert "pos" not in list_check_constraints(table)
    v = execute_dml(spark, table, "ALTER TABLE t SET PARTITION SPEC (bucket(8, k))")
    assert partition_spec(table)["cols"] == ["bucket(8, k)"]
    v = execute_dml(spark, table, "ALTER TABLE t DROP COLUMN s")
    assert "s" not in read_version(spark, table).columns
    with pytest.raises(ValueError, match="unsupported ALTER TABLE"):
        execute_dml(spark, table, "ALTER TABLE t FROB EVERYTHING")


def test_alter_column_widen(spark, tmp_path):
    p = str(tmp_path / "w")
    commit_version(
        spark.range(5).select(F.col("id").cast("int").alias("k")), p
    )
    execute_dml(spark, p, "ALTER TABLE t ALTER COLUMN k TYPE bigint")
    assert dict(read_version(spark, p).dtypes)["k"] == "bigint"


def test_merge_delete_after_update_star_not_canonical(spark, table):
    """ADVICE r13: 'UPDATE SET * … MATCHED AND f THEN DELETE' must NOT
    route to merge_on_read's delete flag — under first-matching-clause-
    wins the unconditional UPDATE shadows the later DELETE, so the
    flagged row survives (updated), never deleted."""
    ch = spark.createDataFrame(
        [(5, 99.0, "upd", False), (7, 1.5, "shadowed", True), (500, 1.0, "ins", False)],
        "k long, v double, s string, is_del boolean",
    )
    ch.createOrReplaceTempView("dml_shadow")
    v = execute_dml(
        spark, table,
        """
        MERGE INTO t USING dml_shadow c ON t.k = c.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN MATCHED AND is_del THEN DELETE
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert v == 2
    df = read_version(spark, table)
    assert df.count() == 101  # k=500 inserted, NOTHING deleted
    r7 = df.filter("k = 7").first()
    assert (r7.v, r7.s) == (1.5, "shadowed")  # updated by the winning clause
    assert df.filter("k = 5").first().v == 99.0
    # the same clauses with DELETE FIRST (the canonical CDC order) do delete
    execute_dml(
        spark, table,
        """
        MERGE INTO t USING dml_shadow c ON t.k = c.k
        WHEN MATCHED AND is_del THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert read_version(spark, table).filter("k = 7").count() == 0
    spark.catalog.dropTempView("dml_shadow")


def test_merge_general_source_evaluated_once(spark, table, tmp_path):
    """ADVICE r13: _general_merge pins the source to ONE materialization
    — the file-prune key collect and the condition join must never see
    two evaluations of a nondeterministic source plan.  A counting UDF
    (marked nondeterministic so Catalyst cannot collapse it) proves the
    source rows are computed once; without the persist the prune collect
    and the join each ran the plan (≥2× the calls)."""
    cnt = str(tmp_path / "calls.log")

    def _mark(k):
        with open(cnt, "a") as fh:
            fh.write("1\n")
        return k

    mark = F.udf(_mark, "long").asNondeterministic()
    ch = spark.range(0, 20).select(
        mark(F.col("id")).alias("k"),
        F.lit(123.0).alias("nv"),
    )
    ch.createOrReplaceTempView("gm_once")
    execute_dml(
        spark, table,
        """
        MERGE INTO t USING gm_once AS s ON t.k = s.k
        WHEN MATCHED AND s.nv > 0 THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (s.k, s.nv, 'once')
        """,
    )
    df = read_version(spark, table)
    assert df.filter("v = 123.0").count() == 20  # every source row landed once
    assert df.count() == 100
    with open(cnt) as fh:
        calls = sum(1 for _ in fh)
    # one evaluation = 20 calls; headroom for a task retry, but far
    # under the 40 an unpinned double evaluation costs
    assert calls <= 30, f"source plan evaluated more than once ({calls} UDF calls)"
    spark.catalog.dropTempView("gm_once")


def test_add_column_manifest_only(spark, table):
    """r14 (VERDICT r13 missing #2): ALTER TABLE ADD COLUMN is a
    manifest-only commit — old files read NULL, the next append carries
    values, time travel shows the pre-add schema."""
    import os

    from fdf_spark.sources.versioned import _read_manifest

    before = {
        f: os.path.getmtime(f) for f in _read_manifest(table, 1)["files"]
    }
    v = execute_dml(spark, table, "ALTER TABLE t ADD COLUMN w double")
    assert v == 2
    # zero bytes rewritten
    m = _read_manifest(table, 2)
    assert m["files"] == list(before) and all(
        os.path.getmtime(f) == before[f] for f in m["files"]
    )
    df = read_version(spark, table)
    assert "w" in df.columns
    assert df.filter("w IS NOT NULL").count() == 0  # old files read NULL
    execute_dml(spark, table, "INSERT INTO t (k, w) VALUES (900, 3.5)")
    got = read_version(spark, table)
    assert got.filter("w = 3.5").count() == 1
    assert got.count() == 101
    # time travel: the pre-add snapshot has no 'w'
    assert "w" not in read_version(spark, table, 1).columns


def test_add_column_fresh_physical_after_drop(spark, table):
    """Re-adding a dropped column's name gets a FRESH physical name —
    the dead bytes never resurrect."""
    from fdf_spark.sources.versioned import _mapping, _read_manifest, add_column

    execute_dml(spark, table, "ALTER TABLE t DROP COLUMN v")
    v = add_column(table, "v", "double")
    m = _read_manifest(table, v)
    assert _mapping(m)["v"] != "v"  # fresh physical name
    df = read_version(spark, table)
    assert df.filter("v IS NOT NULL").count() == 0  # old doubles stay dead
    with pytest.raises(ValueError, match="already exists"):
        add_column(table, "k", "long")
    # multi-column form
    execute_dml(spark, table, "ALTER TABLE t ADD COLUMNS (a int, b string)")
    assert {"a", "b"} <= set(read_version(spark, table).columns)


def test_execute_sql_time_travel(spark, table):
    """r14 (VERDICT r13 missing #3): inline VERSION/TIMESTAMP AS OF in
    SELECT — pinned snapshot vs head disagree after a commit; a
    cross-version self-join diffs snapshots in one statement."""
    import time

    from fdf_spark.sources.sqldml import execute_sql
    from fdf_spark.sources.versioned import _read_manifest

    t1 = _read_manifest(table, 1)["ts"]
    execute_dml(spark, table, "DELETE FROM t WHERE k < 40")
    head = execute_sql(spark, table, "SELECT count(*) AS n FROM t").first().n
    pinned = execute_sql(
        spark, table, "SELECT count(*) AS n FROM t VERSION AS OF 1"
    ).first().n
    assert (head, pinned) == (60, 100)  # pinned vs head disagree
    by_ts = execute_sql(
        spark, table, f"SELECT count(*) AS n FROM t TIMESTAMP AS OF {t1 + 0.001}"
    ).first().n
    assert by_ts == 100
    # cross-version self-join: rows present at v1 but gone at head
    gone = execute_sql(
        spark, table,
        "SELECT count(*) AS n FROM t VERSION AS OF 1 a "
        "LEFT ANTI JOIN t b ON a.k = b.k",
    ).first().n
    assert gone == 40
    # a FROM inside a string literal must not derail the rewrite
    lit = execute_sql(
        spark, table, "SELECT 'FROM t VERSION AS OF 99' AS s FROM t LIMIT 1"
    ).first().s
    assert lit == "FROM t VERSION AS OF 99"
    with pytest.raises(ValueError, match="no FROM"):
        execute_sql(spark, table, "SELECT 1")


def test_copy_into_idempotent(spark, table, tmp_path):
    """r14: COPY INTO loads files by-name-aligned to the table schema
    (missing columns NULL-fill, extra columns error) and the
    IDEMPOTENT form makes a replayed load a NO-OP via the engine's
    ingest-id + expected_parent serializability loop."""
    src = str(tmp_path / "landing")
    spark.range(500, 520).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).write.parquet(src)
    v = execute_dml(
        spark, table, f"COPY INTO t FROM '{src}' IDEMPOTENT 'batch-001'"
    )
    assert v == 2
    df = read_version(spark, table)
    assert df.count() == 120
    assert df.filter("k = 510").first().s is None  # NULL-filled by name
    # replay: no-op, head unchanged
    v2 = execute_dml(
        spark, table, f"COPY INTO t FROM '{src}' IDEMPOTENT 'batch-001'"
    )
    assert v2 == 2 and read_version(spark, table).count() == 120
    # a different id lands (and non-idempotent form always lands)
    execute_dml(spark, table, f"COPY INTO t FROM '{src}' IDEMPOTENT 'batch-002'")
    assert read_version(spark, table).count() == 140
    # extra source columns refuse (by-name discipline)
    bad = str(tmp_path / "bad")
    spark.range(1).select(
        F.col("id").alias("k"), F.lit("x").alias("zzz")
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="zzz"):
        execute_dml(spark, table, f"COPY INTO t FROM '{bad}'")


def test_copy_into_csv_with_table_schema(spark, table, tmp_path):
    src = str(tmp_path / "csv")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "part.csv"), "w") as fh:
        fh.write("k,v,s\n900,1.5,from csv\n901,2.5,also csv\n")
    execute_dml(spark, table, f"COPY INTO t FROM '{src}' FILEFORMAT = CSV")
    got = read_version(spark, table).filter("k >= 900").orderBy("k").collect()
    assert [(r.k, r.v, r.s) for r in got] == [
        (900, 1.5, "from csv"), (901, 2.5, "also csv"),
    ]


def test_describe_history_and_detail(spark, table):
    """r14: DESCRIBE HISTORY (latest-first commit log) and DESCRIBE
    DETAIL (head summary) as SQL — manifest-only."""
    from fdf_spark.sources.sqldml import execute_sql

    execute_dml(spark, table, "DELETE FROM t WHERE k < 10")
    h = execute_sql(spark, table, "DESCRIBE HISTORY t").collect()
    assert [r.version for r in h] == [2, 1]
    assert h[0].mode == "delete"
    d = execute_sql(spark, table, "DESCRIBE DETAIL t").first()
    assert d.version == 2 and d.num_files >= 1 and d.num_rows == 100
    assert d.num_constraints == 0 and d.size_bytes > 0


def test_vacuum_dry_run(spark, table):
    """r14: VACUUM … DRY RUN reports exactly what the destructive form
    then deletes — one retention rule, two modes — and touches nothing."""
    import os

    from fdf_spark.sources.versioned import _read_manifest

    execute_dml(spark, table, "INSERT OVERWRITE t SELECT CAST(1 AS LONG), 2.0, 'x'")
    old_files = _read_manifest(table, 1)["files"]
    n_dry = execute_dml(spark, table, "VACUUM t RETAIN 0 HOURS DRY RUN")
    assert n_dry == len(old_files)
    assert all(os.path.exists(f) for f in old_files)  # nothing deleted
    assert read_version(spark, table, 1).count() == 100  # time travel intact
    n_real = execute_dml(spark, table, "VACUUM t RETAIN 0 HOURS")
    assert n_real == n_dry
    assert not any(os.path.exists(f) for f in old_files)


def test_execute_sql_target_is_top_level_from(spark, table):
    """A scalar subquery's FROM earlier in the statement must not
    steal the target — the versioned table is the first TOP-LEVEL
    FROM's name."""
    from fdf_spark.sources.sqldml import execute_sql

    spark.range(7).createOrReplaceTempView("other_rel")
    r = execute_sql(
        spark, table,
        "SELECT (SELECT COUNT(*) FROM other_rel) AS o, COUNT(*) AS n "
        "FROM t VERSION AS OF 1",
    ).first()
    assert (r.o, r.n) == (7, 100)
    spark.catalog.dropTempView("other_rel")


def test_execute_sql_multi_table_federated_join(spark, tmp_path):
    """r14: tables={name: path} binds SEVERAL versioned tables in one
    statement, each with its own AS OF pin — a federated snapshot join."""
    from fdf_spark.sources.sqldml import execute_sql
    from fdf_spark.sources.versioned import commit_version

    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    commit_version(
        spark.range(10).select(F.col("id").alias("k"), F.lit("a1").alias("tag")), pa_
    )
    commit_version(
        spark.range(10).select(F.col("id").alias("k"), F.lit("a2").alias("tag")),
        pa_, mode="overwrite",
    )
    commit_version(
        spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w")), pb
    )
    r = execute_sql(
        spark, None,
        "SELECT COUNT(*) AS n, MIN(a.tag) AS tag, CAST(SUM(b.w) AS LONG) AS w "
        "FROM a VERSION AS OF 1 a JOIN b ON a.k = b.k",
        tables={"a": pa_, "b": pb},
    ).first()
    assert (r.n, r.tag, r.w) == (5, "a1", 100)
    # head read of `a` sees the overwrite
    r2 = execute_sql(
        spark, None, "SELECT MIN(tag) AS tag FROM a", tables={"a": pa_}
    ).first()
    assert r2.tag == "a2"


# ---------------------------------------------------------------------------
# table_changes(...) SQL table function (r14)
# ---------------------------------------------------------------------------


def test_sql_table_changes_group_counts(spark, table):
    from fdf_spark.sources.sqldml import execute_sql

    execute_dml(spark, table, "UPDATE t SET v = v + 1 WHERE k % 10 = 0")
    execute_dml(spark, table, "DELETE FROM t WHERE k >= 95")
    out = execute_sql(
        spark, table,
        "SELECT _commit_version AS cv, _change_type AS ct, COUNT(*) AS n "
        "FROM table_changes(t, 2, 3) GROUP BY cv, ct ORDER BY cv, ct",
    ).collect()
    assert [(r["cv"], r["ct"], r["n"]) for r in out] == [
        (2, "delete", 10), (2, "insert", 10), (3, "delete", 5),
    ]


def test_sql_table_changes_join_head_and_ref(spark, table):
    from fdf_spark.sources.sqldml import execute_sql
    from fdf_spark.sources.versioned import create_tag

    execute_dml(spark, table, "UPDATE t SET v = v + 1 WHERE k % 10 = 0")
    create_tag(table, "u", 2)
    # the feed joins back to the HEAD by bare name — target detection
    # must bind `t`, not the synthetic feed view
    out = execute_sql(
        spark, table,
        "SELECT c.k AS k, h.v AS head_v FROM table_changes(t, 'u', 'u') c "
        "JOIN t h ON c.k = h.k WHERE c._change_type = 'insert' ORDER BY k",
    ).collect()
    assert [r["k"] for r in out] == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]
    assert all(r["head_v"] == (r["k"] % 7) + 1 for r in out)
    # quoted-string FROM cannot derail the rewrite
    one = execute_sql(
        spark, table,
        "SELECT COUNT(*) AS n, 'FROM table_changes(t, 9, 9)' AS lit "
        "FROM table_changes(t, 1, 1)",
    ).first()
    assert one["n"] == 100


def test_sql_table_changes_requires_binding(spark, table):
    from fdf_spark.sources.sqldml import execute_sql

    with pytest.raises(ValueError, match="no versioned path bound"):
        execute_sql(
            spark, None, "SELECT * FROM table_changes(nosuch, 1)", tables={}
        )
    # but tables= binding resolves it
    out = execute_sql(
        spark, None,
        "SELECT COUNT(*) AS n FROM table_changes(other, 1, 1)",
        tables={"other": table},
    ).first()
    assert out["n"] == 100


def test_sql_analyze_and_describe_stats(spark, table):
    from fdf_spark.sources.sqldml import execute_sql

    # before any ANALYZE: an empty relation with the stats schema
    empty = execute_sql(spark, table, "DESCRIBE STATS t")
    assert empty.count() == 0 and "ndv" in empty.columns
    v = execute_dml(
        spark, table, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, s EXACT"
    )
    assert v == 2
    rows = {
        r["col"]: r for r in execute_sql(spark, table, "DESCRIBE STATS t").collect()
    }
    assert set(rows) == {"k", "s"}
    assert rows["k"]["ndv"] == 100 and rows["k"]["nulls"] == 0
    assert rows["s"]["max_len"] == len("row 99")
    assert rows["k"]["rows"] == 100 and rows["k"]["mode"] == "exact"
    # approx is the default mode
    execute_dml(spark, table, "ANALYZE TABLE t")
    got = execute_sql(spark, table, "DESCRIBE STATS t").first()
    assert got["mode"] == "approx"
    with pytest.raises(ValueError, match="empty column"):
        execute_dml(spark, table, "ANALYZE TABLE t FOR COLUMNS k,")


def test_sql_tblproperties_roundtrip_and_append_only(spark, table):
    from fdf_spark.sources.sqldml import execute_sql

    execute_dml(
        spark, table,
        "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'eng', 'fdf.appendOnly' = 'true')",
    )
    props = {
        r["key"]: r["value"]
        for r in execute_sql(spark, table, "SHOW TBLPROPERTIES t").collect()
    }
    assert props == {"owner": "eng", "fdf.appendOnly": "true"}
    with pytest.raises(ValueError, match="append-only"):
        execute_dml(spark, table, "DELETE FROM t WHERE k < 10")
    execute_dml(
        spark, table, "ALTER TABLE t UNSET TBLPROPERTIES IF EXISTS ('fdf.appendOnly')"
    )
    assert execute_dml(spark, table, "DELETE FROM t WHERE k < 10") > 0
    with pytest.raises(ValueError, match="TBLPROPERTIES pair"):
        execute_dml(spark, table, "ALTER TABLE t SET TBLPROPERTIES (owner = 'x')")


def test_ctas_partitioned_by_and_tblproperties(spark, tmp_path):
    from fdf_spark.sources.sqldml import execute_sql
    from fdf_spark.sources.versioned import (
        list_versions,
        partition_spec,
        read_version,
        table_properties,
    )

    spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("g")
    ).createOrReplaceTempView("ctas_src")
    p = str(tmp_path / "ctas")
    execute_dml(
        spark, p,
        "CREATE TABLE t PARTITIONED BY (bucket(8, k)) "
        "TBLPROPERTIES ('fdf.appendOnly' = 'true') AS SELECT * FROM ctas_src",
    )
    assert partition_spec(p)["cols"] == ["bucket(8, k)"]
    assert table_properties(p)["fdf.appendOnly"] == "true"
    assert read_version(spark, p).count() == 5000
    # the property gate applies from the very first data file
    with pytest.raises(ValueError, match="append-only"):
        execute_dml(spark, p, "DELETE FROM t WHERE k = 1")
    # a keyed probe prunes through the transform on the CTAS layout
    n_all = len(read_version(spark, p).inputFiles())
    from fdf_spark.sources.versioned import read_version as rv

    probed = rv(spark, p, prune=("k", [17]))
    assert probed.filter("k = 17").count() == 1
    if n_all > 1:
        assert len(probed.inputFiles()) < n_all
    # spec-only form (no TBLPROPERTIES)
    p2 = str(tmp_path / "ctas2")
    execute_dml(
        spark, p2, "CREATE TABLE t PARTITIONED BY (g) AS SELECT * FROM ctas_src"
    )
    assert partition_spec(p2)["cols"] == ["g"]
    # props-only form (no PARTITIONED BY)
    p3 = str(tmp_path / "ctas3")
    execute_dml(
        spark, p3,
        "CREATE TABLE t TBLPROPERTIES ('a' = '1') AS SELECT * FROM ctas_src",
    )
    assert table_properties(p3) == {"a": "1"}
    # plain CTAS still lands in ONE commit
    p4 = str(tmp_path / "ctas4")
    execute_dml(spark, p4, "CREATE TABLE t AS SELECT * FROM ctas_src")
    assert list_versions(p4) == [1]
    # a string literal containing ' AS ' inside the query cannot
    # derail clause parsing
    p5 = str(tmp_path / "ctas5")
    execute_dml(
        spark, p5,
        "CREATE TABLE t AS SELECT k, ' AS x FROM y' AS lit FROM ctas_src WHERE k < 3",
    )
    assert read_version(spark, p5).columns == ["k", "lit"]


def test_sql_vacuum_honors_table_policy(spark, table):
    from fdf_spark.sources.versioned import list_versions, set_properties

    execute_dml(spark, table, "DELETE FROM t WHERE k < 10")
    execute_dml(spark, table, "OPTIMIZE t")  # folds -> old files unreferenced
    # policy: keep 2 snapshots, zero time-based retention
    set_properties(
        table,
        {"fdf.maintenance.keep": "2", "fdf.maintenance.retainLastHours": "0"},
    )
    # bare VACUUM resolves the policy: keeps the last TWO versions
    reclaimed = execute_dml(spark, table, "VACUUM t")
    assert reclaimed > 0
    assert len(list_versions(table)) == 2
    # explicit RETAIN overrides the policy hours (dry run: count only)
    assert execute_dml(spark, table, "VACUUM t RETAIN 168 HOURS DRY RUN") == 0


def test_sql_optimize_where_and_show_partitions(spark, tmp_path):
    from fdf_spark.sources.sqldml import execute_sql
    from fdf_spark.sources.versioned import (
        _read_manifest,
        commit_version,
        list_versions,
        set_partition_spec,
    )

    p = str(tmp_path / "ow")
    df = spark.range(0, 40_000).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("g")
    )
    commit_version(df.limit(0), p)
    set_partition_spec(p, ["bucket(4, k)"])
    commit_version(df, p)
    parts = execute_sql(spark, p, "SHOW PARTITIONS t").collect()
    assert sum(r.n_rows for r in parts) == 40_000
    assert any(r.partition.startswith("bucket(4, k)=") for r in parts)
    # scoped OPTIMIZE needs a layout whose stats can exclude files —
    # range-cluster on k (under the hash-bucketed layout above every
    # bucket overlaps k < 5000, and the superset rule keeps them all)
    p2 = str(tmp_path / "ow2")
    commit_version(df.repartitionByRange(8, "k"), p2)
    before = set(_read_manifest(p2, list_versions(p2)[-1])["files"])
    v = execute_dml(spark, p2, "OPTIMIZE t WHERE k < 5000 ZORDER BY (k)")
    after = set(_read_manifest(p2, v)["files"])
    # scoped: most files carried over untouched
    assert len(before & after) >= 6
    assert read_version(spark, p2).count() == 40_000
