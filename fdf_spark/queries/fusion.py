"""Fusion-signal selection semantics, oracle-checked on the events table
(SURVEY §2.2 P2/P4/P5, §2.3 J4, §2.4 A1/A4, §2.5).

The events table plays the role of a non-uniform-grid signal: ``ts``
is the time axis, ``user_id`` the shot/channel key, ``value`` the
sample. Each query drives one of the library operators in
``fdf_spark.operators`` and pins its exact reference convention
against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fdf_spark.functions.scalar import davg, sql_davg
from fdf_spark.operators.asof import asof_join
from fdf_spark.operators.gradient import sql_gradient
from fdf_spark.operators.selection import nearest_sample, positional_slice, value_window
from fdf_spark.operators.windows import baseline_subtract
from fdf_spark.queries import query
from fdf_spark.sources.tables import load_table as T

TS0 = "2024-01-15 12:00:00"
TS_LO = "2024-01-10 00:00:00"
TS_HI = "2024-01-20 00:00:00"


@query(
    "q40_nearest_event",
    f"""
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY abs(epoch_us(ts) - epoch_us(TIMESTAMP '{TS0}')), ts) AS rn
      FROM events)
    WHERE rn = 1
    ORDER BY user_id
    """,
    operators=("P5", "A4", "O4", "J4"),
    doc="Nearest-sample point lookup per group — Signal.__call__ scalar path "
    "(fdf_signal.py:298-300), argmin-first tie-break.",
)
def q40_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        nearest_sample(ev, "ts", TS0, by=["user_id"])
        .select("user_id", "event_id", "ts", "value")
        .orderBy("user_id")
    )


@query(
    "q41_asof_attribution",
    """
    SELECT p.user_id, p.event_id, p.ts,
           c.event_id AS click_id, c.ts AS click_ts, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.user_id, p.ts
    """,
    operators=("J4",),
    doc="Backward as-of join (purchase ← latest click), union-trick plan; "
    "oracle is DuckDB's native ASOF JOIN.",
)
def q41_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id", "value")
    return (
        asof_join(purchases, clicks, on="ts", by=["user_id"], direction="backward")
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_id_right").alias("click_id"),
            F.col("ts_right").alias("click_ts"),
            F.col("value_right").alias("click_value"),
        )
        .orderBy("user_id", "ts")
    )


@query(
    "q42_value_window_snap",
    f"""
    WITH lo AS (
      SELECT user_id, ts AS t_lo FROM (
        SELECT user_id, ts, ROW_NUMBER() OVER (
          PARTITION BY user_id
          ORDER BY abs(epoch_us(ts) - epoch_us(TIMESTAMP '{TS_LO}')), ts) AS rn
        FROM events) WHERE rn = 1),
    hi AS (
      SELECT user_id, ts AS t_hi FROM (
        SELECT user_id, ts, ROW_NUMBER() OVER (
          PARTITION BY user_id
          ORDER BY abs(epoch_us(ts) - epoch_us(TIMESTAMP '{TS_HI}')), ts) AS rn
        FROM events) WHERE rn = 1)
    SELECT e.user_id, e.event_id, e.ts
    FROM events e JOIN lo USING (user_id) JOIN hi USING (user_id)
    WHERE e.ts >= lo.t_lo AND e.ts < hi.t_hi
    ORDER BY e.user_id, e.ts
    """,
    operators=("P4", "P3"),
    doc="Value-based axis window with nearest-endpoint snap, hi EXCLUDED — "
    "Signal.__call__ range path (fdf_signal.py:296-297,301).",
)
def q42_value_window_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        value_window(ev, "ts", TS_LO, TS_HI, by=["user_id"])
        .select("user_id", "event_id", "ts")
        .orderBy("user_id", "ts")
    )


@query(
    "q43_positional_slice",
    """
    SELECT user_id, event_id, ts, CAST(rn - 1 AS BIGINT) AS pos FROM (
      SELECT user_id, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
    WHERE rn - 1 >= 10 AND rn - 1 < 20 AND (rn - 1 - 10) % 2 = 0
    ORDER BY user_id, pos
    """,
    operators=("P2", "P3"),
    doc="numpy positional slice [10:20:2] per group — Signal.__getitem__ "
    "(fdf_signal.py:182-231), 0-based half-open with step.",
)
def q43_positional_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        positional_slice(ev, order=["ts", "event_id"], start=10, stop=20, step=2, by=["user_id"])
        .select("user_id", "event_id", "ts", F.col("__pos").cast("bigint").alias("pos"))
        .orderBy("user_id", "pos")
    )


@query(
    "q91_negative_slice",
    """
    WITH s AS (
      SELECT user_id, event_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) - 1 AS pos,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events),
    sl AS (
      SELECT 'slice' AS src, user_id, event_id, pos,
             (pos - greatest(n - 20, 0)) // 3 AS sel
      FROM s
      WHERE pos >= greatest(n - 20, 0) AND pos < greatest(n - 5, 0)
        AND (pos - greatest(n - 20, 0)) % 3 = 0),
    tk AS (
      SELECT 'take' AS src, s.user_id, s.event_id, s.pos, w.sel
      FROM s JOIN (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                          (1, -1), (2, 5), (3, -1)) w(sel, raw)
        ON s.pos = CASE WHEN w.raw < 0 THEN w.raw + s.n ELSE w.raw END)
    SELECT src, user_id, event_id, CAST(pos AS BIGINT) AS pos, CAST(sel AS BIGINT) AS sel
    FROM (SELECT * FROM sl UNION ALL SELECT * FROM tk)
    ORDER BY src, user_id, sel
    """,
    operators=("P2", "P3"),
    doc="Full parseindex surface (fdf_signal.py:189-206,269-281): negative "
    "slice bounds resolved against each group's length ([-20:-5:3] = 'the "
    "5th-to-20th most recent, every 3rd'), plus fancy int-array take "
    "[0, -1, 5, -1] with a duplicated position — sel carries numpy output "
    "order, duplicates preserved.",
)
def q91_negative_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.operators.selection import positional_take

    ev = T(spark, sf_dir, "events")
    order, by = ["ts", "event_id"], ["user_id"]
    sl = positional_slice(ev, order=order, start=-20, stop=-5, step=3, by=by).select(
        F.lit("slice").alias("src"), "user_id", "event_id",
        F.col("__pos").cast("bigint").alias("pos"), F.col("__sel").cast("bigint").alias("sel"),
    )
    tk = positional_take(ev, order=order, positions=[0, -1, 5, -1], by=by).select(
        F.lit("take").alias("src"), "user_id", "event_id",
        F.col("__pos").cast("bigint").alias("pos"), F.col("__sel").cast("bigint").alias("sel"),
    )
    return sl.unionByName(tk).orderBy("src", "user_id", "sel")


@query(
    "q92_signal_arithmetic",
    """
    SELECT a.l_orderkey, a.l_linenumber,
           (a.l_extendedprice / b.l_quantity) / 1000.0 AS unit_price_k
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    WHERE a.l_orderkey % 25 = 1
    ORDER BY a.l_orderkey, a.l_linenumber
    """,
    operators=("J3", "F1", "F2", "P3"),
    doc="Signal arithmetic surface (fdf_signal.py:30-92: Signal is an "
    "ndarray subclass, so sig_a / sig_b and sig / scalar work directly): "
    "two long-format signals on the (orderkey, linenumber) grid combined "
    "via SignalExpr's axis-equi-join + column arithmetic, then a scalar "
    "broadcast — the oracle replays the join explicitly.",
)
def q92_signal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.operators.arith import SignalExpr

    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 25 == 1)
    mk = lambda col, units: SignalExpr(
        li.select(
            F.col("l_orderkey").alias("shot"),
            F.col("l_linenumber").alias("line"),
            F.col(col).alias("value"),
        ),
        axes=["line"],
        units=units,
    )
    ratio = (mk("l_extendedprice", "usd") / mk("l_quantity", "unit")) / 1000.0
    assert ratio.units == "usd/unit"
    return ratio.df.select(
        F.col("shot").alias("l_orderkey"),
        F.col("line").alias("l_linenumber"),
        F.col("value").alias("unit_price_k"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q96_resample_linear",
    f"""
    WITH s AS (SELECT user_id, epoch_us(ts) / 1e6 AS t, value AS v, 0 AS is_grid FROM events),
    bounds AS (SELECT epoch_us(TIMESTAMP '{TS_LO}') / 1e6 AS lo,
                      epoch_us(TIMESTAMP '{TS_HI}') / 1e6 AS hi),
    grid AS (
      SELECT u.user_id, b.lo + g.i * (b.hi - b.lo) / 8 AS t,
             CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN bounds b CROSS JOIN (SELECT unnest(range(9)) AS i) g),
    u AS (SELECT * FROM s UNION ALL SELECT * FROM grid),
    m AS (
      SELECT *,
        last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY t, is_grid ROWS UNBOUNDED PRECEDING) AS pt,
        last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY t, is_grid ROWS UNBOUNDED PRECEDING) AS pv,
        last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY t DESC, is_grid DESC ROWS UNBOUNDED PRECEDING) AS nt,
        last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY t DESC, is_grid DESC ROWS UNBOUNDED PRECEDING) AS nv
      FROM u)
    SELECT user_id, round(t, 6) AS t,
           round(CASE WHEN pt IS NULL THEN nv WHEN nt IS NULL THEN pv
                      WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END, 6) AS value
    FROM m WHERE is_grid = 1 ORDER BY user_id, t
    """,
    operators=("P4", "P5", "J4", "P3"),
    doc="Grid resampling with linear interpolation (np.interp semantics: "
    "edge clamp outside the sampled range, exact value on coordinate "
    "hits): per-user event series resampled onto a shared 9-point uniform "
    "grid. UDF-free and join-free — grid points union into the sample "
    "stream and two directional windows bracket each one; the alignment "
    "step that lets SignalExpr arithmetic combine signals on different "
    "grids.",
)
def q96_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fdf_spark.operators.resample import resample_linear

    ev = T(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / F.lit(1e6)).alias("t"), "value"
    )
    lo = F.unix_micros(F.lit(TS_LO).cast("timestamp")) / F.lit(1e6)
    hi = F.unix_micros(F.lit(TS_HI).cast("timestamp")) / F.lit(1e6)
    grid = (
        ev.select("user_id")
        .distinct()
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(8))).alias("i"))
        .select("user_id", (lo + F.col("i") * (hi - lo) / F.lit(8)).alias("t"))
    )
    out = resample_linear(ev, "t", grid, by=["user_id"])
    return out.select(
        "user_id", F.round("t", 6).alias("t"), F.round("value", 6).alias("value")
    ).orderBy("user_id", "t")


@query(
    "q44_baseline_subtract",
    """
    WITH ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events),
    b AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value) AS baseline
      FROM ranked WHERE rn <= 10
      GROUP BY user_id, event_type)
    SELECT e.user_id, e.event_type, e.event_id, e.value,
           e.value - b.baseline AS value_adj
    FROM events e JOIN b USING (user_id, event_type)
    ORDER BY e.event_id
    """,
    operators=("A1", "A5", "F2", "X2"),
    doc="Baseline mean subtraction: value − mean(first 10 samples) per group "
    "(usxr/_postprocess.py:10-12 with n=1000→10 for fixture size).",
)
def q44_baseline_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        baseline_subtract(
            ev, value="value", order=["ts", "event_id"], n=10,
            by=["user_id", "event_type"], out="value_adj",
        )
        .select("user_id", "event_type", "event_id", "value", "value_adj")
        .orderBy("event_id")
    )


@query(
    "q45_sample_spacing",
    f"""
    SELECT user_id,
           {sql_davg("(epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0")} AS avg_gap_sec,
           COUNT(prev_ts) AS n_gaps
    FROM (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
    GROUP BY user_id
    ORDER BY user_id
    """,
    operators=("P2",),
    doc="lag-based sample spacing on a non-uniform grid (§2.5 declared "
    "analytic surface; grid diagnostics for nearest-sample ops).",
)
def q45_sample_spacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) / 1_000_000.0
    return (
        ev.withColumn("gap", gap)
        .groupBy("user_id")
        .agg(davg("gap").alias("avg_gap_sec"), F.count("gap").alias("n_gaps"))
        .orderBy("user_id")
    )


@query(
    "q101_gradient",
    f"""
    WITH series AS (
      SELECT user_id, epoch_us(ts) / 1000000.0 AS t, value
      FROM (SELECT user_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
            FROM events) WHERE rn = 1)
    SELECT user_id, t, value,
           {sql_gradient("value", "t", "user_id")} AS grad
    FROM series
    ORDER BY user_id, t
    """,
    operators=("A10",),
    doc="numpy.gradient parity on a non-uniform time grid: dValue/dt per "
    "user series (second-order interior, one-sided edges). The reference "
    "hands Signal ndarrays straight to numpy (fdf_signal.py:30-92), making "
    "np.gradient(ip, t) the idiomatic derivative; the long format needs "
    "this explicit window-algebra operator. Ties in ts are removed first "
    "(rn=1 by event_id) so the grid is strictly increasing and both "
    "engines see a deterministic series.",
)
def q101_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from fdf_spark.operators.gradient import gradient

    ev = T(spark, sf_dir, "events")
    rn = F.row_number().over(W.partitionBy("user_id", "ts").orderBy("event_id"))
    series = (
        ev.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            (F.unix_micros("ts") / F.lit(1_000_000.0)).alias("t"),
            "value",
        )
    )
    return gradient(series, value="value", axis="t", by=("user_id",), out="grad").orderBy(
        "user_id", "t"
    )
