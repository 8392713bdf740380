"""Partitioned table sink (SURVEY S10 / §4 physical layout)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fdf_spark.sources.sinks import write_table


def test_write_table_layout_and_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(s, float(t), float(s * 1000 + t)) for s in (141000, 141001) for t in range(50)],
        "shot long, time double, value double",
    )
    out = str(tmp_path / "sig")
    write_table(df, out)
    # hive-style partition dirs on shot → partition pruning
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shot="))
    assert dirs == ["shot=141000", "shot=141001"]
    back = spark.read.parquet(out)
    assert back.count() == 100
    # partition-pruned single-shot read matches
    one = back.filter(F.col("shot") == 141000)
    assert one.count() == 50
    got = sorted(r["value"] for r in one.collect())
    assert got == [float(141000 * 1000 + t) for t in range(50)]


def test_write_table_time_sorted_within_partition(spark, tmp_path):
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(141000, float(t), 0.0) for t in range(999, -1, -1)],  # reversed input
        "shot long, time double, value double",
    ).coalesce(1)
    out = str(tmp_path / "sorted")
    write_table(df, out)
    part = os.path.join(out, "shot=141000")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    t = pq.read_table(os.path.join(part, files[0]), columns=["time"])["time"].to_pylist()
    assert t == sorted(t)  # min/max page stats usable for time pruning


def test_zorder_sort_tightens_rowgroup_stats(spark, tmp_path):
    """Sorting by morton_key(x, y) before writing gives parquet row-group
    min/max ranges that are tight in BOTH dimensions; a single-column
    sort leaves the other dimension's per-group range at ~full width.
    Measured, not asserted by faith: mean per-row-group y-range must
    shrink by >2x vs the x-sorted layout."""
    import glob

    import pyarrow.parquet as pq

    from fdf_spark.functions.scalar import morton_key

    # ~16 row groups of ~4k rows → z-order tiles the 4096² space at
    # depth 2 (1024-wide in each dim) while an x-sort leaves y at full width
    n = 1 << 16
    df = (
        spark.range(n)
        .select(
            (F.col("id") * 2654435761 % 4096).alias("x"),
            (F.col("id") * 40503 % 4096).alias("y"),
        )
    )

    def mean_range(path, col, rows_per_group=1024):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
                st = md.row_group(g).column(idx).statistics
                spans.append(st.max - st.min)
        assert spans
        return sum(spans) / len(spans)

    opts = {"parquet.block.size": str(64 * 1024)}  # small row groups
    xsorted = str(tmp_path / "xsorted")
    df.orderBy("x").coalesce(1).write.options(**opts).parquet(xsorted)
    zsorted = str(tmp_path / "zsorted")
    df.withColumn("z", morton_key(F.col("x"), F.col("y"), bits=12)).orderBy(
        "z"
    ).drop("z").coalesce(1).write.options(**opts).parquet(zsorted)

    y_x = mean_range(xsorted, "y")
    y_z = mean_range(zsorted, "y")
    x_z = mean_range(zsorted, "x")
    # x-sorted leaves y unclustered (~full 4096 width); z-order clusters both
    assert y_z < y_x / 2, (y_z, y_x)
    assert x_z < 4096 * 0.75, x_z


def test_ivf_index_partition_pruned_probe(spark, tmp_path):
    """SCALE.md's IVF claim, demonstrated: a cell-partitioned index layout
    makes an nprobe probe a PARTITION-PRUNED scan. Asserts (a) the probe
    result is identical to the in-memory ivf_ann_topk, (b) the scan's
    PartitionFilters carry the cell predicate, and (c) the files actually
    read span exactly the probed cells — not all of them."""
    import re

    from fdf_spark.llm.similarity import ivf_ann_topk, ivf_probe_pruned, write_ivf_index

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx, num_cells=16)

    pruned = ivf_probe_pruned(spark, idx, queries, k=5, nprobe=2)
    expected = sorted(map(tuple, ivf_ann_topk(queries, emb, k=5, num_cells=16, nprobe=2).collect()))
    got = sorted(map(tuple, pruned.collect()))
    assert got == expected

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*cell", plan), plan
    # files ACTUALLY read (input_file_name over the executed filtered scan
    # — DataFrame.inputFiles() lists the FileIndex pre-pruning and can't
    # see partition pruning)
    probed = {
        int(m.group(1))
        for (f,) in spark.read.parquet(f"{idx}/corpus")
        .filter(F.col("cell").isin([int(c) for c in cells_from_plan(plan)]))
        .select(F.input_file_name())
        .distinct()
        .collect()
        for m in [re.search(r"cell=(\d+)", f)]
        if m
    }
    n_cells_total = len(
        {m.group(1) for f in spark.read.parquet(f"{idx}/corpus").inputFiles()
         for m in [re.search(r"cell=(\d+)", f)] if m}
    )
    assert 0 < len(probed) < n_cells_total, (probed, n_cells_total)


def cells_from_plan(plan: str) -> list[str]:
    """Extract the IN-list literals from the scan's PartitionFilters."""
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+L? IN \(([^)]*)\)", plan)
    assert m, plan
    return [tok.strip() for tok in m.group(1).split(",")]


def test_compact_table_small_files_and_skewed_partition(spark, tmp_path):
    """40 tiny append files collapse to one file per shot dir; with a
    deliberately small target the bigger shot splits into multiple
    chunks while the small one stays a single file. Content and
    within-file time sort survive both ways."""
    from fdf_spark.sources.sinks import compact_table, write_table

    out = str(tmp_path / "frag")
    for i in range(20):  # streaming-sink-style fragmentation
        df = spark.createDataFrame(
            [(141000, float(t + 50 * i), float(t + i)) for t in range(50)]
            + ([(141001, float(i), 1.0)] if i < 3 else []),
            "shot long, time double, value double",
        )
        write_table(df, out, mode="append")
    orig = sorted(map(tuple, spark.read.parquet(out).collect()))

    def files_per_dir(p):
        import os

        d = {}
        for root, _dirs, files in os.walk(p):
            n = len([f for f in files if f.endswith(".parquet")])
            if n:
                d[os.path.basename(root)] = n
        return d

    assert sum(files_per_dir(out).values()) >= 20
    stats = compact_table(spark, out, target_bytes=1 << 30)
    assert stats["files_before"] >= 20
    assert files_per_dir(out) == {"shot=141000": 1, "shot=141001": 1}
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == orig

    # re-fragment check with a tiny target: the 1000-row shot must split,
    # the 3-row shot must not
    stats2 = compact_table(spark, out, target_bytes=4096)
    per = files_per_dir(out)
    assert per["shot=141001"] == 1
    assert per["shot=141000"] > 1
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == orig

    # within-file sort preserved (page-stats contract)
    import os

    import pyarrow.parquet as pq

    part = os.path.join(out, "shot=141000")
    for f in os.listdir(part):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(part, f), columns=["time"])["time"].to_pylist()
            assert t == sorted(t)
