"""HTML→text extraction (llm/htmltext.py): the regexp_replace chain,
entity order, boilerplate tier, and the Spark↔DuckDB twin property."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fdf_spark.llm.htmltext import (
    boilerplate_line_filter,
    html_to_text,
    sql_boilerplate_line_filter,
    sql_html_to_text,
)

CASES = [
    # script/style bodies vanish even with attributes and comparison
    # operators inside the JS
    '<html><script type="x">if (a < b && c > d) { x("</p>"); }</script>'
    "<style>p > a { color: red }</style><p>body text here</p></html>",
    # entity decode is one-level: &amp;lt; renders as &lt;, never <
    "<p>fish &amp; chips &amp;lt; not-a-tag &gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>",
    # block tags become line breaks; inline tags become spaces
    "<h1>Title</h1><p>one</p><p>two</p><span>in</span>line<br>next",
    # comments, weird whitespace, empty result
    "<!-- only a comment -->   \t  ",
    # unicode survives
    "<p>ünïcødé 中文 text</p>",
]


def test_html_to_text_semantics(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "html string")
    got = [r.t for r in df.select(html_to_text("html").alias("t")).collect()]
    assert got[0] == "body text here"
    assert got[1] == 'fish & chips &lt; not-a-tag > "q" \'s\' end'
    assert got[2] == "Title\none\ntwo\nin line\nnext"
    assert got[3] == ""
    assert got[4] == "ünïcødé 中文 text"


def test_sql_twin_matches_spark(spark):
    """The DuckDB replay (sql_html_to_text / sql_boilerplate_line_filter)
    produces byte-identical output for every tricky case — the property
    q174's hash gate rests on."""
    df = spark.createDataFrame([(c,) for c in CASES], "html string")
    got = [
        (r.t, r.c)
        for r in df.select(
            html_to_text("html").alias("t"),
            boilerplate_line_filter(html_to_text("html"), 3).alias("c"),
        ).collect()
    ]
    con = duckdb.connect()
    for case, (t_spark, c_spark) in zip(CASES, got):
        row = con.execute(
            f"SELECT {sql_html_to_text('?')} AS t, "
            f"{sql_boilerplate_line_filter(sql_html_to_text('?'), 3)} AS c",
            [case, case],
        ).fetchone()
        assert row[0] == t_spark, case
        assert row[1] == c_spark, case


def test_boilerplate_filter_drops_short_lines(spark):
    txt = "home | about\nThis is a long body sentence with many words.\nfooter"
    df = spark.createDataFrame([(txt,)], "t string")
    out = df.select(boilerplate_line_filter("t", 4).alias("c")).first().c
    assert out == "This is a long body sentence with many words."
