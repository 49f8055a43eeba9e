"""HTML → text extraction (operators/html_extract.py): the markup
shapes that break naive strippers — scripts containing raw ``<``,
comments containing fake tags, nested tags inside anchors, entity
double-decode traps, case-insensitive tags — plus the link-density
boilerplate signal."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from anime_data_pipeline_spark.operators.html_extract import (
    link_density,
    n_links,
    strip_html_text,
)


def _run(spark, html: str) -> dict:
    df = spark.createDataFrame([(html,)], "raw string")
    clean = strip_html_text(F.col("raw"))
    row = df.select(
        clean.alias("clean"),
        n_links(F.col("raw")).alias("n_links"),
        link_density(F.col("raw"), clean).alias("density"),
    ).first()
    return {"clean": row["clean"], "n_links": row["n_links"], "density": row["density"]}


def test_script_with_raw_angle_brackets(spark):
    out = _run(
        spark,
        '<body><p>keep</p><script>if (a < b && b > c) { x("</p>"); }</script>'
        "<p>also</p></body>",
    )
    assert out["clean"] == "keep\nalso"


def test_comment_containing_fake_tags_removed_first(spark):
    out = _run(spark, "<div>real</div><!-- <p>fake</p> <br> --><div>text</div>")
    assert out["clean"] == "real\ntext"


def test_head_block_dropped_entirely(spark):
    out = _run(
        spark,
        "<html><head><title>T</title><style>p{}</style></head>"
        "<body><p>body only</p></body></html>",
    )
    assert out["clean"] == "body only"


def test_nested_tags_inside_anchor(spark):
    html = '<p><a href="/x"><b>Bo</b>ld</a> rest</p>'
    out = _run(spark, html)
    assert out["clean"] == "Bold rest"
    assert out["n_links"] == 1
    # anchor text "Bold" = 4 chars over 9 clean chars
    assert abs(out["density"] - 4 / 9) < 1e-12


def test_entities_decode_once_not_twice(spark):
    out = _run(spark, "<p>&amp;lt; &amp; &lt; &nbsp;&#39;&quot;</p>")
    # &amp;lt; renders as the literal string "&lt;", NOT "<"
    assert out["clean"] == "&lt; & < '\""


def test_br_and_block_closers_become_newlines(spark):
    out = _run(spark, "<p>a<br>b</p><h2>c</h2><li>d</li>")
    assert out["clean"] == "a\nb\nc\nd"


def test_case_insensitive_tags(spark):
    out = _run(spark, '<BODY><P>X</P><A HREF="/y">Y</A></BODY>')
    assert out["clean"] == "X\nY"
    assert out["n_links"] == 1


def test_whitespace_collapse(spark):
    out = _run(spark, "<p>a   b\t\tc</p>  <p>  d  </p>")
    assert out["clean"] == "a b c\nd"


def test_plain_text_passthrough(spark):
    out = _run(spark, "no markup at all")
    assert out["clean"] == "no markup at all"
    assert out["n_links"] == 0 and out["density"] == 0.0


def test_empty_page_density_is_boilerplate(spark):
    out = _run(spark, '<nav><a href="/">Home</a></nav>')
    assert out["clean"] == "Home"
    assert out["density"] == pytest.approx(1.0)
