"""HTML→text extraction: the north-rule byte-identity invariant, plus
plan-shape gates. (The cross-engine value check for the `extract_text`
query runs through tools/check_oracles.py like every registered query.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import plan_of


def test_pages_html_extracts_byte_identical(spark):
    """extract_text_expr(pages.html) == pages.text for EVERY row — the
    executable form of "byte-identical extracted text per url". Compared
    as UTF-8 bytes (binary equality), not just string equality."""
    from isimip_qa_spark.functions.extract import extract_text_expr
    from isimip_qa_spark.sources.pages import pages_df

    pages = pages_df(spark, 2000, num_partitions=4)
    bad = pages.filter(
        extract_text_expr(F.col("html")).cast("binary")
        != F.col("text").cast("binary")
    ).count()
    assert bad == 0


def test_extract_drops_head_script_style_and_decodes_entities(spark):
    from isimip_qa_spark.functions.extract import extract_text_expr

    html = (
        b"<html><head><title>t</title><style>b{}</style></head>"
        b'<body><SCRIPT lang="js">if (1<2) alert("x")</SCRIPT>'
        b"<p>A &amp;amp; B &lt;i&gt; &quot;q&quot; &apos;s&apos;</p>"
        b"\nplain tail</body></html>"
    )
    row = spark.createDataFrame([(html,)], "html binary").select(
        extract_text_expr(F.col("html")).alias("t")
    ).head()
    # &amp;amp; decodes to &amp; (single pass, &amp; last) — not to &
    assert row.t == "A &amp; B <i> \"q\" 's'\nplain tail"


def test_extract_is_jvm_only(spark, sf_dir):
    """The extraction query stays in whole-stage codegen: no Python
    evaluation node anywhere, scan reads only (doc_id, text)."""
    from isimip_qa_spark.queries.extract import extract_text

    plan = plan_of(extract_text(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all(
        "doc_id" in ln and "text" in ln and "lang" not in ln
        for ln in scan_lines
    )
