"""Golden test for the T4 title-extraction leg: the fallback HTML converter
must reproduce the reference md corpus's H1 titles for ALL 331 bundled HTML
pages (reference `pipeline/markdown_assets.py:66-91` built those md files
with bs4 `.page__header h1` get_text; tag-strip + entity decode matches it
exactly for h1 content).  Body markdown is NOT golden-testable through the
fallback — only the real markdownify path can reproduce it."""

from __future__ import annotations

import pathlib
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from vector_search_spark.operators.html import html_docs_to_markdown
from vector_search_spark.sources.files import read_html_dir

HTML_DIR = "/root/reference/data/raw/html"
MD_DIR = "/root/reference/data/raw/md"


@pytest.mark.skipif(
    not pathlib.Path(HTML_DIR).is_dir(), reason="reference corpus not present"
)
def test_all_331_titles_match_reference_md(spark):
    md_titles = {}
    for p in pathlib.Path(MD_DIR).glob("*.md"):
        with open(p) as fh:
            first = fh.readline().rstrip("\n")
        md_titles[p.stem] = first.removeprefix("# ").strip()
    assert len(md_titles) == 331

    html = read_html_dir(spark, HTML_DIR).select(
        "path", F.decode(F.col("content"), "utf-8").alias("html")
    )
    out = html_docs_to_markdown(html, html_col="html").select(
        F.regexp_extract("path", r"([a-z]+-\d{1,2}-\d{4})_[0-9a-f]+\.html$", 1).alias(
            "slug"
        ),
        "title",
    )
    rows = out.collect()
    assert len(rows) == 331  # every page has a recognizable content div

    bad = []
    for r in rows:
        day = datetime.strptime(r["slug"], "%B-%d-%Y").date().isoformat()
        if md_titles.get(day) != r["title"]:
            bad.append((r["slug"], r["title"], md_titles.get(day)))
    assert not bad, f"{len(bad)} title mismatches, first: {bad[:3]}"
