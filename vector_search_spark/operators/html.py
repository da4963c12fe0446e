"""HTML → title/body → Markdown (reference T4/T5,
`pipeline/markdown_assets.py:66-91`).

HTML parsing has no native Spark expression, so this is one of the
engine's three sanctioned pandas-UDF seams (SURVEY.md §2.6).  The
production path mirrors the reference exactly — BeautifulSoup select
``.page__header h1`` for the title, ``div.page__content`` for the body,
``markdownify(heading_style="ATX")``, title prepended as an H1 — and loads
its imports once per Python worker.  When bs4/markdownify are not
installed (this container), a clearly-marked deterministic regex fallback
keeps the Spark plumbing (schema, batching, distribution) real and
testable; it is NOT a faithful markdown converter.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # production path
    import bs4  # noqa: F401
    import markdownify  # noqa: F401

    HAVE_HTML_LIBS = True
except ImportError:  # deterministic fallback (this container)
    HAVE_HTML_LIBS = False

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("markdown", T.StringType()),
    ]
)


def _convert_real(html: str) -> tuple[str | None, str | None]:
    """Reference semantics (`markdown_assets.py:66-89`)."""
    from bs4 import BeautifulSoup
    from markdownify import markdownify as md

    soup = BeautifulSoup(html, "html.parser")
    title_el = soup.select_one(".page__header h1")
    content_el = soup.select_one("div.page__content")
    if content_el is None:
        return None, None
    title = title_el.get_text().strip() if title_el else "Unknown"
    body_md = md(str(content_el), heading_style="ATX")
    return title, f"# {title}\n\n{body_md}"


_TAG_RE = re.compile(r"<[^>]+>")
_H1_RE = re.compile(
    r'class="page__header"[^>]*>.*?<h1[^>]*>(.*?)</h1>', re.DOTALL | re.IGNORECASE
)
_BODY_RE = re.compile(r'<div[^>]+class="[^"]*page__content[^"]*"[^>]*>(.*)', re.DOTALL)


def _convert_fallback(html: str) -> tuple[str | None, str | None]:
    """STUB (bs4/markdownify unavailable): regex tag-strip + entity decode.
    TITLE extraction is faithful (golden-tested against all 331 reference
    md H1 lines — tag-strip + ``html.unescape`` reproduces bs4
    ``get_text()`` for h1 content); the BODY is deterministic and
    schema-correct but not markdown-faithful — do not golden-test body
    content through this path."""
    import html as _htmllib

    m_body = _BODY_RE.search(html)
    if not m_body:
        return None, None
    m_title = _H1_RE.search(html)
    # strip tags FIRST, then decode entities (decoding first would let
    # &lt;...&gt; masquerade as tags and get eaten by the strip)
    title = (
        _htmllib.unescape(_TAG_RE.sub("", m_title.group(1))).strip()
        if m_title
        else "Unknown"
    )
    body = _htmllib.unescape(_TAG_RE.sub("", m_body.group(1)))
    body = re.sub(r"\n{3,}", "\n\n", body).strip()
    return title, f"# {title}\n\n{body}"


def html_to_markdown_udf():
    """pandas UDF: html string → struct(title, markdown); imports resolved
    once per worker, Arrow-batched."""
    convert = _convert_real if HAVE_HTML_LIBS else _convert_fallback

    @F.pandas_udf(_OUT_SCHEMA)
    def conv(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            out = [convert(h if h is not None else "") for h in s]
            yield pd.DataFrame(out, columns=["title", "markdown"])

    return conv


def html_docs_to_markdown(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(path, html) → (path, title, markdown); rows without a recognizable
    content div are dropped (reference skips them, `markdown_assets.py:74-77`)."""
    out = df.withColumn("__conv", html_to_markdown_udf()(F.col(html_col)))
    return (
        out.select(
            *[c for c in df.columns if c != html_col],
            F.col("__conv.title").alias("title"),
            F.col("__conv.markdown").alias("markdown"),
        )
        .filter(F.col("markdown").isNotNull())
    )
