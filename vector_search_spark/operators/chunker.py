"""Newsletter chunker (reference T7, `pipeline/utils.py:93-187`) as native
Catalyst expressions: split → posexplode → per-category regexp transforms.

No Python in the data path — the whole operator is
``split``/``posexplode``/``regexp_*``/higher-order filters, so it scales as
a pure projection+explode over a 100 TB document scan (no shuffle at all;
the explode fan-out is local to each task).

Bug-for-bug semantics preserved (SURVEY.md §2.2 T7):
- section headers matched by **case-sensitive substring containment**
  (`utils.py:110,126,170`) with idea → quote → question precedence; files
  with case-variant headers silently produce 0 chunks (4 of 331 in the
  reference corpus);
- the roman-numeral split ``[IVX]+\\.`` is not line-anchored, so "I."
  inside prose splits too (`utils.py:112,127`);
- the first split element (header remnant) is skipped (`utils.py:114,128`);
- ``---`` removed anywhere in the section *after* strip (`utils.py:108`);
- idea prefix "Idea from James Clear: " (`utils.py:117`), quote prefix
  "Quote from {source_name}: " only when the extracted name is non-empty
  (`utils.py:152-155`);
- quote source: linked form ``*Source:* [title](url)`` wins, else
  text-only fallback to end-of-line; '*' stripped from titles
  (`utils.py:129-145`);
- quote body: everything from the first "\\n*Source:*" to the end removed
  (DOTALL), markdown links unwrapped, '**' removed, one '  '→' ' pass
  (`utils.py:147-149`);
- question: header text removed, cut at "Until next week", single chunk
  with index 1 (`utils.py:170-185`);
- blank lines dropped and ends trimmed on every chunk (`utils.py:88-90`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IDEA_PREFIX = "Idea from James Clear: "


def py_strip(c: Column) -> Column:
    r"""Python ``str.strip()`` (all whitespace) — Spark's ``trim`` only
    removes spaces.  (?U) because Python's \s is Unicode (matches \xa0)
    while Java's default is ASCII-only; the corpus contains nbsp."""
    return F.regexp_replace(F.regexp_replace(c, r"(?U)^\s+", ""), r"(?U)\s+$", "")


def trim_empty_lines(c: Column) -> Column:
    """Reference `utils.py:88-90`: drop blank lines (keeping original line
    content), join with \\n, strip both ends."""
    lines = F.split(py_strip(c), "\n")
    kept = F.filter(lines, lambda l: py_strip(l) != "")
    return py_strip(F.array_join(kept, "\n"))


def clean_links(c: Column) -> Column:
    """Reference `utils.py:83-85`: [text](url) → text."""
    return F.regexp_replace(c, r"\[([^\]]+)\]\([^\)]+\)", "$1")


def _sections(df: DataFrame, content_col: str) -> DataFrame:
    """Remove share-lines, split on ``^##\\s+`` headers, classify sections."""
    clean = F.regexp_replace(F.col(content_col), r"(?m)^\[Share this on.*\n?", "")
    df = df.select(
        *[c for c in df.columns if c != content_col],
        F.posexplode(F.split(clean, r"(?mU)^##\s+")).alias("sec_pos", "sec_raw"),
    )
    sec = F.replace(py_strip(F.col("sec_raw")), F.lit("---"), F.lit(""))
    category = (
        F.when(sec.contains("3 IDEAS FROM ME"), F.lit("idea"))
        .when(sec.contains("2 QUOTES FROM OTHERS"), F.lit("quote"))
        .when(sec.contains("1 QUESTION FOR YOU"), F.lit("question"))
    )
    return df.withColumn("section", sec).withColumn("category", category).filter(
        F.col("category").isNotNull()
    ).drop("sec_raw")


def parse_newsletter_chunks(
    df: DataFrame,
    content_col: str = "content",
    date_col: str = "date",
) -> DataFrame:
    """Markdown documents → typed chunk rows.

    Input: one row per document with ``content_col`` (markdown text),
    ``date_col`` (issue date string) and any passthrough columns.
    Output: passthrough columns + (sec_pos, part_pos, text, category,
    index, date, source, source_name) — the reference chunk schema
    (SURVEY.md §1.2) plus the deterministic position keys.
    """
    keep = [c for c in df.columns if c not in (content_col, date_col)]
    secs = _sections(df, content_col)

    # --- ideas + quotes: roman-numeral split, first element skipped -------
    iq = secs.filter(F.col("category").isin("idea", "quote")).select(
        *keep,
        date_col,
        "sec_pos",
        "category",
        F.posexplode(F.split(F.col("section"), r"[IVX]+\.")).alias("part_pos", "part"),
    ).filter(F.col("part_pos") >= 1)

    ideas = iq.filter(F.col("category") == "idea").select(
        *keep,
        "sec_pos",
        F.col("part_pos"),
        F.concat(F.lit(IDEA_PREFIX), trim_empty_lines(F.col("part"))).alias("text"),
        F.col("category"),
        F.col("part_pos").cast("int").alias("index"),
        F.col(date_col).alias("date"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("source_name"),
    )

    quotes_raw = iq.filter(F.col("category") == "quote")
    link_title = F.regexp_extract(
        F.col("part"), r"(?U)\*Source:\*\s*\[([^\]]+)\]\(([^\)]+)\)", 1
    )
    link_url = F.regexp_extract(F.col("part"), r"(?U)\*Source:\*\s*\[([^\]]+)\]\(([^\)]+)\)", 2)
    text_title = F.regexp_extract(F.col("part"), r"(?mU)\*Source:\*\s*(.+)$", 1)
    source_name = (
        F.when(link_title != "", F.replace(link_title, F.lit("*"), F.lit("")))
        .when(text_title != "", F.replace(text_title, F.lit("*"), F.lit("")))
        .otherwise(F.lit(None).cast("string"))
    )
    source_url = F.when(link_title != "", link_url).otherwise(F.lit(None).cast("string"))
    body = F.regexp_replace(F.col("part"), r"(?s)\n\*Source:\*.*", "")
    body = clean_links(body)
    body = F.replace(body, F.lit("**"), F.lit(""))
    body = py_strip(F.replace(body, F.lit("  "), F.lit(" ")))
    quote_text = trim_empty_lines(
        F.when(
            source_name.isNotNull() & (source_name != ""),
            F.concat(F.lit("Quote from "), source_name, F.lit(": "), body),
        ).otherwise(body)
    )
    quotes = quotes_raw.select(
        *keep,
        "sec_pos",
        F.col("part_pos"),
        quote_text.alias("text"),
        F.col("category"),
        F.col("part_pos").cast("int").alias("index"),
        F.col(date_col).alias("date"),
        source_url.alias("source"),
        source_name.alias("source_name"),
    )

    # --- question: single chunk, cut at the sign-off ----------------------
    qsec = secs.filter(F.col("category") == "question")
    qtext = F.replace(F.col("section"), F.lit("1 QUESTION FOR YOU"), F.lit(""))
    qtext = py_strip(qtext)
    qtext = py_strip(F.split(qtext, "Until next week").getItem(0))
    questions = qsec.select(
        *keep,
        "sec_pos",
        F.lit(1).alias("part_pos"),
        trim_empty_lines(qtext).alias("text"),
        F.col("category"),
        F.lit(1).cast("int").alias("index"),
        F.col(date_col).alias("date"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("string").alias("source_name"),
    )

    return ideas.unionByName(quotes).unionByName(questions)
