"""Registry entries: text-analysis operators over `documents` (SURVEY.md
§2.6 north-star).  Oracle SQL is generated from the same constants
(stopword lists, regex patterns) the Spark side uses, so the two engines
cannot drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import BPE_TOKEN_PATTERN, PUNCT_PATTERN, STOPWORDS
from .operators.text_analysis import corpus_stats, document_stats, language_id
from .registry import register
from .sources.tables import load_table as __load


def _sql_ws_tokens(col: str = "text") -> str:
    return f"CASE WHEN trim({col}) = '' THEN 0 ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END"


def _sql_stop_hits(lang: str, col: str = "text") -> str:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower({col}), '{pat}'))"


_SQL_PUNCT = PUNCT_PATTERN.replace("'", "''")
_SQL_SR = f"least({_sql_stop_hits('en')}*1.0 / {_sql_ws_tokens()}, 1.0)"
_SQL_PR = f"len(regexp_extract_all(text, '{_SQL_PUNCT}'))*1.0 / length(text)"
_SQL_QUALITY = (
    f"0.4*least(length(text)/2000.0, 1.0) + 0.3*least({_SQL_SR}*5, 1.0) "
    f"+ 0.3*greatest(0.0, 1.0 - {_SQL_PR}*5)"
)


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           {_sql_ws_tokens()} AS n_tokens_ws,
           len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS n_tokens_bpe,
           floor(({_SQL_PR})*10000 + 0.5)/10000.0 AS punct_ratio,
           floor(({_SQL_SR})*10000 + 0.5)/10000.0 AS stopword_ratio,
           floor(({_SQL_QUALITY})*10000 + 0.5)/10000.0 AS quality
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = __load(spark, sf_dir, "documents")
    return document_stats(docs)


def _sql_lang_score(lang: str) -> str:
    return f"({_sql_stop_hits(lang)}*1.0 / {_sql_ws_tokens()})"


_S = {lang: _sql_lang_score(lang) for lang in ("en", "es", "fr", "de")}
_SQL_PRED = f"""
    CASE WHEN {_S['en']} >= {_S['es']} AND {_S['en']} >= {_S['fr']} AND {_S['en']} >= {_S['de']} THEN 'en'
         WHEN {_S['es']} >= {_S['fr']} AND {_S['es']} >= {_S['de']} THEN 'es'
         WHEN {_S['fr']} >= {_S['de']} THEN 'fr'
         ELSE 'de' END
"""


@register(
    "lang_id_accuracy",
    oracle=f"""
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)::BIGINT AS n_correct
    FROM (SELECT lang, {_SQL_PRED} AS pred_lang FROM documents)
    GROUP BY lang ORDER BY lang
    """,
)
def q_lang_id_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit-rate language ID vs. the fixture's ground-truth lang tag."""
    docs = __load(spark, sf_dir, "documents")
    pred = language_id(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return (
        pred.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
        .orderBy("lang")
    )


@register(
    "corpus_stats",
    oracle=f"""
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           floor((avg(length(text)))*10000 + 0.5)/10000.0 AS avg_chars,
           floor((avg({_sql_ws_tokens()}))*10000 + 0.5)/10000.0 AS avg_tokens,
           floor((avg({_SQL_QUALITY}))*10000 + 0.5)/10000.0 AS avg_quality,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))::BIGINT
             AS distinct_texts
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = __load(spark, sf_dir, "documents")
    return corpus_stats(docs, "lang")


@register(
    "source_lang_pivot",
    oracle="""
    SELECT source,
           sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
           sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
           sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
           sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS zh
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q_source_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via pivot (doc counts per source × language) — §2.6
    grouping-surface coverage; fixed pivot values keep the schema stable."""
    docs = __load(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .pivot("lang", ["de", "en", "es", "fr", "zh"])
        .count()
        .na.fill(0)
        .orderBy("source")
    )
