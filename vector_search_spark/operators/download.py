"""Incremental, rate-limited document acquisition (reference S1/S2,
`pipeline/utils.py:14-80`, `pipeline/download_assets.py:61-102`).

Spark-first decomposition:
- **sitemap parse** (S1): XML → URL rows with the native ``xpath`` SQL
  function — no Python XML parsing in the data path.
- **incremental set** (S2's "skip if file exists",
  `pipeline/utils.py:55-57`): a left-anti join of the URL table against
  the already-done table — the declarative form of the reference's
  per-file existence check.
- **throttled fetch** (S2's 1–3 s politeness sleep,
  `download_assets.py:92-95`): ``foreachPartition`` with a per-partition
  rate limiter and an injectable ``fetcher`` callable, so the network edge
  stays out of the engine and tests inject a local fake.  Deterministic
  jitter (hash of the URL), never ``random``.

Scale note: per-partition throttling gives a global rate of
``partitions / interval`` — set partitions to match the target QPS; the
anti-join prunes the fetch set before any worker spins up.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_sitemap_xml(spark: SparkSession, xml_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """S1: sitemap XML documents → one row per ``<loc>`` URL (native xpath).

    The local-name()-based selector works with or without the sitemap
    namespace (the reference strips it via a namespace map,
    `pipeline/utils.py:24-41`).
    """
    locs = F.expr(f"xpath({xml_col}, '//*[local-name()=\"loc\"]/text()')")
    return (
        xml_docs.select(F.explode(locs).alias("url"))
        .filter(F.col("url") != "")
        .distinct()
    )


def incremental_urls(urls: DataFrame, done: DataFrame, url_col: str = "url") -> DataFrame:
    """S2 incrementality: URLs not yet downloaded = left-anti join."""
    return urls.join(done.select(url_col).distinct(), url_col, "left_anti")


def fetch_throttled(
    urls: DataFrame,
    fetcher: Callable[[str], bytes],
    min_delay_sec: float = 1.0,
    jitter_sec: float = 2.0,
    url_col: str = "url",
) -> DataFrame:
    """S2 fetch: run ``fetcher(url)`` per row with per-partition throttling.

    Delay per request = min_delay + deterministic jitter in [0, jitter)
    derived from the URL's md5 (the reference sleeps random 1–3 s,
    `download_assets.py:93`; determinism keeps tests reproducible).
    Returns (url, n_bytes, ok) — payload persistence is the caller's sink.
    """
    import hashlib

    def run(partition: Iterable) -> Iterable:
        first = True
        for row in partition:
            if not first:
                h = int(hashlib.md5(row[url_col].encode()).hexdigest()[:8], 16)
                time.sleep(min_delay_sec + (h % 1000) / 1000.0 * jitter_sec)
            first = False
            try:
                payload = fetcher(row[url_col])
                yield (row[url_col], len(payload), True)
            except Exception:
                yield (row[url_col], 0, False)

    return urls.select(url_col).rdd.mapPartitions(run).toDF(["url", "n_bytes", "ok"])
