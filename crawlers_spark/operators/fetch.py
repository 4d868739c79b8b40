"""Fetch (O8): the wave's lookup-join against the Common-Crawl-style
``pages`` table.

In the reference, "fetch" is Scrapy's Twisted HTTP downloader hitting
the live web. In this engine (BASELINE.json metric: "URLs
fetched+extracted/sec on a Common-Crawl-style Iceberg table"), the web
*is* a table — fetch becomes an equi-join on ``url_canon``:

    candidates ⋈ pages_index ON url_canon

``pages_index`` is a one-time derived projection of ``pages`` with a
canonicalized join key, so every wave joins on a precomputed column
(at 100 TB this would be written back bucketed by url_canon so wave
joins are shuffle-free on the pages side; here it is cached parquet).
The join deliberately selects only (url_canon, warc_ts, html) —
column pruning keeps ``text``/``lang`` unread unless asked for.

Misses (URL not in the corpus) are the 404/timeout analog → retry
logic (O12) in the wave loop.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawlers_spark.functions.canonicalize import with_canonical_url


def build_pages_index(
    spark: SparkSession, pages_path: str, cache_dir: str | Path | None = None
) -> DataFrame:
    """pages + ``url_canon`` join key (computed once, reused every wave)."""
    pages = spark.read.parquet(pages_path)
    indexed = with_canonical_url(pages, "url", "url_canon", host_out=None)
    if cache_dir is not None:
        cache = Path(cache_dir) / "pages_index.parquet"
        if not cache.exists():
            indexed.write.mode("overwrite").parquet(str(cache))
        return spark.read.parquet(str(cache))
    return indexed


def fetch_pages(candidates: DataFrame, pages_index: DataFrame, columns: tuple[str, ...] = ("html",)) -> DataFrame:
    """Inner-join candidates with the page corpus; returns matches.

    Output: candidate columns + warc_ts + requested page columns.
    """
    page_side = pages_index.select("url_canon", "warc_ts", *columns)
    return candidates.join(page_side, "url_canon", "inner")


def fetch_with_misses(candidates: DataFrame, pages_index: DataFrame, columns: tuple[str, ...] = ("html",)) -> tuple[DataFrame, DataFrame]:
    """(fetched, missed) — missed rows feed retry handling (O12)."""
    fetched = fetch_pages(candidates, pages_index, columns)
    missed = candidates.join(pages_index.select("url_canon"), "url_canon", "left_anti")
    return fetched, missed


def fetch_outer(candidates: DataFrame, pages_index: DataFrame, columns: tuple[str, ...] = ("html",)) -> DataFrame:
    """One outer join instead of inner+anti: adds ``fetch_ok`` flag.

    The caller persists the result and splits on the flag — halves the
    number of probe passes over the pages side per wave.
    """
    page_side = pages_index.select(
        "url_canon", F.col("warc_ts").alias("_page_ts"), *columns
    )
    return candidates.join(page_side, "url_canon", "left").withColumn(
        "fetch_ok", F.col("_page_ts").isNotNull()
    ).withColumnRenamed("_page_ts", "warc_ts")
