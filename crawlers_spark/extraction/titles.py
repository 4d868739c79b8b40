"""Generic page-title extraction with source precedence.

Selector-free title recovery for pages outside any per-site spider
program — the metadata every ranking/display/dedup consumer wants
first. Channel precedence follows the common search-pipeline
convention (title element, then social-card metadata, then the first
heading):

    <title>  >  og:title (extraction/opengraph.py)  >  first <h1>

Each channel parses permissively (any attribute soup inside the
opening tag, case-insensitive, whitespace collapsed, inner tags of
the h1 stripped); blank channels fall through. Pure JVM regexp over
one html scan — html never shuffles, the output is slim
``(url, title, title_source)`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlers_spark.extraction.opengraph import og_properties

_TITLE_RE = r"(?is)<title\b[^>]*>(.*?)</title\s*>"
_H1_RE = r"(?is)<h1\b[^>]*>(.*?)</h1\s*>"


def _clean(c: Column) -> Column:
    """Strip inner tags, collapse whitespace, trim."""
    no_tags = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def page_titles(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per page: ``(url, title, title_source)`` where
    ``title_source`` ∈ {'title', 'og', 'h1', 'none'} names the channel
    that won. Membership-total; title is null when every channel is
    blank."""
    t_el = _clean(F.regexp_extract(F.col(html_col), _TITLE_RE, 1))
    h1 = _clean(F.regexp_extract(F.col(html_col), _H1_RE, 1))
    base = pages.select(
        F.col(url_col).alias("url"),
        F.nullif(t_el, F.lit("")).alias("_t"),
        F.nullif(h1, F.lit("")).alias("_h"),
    )
    og = (
        og_properties(pages, url_col, html_col)
        .where(F.col("property") == "og:title")
        .groupBy("url")
        .agg(F.min(F.struct("tag_pos", "content")).alias("_b"))
        .select("url", F.nullif(F.trim(F.col("_b.content")), F.lit("")).alias("_o"))
    )
    joined = base.join(og, "url", "left")
    source = (
        F.when(F.col("_t").isNotNull(), F.lit("title"))
        .when(F.col("_o").isNotNull(), F.lit("og"))
        .when(F.col("_h").isNotNull(), F.lit("h1"))
        .otherwise(F.lit("none"))
    )
    return joined.select(
        "url",
        F.coalesce("_t", "_o", "_h").alias("title"),
        source.alias("title_source"),
    )
