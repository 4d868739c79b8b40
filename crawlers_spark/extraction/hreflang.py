"""``<link rel="alternate" hreflang=...>`` language-alternate clusters.

Multilingual sites declare their translations with hreflang link tags
(public convention documented by Google Search Central and RFC 8288's
``alternate`` relation). A crawl pipeline uses the declarations three
ways: scheduling (fetch one language variant per cluster first),
dedup/bitext (the cluster IS the document-alignment unit that
``embed_bitext_mine`` scores pairwise), and coverage accounting
(a cluster with a missing back-link is a site bug crawlers must not
trust — Google ignores non-reciprocal pairs, and so do we).

Semantics implemented (all from the public spec):

- A page SHOULD list every alternate including itself; the self row
  (href == url) carries the page's own declared language.
- An alternate edge a→b counts only if b links back to a
  (**reciprocity** — any language label on the back edge suffices).
- Conforming clusters are CLIQUES (every member lists every other),
  so the cluster key needs no iterative connected components: for a
  clique, ``min(url ∪ reciprocal alternates)`` is already the global
  minimum member. Non-clique inputs degrade gracefully to per-edge
  validation (the key is then a 1-hop min — documented, not hidden).

Spark-first shape: tag extraction is JVM-side ``regexp_extract_all``
over the raw html (one scan, html never shuffles — links are projected
out before any exchange); reciprocity is one self-join on the slim
``(src, dst)`` edge set; the per-URL rollup is one hash aggregation.
At 100 TB the edge table is O(pages × languages), tiny next to html.

RE2-safe patterns only (no lookaround/backreferences) so the DuckDB
oracle (`crawl_hreflang_clusters`) can restate expectations with plain
string ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One <link ...> tag per match; attributes parsed individually below so
# any attribute order / quote style works (mirrors how the canonical and
# robots-meta extractors handle real-world attribute soup).
_LINK_TAG_RE = r"(?i)<link\b[^>]*>"
_REL_ALT_RE = r"""(?i)\brel\s*=\s*["']?alternate["'\s/>]"""
_HREFLANG_RE = r"""(?i)\bhreflang\s*=\s*["']?([^"'\s>]+)"""
_HREF_RE = r"""(?i)\bhref\s*=\s*["']?([^"'\s>]+)"""


def hreflang_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Exploded alternate declarations ``(url, hreflang, href)``.

    ``hreflang`` is lowercased (BCP 47 labels are case-insensitive;
    ``x-default`` is kept as an ordinary label). Tags missing either
    attribute, or whose ``rel`` is not ``alternate``, yield no row.
    """
    tags = F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG_RE), 0)
    out = (
        pages.select(F.col(url_col).alias("url"), F.explode(tags).alias("_tag"))
        .where(F.col("_tag").rlike(_REL_ALT_RE))
        .select(
            "url",
            F.lower(F.regexp_extract("_tag", _HREFLANG_RE, 1)).alias("hreflang"),
            F.regexp_extract("_tag", _HREF_RE, 1).alias("href"),
        )
        .where((F.col("hreflang") != "") & (F.col("href") != ""))
    )
    return out


def hreflang_reciprocal(links: DataFrame) -> DataFrame:
    """Alternate edges annotated with reciprocity.

    Input: the :func:`hreflang_links` rows. Output one row per
    NON-SELF edge: ``(url, hreflang, alt_url, reciprocal)`` where
    ``reciprocal`` means the target page declares ANY alternate back
    to ``url`` (language label need not match — the public rule is
    about the link, not the label). Self rows are the page's own
    language declaration and are handled by :func:`hreflang_clusters`.
    """
    edges = links.where(F.col("href") != F.col("url"))
    # back row (url=h, alt_url=u) records "edge u→h exists", keyed by
    # its TARGET — so edge (a→b) is reciprocal iff a back row
    # (url=a, alt_url=b) exists, i.e. some original edge b→a.
    back = (
        links.where(F.col("href") != F.col("url"))
        .select(F.col("href").alias("url"), F.col("url").alias("alt_url"))
        .distinct()
    )
    return (
        edges.join(
            back.withColumn("_rec", F.lit(True)),
            on=[edges["url"] == back["url"], edges["href"] == back["alt_url"]],
            how="left",
        )
        .select(
            edges["url"],
            "hreflang",
            edges["href"].alias("alt_url"),
            F.coalesce(F.col("_rec"), F.lit(False)).alias("reciprocal"),
        )
    )


def hreflang_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page hreflang rollup:

    ``(url, lang, n_alternates, n_reciprocal, cluster_key)``

    - ``lang``: the page's self-declared language (NULL when the page
      lists no self alternate — a spec violation worth surfacing).
    - ``n_alternates`` / ``n_reciprocal``: non-self edges declared /
      confirmed by a back-link.
    - ``cluster_key``: ``min(url ∪ confirmed alternates)`` — the
      canonical cluster id for conforming (clique) groups; pages with
      zero confirmed alternates key to themselves.
    """
    links = hreflang_links(pages, url_col, html_col)
    self_lang = (
        links.where(F.col("href") == F.col("url"))
        .groupBy("url")
        .agg(F.min("hreflang").alias("lang"))
    )
    edges = hreflang_reciprocal(links)
    rollup = edges.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_alternates"),
        F.sum(F.col("reciprocal").cast("int")).alias("n_reciprocal"),
        F.min(F.when(F.col("reciprocal"), F.col("alt_url"))).alias("_min_rec"),
    )
    base = links.select("url").distinct()
    return (
        base.join(self_lang, "url", "left")
        .join(rollup, "url", "left")
        .select(
            "url",
            "lang",
            F.coalesce("n_alternates", F.lit(0)).cast("long").alias("n_alternates"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias("n_reciprocal"),
            F.least(F.col("url"), F.coalesce("_min_rec", F.col("url"))).alias(
                "cluster_key"
            ),
        )
    )
