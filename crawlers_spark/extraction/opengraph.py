"""Open Graph protocol metadata extraction (public spec: ogp.me).

Pages declare share-card metadata with ``<meta property="og:..."
content="...">`` tags. A web-scale pipeline uses them as a
selector-free structured-extraction lane (like the schema.org JSON-LD
lane in ``extraction/jsonld.py``): titles/types/canonical-urls for
ranking and dedup, images for the multimodal columns.

Parsing follows the same permissive conventions as the repo's other
tag extractors (robots-meta, hreflang, canonical): any attribute
order, single/double/no quotes, extra attributes, case-insensitive
tag/attr names. Real-world pages also write ``name=`` instead of
``property=`` — both are accepted (the spec says ``property``;
consumers accept both, and so do we).

Per the spec, the FIRST occurrence of a property wins when a page
declares it multiple times (arrays like multiple ``og:image`` keep
their first element here; the exploded :func:`og_properties` form
retains all of them for consumers that want the full array).

Spark-first shape: one ``regexp_extract_all`` scan over html (html
never shuffles — properties are projected out before any exchange);
the per-page rollup is one hash aggregation with ``min_by(content,
tag_pos)`` per property. RE2-safe patterns only, so the DuckDB oracle
can restate expectations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_TAG_RE = r"(?i)<meta\b[^>]*>"
_PROP_RE = r"""(?i)\b(?:property|name)\s*=\s*["']?(og:[^"'\s>]+)"""
_CONTENT_RE = r"""(?i)\bcontent\s*=\s*["']?([^"'>]*[^"'\s>])"""

# the core og properties surfaced as columns by og_cards
CARD_PROPS = (
    "og:title",
    "og:type",
    "og:url",
    "og:image",
    "og:description",
    "og:site_name",
    "og:locale",
)


def og_properties(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Exploded declarations ``(url, tag_pos, property, content)``.

    ``tag_pos`` is the meta tag's index in document order (the spec's
    first-wins tie-break key). Property names are lowercased; tags
    without an ``og:``-prefixed property/name or without content yield
    no row.
    """
    tags = F.regexp_extract_all(F.col(html_col), F.lit(_META_TAG_RE), 0)
    return (
        pages.select(
            F.col(url_col).alias("url"), F.posexplode(tags).alias("tag_pos", "_tag")
        )
        .select(
            "url",
            "tag_pos",
            F.lower(F.regexp_extract("_tag", _PROP_RE, 1)).alias("property"),
            F.regexp_extract("_tag", _CONTENT_RE, 1).alias("content"),
        )
        .where((F.col("property") != "") & (F.col("content") != ""))
    )


def og_cards(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per page: the core OG properties (first occurrence
    wins) as columns ``og_title .. og_locale`` plus ``n_og`` — the
    total count of og declarations. Membership-total: pages with no
    og tags keep a row of nulls and ``n_og = 0``.
    """
    props = og_properties(pages, url_col, html_col)
    # min over (tag_pos, content) structs: rows of other properties are
    # null and ignored by MIN, the survivor is the first occurrence —
    # null-safe where min_by's null-ordering-key semantics are murky
    firsts = [
        F.min(
            F.when(F.col("property") == p, F.struct("tag_pos", "content"))
        )["content"].alias("og_" + p.split(":", 1)[1])
        for p in CARD_PROPS
    ]
    rolled = props.groupBy("url").agg(
        *firsts, F.count(F.lit(1)).alias("n_og")
    )
    return (
        pages.select(F.col(url_col).alias("url"))
        .join(rolled, "url", "left")
        .withColumn("n_og", F.coalesce(F.col("n_og"), F.lit(0)).cast("long"))
    )
