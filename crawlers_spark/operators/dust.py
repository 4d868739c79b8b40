"""DUST rule mining: detect content-irrelevant URL query parameters.

Bar-Yossef, Keidar & Schonfeld, "Do not crawl in the DUST: different
URLs with similar text" (WWW 2007 — public) observed that large sites
serve the same content under many URLs differing only by session ids,
tracking tags, or presentation parameters, and that *rewrite rules*
can be LEARNED from the crawl itself instead of hand-curated (the
static tracking-param strip list in functions/canonicalize.py is the
hand-curated half; this operator is the learned half).

Rule class (the tractable core of the paper's substring rules,
specialised to query strings): per ``(host, param)``, the rule
"drop every ``param=...`` pair from the query" is SAFE iff every
observed URL pair (u, u′) where u′ = u with the param dropped has
IDENTICAL content digests — with at least ``min_support`` such
witness pairs.  Both sides of each pair must have actually been
fetched: the rule is judged on evidence, never on extrapolation.

Mechanics (all declarative — scales to any corpus):

1. split each URL into base + ordered param list (one scan-side
   projection);
2. explode the DISTINCT param KEYS of each URL; for each key, rebuild
   the URL with every occurrence of that key dropped (higher-order
   ``filter`` — stays in codegen);
3. join candidates against the observed URL→digest map on the
   stripped URL (both sides shuffle on the url key once — at web
   scale this is an equi-join on a well-distributed key; per-host
   skew is bounded because the join key carries the full path);
4. one (host, param) hash-aggregate: witness-pair count + agreeing
   count → verdict.

``apply_dust_rules`` then rewrites a URL table with the learned safe
rules (broadcast join on host — the rule table is per-(host,param),
orders of magnitude smaller than the corpus), composing with the
static canonicalizer: learned rules catch site-specific junk params
(`sid`, `jsessionid`, `ref`) that no global list knows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dust_param_rules", "apply_dust_rules"]


def _host(url) -> F.Column:
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)


def _split_parts(df: DataFrame, url_col: str) -> DataFrame:
    """Adds base (pre-'?'), params (array of 'k=v' strings, [] when no
    query), host."""
    u = F.col(url_col)
    # everything after the FIRST '?' (substring_index(-1) would split
    # on the last one if a value itself contains '?')
    q = F.expr(f"substring({url_col}, instr({url_col}, '?') + 1)")
    has_q = F.col("__has_q")
    return (
        df.withColumn("__has_q", F.instr(u, "?") > 0)
        .withColumn("base", F.when(has_q, F.expr(f"substring_index({url_col}, '?', 1)")).otherwise(u))
        .withColumn(
            "params",
            F.when(has_q, F.split(q, "&")).otherwise(F.array().cast("array<string>")),
        )
        .withColumn("host", _host(u))
        .drop("__has_q")
    )


def dust_param_rules(
    pages: DataFrame,
    *,
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 2,
) -> DataFrame:
    """(host, param, n_pairs, n_agree, irrelevant) — learned per-host
    drop-parameter rules from observed ``(url, digest)`` rows.

    ``irrelevant`` is true iff at least ``min_support`` witness pairs
    exist and EVERY one of them agrees on the digest (a single
    counter-example kills the rule — the paper's "valid rule" bar;
    relax by thresholding n_agree/n_pairs downstream if a site serves
    unstable digests).
    """
    base = (
        _split_parts(pages.select(url_col, digest_col), url_col)
        .select(
            F.col(url_col).alias("url"),
            F.col(digest_col).alias("digest"),
            "base",
            "params",
            "host",
        )
        # one digest per url: pages tables can carry refetches
        .groupBy("url", "base", "host")
        .agg(
            F.min("digest").alias("digest"),
            F.min("params").alias("params"),
            F.count_distinct("digest").alias("n_digests"),
        )
        # a url whose own digest is unstable across fetches is no
        # witness for anything
        .where(F.col("n_digests") == 1)
        .drop("n_digests")
    )
    observed = base.select(F.col("url").alias("o_url"), F.col("digest").alias("o_digest"))
    cands = (
        base.where(F.size("params") > 0)
        .select(
            "host",
            "digest",
            "base",
            "params",
            F.explode(
                F.array_distinct(
                    F.expr("transform(params, p -> substring_index(p, '=', 1))")
                )
            ).alias("param"),
        )
        .withColumn(
            "kept",
            F.expr("filter(params, p -> substring_index(p, '=', 1) != param)"),
        )
        .withColumn(
            "stripped",
            F.when(F.size("kept") == 0, F.col("base")).otherwise(
                F.concat(F.col("base"), F.lit("?"), F.array_join("kept", "&"))
            ),
        )
        .select("host", "param", "digest", "stripped")
    )
    return (
        cands.join(observed, cands["stripped"] == observed["o_url"])
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("digest") == F.col("o_digest")).cast("long")).alias("n_agree"),
        )
        .select(
            "host",
            "param",
            "n_pairs",
            "n_agree",
            (
                (F.col("n_pairs") >= F.lit(int(min_support)))
                & (F.col("n_agree") == F.col("n_pairs"))
            ).alias("irrelevant"),
        )
    )


def apply_dust_rules(
    urls: DataFrame, rules: DataFrame, *, url_col: str = "url"
) -> DataFrame:
    """Rewrite ``urls[url_col]`` by dropping every parameter a learned
    rule marks irrelevant for that host; adds ``url_dust``.  The rule
    table broadcasts (per-(host,param) rows); URLs without matching
    rules pass through unchanged, and an emptied query drops its '?'.
    """
    safe = (
        rules.where("irrelevant")
        .groupBy("host")
        .agg(F.collect_set("param").alias("drop_params"))
    )
    parts = _split_parts(urls, url_col)
    out = (
        parts.join(F.broadcast(safe), "host", "left")
        .withColumn(
            "kept",
            F.when(F.col("drop_params").isNull(), F.col("params")).otherwise(
                F.expr(
                    "filter(params, p -> NOT array_contains("
                    "drop_params, substring_index(p, '=', 1)))"
                )
            ),
        )
        .withColumn(
            "url_dust",
            F.when(F.size("kept") == 0, F.col("base")).otherwise(
                F.concat(F.col("base"), F.lit("?"), F.array_join("kept", "&"))
            ),
        )
    )
    return out.drop("host", "base", "params", "drop_params", "kept")
