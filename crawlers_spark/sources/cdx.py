"""CDX(J)-style capture index over crawled pages (Common Crawl's URL
index layout: one record per capture, keyed by SURT, globally sorted so
range lookups are file-prunable).

SURT (Sort-friendly URI Reordering Transform, the key the CDX ecosystem
sorts by): reversed comma-joined host labels, then ``)/`` and the path+
query — ``https://sub.example.com/x?q=1`` → ``com,example,sub)/x?q=1``.
Built here entirely from JVM-side column expressions (split / reverse /
array_join / regexp), so index construction is scan-side codegen.

Writing a globally sorted index at 100 TB is NOT ``orderBy().write``
(that materializes a global sort whose final exchange is fine, but the
anti-pattern is coalescing to one file): ``write_cdx`` uses
``repartitionByRange(surt)`` + ``sortWithinPartitions`` — each output
file covers a disjoint SURT range and is internally sorted, which is
exactly the binary-searchable layout CDX consumers (and Common Crawl's
own index shards) rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surt_key(url_col: str = "url_canon") -> F.Column:
    """SURT of a canonical URL, as a pure column expression."""
    c = F.col(url_col)
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    # path + query, exactly as they appear after the authority
    tail = F.regexp_replace(c, r"^https?://[^/]*", "")
    return F.concat(rev_host, F.lit(")"), F.when(tail == "", "/").otherwise(tail))


def cdx_records(pages: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """One CDX record per capture: (surt, url, warc_ts, digest?).

    ``digest`` passes through when the input carries ``content_digest``
    (the fused pass's md5-of-visible-text) — the CDXJ dedup field.
    """
    cols = [
        surt_key(url_col).alias("surt"),
        F.col(url_col).alias("url"),
        F.col("warc_ts"),
    ]
    if "content_digest" in pages.columns:
        cols.append(F.col("content_digest").alias("digest"))
    return pages.select(*cols)


def write_cdx(records: DataFrame, path: str, *, shards: int = 8) -> None:
    """Write the index globally sorted by (surt, warc_ts): disjoint
    SURT ranges per file, sorted within — binary-searchable shards."""
    (
        records.repartitionByRange(shards, "surt", "warc_ts")
        .sortWithinPartitions("surt", "warc_ts")
        .write.mode("overwrite")
        .parquet(path)
    )


def cdx_lookup(index: DataFrame, queries: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Exact-URL capture lookup (the CDX server's ``matchType=exact``):
    (query_url, url, warc_ts[, digest]) for every capture of each query
    URL. The query set is the small side (a lookup batch) — broadcast
    SURT equi-join against the index; the index never shuffles, and on
    the :func:`write_cdx` layout the surt equality predicate reaches
    parquet row-group stats (sorted shards ⇒ tight min/max)."""
    q = queries.select(
        surt_key(url_col).alias("surt"), F.col(url_col).alias("query_url")
    ).distinct()
    return index.join(F.broadcast(q), "surt").select(
        "query_url", *[c for c in index.columns if c != "surt"]
    )


def surt_domain_prefix(domain: str, *, include_subdomains: bool = True) -> list[str]:
    """SURT prefixes covering a domain's captures — ``example.com`` →
    ``['com,example)', 'com,example,']`` (the exact host, and with the
    trailing comma every subdomain's reversed key). Prefix filters
    compile to StringStartsWith, which Spark pushes into parquet
    min/max pruning — on sorted CDX shards a domain query reads ONLY
    the shards whose surt range intersects (the Common Crawl index
    access pattern)."""
    key = ",".join(reversed(domain.lower().split(".")))
    out = [key + ")"]
    if include_subdomains:
        out.append(key + ",")
    return out


def domain_captures(index: DataFrame, domain: str, *, include_subdomains: bool = True) -> DataFrame:
    """All captures under a domain (CDX ``matchType=domain``): a SURT
    prefix range scan over the sorted index — no join, no shuffle, and
    file/row-group pruning does the work at 100 TB."""
    prefixes = surt_domain_prefix(domain, include_subdomains=include_subdomains)
    cond = None
    for p in prefixes:
        c = F.col("surt").startswith(p)
        cond = c if cond is None else (cond | c)
    return index.where(cond)


def ccindex_rows(
    pages: DataFrame,
    url_col: str = "url_canon",
    content_col: str = "content",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Common Crawl columnar-index-style capture rows (the public
    cc-index table schema family: one row per capture with URL keys,
    host/registrable-domain rollup keys, detected MIME, length and
    content digest) — the queryable per-capture catalog that sits
    beside the WARC/CDX containers and answers "what did we crawl"
    without touching payloads twice.

    Columns: ``surt``, ``url``, ``host``, ``registrable_domain``,
    ``mime`` (WHATWG-sniffed from the bytes — servers lie, the index
    records what the payload IS), ``length`` (bytes), ``digest``
    (md5 of the payload's hex encoding — an engine-portable digest
    contract: DuckDB's md5 is VARCHAR-only, hex() is identical in
    both engines), ``warc_ts``.

    Everything is scan-side (surt/host/domain string ops, the sniff
    chain, length/digest) — ZERO exchanges; write with
    :func:`write_cdx`'s range-partitioned layout for a
    binary-searchable on-disk index.
    """
    from crawlers_spark.functions.domains import registrable_domain
    from crawlers_spark.functions.mimesniff import sniff_mime

    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    return pages.select(
        surt_key(url_col).alias("surt"),
        F.col(url_col).alias("url"),
        host.alias("host"),
        registrable_domain(host).alias("registrable_domain"),
        sniff_mime(content_col).alias("mime"),
        F.length(F.col(content_col)).cast("long").alias("length"),
        F.md5(F.hex(F.col(content_col))).alias("digest"),
        F.col(ts_col).alias("warc_ts"),
    )


def cdx_closest(
    index: DataFrame,
    queries: DataFrame,
    url_col: str = "url_canon",
    ts_col: str = "target_ts",
) -> DataFrame:
    """CDX server ``matchType=exact&closest=<ts>`` lookup (the
    Wayback-style API, public): for each ``(url, target_ts)`` query,
    the capture of that URL whose ``warc_ts`` is nearest in time —
    ties (equidistant before/after) break to the EARLIER capture,
    then by capture url, a total order.

    Same broadcast shape as :func:`cdx_lookup` (the query batch is
    small; the index never shuffles — the SURT equi-join reaches the
    range-partitioned shards as a pushed predicate), plus one
    per-query window over the handful of matched captures. The time
    algebra is exact integer microseconds.
    """
    q = queries.select(
        surt_key(url_col).alias("surt"),
        F.col(url_col).alias("query_url"),
        F.col(ts_col).alias("target_ts"),
    )
    j = index.join(F.broadcast(q), "surt")
    diff = F.abs(
        F.unix_micros(F.col("warc_ts")) - F.unix_micros(F.col("target_ts"))
    )
    w = Window.partitionBy("query_url", "target_ts").orderBy(
        diff.asc(), F.col("warc_ts").asc(), F.col("url").asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "query_url", "target_ts", "url", "warc_ts", diff.alias("diff_us")
        )
    )
