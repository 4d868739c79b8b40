"""Host-level mirror detection from content digests.

Bharat & Broder, "Mirror, mirror on the Web: a study of host pairs
with replicated content" (WWW 1999 — public): large fractions of the
web are MIRRORED — the same content served by many hosts — and a
crawler that detects host-pair replication can collapse whole hosts
the way URL-level dedup collapses pages.  This is the host-granular
complement of the repo's existing dedup ladder (URL seen-set →
Mercator content-seen → near-dup pairs → crawler-trap signals): trap
detection finds duplication WITHIN a host, mirror detection finds it
BETWEEN hosts.

Method (the paper's "syntactic" stage, exactly computable from crawl
state): for every pair of hosts sharing at least one page content
digest, count the shared digests; a pair is a mirror candidate when
the overlap covers at least ``threshold_pct`` percent of the SMALLER
host's distinct digests (integer cross-multiplied compare — no
division enters the verdict).  Pairs are emitted once with
``host_a < host_b``.

Scale: the join is keyed by DIGEST — only digests that actually
repeat across hosts produce pairs, so a unique page never leaves its
partition's aggregation.  Per-digest fan-out is quadratic in the
number of hosts SHARING that digest; ubiquitous boilerplate digests
(empty pages, error shells) are exactly the hosts×hosts trap, so
digests shared by more than ``max_hosts_per_digest`` hosts are
dropped from pairing (the paper's stop-fingerprint analog) — with
that cap the pair volume is bounded by ``shared_digests · cap²``.
Crawl use: collapse the mirror set to one representative host in the
frontier (politeness budget and fetch waves stop paying for copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mirror_host_pairs"]


def mirror_host_pairs(
    pages: DataFrame,
    *,
    host_col: str = "host",
    digest_col: str = "digest",
    threshold_pct: int = 50,
    max_hosts_per_digest: int = 64,
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, is_mirror) over
    ``pages`` rows carrying a host and a content digest.

    ``shared``   — distinct digests present on BOTH hosts;
    ``size_x``   — distinct digests on each host;
    ``is_mirror``— ``shared · 100 ≥ threshold_pct · least(size_a,
    size_b)`` (integer compare).  Digests on more than
    ``max_hosts_per_digest`` hosts are excluded from pairing (but
    still count toward host sizes — a boilerplate page is still a
    page the host serves).
    """
    hd = pages.select(
        F.col(host_col).alias("host"), F.col(digest_col).alias("digest")
    ).distinct()
    sizes = hd.groupBy("host").agg(F.count(F.lit(1)).alias("size"))
    spread = hd.groupBy("digest").agg(F.count(F.lit(1)).alias("n_hosts"))
    pairable = hd.join(
        spread.where(F.col("n_hosts") <= max_hosts_per_digest).select("digest"),
        "digest",
    )
    a = pairable.select("digest", F.col("host").alias("host_a"))
    b = pairable.select("digest", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "digest")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.select(F.col("host").alias("host_a"), F.col("size").alias("size_a"))),
            "host_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("host").alias("host_b"), F.col("size").alias("size_b"))),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.col("size_a").cast("bigint").alias("size_a"),
            F.col("size_b").cast("bigint").alias("size_b"),
            (
                F.col("shared") * 100
                >= F.lit(int(threshold_pct)) * F.least("size_a", "size_b")
            ).alias("is_mirror"),
        )
    )
