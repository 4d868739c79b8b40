"""URL-level admission filtering (UT1-style blocklist + word scores).

Public RefinedWeb (Penedo et al. 2023, Appendix G) and CCNet-lineage
pipelines gate crawl frontiers and curated corpora by URL alone,
before any fetch or text analysis:

- a **domain blocklist** (in production the UT1 "adult" list, ~4.6M
  registrable domains): a URL is blocked when the *registrable domain*
  of its host is listed, so every subdomain of a listed site is caught
  at the dot boundary (``ads.casino.example`` matches
  ``casino.example``; ``notcasino.example`` does not);
- a **weighted URL word score**: a curated word list where each word
  carries a weight, scored by *presence* in the lowercased URL; a URL
  whose total weight reaches a threshold is blocked even when its
  domain is unlisted (catches fresh domains the blocklist hasn't).

Both are pure Catalyst expressions — ``contains`` + CASE sums over the
registrable-domain expression from :mod:`crawlers_spark.functions.
domains` — so the filter is scan-side codegen with ZERO exchanges at
any corpus size. Weights are integer milli-units (no float enters any
comparison), and the DuckDB oracle replays the identical expression
tree (`crawl_url_blocklist` in harness/crawl.py).

Scale note: the blocklist enters the plan as a literal IN-set here
(right for the sandbox's small zoos). At UT1 size (~4.6M entries) the
same predicate becomes a broadcast LEFT ANTI join on the registrable
domain — the engine wiring in plans/wave.py picks the join form when
the list exceeds ``BLOCKLIST_LITERAL_MAX`` so neither path shuffles
the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.domains import PSL_LITE, registrable_domain

# above this many entries the literal IN-set stops being sane plan text
# and the engine switches to a broadcast anti-join on the registrable
# domain (identical semantics; still zero corpus shuffles)
BLOCKLIST_LITERAL_MAX = 256


def url_word_score(url: Column, weights: dict[str, int]) -> Column:
    """Σ weight over listed words PRESENT in ``lower(url)``, in integer
    milli-units. Presence-based (not occurrence-counted) — matching
    RefinedWeb's word-list scoring — so a word repeated in the URL
    counts once. Deterministic iteration order (sorted words) keeps
    the plan text stable across processes."""
    if not weights:
        return F.lit(0)
    lo = F.lower(url)
    score = None
    for word, milli in sorted(weights.items()):
        term = F.when(lo.contains(word.lower()), F.lit(int(milli))).otherwise(F.lit(0))
        score = term if score is None else score + term
    return score.cast("int")


def blocklisted_domain(
    host: Column,
    blocked: tuple[str, ...],
    suffixes: tuple[str, ...] = PSL_LITE,
) -> Column:
    """True when the registrable domain (eTLD+1 under the PSL rules) of
    ``host`` is a blocklist entry — UT1 semantics: listing a domain
    blocks it and every subdomain, at dot boundaries only."""
    if not blocked:
        return F.lit(False)
    return registrable_domain(F.lower(host), suffixes).isin(*sorted(blocked))


def url_admission(
    df: DataFrame,
    blocked: tuple[str, ...] = (),
    weights: dict[str, int] | None = None,
    threshold_milli: int = 1000,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Annotate ``df`` with the full admission verdict:

    - ``site``          — registrable domain of ``host_col``
    - ``blocklisted``   — domain-blocklist hit (subdomains included)
    - ``score_milli``   — URL word score, integer milli-units
    - ``admitted``      — NOT blocklisted AND score < threshold

    Column-append only; callers filter on ``admitted`` (the engine) or
    keep the verdict columns (the curation/audit lane).
    """
    w = weights or {}
    return (
        df.withColumn("site", registrable_domain(F.lower(F.col(host_col))))
        .withColumn("blocklisted", blocklisted_domain(F.col(host_col), blocked))
        .withColumn("score_milli", url_word_score(F.col(url_col), w))
        .withColumn(
            "admitted",
            ~F.col("blocklisted") & (F.col("score_milli") < F.lit(int(threshold_milli))),
        )
    )
