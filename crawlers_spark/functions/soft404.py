"""Soft-404 detection — error pages served with HTTP 200.

Real crawls meet hosts that answer every path with status 200 and an
"oops, not found" body ("soft 404s", studied publicly in Bar-Yossef et
al., WWW 2004, *Sic transit gloria telae*). Treating them as content
poisons dedup (thousands of near-identical error bodies), wastes
frontier budget (their outlinks are navigation), and pollutes an LLM
corpus with boilerplate. Content-side detection is the standard
complement to status codes:

- **phrase hits** — presence counts over a curated error-phrase list
  (multi-language; the fixture's French sites motivate
  ``page introuvable``), matched on the lowercased text;
- **shortness** — error bodies are short; below ``min_chars`` a single
  phrase hit is damning, while long pages need corroboration;
- **verdict** — ``soft404 = (hits ≥ 1 AND short) OR hits ≥ 2``.

Everything is a pure column expression (``contains`` + CASE sums +
length compare) — scan-side codegen, zero exchanges at any corpus
size, and the DuckDB oracle (`crawl_soft404` in harness/crawl.py)
replays the identical expression tree. Downstream, flagged pages are
the natural input to the trap-gate denylist (a host whose fetched
pages are mostly soft-404s is burning politeness budget for nothing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# sorted for stable plan text; lowercase — matching lowers the input
SOFT404_PHRASES: tuple[str, ...] = tuple(
    sorted(
        [
            "404 not found",
            "error 404",
            "does not exist",
            "no longer available",
            "page introuvable",
            "page not found",
            "page you requested",
            "been removed",
        ]
    )
)

SOFT404_MIN_CHARS = 200


def soft404_hits(
    text: Column, phrases: tuple[str, ...] = SOFT404_PHRASES
) -> Column:
    """Number of listed error phrases PRESENT in ``lower(text)`` —
    presence-based like the URL word score, so a repeated phrase
    counts once."""
    lo = F.lower(text)
    score = None
    for p in phrases:
        term = F.when(lo.contains(p), F.lit(1)).otherwise(F.lit(0))
        score = term if score is None else score + term
    return score.cast("int")


def soft404_flags(
    df: DataFrame,
    text_col: str = "text",
    *,
    phrases: tuple[str, ...] = SOFT404_PHRASES,
    min_chars: int = SOFT404_MIN_CHARS,
) -> DataFrame:
    """Annotate with ``n_hits`` / ``short`` / ``soft404``. Column
    appends only; callers filter or aggregate per host."""
    hits = soft404_hits(F.col(text_col), phrases)
    short = F.length(F.col(text_col)) < min_chars
    return (
        df.withColumn("n_hits", hits)
        .withColumn("short", short)
        .withColumn(
            "soft404",
            ((F.col("n_hits") >= 1) & F.col("short")) | (F.col("n_hits") >= 2),
        )
    )
