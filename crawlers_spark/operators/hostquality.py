"""Host-level curation signals (FineWeb/RefinedWeb-style host gating).

Public web-corpus pipelines gate at HOST granularity as well as per
document: a host whose pages are mostly junk (boilerplate farms, error
mirrors, generated spam) is cheaper to drop wholesale than to score
page by page forever — the quality-side complement of the crawler-trap
gate (operators/traps.py), and the same denylist wiring applies
(broadcast anti-join at link admission / frontier prune).

:func:`host_quality_signals` rolls per-document verdicts up to hosts:

- ``bad`` document ⇔ fails :func:`~crawlers_spark.functions.textstats.
  quality_ok` (C4-ish keep rules) OR trips the soft-404 heuristic
  (:mod:`crawlers_spark.functions.soft404`) — both pure column exprs;
- per host: ``n_docs``, ``n_bad``, and ``flagged`` ⇔ the host has at
  least ``min_docs`` documents AND ``n_bad · 100 ≥ max_bad_pct ·
  n_docs`` (cross-multiplied integers — no division enters the
  verdict, mirroring the trap-gate threshold style).

ONE hash aggregation keyed by host (map-side combine collapses the
per-document rows before the shuffle); output is host-cardinality.
The oracle (`docs_host_quality`) replays the document verdicts and the
rollup verbatim on a corpus with planted spam and soft-404 hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawlers_spark.functions.soft404 import SOFT404_MIN_CHARS, soft404_hits
from crawlers_spark.functions.textstats import quality_ok


def host_quality_signals(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    *,
    min_docs: int = 5,
    max_bad_pct: int = 50,
) -> DataFrame:
    """Per-host rollup ``(host, n_docs, n_bad, flagged)`` — see module
    docstring for the bad-document and flagging rules."""
    hits = soft404_hits(F.col(text_col))
    short = F.length(F.col(text_col)) < SOFT404_MIN_CHARS
    soft404 = ((hits >= 1) & short) | (hits >= 2)
    bad = (~quality_ok(F.col(text_col))) | soft404
    return (
        df.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(bad.cast("int")).cast("bigint").alias("n_bad"),
        )
        .withColumn(
            "flagged",
            (F.col("n_docs") >= min_docs)
            & (F.col("n_bad") * 100 >= F.lit(int(max_bad_pct)) * F.col("n_docs")),
        )
    )
