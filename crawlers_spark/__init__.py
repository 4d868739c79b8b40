"""crawlers_spark — a PySpark-native web-crawl analytics engine.

A from-scratch re-expression of the capabilities of ``pyjobs/crawlers``
(a Scrapy-spider job-board crawler; see SURVEY.md — the read-only
reference mount was empty, so semantics derive from BASELINE.json's
north_star plus public Scrapy/w3lib behavior) on idiomatic PySpark:

- a unified URL frontier over snapshot-committed parquet tables
  (Iceberg-style; see ``crawlers_spark.sources.tables``),
- salted-partition priority-queue fetch waves (``operators.frontier``),
- exact URL-seen dedup accelerated by partitioned Bloom shards
  (``operators.dedup``),
- per-host politeness + robots.txt as broadcast state
  (``operators.politeness``, ``operators.robots``),
- per-source job-offer extraction as vectorized pandas UDFs
  (``extraction``), byte-identical to the pinned oracle extractor,
- per-wave lineage + atomic commit + resume (``plans.wave``).

No per-row Python UDFs anywhere: everything crosses the JVM boundary
through Arrow-batched pandas UDFs only.
"""

__version__ = "0.1.0"
