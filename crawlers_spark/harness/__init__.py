"""Driver-harness query registry (SURVEY §2.2, §5.2.7).

Every implemented operator from SURVEY §2 is exposed twice: as a
PySpark query (``(spark, sf_dir) -> DataFrame``) and as an equivalent
ANSI-SQL string the DuckDB oracle runs on the same parquet tables.
The driver compares row counts, schemas, and order-insensitive value
hashes — so every computed column is aliased identically on both
sides, and floating-point aggregates go through exact DECIMAL
arithmetic before a final cast to double (identical bits in both
engines).

Submodules group the surface:
- ``relational`` — joins/aggregates/windows/set-ops over the TPC-H-ish
  tables (the engine's relational substrate, SURVEY §2.2)
- ``crawl``     — the crawl operators (canonicalize, frontier top-k,
  seen anti-join, robots, politeness) re-expressed over a
  deterministically derived URL table so DuckDB can oracle them
- ``docs``      — training-data pipeline ops over ``documents``:
  exact/minhash-LSH/simhash/Jaccard dedup, language-ID, quality,
  token counts, winnowing fingerprints
- ``embed``     — similarity search over ``embeddings``: brute-force
  cosine top-k and an LSH-bucketed variant
- ``stream``    — Structured Streaming tumbling-window aggregation
  (memory sink), oracled by the equivalent batch SQL
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawlers_spark.harness import crawl, docs, embed, media, relational, stream

_MODULES = [relational, crawl, docs, embed, media, stream]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for m in _MODULES:
        for name, (fn, _sql) in m.QUERIES.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out = {}
    for m in _MODULES:
        for name, (_fn, sql) in m.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
