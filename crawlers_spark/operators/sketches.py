"""Count-min sketch over token streams — bounded-memory heavy hitters.

Exact token counting at 100 TB shuffles one row per *distinct* token
(fine) but the interesting monitoring question — "what are the heavy
hitters and how big are they?" — doesn't need the full distinct set in
one place. A count-min sketch folds every occurrence into a fixed
``depth × width`` counter grid: the sketch build is a hash-aggregate
whose key space is AT MOST ``depth * width`` rows (map-side combine
collapses everything executor-locally; the shuffle moves ≤ d·w rows per
partition regardless of corpus size), and the resulting grid is
broadcast-sized by construction. Estimates are upper bounds:
``est(t) = min_i grid[i][h_i(t)] ≥ true(t)``, with the classic
(ε=e/width, δ=e^-depth) guarantee.

Determinism contract (so the DuckDB oracle can replay the sketch
bit-for-bit, harness/docs.py ``docs_countmin_heavyhitters``): row
``i``'s hash of token ``t`` is the integer value of hex nibbles 7-10
of ``md5(i || '|' || t)`` — two uniform bytes (0..65535) taken
``% width``, so any width up to 65536 gets the full hash range
(width beyond that raises: a silently-shorter hash would void the
ε=e/width guarantee). With the default ``width=256`` the modulus
keeps the low byte — exactly the nibble arithmetic the SQL
restatement performs.

Reference anchor: no sketch surface exists in the reference
(pyjobs/crawlers, SURVEY §0 — mount empty); this extends the mandated
training-data analytics family (graft brief) with the standard
streaming-sketch primitive (Cormode & Muthukrishnan 2005, public).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(token: Column, i: int, width: int) -> Column:
    """Hash row ``i``: md5 nibbles 7-10 of ``"{i}|{token}"`` mod width."""
    if width > 65536:
        raise ValueError(f"width {width} exceeds the 16-bit hash range (65536)")
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}|"), token)), 7, 4), 16, 10
    ).cast("int")
    return (h16 % width).alias("bucket")


def _hash_rows(df: DataFrame, token_col: str, depth: int, width: int) -> DataFrame:
    """(token, i, bucket) — ``depth`` hash rows per input row."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _bucket(F.col(token_col), i, width)
            )
            for i in range(depth)
        ]
    )
    return df.select(token_col, F.explode(pairs).alias("h")).select(
        token_col, F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket")
    )


def countmin_sketch(
    occurrences: DataFrame, token_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch grid from token OCCURRENCES (duplicates count).

    Returns ``(i, bucket, n)`` — at most ``depth * width`` rows, so the
    result is always broadcastable.
    """
    return (
        _hash_rows(occurrences, token_col, depth, width)
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("n"))
    )


def countmin_estimate(
    probe: DataFrame,
    sketch: DataFrame,
    token_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each DISTINCT probe token.

    Returns ``(token_col, est)`` with ``est ≥`` the token's true
    occurrence count. The sketch side is broadcast (≤ depth·width
    rows); the probe side never shuffles beyond its own distinct.

    The join is LEFT so a probe cell the grid never touched counts as
    0 — an inner join would drop empty cells from the min, inflating
    (or losing entirely) estimates for tokens absent from the corpus.
    """
    hashed = _hash_rows(probe.select(token_col).distinct(), token_col, depth, width)
    return (
        hashed.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )
