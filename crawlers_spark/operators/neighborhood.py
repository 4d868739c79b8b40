"""Neighborhood function over the crawl graph (HyperANF-style).

The *neighborhood function* ``|B(v, r)|`` — how many nodes sit within
``r`` hops of ``v`` — underlies the classic web-graph diagnostics:
distance distributions, effective diameter, and (truncated) harmonic
centrality, all published for Common-Crawl-scale graphs via HyperANF
(Boldi & Vigna, WWW 2011). Two implementations with one contract:

- :func:`neighborhood_exact` — iterated frontier joins materializing
  the (node, member) reachability pairs and counting them per radius.
  EXACT, and exactly what the DuckDB oracle unrolls
  (`crawl_neighborhood_function`); pairs grow with ball size, so this
  is the small-radius / verification path.
- :func:`neighborhood_hll` — HyperANF proper: every node carries a
  HyperLogLog sketch of its ball (Spark's Datasketches
  ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_union``), and one
  round updates ``sketch(v) ← sketch(v) ∪ ⋃_{v→w} sketch(w)`` — ONE
  edge join + ONE keyed union-agg per round, per-node state is a
  fixed-size sketch (2^lg_k registers) regardless of ball size. This
  is the 100 TB path: radius-r neighborhood functions over a
  10^10-edge host graph cost r bounded shuffles and never materialize
  a reachability pair. Estimates are within HLL error of the exact
  counts (pytest-pinned on a known graph).

Both take a directed edge table and self-loops are ignored; ``r = 0``
is the node itself. Output: ``(node, r, ball)`` per node per radius
0..``radius`` (``ball`` is exact for the former, the sketch estimate
for the latter).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _nodes(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )


def neighborhood_exact(
    edges: DataFrame, *, radius: int = 2, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact ``(node, r, ball)`` for r in 0..radius via iterated
    distinct reachability pairs. Verification / small-radius path —
    the pair table is Σ ball sizes, which explodes on expander-like
    graphs; use :func:`neighborhood_hll` at scale."""
    if radius < 0:
        raise ValueError("radius must be >= 0")
    e = _clean_edges(edges, src, dst)
    nodes = _nodes(e)
    ball = nodes.select(F.col("node"), F.col("node").alias("member"))
    outs = [
        nodes.select("node", F.lit(0).alias("r"), F.lit(1).cast("bigint").alias("ball"))
    ]
    for r in range(1, radius + 1):
        step = e.join(
            ball.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "member")
        ball = ball.unionByName(step).distinct()
        outs.append(
            ball.groupBy("node").agg(
                F.lit(r).alias("r"), F.count(F.lit(1)).cast("bigint").alias("ball")
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def neighborhood_hll(
    edges: DataFrame,
    *,
    radius: int = 2,
    lg_k: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperANF: ``(node, r, ball)`` estimates for r in 0..radius.
    Per round one edge join + one ``hll_union_agg`` keyed by the
    source node; per-node state is one fixed-size sketch. Sink nodes
    (no out-edges) keep their own sketch each round."""
    if radius < 0:
        raise ValueError("radius must be >= 0")
    e = _clean_edges(edges, src, dst)
    nodes = _nodes(e)
    s = nodes.groupBy("node").agg(F.hll_sketch_agg("node", F.lit(lg_k)).alias("sk"))
    outs = [
        s.select(
            "node", F.lit(0).alias("r"), F.hll_sketch_estimate("sk").alias("ball")
        )
    ]
    for r in range(1, radius + 1):
        nbr = (
            e.join(s.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.hll_union_agg("sk").alias("nbr_sk"))
        )
        s = (
            s.join(nbr, "node", "left")
            .select(
                "node",
                F.when(F.col("nbr_sk").isNull(), F.col("sk"))
                .otherwise(F.hll_union("sk", "nbr_sk"))
                .alias("sk"),
            )
        )
        outs.append(
            s.select(
                "node", F.lit(r).alias("r"), F.hll_sketch_estimate("sk").alias("ball")
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def harmonic_centrality(
    edges: DataFrame,
    *,
    radius: int = 2,
    src: str = "src",
    dst: str = "dst",
    reverse: bool = True,
    method: str = "exact",
    lg_k: int = 12,
) -> DataFrame:
    """Truncated harmonic centrality ``H(v) = Σ_{0<d(u,v)≤radius} 1/d``
    — the centrality HyperBall (Boldi & Vigna, 2013) popularized for
    web graphs, derived from the neighborhood function as
    ``Σ_r (|B(v,r)| − |B(v,r−1)|)/r``. ``reverse=True`` (default)
    transposes the edges first, giving the classic "how easily is v
    REACHED" variant; ``reverse=False`` scores reach-out instead.

    Contract: contributions are quantized to integer micro-units with
    floor division — ``(Δ_r · 10⁶) div r`` — then summed, so the score
    is exact integer arithmetic over ball sizes and any engine
    replaying the same balls agrees bit-for-bit
    (``harmonic_micro``; divide by 10⁶ to read it).

    ``method='exact'`` uses :func:`neighborhood_exact` (verification /
    oracle path); ``method='hll'`` uses :func:`neighborhood_hll` —
    same cost shape as HyperANF, the 100 TB path.
    """
    from pyspark.sql import Window

    if method not in ("exact", "hll"):
        raise ValueError(f"unknown method {method!r}")
    e = (
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        if reverse
        else edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    balls = (
        neighborhood_exact(e, radius=radius)
        if method == "exact"
        else neighborhood_hll(e, radius=radius, lg_k=lg_k)
    )
    w = Window.partitionBy("node").orderBy("r")
    delta = F.col("ball") - F.lag("ball").over(w)
    contrib = F.when(F.col("r") == 0, F.lit(0)).otherwise(
        F.floor(delta * 1_000_000 / F.col("r"))
    )
    return (
        balls.withColumn("_c", contrib)
        .groupBy("node")
        .agg(F.sum("_c").cast("bigint").alias("harmonic_micro"))
    )
