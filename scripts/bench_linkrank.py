"""Link-graph PageRank scaling probe (operators/linkrank.py).

The frontier-prioritization PageRank is the engine's only iterative
graph job, so it gets its own N → 4N probe: the same deterministic
graph (derived from spark.range — identical input at every
parallelism) through ``pagerank_fixed`` at two core counts, reporting
edge-iteration throughput at both plus the scaling efficiency.

Graph shape mirrors the crawl workload: a century-hub edge per node
(skew: 1% of nodes receive ~100× in-degree, exercising the same
hot-key path AQE handles in the frontier), a chain edge, and 25%
dangling nodes (mass-redistribution term stays non-trivial).

Usage: python scripts/bench_linkrank.py [n_nodes] [iters] [cores ...]
       (default: 2_000_000 nodes, 3 iterations, at 2 and 8 cores)
       SPARK_GRAFT_GRAPH_OP=trustrank probes the seed-biased variant
       (trusted seeds = the century hubs) on the same graph.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from crawlers_spark.operators.linkrank import pagerank_fixed, trustrank_fixed  # noqa: E402
from crawlers_spark.session import get_spark  # noqa: E402

REPS = int(__import__("os").environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def build_graph(spark, n: int):
    ids = spark.range(n).select(F.col("id"))
    linked = ids.where(F.col("id") % 4 != 0)
    hub = linked.select(
        F.col("id").alias("src"), (F.col("id") - F.col("id") % 100).alias("dst")
    )
    chain = linked.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    return hub.unionByName(chain), ids


def run(n_nodes: int, iters: int, cores: int) -> dict:
    spark = get_spark(f"linkrank-{cores}", cores=cores, shuffle_partitions=cores)
    try:
        edges, nodes = build_graph(spark, n_nodes)
        n_edges = edges.count()  # warm + fixed input size

        op = __import__("os").environ.get("SPARK_GRAFT_GRAPH_OP", "pagerank")
        seeds = nodes.where(F.col("id") % 100 == 0)  # the century hubs

        def one_pass() -> None:
            if op == "trustrank":
                out = trustrank_fixed(edges, nodes, seeds, iterations=iters)
            else:
                out = pagerank_fixed(edges, nodes, iterations=iters)
            out.write.mode("overwrite").format("noop").save()

        one_pass()  # warm: codegen, checkpoint dirs
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            one_pass()
            walls.append(round(time.perf_counter() - t0, 2))
        wall = min(walls)
        return {
            "nodes": n_nodes,
            "edges": n_edges,
            "iters": iters,
            "cores": cores,
            "wall_s": wall,
            "walls": walls,
            "edge_iters_per_sec": round(n_edges * iters / wall, 1),
        }
    finally:
        spark.stop()


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores_list = [int(c) for c in sys.argv[3:]] or [2, 8]
    results = [run(n_nodes, iters, c) for c in cores_list]
    out = {"runs": results}
    if len(results) >= 2:
        a, b = results[0], results[-1]
        ratio = b["cores"] / a["cores"]
        out["scaling_efficiency"] = round(
            (b["edge_iters_per_sec"] / a["edge_iters_per_sec"]) / ratio, 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
