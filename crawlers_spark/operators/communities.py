"""Label-propagation community detection over the host graph.

Raghavan, Albert & Kumara, "Near linear time algorithm to detect
community structures in large-scale networks" (Phys. Rev. E 2007 —
public) — the standard near-linear community detector for web-scale
graphs, and the community-structure complement of this repo's other
link-analysis operators (connected components finds *reachability*
clusters; LPA finds *densely linked* clusters inside one component).
Crawl uses: mirror-farm / link-farm grouping (a spam community found
by Anti-TrustRank on one member usually covers the whole community),
per-community crawl budgeting, and shard-locality hints (co-fetching
a community keeps its intra-links resolvable in one partition).

Determinism. Classic LPA breaks ties randomly and updates
asynchronously — neither survives a distributed replay or an oracle
comparison. This implementation is the SYNCHRONOUS variant with a
total tie order:

- round r: every node simultaneously adopts the label with the most
  votes among its neighbours' round-(r-1) labels PLUS ONE vote for
  its own current label (the self-vote damps single-round label
  invasion across bridges — without it a lexicographically small
  label annexes everything it touches);
- ties break to the lexicographically SMALLEST label;
- nodes with no neighbours keep their label.

Every step is a pure function of the previous labelling, so the
result is bit-identical at any parallelism and a SQL oracle can
unroll the rounds verbatim (harness/crawl.py ``crawl_host_communities``).
Synchronous LPA can 2-cycle on bipartite structures instead of
converging — callers pick a fixed round count (the paper reports ~5
rounds labels >95% of nodes correctly) and treat the output as that
round's labelling, exactly like the fixed-round PageRank/HITS
operators.

Scale. Per round: one src-keyed edge⋈label join, one (node, label)
partial-count shuffle, one node-partitioned window (top-1 per node —
never a global sort), one node-keyed left join; ``localCheckpoint``
per round truncates lineage like pagerank_fixed/connected_components.
Edges carry only (src, dst) strings — at 100 TB the host graph is
~10^8 edges, executor-trivial next to the page corpus it summarizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    *,
    iterations: int = 5,
    undirected: bool = True,
) -> DataFrame:
    """(id, label) — synchronous min-tie LPA after ``iterations``
    rounds over ``edges (src, dst)``.

    ``undirected=True`` (default, the paper's setting) symmetrizes
    edges first — host links are treated as affinity, not direction.
    Self-loops are dropped (a page linking to its own host is
    navigation, not community evidence); parallel edges collapse to
    one vote (distinct), so a single heavily-duplicated link cannot
    outvote distinct neighbours.
    """
    e = edges.select("src", "dst")
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.where(F.col("src") != F.col("dst")).distinct().persist()

    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint()

    w = Window.partitionBy("vote_id").orderBy(F.col("c").desc(), F.col("label").asc())
    for _ in range(iterations):
        votes = (
            e.join(labels, e["src"] == labels["id"])
            .select(e["dst"].alias("vote_id"), "label")
            # the self-vote: each node also votes its own current label
            .unionByName(labels.select(F.col("id").alias("vote_id"), "label"))
            .groupBy("vote_id", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vote_id", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(pick, labels["id"] == pick["vote_id"], "left")
            .select(
                labels["id"].alias("id"),
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return labels


def host_communities(
    host_edges: DataFrame,
    *,
    iterations: int = 5,
) -> DataFrame:
    """(host, community) from a host-graph edge table
    ``(from_host, to_host)`` (operators/hostgraph.py layout): LPA
    community membership, community id = the surviving label (a host
    name — stable and human-readable, like connected components'
    min-id representative)."""
    out = label_propagation(
        host_edges.select(
            F.col("from_host").alias("src"), F.col("to_host").alias("dst")
        ),
        iterations=iterations,
    )
    return out.select(F.col("id").alias("host"), F.col("label").alias("community"))
