"""Host-level web-graph export (the Common Crawl host-graph analog).

Common Crawl publishes a *host-level webgraph* derivative alongside
WARC/WAT/WET/CDX: nodes are hosts written in **reversed-label order**
(``example.src0`` for ``src0.example`` — the same ordering SURT keys
use, so one sort co-locates a domain's subtree), edges are
``(from_host, to_host)`` pairs aggregated from page-level links. This
module produces that export from the engine's persisted link rows:

- :func:`host_edges` — page-level links → distinct host→host edges
  with ``n_links`` weights (self-loops dropped: intra-host links are
  navigation, not graph structure). ONE hash aggregation keyed by the
  host pair; map-side combine collapses the page-level fan-in before
  the shuffle, so shuffled bytes are bounded by the EDGE count (host²
  worst case, ~linear in hosts in practice), not the link count.
- :func:`host_nodes` — per-host out/in degree + link mass. Two keyed
  aggs over the edge table (already host-sized) + one full outer
  merge: a host appears when it has any edge in either direction.
- :func:`degree_distribution` — the classic power-law histogram
  (degree → number of hosts); edge-table-sized input, tiny output.

The reversed-host node key is a pure column expression
(split + reverse + rejoin). Nothing here reads html or page text —
the export runs entirely off link metadata, so at 100 TB it scans
only the (src, dst) columns of the link table (column pruning does
the rest).

Engine surface: ``CrawlEngine.host_graph()`` (plans/wave.py) builds
the export from committed ``kind='link'`` wave output; the oracle
query ``crawl_host_graph`` (harness/crawl.py) countersigns the whole
node rollup on a deterministically derived link table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reversed_host(host: Column) -> Column:
    """Host with label order reversed (``a.b.c`` → ``c.b.a``) — the
    Common-Crawl/SURT node naming that sorts a domain's subtree
    together."""
    return F.concat_ws(".", F.reverse(F.split(host, r"\.")))


def host_edges(
    links: DataFrame, src_col: str = "src_host", dst_col: str = "dst_host"
) -> DataFrame:
    """Aggregate page-level links into the host-graph edge table:
    ``(from_host, to_host, n_links)`` in reversed-label naming,
    self-loops dropped. One shuffle, keyed by the host pair."""
    return (
        links.where(F.col(src_col) != F.col(dst_col))
        .groupBy(
            reversed_host(F.col(src_col)).alias("from_host"),
            reversed_host(F.col(dst_col)).alias("to_host"),
        )
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def host_nodes(edges: DataFrame) -> DataFrame:
    """Per-host degree/mass rollup over the edge table:
    ``(host, out_deg, in_deg, out_links, in_links)``. Hosts with only
    one direction get 0 for the other (full outer merge)."""
    out = edges.groupBy(F.col("from_host").alias("host")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("n_links").alias("out_links")
    )
    inn = edges.groupBy(F.col("to_host").alias("host")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("n_links").alias("in_links")
    )
    return (
        out.join(inn, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_deg", F.lit(0)).cast("bigint").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("bigint").alias("in_deg"),
            F.coalesce("out_links", F.lit(0)).cast("bigint").alias("out_links"),
            F.coalesce("in_links", F.lit(0)).cast("bigint").alias("in_links"),
        )
    )


def degree_distribution(nodes: DataFrame, col: str = "out_deg") -> DataFrame:
    """Histogram of ``col`` over the node table: ``(degree, n_hosts)``
    — the power-law curve every web-graph paper plots."""
    return nodes.groupBy(F.col(col).alias("degree")).agg(
        F.count(F.lit(1)).alias("n_hosts")
    )
