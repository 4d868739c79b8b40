"""OPIC — Adaptive On-line Page Importance Computation (O2+).

Abiteboul, Preda & Cobéna, "Adaptive On-Line Page Importance
Computation" (WWW 2003 — public): the importance estimator built FOR
crawlers. Batch PageRank needs the whole link graph and k full passes;
OPIC updates importance *as pages are fetched*: every page holds
``cash``; fetching a page distributes its cash equally over its
outlinks and banks the spent amount in ``history``; importance is
``history + cash``. Pages that keep receiving cash from important
pages accumulate history fastest — the estimate converges to PageRank
without ever materializing a global iteration, which is exactly the
wave loop's access pattern (each wave fetches a batch and already
holds its outlinks from the fused extraction pass).

The paper's *virtual root* page closes the system: dangling pages send
their cash to the root, and the root — treated as fetched every step —
redistributes its cash uniformly over all known pages. The root is a
literal state row here (``ROOT``), which also absorbs every
floor-division residue, giving the discipline the rest of this repo's
graph operators follow:

- **Fixed-point bigint arithmetic.** cash/history are integer
  micro-units (Σcash is EXACTLY ``total_cash`` forever — every
  ``div`` has its ``mod`` banked in the root row), so sums are
  order-independent and the result is bit-identical at any
  parallelism; the DuckDB oracle restates one step verbatim
  (harness/crawl.py ``crawl_opic_step``).
- **Per-step shuffle budget**: one src-keyed join of the wave's
  outlinks against fetched cash, one dst-keyed partial-agg shuffle of
  the shares, one url-keyed outer merge onto the state. Root totals
  and the page count are 1-row broadcast scalars. State is
  url-cardinality — the same table the frontier already maintains.
- **Wave-integrability**: ``opic_step`` consumes exactly what a
  committed wave provides — the fetched set and its outlinks — so the
  engine can fold it between waves like ``apply_linkrank``, but
  incrementally: no replay over the full historical graph, ever.
  That is OPIC's 10^10-URL advantage over batch PageRank refreshes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROOT = "<root>"
TOTAL_CASH = 10**12  # same grid as linkrank.SCALE

STATE_SCHEMA = "url_canon string, cash bigint, history bigint"


def opic_init(pages: DataFrame, *, total_cash: int = TOTAL_CASH) -> DataFrame:
    """Initial OPIC state over a 1-column page table: every page gets
    ``total_cash div n``; the virtual root row gets the residue, so
    Σcash == total_cash exactly from step 0."""
    spark = pages.sparkSession
    n1 = pages.agg(F.count(F.lit(1)).alias("n"))
    paged = (
        pages.select(F.col(pages.columns[0]).alias("url_canon"))
        .distinct()
        .crossJoin(F.broadcast(n1))
        .select(
            "url_canon",
            F.expr(f"{total_cash} div n").alias("cash"),
            F.lit(0).cast("bigint").alias("history"),
        )
    )
    root = (
        spark.range(1)
        .crossJoin(F.broadcast(n1))
        .select(
            F.lit(ROOT).alias("url_canon"),
            F.expr(f"{total_cash} - n * ({total_cash} div n)").cast("bigint").alias("cash"),
            F.lit(0).cast("bigint").alias("history"),
        )
    )
    return paged.unionByName(root)


def opic_step(state: DataFrame, fetched: DataFrame, outlinks: DataFrame) -> DataFrame:
    """One OPIC update from one fetch wave → the next state table.

    ``state``: (url_canon, cash, history) including the ``ROOT`` row
    (from :func:`opic_init` or a previous step). ``fetched``: 1-column
    set of page urls fetched this wave. ``outlinks``: (src_canon,
    dst_canon) outlinks OF FETCHED PAGES (rows whose src was not
    fetched are ignored; parallel edges collapse to one).

    Semantics (paper §2.2 + virtual root, floor-division form):

    - each fetched page p with out-degree d > 0 sends
      ``cash(p) div d`` to every distinct outlink target, banks
      ``cash(p)`` into history(p), keeps 0; the residue
      ``cash(p) mod d`` goes to the root;
    - a fetched dangling page sends its whole cash to the root;
    - the root is fetched every step: it spreads ``cash(root) div n``
      to each of the n known pages (new discoveries included — cash
      arriving at a never-seen url CREATES its state row, the paper's
      on-line graph growth), banks its spent cash in its history, and
      retains ``cash(root) mod n`` plus the incoming residues;
    - unfetched pages keep cash and add any inflow.

    Σcash is exactly preserved; importance(p) = history(p) + cash(p)
    (:func:`opic_importance`).
    """
    f = fetched.select(F.col(fetched.columns[0]).alias("url_canon")).distinct()
    # localCheckpoint the three tables every downstream branch re-reads
    # (flagged state, per-spender cash×degree, merged page universe):
    # the step's scalar aggregates (|root|, n, residues) would otherwise
    # each replay the whole join tree — measured 42 distinct hash
    # exchanges in one un-materialized step vs ~7 with the cuts. All
    # three are url-cardinality or smaller; the engine lane checkpoints
    # between steps anyway, so this only adds the within-step cuts.
    st = state.join(f.withColumn("_f", F.lit(1)), "url_canon", "left").localCheckpoint()

    links = (
        outlinks.select(
            F.col("src_canon").alias("src"), F.col("dst_canon").alias("dst")
        )
        .distinct()
        .join(f.withColumnRenamed("url_canon", "src"), "src")
    )
    deg = links.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    spender = st.where(
        (F.col("_f").isNotNull()) & (F.col("url_canon") != ROOT)
    ).select(F.col("url_canon").alias("src"), "cash")
    spend = spender.join(deg, "src", "left").localCheckpoint()
    # linked spend: share per target + residue; dangling spend: all → root
    shares = (
        links.join(spend.where(F.col("deg").isNotNull()), "src")
        .select("dst", F.expr("cash div deg").alias("gain"))
        .groupBy("dst")
        .agg(F.sum("gain").alias("in_cash"))
    )
    to_root = spend.agg(
        F.coalesce(
            F.sum(
                F.when(F.col("deg").isNull(), F.col("cash")).otherwise(
                    F.expr("cash - deg * (cash div deg)")
                )
            ),
            F.lit(0),
        ).alias("root_in")
    )

    # the page universe after this step: old state pages + new targets
    base = st.where(F.col("url_canon") != ROOT).select(
        "url_canon", "cash", "history", "_f"
    )
    pages = (
        base.join(shares, base["url_canon"] == shares["dst"], "full")
        .select(
            F.coalesce("url_canon", "dst").alias("url_canon"),
            F.coalesce("cash", F.lit(0)).alias("cash"),
            F.coalesce("history", F.lit(0)).alias("history"),
            "_f",
            F.coalesce("in_cash", F.lit(0)).alias("in_cash"),
        )
        .localCheckpoint()
    )
    n1 = pages.agg(F.count(F.lit(1)).alias("n"))
    root_cash1 = state.where(F.col("url_canon") == ROOT).agg(
        F.coalesce(F.sum("cash"), F.lit(0)).alias("rc"),
        F.coalesce(F.sum("history"), F.lit(0)).alias("rh"),
    )

    new_pages = pages.crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(root_cash1)).select(
        "url_canon",
        (
            F.when(F.col("_f").isNotNull(), F.lit(0)).otherwise(F.col("cash"))
            + F.col("in_cash")
            + F.expr("rc div n")
        ).cast("bigint").alias("cash"),
        (
            F.col("history")
            + F.when(F.col("_f").isNotNull(), F.col("cash")).otherwise(F.lit(0))
        ).cast("bigint").alias("history"),
    )
    new_root = (
        state.sparkSession.range(1)
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(root_cash1))
        .crossJoin(F.broadcast(to_root))
        .select(
            F.lit(ROOT).alias("url_canon"),
            F.expr("rc - n * (rc div n) + root_in").cast("bigint").alias("cash"),
            F.expr("rh + rc").cast("bigint").alias("history"),
        )
    )
    return new_pages.unionByName(new_root)


def opic_importance(state: DataFrame) -> DataFrame:
    """(url_canon, importance) = history + cash, root excluded — the
    paper's estimator, monotone-comparable across steps because Σcash
    is invariant."""
    return (
        state.where(F.col("url_canon") != ROOT)
        .select("url_canon", (F.col("history") + F.col("cash")).alias("importance"))
    )
