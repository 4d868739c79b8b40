"""Link-graph PageRank for frontier prioritization (O2 priority source).

The reference's scheduler orders requests by a static per-request
``priority`` (Scrapy `Request.priority`; SURVEY §2.1 O2). A web-scale
frontier wants a *link-derived* priority — crawl pages that many
crawled pages point to first. This module computes PageRank over the
outlink graph as a batch DataFrame job; ``CrawlEngine`` can fold the
result into frontier priorities between waves (see
``pagerank_priorities`` and tests/test_linkrank.py::test_engine_hook).

Design for a 1000-executor cluster:

- **Fixed-point bigint arithmetic** (``SCALE = 10**12``). Floating-point
  addition is not associative, so a distributed power iteration that
  sums doubles is non-reproducible run-to-run (reduction order changes
  with partitioning). All mass here is integer micro-units with floor
  division: sums are exact and ORDER-INDEPENDENT, so the result is
  bit-identical at any parallelism — and the DuckDB oracle can restate
  the whole iteration verbatim (harness/crawl.py). Quantization error
  is ≤ out_degree ulps of 1e-12 per vertex per round — irrelevant for
  ranking.
- **Per-iteration shuffle budget**: one (src-keyed) join of edges
  against ranks, one dst-keyed partial-agg shuffle, one vertex-keyed
  left join. The dangling-mass and vertex-count terms are 1-row
  aggregates crossJoined back (broadcast, no driver collect).
- **Lineage truncation**: ``localCheckpoint`` per round, same idiom as
  ``connected_components`` (operators/textdedup.py) — round N's plan
  must not replay rounds 1..N-1.

Semantics (classic damped PageRank, d = damping_pct/100):

    rank'(v) = (1-d)/N  +  d * ( Σ_{(u,v)∈E} rank(u)/deg(u)  +  m/N )

with m = Σ rank(u) over dangling vertices (no out-edges): their mass is
redistributed uniformly, so total mass stays ~1 and ranks are
comparable across graphs. In fixed point (all ops bigint, ``div`` =
floor division, non-negative operands so Spark's ``div`` ≡ DuckDB's
``//``):

    base    = (SCALE - (d_pct * SCALE) div 100) div N
    rank'_s = base + (d_pct * (in_sum + m div N)) div 100
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCALE = 10**12  # 85 * (SCALE + slack) stays far under int64


def pagerank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(id, rank_scaled) — damped PageRank after ``iterations`` power
    rounds, in SCALE-fixed-point bigints (rank ≈ rank_scaled / 1e12).

    ``nodes``: one ``id`` column (every vertex, including sinks).
    ``edges``: ``(src, dst)``; callers should pre-``distinct()`` —
    parallel edges would double-count mass.
    """
    edges = edges.select("src", "dst").persist()
    # deg is re-joined twice per round — persist the aggregate once so
    # the per-round DAG starts at the cached (src, deg) rows instead of
    # re-running the degree shuffle every iteration
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    n1 = nodes.agg(F.count("*").alias("n"))  # 1 row, crossJoined (broadcast)

    ranks = (
        nodes.crossJoin(F.broadcast(n1))
        .select("id", F.expr(f"{SCALE} div n").alias("rank_scaled"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        ranks = _power_round(ranks, edges, deg, nodes, n1, damping_pct).localCheckpoint()
    edges.unpersist()
    deg.unpersist()
    return ranks


def _power_round(ranks, edges, deg, nodes, n1, damping_pct: int) -> DataFrame:
    """One un-checkpointed power round (exposed for the plan-shape test:
    the only exchanges are the src-keyed edge join, the dst-keyed
    partial agg, and the vertex left join — the 1-row m/n terms come
    back as broadcast nested-loop joins, never a shuffle)."""
    # project deg's `src` away immediately: it is the SAME attribute
    # as edges.src, and keeping it would make the in_sum join below
    # an ambiguous self-join
    withdeg = ranks.join(deg, ranks["id"] == deg["src"], "left").select(
        ranks["id"].alias("id"), "rank_scaled", "deg"
    )
    m1 = withdeg.where(F.col("deg").isNull()).agg(
        F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("m")
    )
    live = withdeg.where(F.col("deg").isNotNull())
    in_sum = (
        edges.join(live, edges["src"] == live["id"])
        .select(edges["dst"].alias("dst"), F.expr("rank_scaled div deg").alias("share"))
        .groupBy("dst")
        .agg(F.sum("share").alias("in_sum"))
    )
    return (
        nodes.join(in_sum, nodes["id"] == in_sum["dst"], "left")
        .crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(n1))
        .select(
            "id",
            F.expr(
                f"({SCALE} - ({damping_pct} * {SCALE}) div 100) div n"
                f" + ({damping_pct} * (coalesce(in_sum, 0) + m div n)) div 100"
            ).alias("rank_scaled"),
        )
    )


SCALE_H = 10**9  # raw ≤ ΣSCALE_H ⇒ raw·SCALE_H ≤ 1e18 < int64 max


def hits_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    iterations: int = 2,
) -> DataFrame:
    """(id, hub_scaled, auth_scaled) — Kleinberg's HITS
    ("Authoritative Sources in a Hyperlinked Environment", JACM 1999 —
    public) after ``iterations`` mutual-reinforcement rounds:

        auth(v) ∝ Σ_{u→v} hub(u)      hub(u) ∝ Σ_{u→v} auth(v)

    Same portability discipline as :func:`pagerank_fixed`: all mass is
    fixed-point bigint, and each half-step SUM-normalizes (Σ = SCALE_H
    via exact floor division — L2 would need a float sqrt; any
    consistent normalization preserves the ranking, and the integer
    form is bit-identical at any parallelism and replayable in DuckDB).
    Per half-step shuffle budget: one edge-keyed join + one
    dst(/src)-keyed partial agg + one vertex left join; the normalizing
    total is a 1-row broadcast. ``localCheckpoint`` per round truncates
    lineage exactly like PageRank/connected-components.
    """
    if iterations < 1:
        raise ValueError("hits_fixed needs iterations >= 1 (auth is undefined before the first half-step)")
    edges = edges.select("src", "dst").persist()
    n1 = nodes.agg(F.count("*").alias("n"))
    hub = (
        nodes.crossJoin(F.broadcast(n1))
        .select("id", F.expr(f"{SCALE_H} div n").alias("score"))
        .localCheckpoint()
    )
    auth = None
    for _ in range(iterations):
        auth = _hits_half(edges, hub, nodes, "src", "dst").localCheckpoint()
        hub = _hits_half(edges, auth, nodes, "dst", "src").localCheckpoint()
    edges.unpersist()
    out = (
        hub.select(F.col("id"), F.col("score").alias("hub_scaled"))
        .join(
            auth.select(F.col("id"), F.col("score").alias("auth_scaled")),
            "id",
        )
    )
    return out


def _hits_half(edges, scores, nodes, from_col: str, to_col: str) -> DataFrame:
    """One HITS half-step: propagate ``scores`` along edges from
    ``from_col`` endpoints onto ``to_col`` endpoints, then sum-normalize
    to SCALE_H (CASE-guarded for the empty-graph total)."""
    raw = (
        edges.join(scores, edges[from_col] == scores["id"])
        .select(edges[to_col].alias("_to"), "score")
        .groupBy("_to")
        .agg(F.sum("score").alias("raw"))
    )
    total = raw.agg(F.coalesce(F.sum("raw"), F.lit(0)).alias("t"))
    return (
        nodes.join(raw, nodes["id"] == raw["_to"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.expr(
                f"CASE WHEN t = 0 THEN CAST(0 AS BIGINT) "
                f"ELSE (coalesce(raw, 0) * {SCALE_H}) div t END"
            ).alias("score"),
        )
    )


def hits_scores(outlinks: DataFrame, *, iterations: int = 2) -> DataFrame:
    """(url_canon, hub_scaled, auth_scaled) from a crawled outlink
    table ``(src_canon, dst_canon)`` — the hub/authority complement of
    :func:`pagerank_priorities`: authorities are fetch-priority
    material (pages many good hubs endorse), hubs are frontier-
    expansion material (pages whose outlinks are worth following
    first). Parallel edges are dropped, vertex set = src ∪ dst."""
    nodes = (
        outlinks.select(F.col("src_canon").alias("id"))
        .unionByName(outlinks.select(F.col("dst_canon").alias("id")))
        .distinct()
    )
    edges = outlinks.select(
        F.col("src_canon").alias("src"), F.col("dst_canon").alias("dst")
    ).distinct()
    return hits_fixed(edges, nodes, iterations=iterations).withColumnRenamed(
        "id", "url_canon"
    )


def pagerank_priorities(
    outlinks: DataFrame,
    *,
    iterations: int = 3,
    anchor: int = 100,
    lo: int = 0,
    hi: int = 119,
) -> DataFrame:
    """(url_canon, priority) from a crawled outlink table
    ``(src_canon, dst_canon)`` — PageRank quantized onto the frontier's
    integer priority axis, so the scheduler's existing
    (priority DESC, discovered_ts, url ASC) ordering
    (operators/frontier.py) needs no change.

    Anchoring: priority = anchor + floor(log2(rank / uniform)), i.e. a
    page of exactly average rank ties with fresh seeds (anchor=100,
    plans/wave.py seed priority) and each doubling of link mass is one
    level up, clamped to [lo, hi]. Default hi=119 keeps the whole
    link-derived band strictly below freshness recrawls (120), so
    recrawl-due URLs always fetch first."""
    nodes = (
        outlinks.select(F.col("src_canon").alias("id"))
        .unionByName(outlinks.select(F.col("dst_canon").alias("id")))
        .distinct()
    )
    edges = outlinks.select(
        F.col("src_canon").alias("src"), F.col("dst_canon").alias("dst")
    ).distinct()
    ranks = pagerank_fixed(edges, nodes, iterations=iterations)
    # Quantize by log2 of rank relative to the uniform mass 1/N — a pure
    # per-row expression (a percent_rank/ntile would be a GLOBAL window =
    # single-partition sort of every url). ratio 1 ⇒ average page ⇒ mid
    # priority; each doubling of rank is one level up.
    #
    # floor(log2(·)) is computed in EXACT integer arithmetic: a float
    # log2 of a bigint ratio differs by ULPs between libm / JVM Math and
    # flips the floor at power-of-two boundaries — non-portable across
    # engines.  Instead: t = (rank·2^20) div uniform (a bigint; for any
    # real y ≥ 2^-20, floor(log2(floor(y·2^20))) = floor(log2(y·2^20))
    # since [2^k, 2^(k+1)) has integer endpoints), and floor(log2(t)) =
    # bit_length(t) − 1 = length(bin(t)) − 1 — pure string/int ops that
    # DuckDB states verbatim (harness/crawl.py).  rank ≤ SCALE=1e12 so
    # t ≤ 2^20·1e12 < 2^63.  rank ≥ base ≈ 0.15·uniform > uniform·2^-20,
    # so t ≥ 1 always (the lo clamp still guards the degenerate case).
    uniform = (
        ranks.crossJoin(
            F.broadcast(
                nodes.agg(F.count("*").alias("n")).select(
                    F.expr(f"{SCALE} div n").alias("uniform_scaled")
                )
            )
        )
    )
    t = F.expr(f"(rank_scaled * {1 << 20}) div uniform_scaled")
    return uniform.select(
        F.col("id").alias("url_canon"),
        F.least(
            F.lit(hi),
            F.greatest(
                F.lit(lo),
                (F.length(F.bin(t)) - F.lit(21) + F.lit(anchor)).cast("int"),
            ),
        ).alias("priority"),
    )


def trustrank_fixed(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(id, rank_scaled) — TrustRank (Gyöngyi, Garcia-Molina, Pedersen,
    "Combating Web Spam with TrustRank", VLDB 2004 — public) after
    ``iterations`` biased power rounds, in SCALE-fixed-point bigints.

    TrustRank is PageRank with the teleport vector restricted to a
    hand-vetted trusted seed set S: trust flows OUT of seeds along
    links and decays with distance, so pages reachable only through
    long/spammy paths end up with ~0 trust.  The crawl use is frontier
    demotion — a candidate whose trust is far below its PageRank is
    link-spam-shaped (the paper's "spam mass" idea) and can be
    deprioritized before fetch.  Run on REVERSED edges with a known-
    spam seed set this same recurrence is Anti-TrustRank (Krishnan &
    Raj, AIRWeb 2006): distrust flows backwards onto pages that LINK
    TO spam.

        rank'(v) = (1-d)·[v∈S]/|S| + d·( Σ_{(u,v)∈E} rank(u)/deg(u)
                                          + [v∈S]·m/|S| )

    with dangling mass m redistributed over the SEEDS (not uniformly):
    mass the walk loses at a sink re-enters at the teleport set, which
    keeps total mass ~constant and the recurrence seed-biased — the
    static-score-vector variant of the paper's §4.3 (they renormalize;
    a seed-targeted dangling return is the standard mass-conserving
    equivalent for power iteration).

    Same portability discipline as :func:`pagerank_fixed` — all
    arithmetic is bigint floor-division, sums are order-independent,
    so the result is bit-identical at any parallelism and the DuckDB
    oracle restates the recurrence verbatim (harness/crawl.py).  Same
    per-round shuffle budget too: one src-keyed edge join, one
    dst-keyed partial agg, one vertex-keyed left join; |S| and m are
    1-row broadcasts; the seed-indicator join broadcasts ``seeds``
    (seed sets are hand-vetted — hundreds, not millions).

    In fixed point (``div`` = floor division, non-negative operands):

        base_s  = (SCALE - (d_pct * SCALE) div 100) div |S|
        rank'_s = is_seed * base_s
                  + (d_pct * (in_sum + is_seed * (m div |S|))) div 100
    """
    edges = edges.select("src", "dst").persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    seeds = seeds.select(F.col(seeds.columns[0]).alias("seed_id")).distinct().persist()
    ns1 = seeds.agg(F.count("*").alias("s"))  # 1 row, broadcast

    def seeded(df):
        return df.join(
            F.broadcast(seeds), df["id"] == F.col("seed_id"), "left"
        ).withColumn("is_seed", F.col("seed_id").isNotNull().cast("bigint"))

    ranks = (
        seeded(nodes)
        .crossJoin(F.broadcast(ns1))
        .select("id", F.expr(f"is_seed * ({SCALE} div s)").alias("rank_scaled"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        withdeg = ranks.join(deg, ranks["id"] == deg["src"], "left").select(
            ranks["id"].alias("id"), "rank_scaled", "deg"
        )
        m1 = withdeg.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("m")
        )
        live = withdeg.where(F.col("deg").isNotNull())
        in_sum = (
            edges.join(live, edges["src"] == live["id"])
            .select(edges["dst"].alias("dst"), F.expr("rank_scaled div deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("in_sum"))
        )
        ranks = (
            seeded(nodes)
            .join(in_sum, nodes["id"] == in_sum["dst"], "left")
            .crossJoin(F.broadcast(m1))
            .crossJoin(F.broadcast(ns1))
            .select(
                "id",
                F.expr(
                    f"is_seed * (({SCALE} - ({damping_pct} * {SCALE}) div 100) div s)"
                    f" + ({damping_pct} * (coalesce(in_sum, 0) + is_seed * (m div s))) div 100"
                ).alias("rank_scaled"),
            )
            .localCheckpoint()
        )
    edges.unpersist()
    deg.unpersist()
    seeds.unpersist()
    return ranks


def trustrank_scores(
    outlinks: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 3,
    reverse: bool = False,
) -> DataFrame:
    """(url_canon, trust_scaled) from a crawled outlink table
    ``(src_canon, dst_canon)`` and a 1-column trusted-URL seed table.
    ``reverse=True`` runs the recurrence on the transposed graph —
    with a SPAM seed set that is Anti-TrustRank: ``trust_scaled`` is
    then a distrust mass flowing onto pages that link (transitively)
    into spam, and high scores mean DEMOTE.  Parallel edges are
    dropped; vertex set = src ∪ dst; seeds outside the vertex set
    still teleport (they count in |S|) but never receive link mass."""
    s, d = ("dst_canon", "src_canon") if reverse else ("src_canon", "dst_canon")
    nodes = (
        outlinks.select(F.col("src_canon").alias("id"))
        .unionByName(outlinks.select(F.col("dst_canon").alias("id")))
        .distinct()
    )
    edges = outlinks.select(F.col(s).alias("src"), F.col(d).alias("dst")).distinct()
    return trustrank_fixed(edges, nodes, seeds, iterations=iterations).withColumnRenamed(
        "id", "url_canon"
    ).withColumnRenamed("rank_scaled", "trust_scaled")


def spam_mass(
    outlinks: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(url_canon, rank_scaled, trust_scaled, spam_mass_pct) — the
    TrustRank paper's §6 *relative spam mass*: the fraction of a page's
    PageRank that is NOT accounted for by trust flowing from the seed
    set,

        m̃(v) = (PR(v) - TR(v)) / PR(v)

    High m̃ ⇒ the page's rank comes from unvetted (spam-shaped) link
    mass ⇒ demote; low m̃ ⇒ its rank is trust-backed. This is the
    demotion signal `CrawlEngine.apply_trustrank`'s zero-trust rule
    approximates; computing the full ratio lets a scheduler demote by
    threshold instead of only the trust=0 extreme.

    Scale-exact arithmetic: both recurrences are the fixed-point bigint
    iterations above (same graph, same rounds, bit-identical at any
    parallelism), and the ratio is emitted as integer PERCENT with
    floor division — (rank - trust)·100 div rank, clamped at 0 — so the
    DuckDB oracle restates everything verbatim. TR ≤ PR is NOT an
    identity at finite iteration counts (trust teleports concentrate on
    seeds, so a seed's TR can exceed its PR), hence the clamp; the
    paper's usable signal is the high end of the scale.

    One extra cost over two separate calls: none — PageRank and
    TrustRank share the de-duplicated edge table and degree aggregate
    shapes, and the final merge is one vertex-keyed join.
    """
    nodes = (
        outlinks.select(F.col("src_canon").alias("id"))
        .unionByName(outlinks.select(F.col("dst_canon").alias("id")))
        .distinct()
    )
    edges = outlinks.select(
        F.col("src_canon").alias("src"), F.col("dst_canon").alias("dst")
    ).distinct()
    pr = pagerank_fixed(edges, nodes, iterations=iterations, damping_pct=damping_pct)
    tr = trustrank_fixed(edges, nodes, seeds, iterations=iterations, damping_pct=damping_pct)
    return (
        pr.join(tr.withColumnRenamed("rank_scaled", "trust_scaled"), "id")
        .select(
            F.col("id").alias("url_canon"),
            "rank_scaled",
            "trust_scaled",
            F.greatest(
                F.lit(0),
                F.expr("(rank_scaled - trust_scaled) * 100 div rank_scaled"),
            )
            .cast("int")
            .alias("spam_mass_pct"),
        )
    )


def cocitation_pairs(
    outlinks: DataFrame,
    *,
    max_fanout: int = 100,
) -> DataFrame:
    """(url_a, url_b, cocite) — co-citation counts: how many distinct
    pages link to BOTH a and b (Dean & Henzinger, "Finding related
    pages in the World Wide Web", WWW 1999 — public; co-citation is
    their core signal for the Related Pages feature). Crawl uses:
    seed expansion (pages co-cited with known-good seeds are crawl
    candidates) and mirror/variant grouping.

    Scale guard: the per-source self-join is QUADRATIC in out-degree —
    one 10^5-outlink hub page alone would emit 10^10 pairs. Sources
    with more than ``max_fanout`` distinct outlinks are dropped BEFORE
    the pair expansion (the paper's own mitigation; directory-shaped
    mega-hubs carry little co-citation signal per pair anyway), so the
    expansion is bounded by Σ min(deg, max_fanout)² — linear-ish in
    sources. One degree agg + one src-keyed self-join + one pair-keyed
    count; `url_a < url_b` keeps each unordered pair once.
    """
    e = outlinks.select(
        F.col("src_canon").alias("src"), F.col("dst_canon").alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    bounded = e.join(
        deg.where(F.col("_deg") <= max_fanout).select("src"), "src"
    )
    a = bounded.select("src", F.col("dst").alias("url_a"))
    b = bounded.select("src", F.col("dst").alias("url_b"))
    return (
        a.join(b, "src")
        .where(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.count(F.lit(1)).alias("cocite"))
    )


def related_pages(
    outlinks: DataFrame,
    *,
    k: int = 5,
    max_fanout: int = 100,
    min_cocite: int = 2,
) -> DataFrame:
    """(url_canon, rank, related_url, cocite) — top-k related pages per
    page by co-citation count (ties: lexicographically smallest
    neighbour first — deterministic at any parallelism). Pairs below
    ``min_cocite`` are noise (a single shared hub co-cites everything
    it links) and are dropped before ranking. Per-page window on the
    (already tiny) pair table — never a global sort."""
    pairs = cocitation_pairs(outlinks, max_fanout=max_fanout).where(
        F.col("cocite") >= min_cocite
    )
    both = pairs.select(
        F.col("url_a").alias("url_canon"), F.col("url_b").alias("related_url"), "cocite"
    ).unionByName(
        pairs.select(
            F.col("url_b").alias("url_canon"), F.col("url_a").alias("related_url"), "cocite"
        )
    )
    w = Window.partitionBy("url_canon").orderBy(
        F.desc("cocite"), F.asc("related_url")
    )
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("url_canon", "rank", "related_url", "cocite")
    )
