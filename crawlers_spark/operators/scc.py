"""Strongly connected components + web bowtie decomposition.

Two public results motivate this operator family:

- Broder et al., "Graph structure in the web" (WWW 2000 — public):
  the web graph resolves into a giant strongly connected CORE, an IN
  region that reaches the core, an OUT region the core reaches, and
  tendrils/tubes/disconnected islands.  A crawler cares because a
  forward BFS from seeds inside the core can never discover IN —
  coverage audits, seed-list design, and frontier budgeting all want
  the per-host bowtie class.
- Orzan's coloring algorithm ("On distributed verification and
  verified distribution", 2004 — public; the standard distributed
  SCC scheme, also the basis of the Spark "coloring" SCC in the
  literature): repeatedly (a) propagate to every node the MINIMUM id
  that can reach it ("color"), (b) the root of each color class
  (color(r) == r) identifies one SCC = the class members that reach
  the root *within the class*, (c) peel those off and repeat on the
  remainder.

Determinism.  Every step is a pure function of the edge set — min()
over ancestors, integer set algebra — so the result is bit-identical
at any parallelism, and the DuckDB oracle (harness/crawl.py
``crawl_scc_bowtie``) does not replay the algorithm at all: it
computes the transitive closure with a recursive CTE and derives
SCCs from MUTUAL reachability — two INDEPENDENT derivations of the
same mathematical object.

Correctness of the restricted backward sweep (why (b) may confine
itself to the color class): if color(v) == r then r reaches v; if
additionally v reaches r, every node x on a v→…→r path satisfies
r →…→ v →…→ x →…→ r, i.e. x ∈ SCC(r), hence color(x) == r — the
witness path never leaves the class.  And r is the minimum id of its
class (r is an ancestor of every member, and every id is its own
ancestor), so "reaches r within the class" ≡ "min same-color
descendant == r", which is min-propagation on the reversed
class-restricted graph — the same kernel as (a).

Scale.  Both fixpoints use pointer doubling (label := label-of-label
— a min-ancestor's min-ancestor is a min-ancestor by transitivity),
so each converges in O(log longest-path) rounds, not O(diameter).
Per round: one edge⋈label join + one keyed partial-min shuffle + one
label self-join, all over the HOST graph (~10^8 edges at 100 TB —
executor-trivial next to the page corpus); ``localCheckpoint``
truncates lineage per round.  Peeling removes at least one SCC per
color-class root per outer round; on web-shaped graphs the giant
core leaves in round 1 and the shallow IN/OUT chains drain in a
handful more.  Non-convergence RAISES (never silently-wrong labels),
mirroring textdedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["strongly_connected_components", "bowtie_classes"]

# Virtual super-source for reachability-as-coloring (bowtie_classes).
# Sorts strictly below every real id, so min-ancestor == _SOURCE is
# exactly "reachable from the source".  Real node ids must be
# non-empty strings (host names / URLs always are).
_SOURCE = ""


def _min_ancestors(
    edges: DataFrame, nodes: DataFrame, *, max_rounds: int, what: str
) -> DataFrame:
    """Fixpoint ``(id, label)`` with label = MIN id over {v} ∪ all
    ancestors of v along ``edges (src, dst)``, by min-propagation
    with pointer doubling.  ``nodes`` is an (id) frame covering every
    vertex (isolated ones included).  Raises on non-convergence.
    """
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint()
    for _ in range(max_rounds):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("src"), F.col("label").alias("src_label")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("src_label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, labels["id"] == nbr["dst"], "left").select(
            "id",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # pointer doubling: an ancestor's ancestor is an ancestor.
        # Change detection rides the same frame (label vs the round's
        # starting label) so convergence costs one cheap scan of the
        # checkpointed result instead of a second join+shuffle.
        hop = stepped.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        new_labels = (
            stepped.join(hop, stepped["label"] == hop["pid"], "left")
            .select(
                "id",
                F.least("label", F.coalesce("plabel", "label")).alias("label"),
                (F.least("label", F.coalesce("plabel", "label")) != F.col("old")).alias(
                    "_chg"
                ),
            )
        ).localCheckpoint(eager=False)
        # lazy checkpoint: the convergence count below is the action
        # that materializes it — one job per round, not two
        changed = new_labels.where("_chg").count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"scc.{what}: min-ancestor fixpoint did not converge in {max_rounds} "
        f"doubling rounds (longest path > 2^{max_rounds}); raise max_rounds"
    )


def strongly_connected_components(
    edges: DataFrame, *, max_peel: int = 12, max_rounds: int = 25
) -> DataFrame:
    """(id, scc) over a DIRECTED edge table ``(src, dst)`` — scc is
    the minimum member id of the strongly connected component (the
    same representative convention as connected_components'
    ``cluster``).  Self-loops are dropped; parallel edges collapse.
    Isolated endpoints never occur (every id appears in some edge);
    callers with isolated nodes union them in as singletons.
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    active_nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    active_edges = e
    done = None
    for peel in range(max_peel):
        colors = _min_ancestors(
            active_edges, active_nodes, max_rounds=max_rounds, what="colors"
        )
        # (b) within each color class, min same-color DESCENDANT ==
        # color  ⟺  the node reaches its class root  ⟺  member of the
        # root's SCC.  Same kernel on the reversed class-restricted
        # edges.
        c_src = colors.select(F.col("id").alias("src"), F.col("label").alias("cs"))
        c_dst = colors.select(F.col("id").alias("dst"), F.col("label").alias("cd"))
        same = (
            active_edges.join(c_src, "src")
            .join(c_dst, "dst")
            .where(F.col("cs") == F.col("cd"))
            # reversed: propagate descendants' mins backwards
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .localCheckpoint()
        )
        desc = _min_ancestors(same, active_nodes, max_rounds=max_rounds, what="desc")
        verdict = colors.join(
            desc.select(F.col("id").alias("did"), F.col("label").alias("dlabel")),
            colors["id"] == F.col("did"),
        ).select("id", F.col("label").alias("scc"), (F.col("dlabel") == F.col("label")).alias("in_scc"))
        found = verdict.where("in_scc").select("id", "scc").localCheckpoint()
        done = found if done is None else done.unionByName(found).localCheckpoint()
        remaining = verdict.where(~F.col("in_scc")).select("id").localCheckpoint()
        if remaining.isEmpty():
            e.unpersist()
            return done
        active_nodes = remaining
        keep_src = remaining.select(F.col("id").alias("src"))
        keep_dst = remaining.select(F.col("id").alias("dst"))
        active_edges = (
            active_edges.join(keep_src, "src").join(keep_dst, "dst").localCheckpoint()
        )
    e.unpersist()
    raise RuntimeError(
        f"strongly_connected_components: {max_peel} peel rounds exhausted with "
        f"nodes remaining; raise max_peel"
    )


def _reachable_from(seed_flags: DataFrame, edges: DataFrame, nodes: DataFrame, *, max_rounds: int, what: str) -> DataFrame:
    """(id, reached:boolean) — forward reachability from the flagged
    seed set along ``edges``, via the min-ancestor kernel with a
    virtual super-source wired to every seed (reachable ⟺ the
    propagated min is the source sentinel — pointer doubling applies
    to plain reachability for free this way).
    """
    aug_edges = edges.unionByName(
        seed_flags.where("seed").select(
            F.lit(_SOURCE).alias("src"), F.col("id").alias("dst")
        )
    )
    aug_nodes = nodes.unionByName(
        seed_flags.sparkSession.createDataFrame([(_SOURCE,)], "id string")
    )
    labels = _min_ancestors(aug_edges, aug_nodes, max_rounds=max_rounds, what=what)
    return labels.where(F.col("id") != _SOURCE).select(
        "id", (F.col("label") == _SOURCE).alias("reached")
    )


def bowtie_classes(
    edges: DataFrame, *, max_peel: int = 12, max_rounds: int = 25
) -> DataFrame:
    """(id, scc, cls) — Broder et al.'s bowtie decomposition of a
    directed graph: ``cls`` is ``core`` (the largest SCC; ties break
    to the smallest representative id), ``in`` (reaches the core, not
    in it), ``out`` (reachable from the core, not in it), or
    ``other`` (tendrils, tubes, disconnected islands).  A node that
    both reaches and is reached by the core would BE core, so the
    four classes partition the vertex set.
    """
    scc = strongly_connected_components(
        edges, max_peel=max_peel, max_rounds=max_rounds
    ).persist()
    core_id = (
        scc.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("scc").asc())
        .limit(1)
        .select(F.col("scc").alias("core_id"))
    )
    flagged = scc.crossJoin(F.broadcast(core_id)).select(
        "id", "scc", (F.col("scc") == F.col("core_id")).alias("seed")
    ).localCheckpoint()
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = flagged.select("id")
    fwd = _reachable_from(flagged, e, nodes, max_rounds=max_rounds, what="bowtie_out")
    bwd = _reachable_from(
        flagged,
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        nodes,
        max_rounds=max_rounds,
        what="bowtie_in",
    )
    out = (
        flagged.join(fwd.withColumnRenamed("reached", "from_core"), "id")
        .join(bwd.withColumnRenamed("reached", "to_core"), "id")
        .select(
            "id",
            "scc",
            F.when(F.col("seed"), F.lit("core"))
            .when(F.col("to_core"), F.lit("in"))
            .when(F.col("from_core"), F.lit("out"))
            .otherwise(F.lit("other"))
            .alias("cls"),
        )
    )
    result = out.localCheckpoint()
    scc.unpersist()
    e.unpersist()
    return result
