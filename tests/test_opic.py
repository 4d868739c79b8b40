"""OPIC on-line importance (operators/opic.py) vs a hand replay of
the Abiteboul et al. update, plus its load-bearing invariants: exact
cash conservation through floor division (residues bank in the
virtual root), on-line page creation when cash reaches a never-seen
url, dangling cash routing, and convergence of the importance
ordering toward the link structure.
"""

from __future__ import annotations

import pytest

from crawlers_spark.operators.opic import (
    ROOT,
    TOTAL_CASH,
    opic_importance,
    opic_init,
    opic_step,
)

# hub h is linked by a and b; c dangles; d is discovered on-line (only
# ever a link target, absent from the initial page table)
PAGES = ["a", "b", "c", "h"]
OUT = {"a": ["h", "d"], "b": ["h"], "c": [], "h": ["a"]}


def _replay(waves):
    n_pages = len(PAGES)
    cash = {p: TOTAL_CASH // n_pages for p in PAGES}
    hist = {p: 0 for p in PAGES}
    root_cash = TOTAL_CASH - n_pages * (TOTAL_CASH // n_pages)
    root_hist = 0
    for fetched in waves:
        links = sorted({(s, d) for s in fetched for d in OUT.get(s, [])})
        deg = {}
        for s, _ in links:
            deg[s] = deg.get(s, 0) + 1
        inflow = {}
        root_in = 0
        for p in fetched:
            c = cash[p]
            if deg.get(p):
                share = c // deg[p]
                for (s, d) in links:
                    if s == p:
                        inflow[d] = inflow.get(d, 0) + share
                root_in += c - deg[p] * share
            else:
                root_in += c
        universe = sorted(set(cash) | set(inflow))
        n = len(universe)
        spread = root_cash // n
        new_cash, new_hist = {}, {}
        for p in universe:
            old = cash.get(p, 0)
            new_cash[p] = (0 if p in fetched else old) + inflow.get(p, 0) + spread
            new_hist[p] = hist.get(p, 0) + (old if p in fetched else 0)
        root_hist += root_cash
        root_cash = root_cash - n * spread + root_in
        cash, hist = new_cash, new_hist
    return cash, hist, root_cash, root_hist


def _spark_state(spark, waves):
    pages = spark.createDataFrame([(p,) for p in PAGES], "url_canon string")
    st = opic_init(pages)
    for fetched in waves:
        fdf = spark.createDataFrame([(p,) for p in fetched], "url_canon string")
        links = [(s, d) for s in fetched for d in OUT.get(s, [])]
        ldf = spark.createDataFrame(
            links or [("_none_", "_none_")], "src_canon string, dst_canon string"
        )
        if not links:
            ldf = ldf.where("src_canon <> '_none_'")
        st = opic_step(st, fdf, ldf).localCheckpoint()
    return {r["url_canon"]: (r["cash"], r["history"]) for r in st.collect()}


WAVES = [["a", "b", "c"], ["h", "d"], ["a", "b"]]


@pytest.fixture(scope="module")
def final(spark):
    return _spark_state(spark, WAVES)


def test_matches_hand_replay(final):
    cash, hist, rc, rh = _replay(WAVES)
    want = {p: (cash[p], hist[p]) for p in cash}
    want[ROOT] = (rc, rh)
    assert final == want


def test_cash_conserved_exactly(final):
    assert sum(c for c, _ in final.values()) == TOTAL_CASH


def test_online_page_creation_and_dangling(final):
    # d was not in the initial table; a's fetch minted its state row
    assert "d" in final and final["d"][0] > 0
    # c dangles: its whole fetched cash went to the root, its history
    # banked what it spent
    _, c_hist = final["c"]
    assert c_hist == TOTAL_CASH // len(PAGES)


def test_importance_orders_by_link_structure(spark, final):
    # replay the same waves; the twice-linked hub h must out-rank the
    # dangling page c, and every importance is positive
    pages = spark.createDataFrame([(p,) for p in PAGES], "url_canon string")
    st = opic_init(pages)
    for fetched in WAVES:
        fdf = spark.createDataFrame([(p,) for p in fetched], "url_canon string")
        links = [(s, d) for s in fetched for d in OUT.get(s, [])]
        ldf = spark.createDataFrame(links, "src_canon string, dst_canon string")
        st = opic_step(st, fdf, ldf).localCheckpoint()
    imp = {r["url_canon"]: r["importance"] for r in opic_importance(st).collect()}
    assert ROOT not in imp
    assert imp["h"] > imp["c"]
    assert all(v > 0 for v in imp.values())


# --------------------------------------------- CrawlEngine OPIC lane
def test_engine_fold_timing_invariance(spark):
    """apply_opic folded once at the end equals apply_opic called after
    every wave (state after wave k is a pure function of committed
    waves <= k), the upto marker advances, re-folding is a no-op, and
    opic_scores ranks fetched pages positively."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from fixtures.gen_pages import ensure_fixture
    from tests.test_crawl_e2e import make_engine

    fx = ensure_fixture(300)

    # engine A: fold after every wave
    a = make_engine(spark, fx, "opic_everywave")
    for _ in range(3):
        a.run(max_waves=1)
        a.apply_opic()
    sa = {
        (r["url_canon"], r["cash"], r["history"])
        for r in a._read_opic().drop("upto").collect()
    }

    # engine B: same three waves, one fold at the end
    b = make_engine(spark, fx, "opic_once")
    b.run(max_waves=3)
    st = b.apply_opic()
    # init consumes the first fetch wave; the remaining two fold as steps
    assert st["steps"] == 2 and st["upto"] == 3
    sb = {
        (r["url_canon"], r["cash"], r["history"])
        for r in b._read_opic().drop("upto").collect()
    }
    assert sa == sb

    # idempotence: nothing new committed -> no-op, state unchanged
    again = b.apply_opic()
    assert again == {"wave": None, "upto": st["upto"], "steps": 0}

    imp = {r["url_canon"]: r["importance"] for r in b.opic_scores().collect()}
    assert imp and all(v >= 0 for v in imp.values())
    from crawlers_spark.operators.opic import ROOT

    assert ROOT not in imp


def test_engine_fold_before_any_wave(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from fixtures.gen_pages import ensure_fixture
    from tests.test_crawl_e2e import make_engine

    fx = ensure_fixture(300)
    eng = make_engine(spark, fx, "opic_empty")
    assert eng.apply_opic() == {"wave": None, "upto": None, "steps": 0}
    assert eng.opic_scores() is None
