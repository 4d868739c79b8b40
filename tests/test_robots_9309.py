"""RFC 9309 robots dialect: vectorized evaluator vs an independent
pure-Python matcher (written directly from the RFC, no regex), plus
hand-computed precedence cases and the Spark gate.

Semantics under test (RFC 9309 §2.2.2 / Google REP, what Scrapy's
Protego implements — the stdlib parser the reference relies on has
none of these):
  * ``*`` matches any run of octets, ``$`` (trailing) anchors at end
  * ALL matching rules compete; the longest pattern wins
  * on a tie, Allow wins
  * no matching rule → allowed
  * group selection: exact/prefix agent-token match, else ``*``;
    same-agent groups merge; empty patterns match nothing
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawlers_spark.operators.robots import (
    USER_AGENT,
    _allowed_mask_9309,
    match_9309,
)


# ----------------------------------------------------------- independent oracle
def _match_pattern(pattern: str, path: str) -> bool:
    """Backtracking matcher: '*' wildcard, trailing '$' anchor, match
    anchored at the start of ``path``. Deliberately regex-free."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    segs = pattern.split("*")

    # first segment must sit at position 0
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    for seg in segs[1:-1] if len(segs) > 1 else []:
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    if len(segs) > 1:
        last = segs[-1]
        if anchored:
            return path.endswith(last) and path.find(last, pos) >= 0 if last else True
        i = path.find(last, pos)
        return i >= 0
    return path == segs[0] if anchored else True


def _oracle_allowed(rules: str, path: str, agent: str = USER_AGENT) -> bool:
    """Straight-line RFC 9309 evaluation: collect every matching rule,
    pick (longest pattern, Allow-on-tie)."""
    want = agent.lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
    open_tokens: list[str] = []
    last_was_agent = False
    agent_named = False  # a UA line matched us, even in a rule-less group
    for raw in rules.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                open_tokens = []
            tok = val.lower()
            open_tokens.append(tok)
            if tok and tok != "*" and (tok == want or want.startswith(tok)):
                agent_named = True
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if val:
                for t in open_tokens:
                    groups.setdefault(t, []).append((val, key == "allow"))
        else:
            last_was_agent = False
    specific = [
        r
        for t, rs in groups.items()
        if t and t != "*" and (t == want or want.startswith(t))
        for r in rs
    ]
    # a matched-but-empty group is still the most specific match: allow
    # all for this agent, no fallback to '*' (RFC 9309 / Protego)
    chosen = specific if (specific or agent_named) else groups.get("*", [])
    best: tuple[int, bool] | None = None
    for pattern, allow in chosen:
        if _match_pattern(pattern, path):
            key2 = (len(pattern), allow)
            if best is None or key2 > best:
                best = key2
    return True if best is None else best[1]


RULES_PRECEDENCE = """
User-agent: *
Disallow: /private/*
Allow: /private/doc/1*
Disallow: /*.tmp$
"""

RULES_TIE = """
User-agent: *
Allow: /page
Disallow: /page
"""

RULES_GROUPS = """
User-agent: other-bot
Disallow: /

User-agent: crawlers-spark
Disallow: /private/*$
Crawl-delay: 7

User-agent: crawlers-spark
Disallow: /extra
"""


@pytest.mark.parametrize(
    "rules, path, expect",
    [
        # longest match wins: Allow(16) beats Disallow(9)
        (RULES_PRECEDENCE, "/private/doc/123", True),
        (RULES_PRECEDENCE, "/private/doc/9", False),
        (RULES_PRECEDENCE, "/doc/5", True),
        # $ anchor
        (RULES_PRECEDENCE, "/a/b/file.tmp", False),
        (RULES_PRECEDENCE, "/a/b/file.tmp.bak", True),
        # equal length → Allow wins
        (RULES_TIE, "/page/sub", True),
        # agent-specific group wins over *, merged across duplicates,
        # other agents' groups ignored
        (RULES_GROUPS, "/anything", True),
        (RULES_GROUPS, "/private/x", False),
        (RULES_GROUPS, "/extra/y", False),
        # empty Disallow matches nothing; no rules → allow
        ("User-agent: *\nDisallow:\n", "/any", True),
        ("", "/any", True),
        # '*' bare pattern disallows everything for matched agent
        ("User-agent: *\nDisallow: *\n", "/x", False),
        # mid-pattern $ is literal
        ("User-agent: *\nDisallow: /a$b\n", "/a$b/c", False),
        ("User-agent: *\nDisallow: /a$b\n", "/ab/c", True),
        # a group NAMING our agent with zero rules is still the most
        # specific match → allow-all, no fallback to the '*' group
        (
            "User-agent: crawlers-spark\nCrawl-delay: 7\n\n"
            "User-agent: *\nDisallow: /\n",
            "/x",
            True,
        ),
        ("User-agent: *\nDisallow: /\nUser-agent: crawlers-spark\n", "/x", True),
        # ...but consecutive UA lines share the following rules, so this
        # specific group is NOT empty
        (
            "User-agent: crawlers-spark\nUser-agent: *\nDisallow: /\n",
            "/x",
            False,
        ),
    ],
)
def test_hand_cases_both_impls(rules, path, expect):
    assert _oracle_allowed(rules, path) is expect
    assert match_9309(rules, path) is expect


_PATTERN_ATOMS = st.sampled_from(
    ["/", "a", "b", "doc", "1", "2", "*", ".", "tmp", "private"]
)
_PATTERNS = st.lists(_PATTERN_ATOMS, min_size=1, max_size=6).map("".join)
_PATHS = st.lists(
    st.sampled_from(["/", "a", "b", "doc", "1", "2", ".", "tmp", "private"]),
    min_size=0,
    max_size=8,
).map(lambda xs: "/" + "".join(xs))


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(_PATTERNS, st.booleans(), st.booleans()),  # (pattern, allow, anchor)
        min_size=0,
        max_size=6,
    ),
    st.lists(_PATHS, min_size=1, max_size=8),
)
def test_property_vs_oracle(rule_specs, paths):
    lines = ["User-agent: *"]
    for pattern, allow, anchor in rule_specs:
        p = pattern + ("$" if anchor else "")
        lines.append(("Allow: " if allow else "Disallow: ") + p)
    rules = "\n".join(lines) + "\n"
    got = _allowed_mask_9309(rules, pd.Series(paths))
    for path, g in zip(paths, got):
        assert bool(g) == _oracle_allowed(rules, path), (rules, path)


def test_spark_gate_rfc9309(spark):
    from crawlers_spark.operators.robots import robots_flag

    cands = spark.createDataFrame(
        [
            ("h1", "https://h1/private/doc/15"),
            ("h1", "https://h1/private/doc/9"),
            ("h1", "https://h1/x/file.tmp"),
            ("h2", "https://h2/anything"),
            ("h3", "https://h3/no-rules"),
        ],
        "host string, url_canon string",
    )
    robots = spark.createDataFrame(
        [("h1", RULES_PRECEDENCE), ("h2", "User-agent: *\nDisallow: *\n")],
        "host string, rules string",
    )
    got = {
        r.url_canon: r.robots_ok
        for r in robots_flag(cands, robots, mode="rfc9309").collect()
    }
    assert got == {
        "https://h1/private/doc/15": True,
        "https://h1/private/doc/9": False,
        "https://h1/x/file.tmp": False,
        "https://h2/anything": False,
        "https://h3/no-rules": True,  # no robots row → allow
    }


def test_stdlib_mode_unchanged(spark):
    """The default mode stays byte-for-byte stdlib-robotparser exact
    (pinned by tests/test_robots_rules.py); rfc9309 only engages when
    asked."""
    from crawlers_spark.operators.robots import robots_flag

    cands = spark.createDataFrame(
        [("h1", "https://h1/private/doc/15")], "host string, url_canon string"
    )
    robots = spark.createDataFrame(
        [("h1", RULES_PRECEDENCE)], "host string, rules string"
    )
    # stdlib prefix semantics: first matching rule in file order is
    # Disallow /private/* — a LITERAL '*' prefix that matches nothing,
    # then Allow /private/doc/1* (also literal) — so the path is decided
    # by... neither; default allow.
    row = robots_flag(cands, robots).collect()[0]
    import urllib.robotparser

    rp = urllib.robotparser.RobotFileParser()
    rp.parse(RULES_PRECEDENCE.splitlines())
    assert row.robots_ok == rp.can_fetch(USER_AGENT, "https://h1/private/doc/15")
