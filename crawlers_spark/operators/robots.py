"""robots.txt filter (O7).

Scrapy's ``RobotsTxtMiddleware`` keeps a per-domain parsed-rules cache
and drops disallowed requests (public framework behavior). Here the
robots corpus is a host-cardinality table broadcast-joined onto each
fetch batch (BASELINE.json: "robots.txt caches are enforced as
broadcast state"), and rule evaluation runs inside ``mapInPandas``:
one ``urllib.robotparser`` parse per distinct (host, rules) pair per
Arrow batch — the parse cost is O(hosts), not O(urls); only the cheap
per-path allow check touches each row.

URLs whose host has no robots row are allowed (reference default when
robots.txt is absent/unfetchable).
"""

from __future__ import annotations

import urllib.robotparser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

USER_AGENT = "crawlers-spark"


def _allowed_mask(rules: str, paths: pd.Series) -> pd.Series:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(rules.splitlines())
    return paths.map(lambda p: rp.can_fetch(USER_AGENT, p))


def robots_flag(candidates: DataFrame, robots: DataFrame, url_col: str = "url_canon", flag: str = "robots_ok") -> DataFrame:
    """Add a ``robots_ok`` bool column (one pass; caller splits on it)."""
    out_cols = candidates.schema.fieldNames() + [flag]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + f", {flag} boolean"
    joined = candidates.join(
        F.broadcast(robots.select("host", "rules")), "host", "left"
    ).withColumn("_path", F.regexp_replace(F.col(url_col), r"^https?://[^/]+", ""))

    def gate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            keep = pd.Series(True, index=pdf.index)
            has_rules = pdf["rules"].notna()
            for rules, idx in pdf[has_rules].groupby("rules", sort=False).groups.items():
                keep.loc[idx] = _allowed_mask(rules, pdf.loc[idx, "_path"]).values
            pdf = pdf.copy()
            pdf[flag] = keep
            yield pdf[out_cols]

    return joined.mapInPandas(gate, schema)


def robots_filter(candidates: DataFrame, robots: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Drop URLs disallowed by their host's robots rules."""
    return robots_flag(candidates, robots, url_col).where(F.col("robots_ok")).drop("robots_ok")
