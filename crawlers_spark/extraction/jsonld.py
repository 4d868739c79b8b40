"""schema.org JobPosting extraction from embedded JSON-LD.

The reference's per-site spiders scrape job fields with hand-written
selectors (SURVEY §2.1 O10 — reproduced byte-exactly in
extraction/extractors.py).  Modern job boards ALSO publish the same
fields machine-readably as schema.org ``JobPosting`` JSON-LD inside
``<script type="application/ld+json">`` blocks (Google's job-search
indexing requires it — public schema.org/JobPosting contract).  This
lane extracts those: a selector-free complement to the per-site
programs, exactly the generic-vs-specific split main-content
extraction has with the offer extractors.

Determinism contract (so the DuckDB oracle can restate expected rows
from the generating fields):

- script blocks are found with a permissive tag match (either quote
  style, any attribute order — the robots-meta lesson from r3
  ADVICE);
- numbers inside the JSON are NEVER converted to Python floats:
  ``json.loads(..., parse_float=str, parse_int=str)`` keeps the raw
  lexeme, so salary values round-trip byte-exactly;
- a block may be a single object, a list, or an ``@graph`` envelope;
  an object counts when its ``@type`` equals ``JobPosting`` or is a
  list containing it;
- field mapping (missing → NULL):
  ``title`` ← title; ``company`` ← hiringOrganization.name;
  ``location`` ← jobLocation.address.addressLocality (address may be
  a bare string); ``salary`` ← baseSalary as ``currency value`` when
  a MonetaryAmount (value may nest a QuantitativeValue), else the
  bare lexeme; ``description`` ← description;
  ``date_posted`` ← datePosted (string — callers cast).

Scale: one mapInPandas pass over (url, html) — stdlib regex + json,
html never shuffles, one output row per posting.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

JOBPOSTING_SCHEMA = (
    "url string, title string, company string, location string, "
    "salary string, description string, date_posted string"
)

_SCRIPT_RE = re.compile(
    r"<script\b[^>]*type\s*=\s*['\"]application/ld\+json['\"][^>]*>(.*?)</script>",
    re.IGNORECASE | re.DOTALL,
)


def _is_jobposting(obj) -> bool:
    t = obj.get("@type")
    if isinstance(t, list):
        return "JobPosting" in t
    return t == "JobPosting"


def _candidates(doc) -> list:
    if isinstance(doc, list):
        out = []
        for item in doc:
            if isinstance(item, dict):
                out.extend(_candidates(item))
        return out
    if isinstance(doc, dict):
        graph = doc.get("@graph")
        if isinstance(graph, list):
            return [o for o in graph if isinstance(o, dict)]
        return [doc]
    return []


def _salary(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, dict):  # MonetaryAmount
        val = v.get("value")
        if isinstance(val, dict):  # QuantitativeValue
            val = val.get("value")
        cur = v.get("currency")
        if val is None:
            return None
        return f"{cur} {val}" if cur else str(val)
    return str(v)


def _location(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, list):
        v = v[0] if v else None
    if isinstance(v, dict):  # Place
        addr = v.get("address")
        if isinstance(addr, dict):  # PostalAddress
            return addr.get("addressLocality")
        if isinstance(addr, str):
            return addr
        return None
    if isinstance(v, str):
        return v
    return None


def parse_jsonld_jobpostings(html: str) -> list[dict]:
    """All JobPosting objects of one page as flat field dicts."""
    out = []
    for block in _SCRIPT_RE.findall(html or ""):
        try:
            doc = json.loads(block, parse_float=str, parse_int=str)
        except (json.JSONDecodeError, ValueError):
            continue
        for obj in _candidates(doc):
            if not _is_jobposting(obj):
                continue
            org = obj.get("hiringOrganization")
            company = (
                org.get("name") if isinstance(org, dict)
                else org if isinstance(org, str) else None
            )
            out.append(
                {
                    "title": obj.get("title"),
                    "company": company,
                    "location": _location(obj.get("jobLocation")),
                    "salary": _salary(obj.get("baseSalary")),
                    "description": obj.get("description"),
                    "date_posted": obj.get("datePosted"),
                }
            )
    return out


def extract_jsonld_offers(
    pages: DataFrame, *, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, title, company, location, salary, description,
    date_posted) — one row per JobPosting found on each page."""

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                for p in parse_jsonld_jobpostings(html or ""):
                    rows.append(
                        (
                            url,
                            p["title"],
                            p["company"],
                            p["location"],
                            p["salary"],
                            p["description"],
                            p["date_posted"],
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "url", "title", "company", "location",
                        "salary", "description", "date_posted",
                    ],
                )

    return pages.select(url_col, html_col).mapInPandas(parse, JOBPOSTING_SCHEMA)
