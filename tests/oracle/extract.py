"""Pinned pure-Python oracle extractor (SURVEY.md §5.2.1, FIXTURES.md B3).

Stands in for the reference's per-site Scrapy spiders while the
read-only reference mount is empty (SURVEY.md §0): `pyjobs/crawlers`
extracts (title, company, location, salary, description,
publication date) per job-board site via per-site XPath/CSS selectors
with whitespace cleanup and a French-month date parser
(``_month_french_to_english`` — public behavior recalled; re-validate
against the real spiders if /root/reference ever populates).

This module is the parity authority: the engine's vectorized pandas-UDF
extractors (crawlers_spark/extraction) must produce **byte-identical
``extracted_text`` per url** against this implementation. It is
deliberately written in a different style (regex scan, scalar,
item-at-a-time — like the reference) from the engine (vectorized
pandas) so the parity test is a real cross-check, not a tautology.

Layout families (fixture contract, FIXTURES.md B1):
  family = source_index % 4
  0: <div class="job-offer"> with h1.title / div.company|location|salary|pubdate|description ; French date
  1: <table class="offer"> with td id=t/c/l/s/d/desc ; ISO date
  2: <span data-field="..."> ; French date
  3: <h2> title + p.meta "company — location — salary" + p.date (dd/mm/YYYY) + p.desc
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

FRENCH_MONTHS = {
    "janvier": 1, "février": 2, "fevrier": 2, "mars": 3, "avril": 4,
    "mai": 5, "juin": 6, "juillet": 7, "août": 8, "aout": 8,
    "septembre": 9, "octobre": 10, "novembre": 11, "décembre": 12,
    "decembre": 12,
}

# the fixture generator only emits these entities (FIXTURES.md B1)
_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&eacute;", "é"), ("&agrave;", "à"),
    ("&euro;", "€"),
]

_WS_RE = re.compile(r"\s+")


def clean_text(raw: str) -> str:
    """Whitespace-collapse + entity-decode, reference-spider style."""
    s = raw
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def parse_date(s: str, family: int):
    """publication date string → UTC datetime (reference: French-locale parse)."""
    s = s.strip()
    try:
        if family in (0, 2):  # "12 janvier 2016"
            day, month_name, year = s.split(" ")
            return datetime(int(year), FRENCH_MONTHS[month_name.lower()], int(day), tzinfo=timezone.utc)
        if family == 1:  # ISO
            return datetime.strptime(s, "%Y-%m-%d").replace(tzinfo=timezone.utc)
        day, month, year = s.split("/")  # family 3: dd/mm/YYYY
        return datetime(int(year), int(month), int(day), tzinfo=timezone.utc)
    except (ValueError, KeyError):
        return None


_SELECTORS = {
    0: {
        "title": r'<h1 class="title">(.*?)</h1>',
        "company": r'<div class="company">(.*?)</div>',
        "location": r'<div class="location">(.*?)</div>',
        "salary": r'<div class="salary">(.*?)</div>',
        "date": r'<div class="pubdate">(.*?)</div>',
        "description": r'<div class="description">(.*?)</div>',
    },
    1: {
        "title": r'<td id="t">(.*?)</td>',
        "company": r'<td id="c">(.*?)</td>',
        "location": r'<td id="l">(.*?)</td>',
        "salary": r'<td id="s">(.*?)</td>',
        "date": r'<td id="d">(.*?)</td>',
        "description": r'<td id="desc">(.*?)</td>',
    },
    2: {
        "title": r'<span data-field="title">(.*?)</span>',
        "company": r'<span data-field="company">(.*?)</span>',
        "location": r'<span data-field="location">(.*?)</span>',
        "salary": r'<span data-field="salary">(.*?)</span>',
        "date": r'<span data-field="pubdate">(.*?)</span>',
        "description": r'<span data-field="description">(.*?)</span>',
    },
}

_F3 = {
    "title": r"<h2>(.*?)</h2>",
    "meta": r'<p class="meta">(.*?)</p>',
    "date": r'<p class="date">(.*?)</p>',
    "description": r'<p class="desc">(.*?)</p>',
}


def _first(pattern: str, html: str) -> str:
    m = re.search(pattern, html, re.DOTALL)
    return m.group(1) if m else ""


def extract_offer(url: str, source: str, html: str) -> dict:
    """Extract one job offer from a detail page (reference `parse_job_page`)."""
    family = int(re.sub(r"\D", "", source) or 0) % 4
    if family == 3:
        title = clean_text(_first(_F3["title"], html))
        meta = clean_text(_first(_F3["meta"], html))
        parts = [p.strip() for p in meta.split("—")]
        company, location, salary = (parts + ["", "", ""])[:3]
        date_s = clean_text(_first(_F3["date"], html))
        description = clean_text(_first(_F3["description"], html))
    else:
        sel = _SELECTORS[family]
        title = clean_text(_first(sel["title"], html))
        company = clean_text(_first(sel["company"], html))
        location = clean_text(_first(sel["location"], html))
        salary = clean_text(_first(sel["salary"], html))
        date_s = clean_text(_first(sel["date"], html))
        description = clean_text(_first(sel["description"], html))
    extracted_text = "\n".join([title, company, location, salary, description])
    return {
        "url": url,
        "source": source,
        "title": title,
        "company": company,
        "location": location,
        "salary": salary,
        "description": description,
        "publication_ts": parse_date(date_s, family),
        "extracted_text": extracted_text,
    }


def extract_outlinks(html: str) -> list[str]:
    """All anchor hrefs on a page (reference `parse_job_list_page` link scan)."""
    return re.findall(r'<a[^>]*\bhref="([^"]+)"', html)
