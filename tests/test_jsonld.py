"""schema.org JobPosting JSON-LD extraction (extraction/jsonld.py):
field mapping across the shape zoo (bare object, list, @graph
envelope, MonetaryAmount/QuantitativeValue salaries, Place vs string
locations, @type lists), permissive script-tag matching, malformed
JSON tolerance, and the raw-lexeme number contract."""

from __future__ import annotations

import pytest

from crawlers_spark.extraction.jsonld import (
    extract_jsonld_offers,
    parse_jsonld_jobpostings,
)


def _page(body: str) -> str:
    return f"<html><head>{body}</head><body><p>x</p></body></html>"


FULL = _page(
    """<script type="application/ld+json">
    {"@context": "https://schema.org", "@type": "JobPosting",
     "title": "Data Engineer",
     "hiringOrganization": {"@type": "Organization", "name": "Acme"},
     "jobLocation": {"@type": "Place",
        "address": {"@type": "PostalAddress", "addressLocality": "Paris"}},
     "baseSalary": {"@type": "MonetaryAmount", "currency": "EUR",
        "value": {"@type": "QuantitativeValue", "value": 65000.50}},
     "description": "Build pipelines.",
     "datePosted": "2024-02-01"}
    </script>"""
)


def test_full_object():
    got = parse_jsonld_jobpostings(FULL)
    assert got == [
        {
            "title": "Data Engineer",
            "company": "Acme",
            "location": "Paris",
            # raw lexeme preserved — NOT 65000.5
            "salary": "EUR 65000.50",
            "description": "Build pipelines.",
            "date_posted": "2024-02-01",
        }
    ]


def test_graph_envelope_and_type_list():
    html = _page(
        """<script TYPE='application/ld+json'>
        {"@graph": [
          {"@type": "WebPage", "name": "ignore me"},
          {"@type": ["JobPosting", "Thing"], "title": "Dev",
           "hiringOrganization": "SoloCo",
           "jobLocation": "Lyon",
           "baseSalary": "negotiable"}
        ]}</script>"""
    )
    got = parse_jsonld_jobpostings(html)
    assert got == [
        {
            "title": "Dev",
            "company": "SoloCo",
            "location": "Lyon",
            "salary": "negotiable",
            "description": None,
            "date_posted": None,
        }
    ]


def test_list_block_and_malformed_skipped():
    html = _page(
        """<script type="application/ld+json">{broken json</script>
        <script data-x="1" type="application/ld+json">
        [{"@type": "JobPosting", "title": "A"},
         {"@type": "NewsArticle", "headline": "no"}]</script>"""
    )
    got = parse_jsonld_jobpostings(html)
    assert [p["title"] for p in got] == ["A"]


def test_no_blocks():
    assert parse_jsonld_jobpostings("<html><body>hi</body></html>") == []
    assert parse_jsonld_jobpostings("") == []


def test_dataframe_surface(spark):
    pages = spark.createDataFrame(
        [("https://a.example/j1", FULL), ("https://a.example/none", "<html/>")],
        "url string, html string",
    )
    rows = extract_jsonld_offers(pages).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["url"], r["title"], r["salary"]) == (
        "https://a.example/j1", "Data Engineer", "EUR 65000.50",
    )
