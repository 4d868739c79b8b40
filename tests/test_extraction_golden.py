"""Golden byte-parity: engine extractors vs pinned oracle (SURVEY §5.2.1).

The contract from BASELINE.json's input_hint: byte-identical extracted
text per url. The engine side is vectorized pandas regex programs; the
oracle is scalar re.search — independent implementations cross-checked
here over every detail page of the 2k fixture, all 4 layout families,
all 20 sources.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402


@pytest.fixture(scope="module")
def fixture_dir():
    return ensure_fixture(2000)


def test_extraction_byte_parity(spark, fixture_dir):
    from pyspark.sql import functions as F

    from crawlers_spark.extraction import extract_offers

    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    details = (
        pages.where(F.col("url").contains("/job/"))
        .withColumn("src_source", F.regexp_extract("url", r"https://(src\d+)\.", 1))
        .select("url", "src_source", "html")
    )
    got = {r["url"]: r.asDict() for r in extract_offers(details).collect()}
    expected = spark.read.parquet(str(fixture_dir / "expected_offers.parquet")).collect()
    assert len(got) == len(expected) > 1500

    bad = []
    for e in expected:
        g = got[e["url"]]
        for f in ("source", "title", "company", "location", "salary", "description", "extracted_text", "publication_ts"):
            if g[f] != e[f]:
                bad.append((e["url"], f, g[f], e[f]))
    assert not bad, bad[:5]


def test_all_families_and_sources_covered(spark, fixture_dir):
    exp = spark.read.parquet(str(fixture_dir / "expected_offers.parquet"))
    sources = {r["source"] for r in exp.select("source").distinct().collect()}
    assert sources == {f"src{i}" for i in range(20)}


def test_outlinks_match_oracle(spark, fixture_dir):
    """Engine outlink scan ≡ oracle's extract_outlinks on list pages."""
    from pyspark.sql import functions as F

    from crawlers_spark.extraction import extract_outlinks
    from tests.oracle.extract import extract_outlinks as oracle_links

    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    lists = (
        pages.where(~F.col("url").contains("/job/"))
        .withColumn("src_source", F.lit("srcX"))
        .withColumn("depth", F.lit(0))
        .limit(50)
    )
    rows = lists.select("url", "html").collect()
    got = (
        extract_outlinks(lists.select("url", "src_source", "depth", "html"))
        .groupBy("url")
        .agg(F.collect_list("out_url").alias("links"))
        .collect()
    )
    got_map = {r["url"]: sorted(r["links"]) for r in got}
    for r in rows:
        html = bytes(r["html"]).decode()
        base = r["url"].split("/", 3)
        origin = f"{base[0]}//{base[2]}"
        expect = sorted(
            link if not link.startswith("/") else origin + link
            for link in oracle_links(html)
        )
        assert got_map.get(r["url"], []) == expect, r["url"]


def test_anchor_capture(spark):
    """Anchor text rides the same single regex pass as hrefs: attribute
    order, relative resolution, empty anchors, and whitespace trim."""
    from crawlers_spark.extraction import extract_outlinks

    html = (
        '<p><a href="https://a.example/x">First Link</a>'
        '<a class="c" href="/rel" id="i"> padded </a>'
        '<a href="https://a.example/empty"></a>'
        "no link here</p>"
    )
    df = spark.createDataFrame(
        [("https://host.example/page", "s", 0, html)],
        "url string, src_source string, depth int, html string",
    )
    got = {
        r["out_url"]: r["anchor"] for r in extract_outlinks(df).collect()
    }
    assert got == {
        "https://a.example/x": "First Link",
        "https://host.example/rel": "padded",
        "https://a.example/empty": "",
    }


def test_anchor_text_index_semantics(spark):
    """Dominant anchor per dst: majority wins, ties break ascending,
    empty/null anchors are excluded from the vote and the counts."""
    from crawlers_spark.operators.anchors import anchor_text_index

    rows = [
        ("d1", "jobs"), ("d1", "jobs"), ("d1", "careers"),
        ("d2", "b"), ("d2", "a"),           # tie → 'a'
        ("d3", ""), ("d3", None),           # only empties → no row
        ("d4", "solo"),
    ]
    df = spark.createDataFrame(rows, "dst_canon string, anchor string")
    got = {r["dst_canon"]: r.asDict() for r in anchor_text_index(df).collect()}
    assert set(got) == {"d1", "d2", "d4"}
    assert got["d1"]["top_anchor"] == "jobs"
    assert got["d1"]["top_anchor_refs"] == 2
    assert got["d1"]["n_refs"] == 3 and got["d1"]["n_anchors"] == 2
    assert got["d2"]["top_anchor"] == "a"
    assert got["d4"]["n_refs"] == 1


def test_fixture_anchors_fill_the_index(spark, fixture_dir):
    """Over the real 2k fixture: every list page's nav links carry the
    'page N' anchors and detail hubs the related-link text, so the
    index's dominant anchors are the fixture's literal anchor strings."""
    from pyspark.sql import functions as F

    from crawlers_spark.extraction import extract_outlinks
    from crawlers_spark.operators.anchors import anchor_text_index

    pages = (
        spark.read.parquet(str(fixture_dir / "pages.parquet"))
        .withColumn("src_source", F.lit("s"))
        .withColumn("depth", F.lit(0))
    )
    idx = anchor_text_index(
        extract_outlinks(pages.select("url", "src_source", "depth", "html")),
        dst_col="out_url",
    )
    top = {r["out_url"]: r["top_anchor"] for r in idx.collect()}
    assert any(v == "voir aussi" for v in top.values())
    assert any(v.startswith("page ") for v in top.values())
    # list pages are multiply-linked via numbered nav anchors
    nav = idx.where(F.col("top_anchor").startswith("page ")).where(
        F.col("n_refs") > 1
    )
    assert nav.count() > 0
