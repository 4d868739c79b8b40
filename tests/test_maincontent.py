"""Generic main-content extraction (extraction/maincontent.py): golden
block-classification cases, fixture-page sanity, and the fused-pass
integration (CrawlConfig.main_content) with offer byte parity untouched.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from crawlers_spark.extraction.maincontent import (  # noqa: E402
    extract_main_content,
    main_content_batches,
)

LONG_A = "This is a long enough paragraph of genuine article content here."
LONG_B = "Second real paragraph with plenty of characters to pass the bar."


def _run(html: str):
    pdf = pd.DataFrame({"url": ["u"], "html": [html]})
    out = pd.concat(list(main_content_batches(iter([pdf]))))
    r = out.iloc[0]
    return r["main_text"], int(r["n_blocks"]), int(r["n_content"])


def test_golden_block_classification():
    main, n_blocks, n_content = _run(
        '<div class="nav"><a href="/">Home</a> <a href="/jobs">Jobs</a></div>'
        f"<p>{LONG_A}</p>"
        '<li><a href="/x">click here for promotions today</a> deal</li>'
        "<div>tiny</div>"
        f"<p>{LONG_B}</p>"
    )
    # nav: link density 1 → out; promo li: 2·links ≥ text → out;
    # tiny: < 25 chars → out; both long paragraphs kept in order
    assert main == LONG_A + "\n" + LONG_B
    assert (n_blocks, n_content) == (5, 2)


def test_density_boundaries_exact_integer_arithmetic():
    # text exactly 25 chars, no links → kept (>= is inclusive)
    text25 = "a" * 25
    main, _, n = _run(f"<p>{text25}</p>")
    assert main == text25 and n == 1
    # 24 chars → dropped
    assert _run(f"<p>{'a' * 24}</p>")[2] == 0
    # link chars exactly half: 2·len(link) == len(text) → dropped
    link = "x" * 13
    tail = "y" * 12  # total 26 = 2·13
    assert _run(f'<p><a href="/">{link}</a> {tail}</p>')[0] == ""
    # one char under half → kept
    tail = "y" * 14  # total 28 > 2·13
    got, _, n = _run(f'<p><a href="/">{link}</a> {tail}</p>')
    assert n == 1 and got == f"{link} {tail}"


def test_whitespace_collapse_and_entities_left_alone():
    main, _, _ = _run("<p>  spaced \t out \n content across lines padded  </p>")
    assert main == "spaced out content across lines padded"


def test_headings_tables_and_empty_pages():
    main, n_blocks, n_content = _run(
        "<h1>A headline long enough to count as content</h1>"
        "<td>A table cell with enough characters to be real content</td>"
    )
    assert n_blocks == 2 and n_content == 2
    assert main.startswith("A headline")
    assert _run("")[1] == 0
    assert _run("<span>no block-level tags here</span>")[1] == 0


def test_fixture_list_pages_are_all_boilerplate(spark):
    """The crawl fixture's list pages are pure link rows (<li><a>…) —
    generic main-content must come back empty for every one of them,
    while detail pages keep their description."""
    from fixtures.gen_pages import ensure_fixture

    fx = ensure_fixture(300)
    pages = spark.read.parquet(str(fx / "pages.parquet"))
    out = extract_main_content(pages).toPandas().set_index("url")
    lists = [u for u in out.index if "/jobs" in u]
    details = [u for u in out.index if "/job/" in u]
    assert lists and details
    for u in lists:
        assert out.loc[u, "main_text"] == "", u
    # detail pages: content blocks (long, link-free) survive; every
    # kept line is verbatim page text, and the vast majority of detail
    # pages keep at least one block (short-field edge cases aside)
    texts = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    n_nonempty = 0
    for u in details:
        main = out.loc[u, "main_text"]
        if main:
            n_nonempty += 1
            for line in main.split("\n"):
                assert line in texts[u], (u, line)
    assert n_nonempty / len(details) > 0.9


def test_fused_pass_integration_and_offer_parity(spark):
    """CrawlConfig.main_content routes the main text onto page rows'
    extracted_text; offer rows are byte-identical with the flag on/off."""
    from crawlers_spark.extraction.extractors import extract_page_outputs

    from fixtures.gen_pages import ensure_fixture

    fx = ensure_fixture(300)
    pages = spark.read.parquet(str(fx / "pages.parquet")).limit(40)
    from pyspark.sql import functions as F

    fetched = pages.select(
        "url",
        F.col("url").alias("url_canon"),
        F.regexp_extract("url", r"https://([^/]+)", 1).alias("host"),
        F.lit(1).cast("int").alias("host_rank"),
        F.lit(0).cast("int").alias("depth"),
        F.regexp_extract("url", r"https://(src\d+)", 1).alias("src_source"),
        "html",
    )
    on = extract_page_outputs(fetched, detail_pattern="/job/", main_content=True)
    off = extract_page_outputs(fetched, detail_pattern="/job/", main_content=False)
    on_pages = {r.url: r.extracted_text for r in on.where("kind = 'page'").collect()}
    ref = {
        r.url: r.main_text for r in extract_main_content(pages).collect()
    }
    assert on_pages and all(on_pages[u] == ref[u] for u in on_pages)
    off_pages = [r.extracted_text for r in off.where("kind = 'page'").collect()]
    assert all(t is None for t in off_pages)
    key = lambda r: (r.url, r.extracted_text, r.title, r.company, r.salary)
    assert sorted(map(key, on.where("kind = 'offer'").collect())) == sorted(
        map(key, off.where("kind = 'offer'").collect())
    )
