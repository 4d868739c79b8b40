"""Conditional revisit e2e (CrawlConfig.revalidate — the ETag /
If-Modified-Since / 304 analog, r3 VERDICT missing-item #1).

Flow: crawl to quiesce, then MUTATE the corpus for k of the fetched
detail pages (new title ⇒ new text ⇒ new validator) while leaving m
others byte-identical, bump sitemap lastmod for all k+m (lastmod lies
for the unchanged ones — the spurious-bump case conditional requests
exist for), and schedule_recrawls:

- unchanged pages revalidate 304: no tombstone, no refetch, no
  re-extraction — just a kind='revalidated' freshness record;
- changed pages tombstone + refetch, and the re-extracted offers are
  byte-identical to the pinned oracle run on the NEW html;
- a repeated sitemap is idempotent for both groups;
- the off-control (revalidate=False) refetches everything, proving the
  gate is load-bearing;
- the revalidation plan never reads the corpus's html column.
"""

from __future__ import annotations

import json
import re
import shutil
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture, page_text  # noqa: E402

from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine  # noqa: E402
from tests.oracle.extract import extract_offer  # noqa: E402
from tests.test_crawl_e2e import STATE, make_engine  # noqa: E402
from tests.test_recrawl_e2e import _sitemap_entries  # noqa: E402


@pytest.fixture(scope="module")
def fx():
    return ensure_fixture(300)


def _mutate_corpus(spark, fx, changed_urls: list[str], out_dir: Path) -> Path:
    """New corpus parquet: ``changed_urls`` get ' v2' appended to their
    title (html AND text mutated consistently — text stays the fixture's
    tag-strip of html, preserving the content_digest == md5(text)
    invariant); every other row is byte-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(str(fx / "pages.parquet"))
    pdf = table.to_pandas()
    changed = set(changed_urls)
    for i, row in pdf.iterrows():
        if row["url"] in changed:
            html = bytes(row["html"]).decode()
            new_html = re.sub(
                r"(<(?:h1 class=\"title\"|h2|td id=\"t\"|span data-field=\"title\")[^>]*>)(\s*[^<]*?)(\s*</)",
                lambda m: m.group(1) + m.group(2) + " v2" + m.group(3),
                html,
                count=1,
            )
            assert new_html != html, row["url"]
            pdf.at[i, "html"] = new_html.encode()
            pdf.at[i, "text"] = page_text(new_html)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "pages.parquet"
    # keep the fixture's exact arrow schema (us timestamps — pandas'
    # default ns timestamps are unreadable for Spark's parquet reader)
    pq.write_table(pa.Table.from_pandas(pdf, schema=table.schema, preserve_index=False), out)
    return out


def _resume_engine(spark, fx, name, pages_path, **cfg_kw):
    """A NEW engine on the existing state dir, pointed at a (possibly
    mutated) corpus. The cached pages index belongs to the OLD corpus —
    drop it, as any corpus swap must."""
    root = STATE / name
    shutil.rmtree(root / "_cache", ignore_errors=True)
    cfg_kw.setdefault("hot_hosts", {"src0.example": 4, "src1.example": 4})
    return CrawlEngine(
        spark,
        str(pages_path),
        json.loads((fx / "seeds.json").read_text()),
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        CrawlConfig(**cfg_kw),
    )


@pytest.fixture(scope="module")
def revalidated(spark, fx, tmp_path_factory):
    eng = make_engine(spark, fx, "reval_e2e", revalidate=True, seen_filter="cuckoo")
    eng.run(max_waves=40)
    offer_urls = sorted(r.url for r in eng.offers().select("url").distinct().collect())
    changed, unchanged = offer_urls[:3], offer_urls[3:6]

    mutated = _mutate_corpus(
        spark, fx, changed, tmp_path_factory.mktemp("reval") / "corpus"
    )
    eng2 = _resume_engine(
        spark, fx, "reval_e2e", mutated, revalidate=True, seen_filter="cuckoo"
    )
    st = eng2.schedule_recrawls(_sitemap_entries(spark, changed + unchanged, []))
    eng2.run(max_waves=st["wave"] + 10)
    return eng2, st, sorted(changed), sorted(unchanged), mutated


def test_revalidate_splits_changed_vs_unchanged(revalidated):
    eng, st, changed, unchanged, _ = revalidated
    assert st["recrawled"] == len(changed)
    assert st["revalidated"] == len(unchanged)
    refetched = sorted(
        r.url_canon for r in eng.wave_log().where(F.col("wave") > st["wave"]).collect()
    )
    assert refetched == changed  # 304s never refetch
    reval_rows = {
        r.url_canon for r in eng._read_wave_out("revalidated").collect()
    }
    assert reval_rows == set(unchanged)


def test_unchanged_pages_not_reextracted_changed_byte_parity(spark, revalidated):
    eng, st, changed, unchanged, mutated = revalidated
    per_url: dict[str, list] = {}
    for r in eng.offers().collect():
        per_url.setdefault(r.url, []).append(r)
    for url in unchanged:
        assert len(per_url[url]) == 1, f"{url}: 304 must not re-extract"
    corpus = {
        r["url"]: (bytes(r["html"]).decode(), r["url"].split("/")[2])
        for r in spark.read.parquet(str(mutated))
        .where(F.col("url").isin(changed))
        .collect()
    }
    for url in changed:
        rows = sorted(per_url[url], key=lambda r: r.wave)
        assert len(rows) == 2, f"{url}: expected original + refetch"
        html, host = corpus[url]
        source = "src" + re.search(r"src(\d+)", host).group(1)
        expected = extract_offer(url, source, html)
        assert rows[1].extracted_text == expected["extracted_text"]
        assert rows[1].title == expected["title"]
        assert rows[1].title != rows[0].title  # the mutation is visible
        assert rows[1].title.endswith("v2")


def test_repeat_sitemap_idempotent_for_both_groups(spark, revalidated):
    eng, _, changed, unchanged, _ = revalidated
    st2 = eng.schedule_recrawls(_sitemap_entries(spark, changed + unchanged, []))
    assert st2["recrawled"] == 0 and st2["revalidated"] == 0
    # a NEWER lastmod re-triggers: changed pages were refetched (their
    # digest now matches the mutated corpus) so they revalidate 304 too
    newer = _sitemap_entries(spark, changed + unchanged, [], fresh_lastmod="2024-03-01")
    st3 = eng.schedule_recrawls(newer)
    assert st3["recrawled"] == 0
    assert st3["revalidated"] == len(changed) + len(unchanged)


def test_off_control_refetches_everything(spark, fx, revalidated, tmp_path_factory):
    """revalidate=False: the identical mutation + sitemap bump refetches
    changed AND unchanged — the lane is what saves the spurious ones."""
    _, _, changed, unchanged, mutated = revalidated
    eng = make_engine(spark, fx, "reval_off", revalidate=False, seen_filter="cuckoo")
    eng.run(max_waves=40)
    eng2 = _resume_engine(spark, fx, "reval_off", mutated, revalidate=False,
                          seen_filter="cuckoo")
    st = eng2.schedule_recrawls(_sitemap_entries(spark, changed + unchanged, []))
    assert st["recrawled"] == len(changed) + len(unchanged)
    eng2.run(max_waves=st["wave"] + 10)
    refetched = sorted(
        r.url_canon for r in eng2.wave_log().where(F.col("wave") > st["wave"]).collect()
    )
    assert refetched == sorted(changed + unchanged)


def test_revalidation_plan_never_reads_html(spark, fx):
    """The 304 check's corpus scan is column-pruned to (url, text[, …])
    — html, the dominant column at 100 TB, stays unread."""
    from crawlers_spark.operators.fetch import build_pages_index
    from crawlers_spark.operators.recrawl import revalidate_candidates

    idx = build_pages_index(spark, str(fx / "pages.parquet"))
    due = spark.createDataFrame(
        [("https://src2.example/job/000000", "https://src2.example/job/000000")],
        "url string, url_canon string",
    )
    recorded = spark.createDataFrame(
        [("https://src2.example/job/000000", "00" * 16)],
        "url_canon string, content_digest string",
    )
    flagged = revalidate_candidates(due, idx, recorded)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans, plan
    for ln in scans:
        assert "html" not in ln, ln
