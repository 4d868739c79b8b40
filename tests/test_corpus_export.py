"""End-to-end training-corpus export (plans/corpus.py +
CrawlEngine.export_corpus): the crawl→LLM-data bridge. Pins the
funnel's invariants on a real crawl of the web fixture (mirrored
hosts plant exact duplicates), plus determinism of a re-export."""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from fixtures.gen_pages import ensure_fixture  # noqa: E402

from crawlers_spark.plans.corpus import build_training_corpus  # noqa: E402
from crawlers_spark.plans.wave import CrawlConfig, CrawlEngine  # noqa: E402
from tests.test_crawl_e2e import STATE  # noqa: E402

MIN_WORDS = 5
SHARD_TOKENS = 2000


@pytest.fixture(scope="module")
def engine(spark):
    fx = ensure_fixture(300)
    root = STATE / "corpus_export"
    shutil.rmtree(root, ignore_errors=True)
    seeds = [
        {"source": "src0", "url": "https://src0.example/jobs", "allowed_host": "src0.example"},
        {"source": "src1", "url": "https://src1.example/jobs", "allowed_host": "src1.example"},
    ]
    eng = CrawlEngine(
        spark,
        str(fx / "pages.parquet"),
        seeds,
        spark.read.parquet(str(fx / "robots.parquet")),
        spark.read.parquet(str(fx / "politeness.parquet")),
        root,
        CrawlConfig(),
    )
    eng.run(max_waves=25)
    return eng


def _input(engine):
    """offers ∪ planted exact copies of every 3rd page (suffixed key,
    same text) — the exact-dedup stage must remove precisely these."""
    offers = engine.offers()
    copies = offers.where(F.crc32(F.col("url")) % 3 == 0).withColumn(
        "url", F.concat(F.col("url"), F.lit("#copy"))
    )
    return offers.unionByName(copies)


@pytest.fixture(scope="module")
def built(spark, engine):
    corpus, stats = build_training_corpus(
        _input(engine), min_words=MIN_WORDS, shard_tokens=SHARD_TOKENS,
        quality_gate="basic",
    )
    return corpus.persist(), stats


def test_funnel_is_monotone_and_nonempty(built):
    _corpus, s = built
    assert s["n_input"] >= s["n_nonempty"] >= s["n_exact_unique"]
    assert s["n_exact_unique"] >= s["n_quality"] >= s["n_final"] > 0
    assert s["total_tokens"] > 0


def test_planted_exact_duplicates_are_removed(built):
    _corpus, s = built
    assert s["n_exact_unique"] < s["n_nonempty"]
    # no '#copy' key survives: min-xxhash64 winners are deterministic,
    # and whichever member wins, its TEXT appears exactly once (pinned
    # by test_output_has_no_duplicate_texts)


def test_output_has_no_duplicate_texts(built):
    corpus, s = built
    n = corpus.count()
    assert n == s["n_final"]
    assert corpus.select(F.md5("text")).distinct().count() == n


def test_every_kept_row_passes_the_quality_gate(built):
    corpus, _s = built
    from crawlers_spark.functions.textstats import quality_features

    qf = quality_features(F.col("text"))
    gate = (qf["n_tokens"] >= MIN_WORDS) & (qf["mean_word_len"] <= 12.0)
    # scrubbing only replaces PII spans with markers; assert on the
    # scrubbed text's own gate verdict
    assert corpus.where(~gate).count() == 0


def test_shards_are_token_balanced(built):
    corpus, _s = built
    per = corpus.groupBy("shard").agg(F.sum("n_tokens").alias("t")).collect()
    shards = sorted(r.shard for r in per)
    assert shards == list(range(len(shards)))
    # every shard except the last reaches the target minus one doc of slack
    max_doc = corpus.agg(F.max("n_tokens")).collect()[0][0]
    for r in per:
        if r.shard != shards[-1]:
            assert r.t >= SHARD_TOKENS - max_doc


def test_reexport_is_row_identical(spark, engine, built):
    corpus, _s = built
    again, _s2 = build_training_corpus(
        _input(engine), min_words=MIN_WORDS, shard_tokens=SHARD_TOKENS,
        quality_gate="basic",
    )
    a = sorted(map(tuple, corpus.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_engine_surface_writes_partitioned_shards(spark, engine, tmp_path):
    out = tmp_path / "corpus"
    stats = engine.export_corpus(
        out, min_words=MIN_WORDS, shard_tokens=SHARD_TOKENS,
        quality_gate="basic",
    )
    back = spark.read.parquet(str(out))
    assert back.count() == stats["n_final"]
    assert {p.name.split("=")[0] for p in out.iterdir() if p.is_dir()} == {"shard"}
