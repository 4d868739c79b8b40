"""WAT sink/reader (sources/warc.py write_wat_pages/read_wat_pages):
round trip, byte-idempotent re-runs, type isolation from the
response/conversion readers.
"""

from __future__ import annotations

import glob
import shutil
from datetime import datetime
from pathlib import Path

import pytest

from crawlers_spark.sources.warc import (
    read_warc_pages,
    read_wat_pages,
    read_wet_pages,
    write_wat_pages,
)

OUT = Path("_data/test_wat")

ROWS = [
    (
        "https://src0.example/job/1",
        datetime(2024, 1, 1, 0, 0, 0),
        "Job One",
        ["https://src0.example/job/2", "https://src0.example/"],
    ),
    (
        "https://src0.example/job/2",
        datetime(2024, 1, 1, 0, 1, 0),
        "Déjà – unicode title",
        [],
    ),
    ("https://src1.example/", datetime(2024, 1, 2, 0, 0, 0), None, None),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        ROWS,
        "url string, warc_ts timestamp, title string, outlinks array<string>",
    ).repartition(2)


def _write(pages, sub):
    out = OUT / sub
    shutil.rmtree(out, ignore_errors=True)
    lineage = write_wat_pages(pages, str(out)).collect()
    return out, lineage


def test_round_trip(spark, pages):
    out, lineage = _write(pages, "rt")
    assert sum(r.n_records for r in lineage) == len(ROWS)
    back = {r.url: r for r in read_wat_pages(spark, str(out / "*.gz")).collect()}
    assert len(back) == len(ROWS)
    for url, ts, title, links in ROWS:
        r = back[url]
        assert r.warc_ts == ts
        assert r.title == (title or "")          # null title → ""
        assert sorted(r.outlinks) == sorted(links or [])


def test_idempotent_rerun_byte_identical(spark, pages):
    out1, _ = _write(pages, "a")
    out2, _ = _write(pages, "b")
    f1, f2 = sorted(glob.glob(str(out1 / "*"))), sorted(glob.glob(str(out2 / "*")))
    assert [Path(f).name for f in f1] == [Path(f).name for f in f2]
    for a, b in zip(f1, f2):
        assert Path(a).read_bytes() == Path(b).read_bytes()


def test_metadata_type_isolation(spark, pages):
    out, _ = _write(pages, "iso")
    assert read_warc_pages(spark, str(out / "*.gz")).count() == 0
    assert read_wet_pages(spark, str(out / "*.gz")).count() == 0
