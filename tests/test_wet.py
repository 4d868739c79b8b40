"""WET sink/reader (sources/warc.py write_wet_pages/read_wet_pages):
byte-exact round trip, idempotent re-runs, and conversion-type
isolation from response records.
"""

from __future__ import annotations

import glob
import shutil
from datetime import datetime
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from crawlers_spark.sources.warc import (
    read_wet_pages,
    read_warc_pages,
    write_warc_pages,
    write_wet_pages,
)

OUT = Path("_data/test_wet")

ROWS = [
    ("https://src0.example/job/1", datetime(2024, 1, 1, 0, 0, 0), "hello world"),
    ("https://src0.example/job/2", datetime(2024, 1, 1, 0, 1, 0), "accents: déjà vu ß"),
    ("https://src1.example/job/3", datetime(2024, 1, 2, 0, 0, 0), ""),  # empty text
    ("https://src1.example/job/4", datetime(2024, 1, 2, 0, 1, 0), "multi\nline\n\ntext"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        ROWS, "url string, warc_ts timestamp, text string"
    ).repartition(2)


def _write(pages, sub):
    out = OUT / sub
    shutil.rmtree(out, ignore_errors=True)
    lineage = write_wet_pages(pages, str(out)).collect()
    return out, lineage


def test_round_trip(spark, pages):
    out, lineage = _write(pages, "rt")
    assert sum(r.n_records for r in lineage) == len(ROWS)
    back = read_wet_pages(spark, str(out / "*.gz"))
    got = sorted((r.url, r.warc_ts, r.text) for r in back.collect())
    assert got == sorted(ROWS)


def test_idempotent_rerun_byte_identical(spark, pages):
    out1, _ = _write(pages, "a")
    out2, _ = _write(pages, "b")
    f1 = sorted(glob.glob(str(out1 / "*")))
    f2 = sorted(glob.glob(str(out2 / "*")))
    assert [Path(f).name for f in f1] == [Path(f).name for f in f2]
    for a, b in zip(f1, f2):
        assert Path(a).read_bytes() == Path(b).read_bytes()


def test_conversion_records_invisible_to_warc_reader(spark, pages):
    """A WET shard contains only conversion records: the WARC (response)
    reader must yield nothing from it, and vice versa the WET reader
    yields nothing from a response shard."""
    wet_out, _ = _write(pages, "iso")
    assert read_warc_pages(spark, str(wet_out / "*.gz")).count() == 0

    warc_out = OUT / "resp"
    shutil.rmtree(warc_out, ignore_errors=True)
    html_pages = pages.select(
        "url", "warc_ts", F.encode("text", "UTF-8").alias("html")
    )
    write_warc_pages(html_pages, str(warc_out)).collect()
    assert read_wet_pages(spark, str(warc_out / "*.gz")).count() == 0
