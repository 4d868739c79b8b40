"""IcebergTableIO contract test against a mocked catalog session.

No Iceberg runtime jar exists in this sandbox (and no network to fetch
one), so the real-catalog binding cannot run end-to-end; this exercises
every code path of ``IcebergTableIO`` against a recording fake of the
SparkSession surface it touches (``sql`` / ``table`` / ``writeTo``),
pinning the DDL/DML it would issue. If the jar ever lands, the same
assertions document the expected call sequence. SnapshotParquetIO (the
default impl, same TableIO semantics) is covered for real by the crawl
e2e + resume tests.
"""

from __future__ import annotations

from unittest import mock

import pytest

from crawlers_spark.sources.tables import IcebergTableIO


def _fake_spark(fail_use: bool = False, max_wave: int = 7):
    spark = mock.MagicMock(name="spark")

    def sql(q):
        if q.startswith("USE ") and fail_use:
            raise RuntimeError("catalog not found")
        result = mock.MagicMock(name=f"sql({q!r})")
        if "max(wave)" in q:
            result.collect.return_value = [{"w": max_wave}]
        return result

    spark.sql.side_effect = sql
    return spark


def test_init_requires_catalog():
    with pytest.raises(RuntimeError, match="Iceberg catalog unavailable"):
        IcebergTableIO(_fake_spark(fail_use=True), "ice", "crawl")


def test_init_uses_namespace():
    spark = _fake_spark()
    IcebergTableIO(spark, "ice", "crawl")
    spark.sql.assert_any_call("USE ice.crawl")


def test_stage_writes_staging_table_and_returns_its_name():
    spark = _fake_spark()
    io = IcebergTableIO(spark, "ice", "crawl")
    df = mock.MagicMock(name="df")
    name = io.stage(df, "offers", 3)
    assert name == "ice.crawl._stage_offers_3"
    df.writeTo.assert_called_once_with(name)
    df.writeTo.return_value.createOrReplace.assert_called_once_with()


def test_commit_wave_appends_each_staged_table():
    spark = _fake_spark()
    io = IcebergTableIO(spark, "ice", "crawl")
    io.commit_wave(
        3,
        {"offers": ["ice.crawl._stage_offers_3"], "seen": ["ice.crawl._stage_seen_3"]},
    )
    # each staged table read back and appended to its target
    read_names = [c.args[0] for c in spark.table.call_args_list]
    assert read_names == ["ice.crawl._stage_offers_3", "ice.crawl._stage_seen_3"]
    appended = [
        c.args[0] for c in spark.table.return_value.writeTo.call_args_list
    ]
    assert appended == ["ice.crawl.offers", "ice.crawl.seen"]
    assert spark.table.return_value.writeTo.return_value.append.call_count == 2


def test_read_and_last_committed_wave():
    spark = _fake_spark(max_wave=41)
    io = IcebergTableIO(spark, "ice", "crawl")
    io.read("frontier")
    spark.table.assert_called_with("ice.crawl.frontier")
    assert io.last_committed_wave() == 41
    assert any(
        "FROM ice.crawl.lineage" in c.args[0] for c in spark.sql.call_args_list
    )
