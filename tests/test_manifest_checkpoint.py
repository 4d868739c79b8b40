"""Manifest-checkpoint semantics of SnapshotParquetIO.

A thousand-wave crawl commits a thousand manifests; without folding,
every read parses all of them (O(waves) driver work per call, quadratic
over the crawl). ``checkpoint()`` folds the history into one manifest.
These tests pin the contract: reads through a checkpoint are identical
to full-history reads, time travel below the checkpoint still resolves,
a fresh (resumed) IO instance sees the same state, and vacuum never
deletes dirs that older manifests still reference.
"""

from __future__ import annotations

import pytest

from crawlers_spark.sources.tables import SnapshotParquetIO


def _commit(io, spark, wave: int, table: str, values: list[int], **more: list[int]):
    """One atomic manifest per wave (the API contract) covering
    ``table`` plus any ``more`` tables."""
    staged = {}
    for t, vals in {table: values, **more}.items():
        df = spark.createDataFrame([(wave, v) for v in vals], "wave long, v long")
        staged[t] = [io.stage(df, t, wave)]
    io.commit_wave(wave, staged)


def _rows(io, table: str, as_of=None) -> set[tuple]:
    return {
        (r.wave, r.v) for r in io.read(table, "wave long, v long", as_of_wave=as_of).collect()
    }


@pytest.fixture()
def io(spark, tmp_path):
    io = SnapshotParquetIO(spark, tmp_path / "state")
    for w in range(1, 7):
        extra = {"u": [w]} if w % 2 == 0 else {}
        _commit(io, spark, w, "t", [w * 10, w * 10 + 1], **extra)
    return io


def test_checkpoint_preserves_reads_and_folds_history(io, spark):
    full_t, full_u = _rows(io, "t"), _rows(io, "u")
    io.compact_table("t")
    io.checkpoint()
    _commit(io, spark, 7, "t", [70])

    assert _rows(io, "t") == full_t | {(7, 70)}
    assert _rows(io, "u") == full_u
    # steady-state read parses only checkpoint + tail, not the history
    ms = io._manifests()
    assert ms[0]["meta"].get("checkpoint") is True
    assert len(ms) == 2  # checkpoint + wave 7
    assert len(io._manifests(use_checkpoint=False)) > len(ms)
    assert io.last_committed_wave() == 7


def test_time_travel_below_checkpoint(io, spark):
    at3_t, at3_u = _rows(io, "t", as_of=3), _rows(io, "u", as_of=3)
    io.compact_table("t")
    io.checkpoint()
    _commit(io, spark, 7, "t", [70])
    assert _rows(io, "t", as_of=3) == at3_t
    assert _rows(io, "u", as_of=3) == at3_u
    # at exactly the checkpoint wave: post-compaction state, same rows
    assert _rows(io, "t", as_of=6) == {
        (w, w * 10 + d) for w in range(1, 7) for d in (0, 1)
    }


def test_resumed_instance_and_repeated_checkpoints(io, spark):
    io.compact_table("t")
    io.checkpoint()
    _commit(io, spark, 7, "t", [70])
    io.checkpoint()  # second fold, nothing compacted since
    _commit(io, spark, 8, "t", [80])

    fresh = SnapshotParquetIO(spark, io.root)  # resume = new process
    assert _rows(fresh, "t") == _rows(io, "t")
    assert fresh.last_committed_wave() == 8
    assert len(fresh._manifests()) == 2  # latest checkpoint + wave 8


def test_snapshot_tables_fold_to_latest_version_only(io, spark):
    """frontier/bloom/cuckoo-style tables are full snapshots per wave:
    the engine reads only the LATEST manifest's dirs. A checkpoint that
    folded their cumulative history would union every historical
    snapshot — so ``snapshot_tables`` must keep just the last writer's
    dirs."""
    io.compact_table("t")
    io.checkpoint(snapshot_tables=("t", "u"))
    ckpt = io._manifests()[0]
    assert ckpt["meta"].get("checkpoint") is True
    assert len(ckpt["tables"]["t"]) == 1  # the compacted dir only
    assert len(ckpt["tables"]["u"]) == 1  # wave 6's snapshot only
    # latest-manifest-wins readers (plans/wave._frontier_rels shape)
    # now see exactly the newest snapshot through the checkpoint
    assert _rows(io, "u") == {(6, 6)}


def test_expire_snapshots_retention(io, spark):
    """Retention drops history below a wave: current reads are
    untouched, superseded dirs are reclaimed, and expiring without a
    covering checkpoint is refused (it would orphan committed dirs)."""
    with pytest.raises(RuntimeError, match="no checkpoint"):
        io.expire_snapshots(before_wave=4)

    full_t, full_u = _rows(io, "t"), _rows(io, "u")
    io.compact_table("t")
    io.checkpoint(snapshot_tables=())
    _commit(io, spark, 7, "t", [70])
    n_dirs = sum(1 for _ in (io.root / "t" / "data").iterdir())

    st = io.expire_snapshots(before_wave=7)
    assert st["manifests_expired"] >= 6
    assert st["dirs_vacuumed"] > 0  # pre-compaction dirs reclaimed
    assert _rows(io, "t") == full_t | {(7, 70)}
    assert _rows(io, "u") == full_u
    assert io.last_committed_wave() == 7
    assert sum(1 for _ in (io.root / "t" / "data").iterdir()) < n_dirs
    # a resumed instance agrees
    fresh = SnapshotParquetIO(spark, io.root)
    assert _rows(fresh, "t") == full_t | {(7, 70)}


def test_vacuum_keeps_dirs_superseded_by_compaction(io, spark):
    n_dirs_before = len(io.committed_dirs("t"))
    io.compact_table("t")
    io.checkpoint()
    removed = io.vacuum_uncommitted()
    assert removed == 0  # superseded dirs are still manifest-referenced
    # ...and time travel through them still works
    assert _rows(io, "t", as_of=2) == {(1, 10), (1, 11), (2, 20), (2, 21)}
    assert len(io.committed_dirs("t")) == 1 < n_dirs_before
