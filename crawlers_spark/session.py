"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a multi-executor deployment would use:
AQE on (skew-join split + partition coalesce), Arrow enabled for every
pandas-UDF boundary, UTC session timezone (DuckDB-oracle comparability),
and shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "crawlers_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cores`` may be an int (→ ``local[N]``) or a full master string.
    Reads ``SPARK_GRAFT_CPUS`` when unset so the bench driver can pin
    parallelism externally.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = cores if isinstance(cores, str) and cores.startswith(("local", "spark://", "yarn")) else f"local[{cores}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # deterministic plans: fixed shuffle partitioning per run
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1024, not the 10000 default: page-sized rows make 10k-row
        # Arrow batches ~120 MB pandas frames; with 32 concurrent UDF
        # workers each holding the batch + derived series, that's tens
        # of GB of allocator churn and extraction stops scaling
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # html-heavy scans feed pandas-UDF extraction: smaller input
        # splits keep every core busy (128m default → 1-2 tasks on the
        # compressed fixture; at warehouse scale files are many and this
        # only caps the per-task batch)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        # pack tiny state files (wave_out kind leaves, bloom shards)
        # many-per-task: the 4 MB default openCost with 4 MB partitions
        # schedules ONE task per file — a 60-file seen scan became 60+
        # tasks of pure scheduling overhead
        .config("spark.sql.files.openCostInBytes", "131072")
        # our joins are build-tiny/probe-huge (url keys vs html pages):
        # shuffled-hash beats sort-merge — SMJ sorts the html side per
        # task (Spark ignores bucketed sort order by default), which
        # thrashes memory at high core counts
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
