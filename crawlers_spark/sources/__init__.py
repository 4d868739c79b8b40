from crawlers_spark.sources.tables import SnapshotParquetIO, TableIO  # noqa: F401
