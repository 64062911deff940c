from spider_go_spark.tables.snapshot import Catalog, SnapshotTable  # noqa: F401
