"""Batch sinks (SURVEY.md §2.1 S10-S11, §4 item 5).

The reference wrote flat CSV/JSON files from Python loops
(``src/streaming/kafka_consumer.py:66-110``,
``src/streaming_service.py:384-398``). The engine's canonical sink is
partitioned parquet: partition pruning turns date-range scans into
file skips, and writers scale with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "append",
) -> None:
    """Parquet sink, optionally hive-partitioned. Use low-cardinality
    partition columns only (a date, not an id): each distinct value is
    a directory, and the planner prunes unscanned ones."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_events_by_day(df: DataFrame, path: str, *, ts_col: str = "ts") -> None:
    """The events-lake layout: one partition per event day. Queries
    filtering on ``event_date`` scan only matching directories
    (PartitionFilters in the plan, zero data files touched outside the
    range)."""
    write_parquet(
        df.withColumn("event_date", F.to_date(F.col(ts_col))),
        path,
        partition_by=["event_date"],
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows are hash-clustered into
    ``n_buckets`` files per partition at WRITE time, so equi-joins and
    aggregations on ``bucket_by`` between co-bucketed tables need no
    shuffle at READ time — the join amortizes its exchange into the
    write, the right trade for fact tables joined repeatedly on the
    same key at 100 TB."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S10 parity: CSV export with header (ingest-compatible with
    :func:`..sources.readers.read_csv_hardened`)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S11 parity: JSON-lines export."""
    df.write.mode(mode).json(path)
