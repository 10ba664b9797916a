"""Bucketed-table layout for shuffle-free co-located joins
(SURVEY.md §4: "co-locate joins via bucketing or pre-partitioning").

A fact⋈fact equi-join (lineitem⋈orders on orderkey at 100 TB) normally
shuffles BOTH sides on the key every time it runs. Writing both tables
bucketed by that key pays the shuffle ONCE at write time; every
subsequent join reads co-located buckets and plans a SortMergeJoin
with ZERO Exchange on either side — the repeated-join amortization
every warehouse layout uses. (The reference has no storage layout at
all — CSVs re-read per run, ref ``src/spark/training.py:37-42``.)

Bucketing goes through the session catalog (``saveAsTable``): bucket
metadata lives in the table definition, which is what lets the planner
trust the layout and elide the exchange. Plain ``parquet(path)``
writes cannot carry it.

Pair with ``spark.sql.sources.bucketing.enabled`` (default true) and
match ``n_buckets`` across tables meant to join (the planner only
elides shuffles when bucket counts line up or are multiples under
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally
    sorted) by ``key``. Sorting within buckets additionally removes the
    join-time Sort, leaving a pure streaming merge."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on their bucket key.
    With matching bucket counts the physical plan carries no Exchange —
    assert that in tests rather than trusting it."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)
