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


def compact_bucketed_table(spark, table: str) -> dict:
    """OPTIMIZE for a bucketed catalog table: the incremental index
    merges (``merge_bm25_index`` / ``merge_srp_index`` /
    ``merge_minhash_index``) APPEND one file set per delta under the
    existing bucket spec — pruning survives, but after N merges every
    bucket is N files and task/footer overhead creeps back. This pass
    rewrites the table to ONE file per bucket with the SAME spec
    (bucket count/columns and sort columns read from the catalog, so
    it cannot drift), repartitioning by the bucket column first —
    Spark's bucket id and ``repartition``'s hash partitioning use the
    same murmur3-mod function, so each task holds exactly one bucket's
    rows. The swap is the staged-rename discipline the merges
    themselves use (write to ``{table}_compact_stage``, DROP, RENAME —
    metadata-only; same non-transactional caveat as
    :func:`~.layout.compact_parquet`, closed by a table format in
    deployment).

    Returns ``{"files_before", "files_after", "n_buckets"}``.
    IO cost ∝ the table (a full rewrite): run it on the compaction
    cadence, not per merge. Parallelism note: one-file-per-bucket
    means one write TASK per bucket, so the bucket count chosen at
    build time is also the compaction parallelism and the per-file
    size ceiling — at 100 TB pick buckets so table/buckets lands in
    the 128 MiB–1 GiB file band (the RUNBOOK layout rule), and this
    pass inherits sane tasks for free.
    """
    import os
    import re
    from urllib.parse import urlparse

    info = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    }
    if "Num Buckets" not in info:
        raise ValueError(f"compact_bucketed_table: {table!r} is not bucketed")
    n_buckets = int(info["Num Buckets"])
    bucket_cols = re.findall(r"`([^`]+)`", info.get("Bucket Columns", ""))
    sort_cols = re.findall(r"`([^`]+)`", info.get("Sort Columns", ""))
    location = urlparse(info["Location"]).path

    def _n_files() -> int:
        return sum(
            1
            for f in os.listdir(location)
            if f.endswith(".parquet") and not f.startswith("_")
        )

    files_before = _n_files()
    stage = f"{table}_compact_stage"
    # the localCheckpoint is load-bearing: the bucketed scan CLAIMS
    # HashPartitioning(bucket_cols, n) so a bare repartition to the
    # same spec is elided as already-satisfied — but when the planner
    # disables bucket reading for the write query the physical
    # partitioning is raw file splits, and every split writes its own
    # per-bucket files (the fragmentation this pass removes, measured:
    # 34 files instead of 4). Cutting the lineage makes the
    # repartition real; its murmur3-mod hash IS the bucket-id
    # function, so each task then holds exactly one bucket and writes
    # exactly one file. Cost: one materialization — a compactor reads
    # the whole table anyway.
    df = (
        spark.table(table)
        .localCheckpoint(eager=False)
        .repartition(n_buckets, *bucket_cols)
    )
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(stage)
    # swap ordering: rename the live table ASIDE first, then promote
    # the stage, then drop the old — the no-table window (where probes
    # would raise) is one metadata op, not DROP-to-RENAME. A crash
    # between the two renames leaves {table}_old intact for manual
    # repair instead of nothing. Still non-transactional (documented
    # below); this ordering just shrinks the window for free.
    old = f"{table}_compact_old"
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    spark.sql(f"DROP TABLE {old}")
    info2 = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    }
    location = urlparse(info2["Location"]).path
    return {
        "files_before": files_before,
        "files_after": _n_files(),
        "n_buckets": n_buckets,
    }
