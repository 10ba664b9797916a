"""Z-order data layout: multi-dimensional clustering so parquet
row-group min/max statistics prune scans on EVERY clustered column,
not just the leading sort key.

A linearly-sorted table prunes range predicates on its first sort
column only — a filter on the second column still reads every row
group. Interleaving the bits of the clustered columns (Morton / Z
curve) keeps rows that are close in ANY dimension close on disk, so a
selective filter on any one of them touches a small fraction of row
groups. This is the layout pass (Delta's OPTIMIZE ZORDER, Iceberg's
sort-order rewrite) a 100 TB table runs after ingest; at that scale
the pruning happens twice — at the FILE level via footer stats and at
the ROW-GROUP level inside each file — both from the same interleaved
ordering.

Everything is expression-level: the z-key is shift/or arithmetic built
as ONE SQL string (one py4j round trip, whole-stage codegen), the
range normalization is a broadcast 1-row aggregate (no driver
collect), and the write is repartitionByRange + sortWithinPartitions —
exactly one shuffle, the same cost a plain sorted write pays.

The reference has no storage layout at all (CSVs re-read per run,
ref ``src/spark/training.py:37-42``); this and sources/bucketing.py
are the write-side layouts the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; 2 dims × 16 bits = 32-bit z-key (fits long for
#: up to 4 dims at 16 bits).
DEFAULT_BITS = 16


def _norm_expr(col: str, lo: str, hi: str, bits: int) -> str:
    """SQL for ``col`` scaled to [0, 2^bits) against broadcast min/max
    columns ``lo``/``hi`` (degenerate constant column → 0)."""
    span = f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))"
    scaled = (
        f"CAST(floor((CAST({col} AS DOUBLE) - CAST({lo} AS DOUBLE))"
        f" * {(1 << bits) - 1} / {span}) AS BIGINT)"
    )
    return f"(CASE WHEN {span} = 0.0 THEN 0L ELSE {scaled} END)"


def zorder_key(cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton key over pre-normalized integer columns in [0, 2^bits):
    bit j of column i lands at position ``j * n_cols + i``. Built as a
    single OR-reduction SQL string — ``2 * bits * n_cols`` shift/and
    terms, all codegen."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    if bits * n > 62:
        raise ValueError("z-key would overflow a signed long")
    terms = []
    for i, c in enumerate(cols):
        for j in range(bits):
            terms.append(f"shiftleft(shiftright(`{c}`, {j}) & 1, {j * n + i})")
    return F.expr(" | ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
    tiny_rowgroups: bool = False,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``.

    Ranges for normalization come from one broadcast min/max aggregate
    (scale-safe: a map-side-combined 1-row result). The write is
    ``repartitionByRange(zkey)`` + ``sortWithinPartitions(zkey)`` — one
    range shuffle, contiguous z-runs per output file, so footer stats
    prune at file granularity and row-group stats inside each file.

    ``tiny_rowgroups`` shrinks parquet block/page sizes so toy-scale
    tests get enough row groups to observe pruning; leave False in
    production (the 128 MB default row group is the right pruning
    granularity)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    ranges = df.agg(*aggs)
    normed = df.crossJoin(F.broadcast(ranges))
    for c in cols:
        normed = normed.withColumn(
            f"__z_{c}", F.expr(_norm_expr(f"`{c}`", f"`__lo_{c}`", f"`__hi_{c}`", bits))
        )
    keyed = (
        normed.withColumn("__zkey", zorder_key([f"__z_{c}" for c in cols], bits))
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols],
              *[f"__z_{c}" for c in cols])
    )
    writer = (
        keyed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
    )
    if tiny_rowgroups:
        writer = writer.option("parquet.block.size", 64 * 1024).option(
            "parquet.page.size", 8 * 1024
        )
    writer.parquet(path)


def rowgroups_matching(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(matching, total) parquet row groups whose [min, max] stats
    intersect ``[lo, hi]`` — footer reads only, the exact pruning
    decision a scan makes. Test/audit helper for layout quality."""
    import os

    import pyarrow.parquet as pq

    files = [path]
    if os.path.isdir(path):
        files = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        ]
    match = total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                match += 1  # no stats → cannot prune
            elif not (st.max < lo or st.min > hi):
                match += 1
    return match, total


def compact_parquet(
    spark,
    path: str,
    *,
    target_bytes: int = 128 << 20,
    small_ratio: float = 0.5,
) -> dict:
    """Small-file compaction (the lakehouse ``OPTIMIZE`` maintenance
    pass): coalesce a directory's undersized parquet files toward
    ``target_bytes``, leaving already-healthy files untouched — the
    companion every micro-batch writer needs (streaming curation
    shards, per-epoch exports) because small files multiply scan tasks
    and footer reads until listing dominates the query.

    A file is "small" below ``small_ratio·target_bytes``. Only the
    small set is read and rewritten (``ceil(bytes/target)`` output
    files); big files are never touched, so the pass costs IO
    proportional to the junk, not the table. Returns a stats dict
    (files before/after, bytes compacted, files rewritten).

    Durability scope: file moves use local-filesystem rename, which is
    atomic per file but the SWAP (delete originals, move in rewrites)
    is not transactional — a reader listing mid-swap can see both or
    neither. That is the same contract as Spark's own
    non-transactional overwrite; production object-store tables run
    this through a table format's commit protocol (Delta OPTIMIZE /
    Iceberg rewrite_data_files) where the manifest swap is the atom.
    """
    import math
    import os
    import shutil
    import uuid

    files = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    sizes = {f: os.path.getsize(f) for f in files}
    small = [f for f in files if sizes[f] < small_ratio * target_bytes]
    if len(small) < 2:
        # nothing to gain — report a true no-op (a lone small file is
        # NOT rewritten, so it must not count as compaction work)
        return {
            "files_before": len(files),
            "files_rewritten": 0,
            "bytes_compacted": 0,
            "files_after": len(files),
        }
    stats = {
        "files_before": len(files),
        "files_rewritten": len(small),
        "bytes_compacted": sum(sizes[f] for f in small),
        "files_after": len(files),
    }

    n_out = max(1, math.ceil(stats["bytes_compacted"] / target_bytes))
    tmp = os.path.join(path, f"_compact_{uuid.uuid4().hex[:8]}")
    spark.read.parquet(*small).coalesce(n_out).write.mode(
        "overwrite"
    ).parquet(tmp)

    for f in small:
        os.remove(f)
    moved = 0
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(path, f"compact-{uuid.uuid4().hex[:8]}-{f}"),
            )
            moved += 1
    shutil.rmtree(tmp, ignore_errors=True)
    stats["files_after"] = len(files) - len(small) + moved
    return stats
