"""Schema'd sources (SURVEY.md §2.1, S1-S7).

The reference reads CSVs either with ``inferSchema=true``
(``src/spark/training.py:113-116``) or all-string followed by per-column
defensive casts (``src/spark/training.py:37-65``). This engine instead
declares fixed :class:`StructType` schemas per table and funnels every
dirty input through one hardening pass (:func:`read_csv_hardened` +
:func:`..operators.clean.clean`), which keeps scans single-pass and
lets Catalyst push filters/projections into the file format.

Parquet is the canonical storage format (columnar, pushdown, stats);
CSV/JSON readers exist for ingest parity with the reference (S1-S3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §B) — parquet carries its
# own schema; this registry documents the contract and gives a single
# load/register entry point.
# ---------------------------------------------------------------------------

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always travel to a join as the
# broadcast side (SURVEY.md §4 item 1).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


# (session, sf_dir, name) → lazy plan. A DataFrame is an immutable
# logical plan, so reuse across queries is free and safe; what it saves
# is the ~80-90 ms JVM round-trip per spark.read.parquet (file listing
# + footer schema read), which across a 63-query bench run is seconds.
# The session object is held in the value so id() keys can't be reused
# by a garbage-collected successor.
_TABLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table: ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects ([PARQUET_TYPE_ILLEGAL]); we read it as a long via the
    legacy conf and convert to a microsecond timestamp (lossless here:
    the generator emits µs resolution; DuckDB performs the same ns→µs
    truncation).
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # The driver harness builds its own SparkSession; pin the runtime-
    # settable confs our queries depend on (UTC formatting parity with
    # the DuckDB oracle) rather than assuming our factory was used.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), sf_dir, name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if name in COMPUTE_DENSE_TABLES:
        df = _redistribute_if_underpartitioned(spark, df, f"{sf_dir}/{name}.parquet")
    if os.environ.get("SPARK_GRAFT_PIN_TABLES") == "1":
        # Opt-in hot-table pinning (bench.py sets this): persist the
        # scanned table so a multi-query session decodes parquet once —
        # Spark's buffer-pool equivalent of the OS page cache + buffer
        # manager a single-process engine (the DuckDB oracle) reuses
        # across its suite for free. Default OFF: unit tests assert
        # parquet pushdown plan shapes, and on a real cluster pinning
        # is a per-table call the operator makes for hot dims — you
        # would pin region/nation/customer at 100 TB, never lineitem
        # (MEMORY_AND_DISK would thrash; the scan is already columnar).
        df = df.cache()
    _TABLE_CACHE[key] = (spark, df)
    return df


# Tables whose consumers are compute-dense per row (regex/md5 shingling,
# minhash, GEMM) rather than scan-dense. For these, scan parallelism is
# the throughput ceiling — see _redistribute_if_underpartitioned.
COMPUTE_DENSE_TABLES: frozenset[str] = frozenset({"documents", "embeddings"})


def _parquet_layout(path: str) -> tuple[int, int]:
    """(total row groups, total rows) across the file/directory —
    footer reads only, no Spark job."""
    import os

    import pyarrow.parquet as pq

    files = [path]
    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
    groups = rows = 0
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
            groups += md.num_row_groups
            rows += md.num_rows
        except Exception:
            return (1_000_000, 0)  # unreadable footer → assume well-partitioned
    return (max(groups, 1), rows)


def _redistribute_if_underpartitioned(
    spark: SparkSession, df: DataFrame, path: str
) -> DataFrame:
    """Round-robin repartition a scan whose parquet layout cannot feed
    the cluster. Spark parallelizes parquet scans at ROW-GROUP
    granularity; a file written as one row group (the driver testdata
    is) is physically unsplittable, so every downstream map — regex
    quality scoring, minhash shingling, language ID — runs on ONE core
    no matter the split config. One narrow shuffle of the (small,
    by construction: too few row groups to matter) input unlocks
    cluster-wide parallelism for the compute-dense work.

    Self-disabling at scale: a production corpus has thousands of row
    groups, the condition is false, and the scan shape is untouched —
    this never adds a shuffle to an already-parallel scan. Relational
    fact tables are excluded outright (COMPUTE_DENSE_TABLES): their
    consumers are scan/agg-bound, where a pre-shuffle only adds cost
    (measured: q01 0.62→0.71 s with a forced repartition).

    The partition count is row-scaled (≥_MIN_ROWS_PER_TASK rows per
    task, capped at defaultParallelism): tiny corpora on max-width
    layouts feed iterative consumers (KMeans/ALS run a job per
    iteration) with per-task scheduling overhead that exceeds the
    per-task work (measured: q41 KMeans 1.84→1.35 s at 32→8
    partitions over 2 000 vectors). At production row counts the
    clamp saturates to full parallelism."""
    target = spark.sparkContext.defaultParallelism
    groups, rows = _parquet_layout(path)
    if groups >= target:
        return df
    target = max(1, min(target, rows // _MIN_ROWS_PER_TASK))
    if target <= groups:
        return df
    return df.repartition(target)


#: Minimum rows per task for redistributed compute-dense scans — sized
#: so task launch (~5-10 ms) stays well under the per-task work.
_MIN_ROWS_PER_TASK = 250


def local_frame(spark: SparkSession, data, schema) -> DataFrame:
    """Stage a committed-literal table (LM tiers, ALS factors, vocab,
    centroids, probe lists) as an in-JVM ``LocalRelation``.

    ``spark.createDataFrame(list, schema)`` parallelizes the rows into
    a pickled RDD of ``defaultParallelism`` slices; EVERY downstream
    action then runs a 32-task scan stage in which each task spins a
    Python worker to unpickle its slice — measured ~300 ms wall per
    task at local[32], i.e. multi-second stages that carry a few
    thousand literal rows (r12 stage profile: the q176 LM-tier stages
    alone were 3×32 tasks ≈ 26 s of task runTime for ~100 ms of CPU).
    Converting through pandas with the Arrow path instead materializes
    the rows as a JVM ``LocalRelation`` at BUILD time: zero runtime
    Python tasks, no scan stage at all, and the broadcast exchanges
    these tables feed read driver-local rows directly.

    Values are identical to the classic path (Arrow list/int/string
    conversion is exact for the integer/string literals these tables
    hold — pinned by tests/test_local_frame.py); anything the strict
    path cannot take (empty lists, non-tuple rows, missing pandas)
    falls back to classic ``createDataFrame``."""
    rows = data if isinstance(data, list) else list(data)
    if rows and all(isinstance(r, (tuple, list)) for r in rows):
        try:
            import pandas as pd

            prev = spark.conf.get(
                "spark.sql.execution.arrow.pyspark.enabled", "false"
            )
            spark.conf.set(
                "spark.sql.execution.arrow.pyspark.enabled", "true"
            )
            try:
                return spark.createDataFrame(pd.DataFrame(rows), schema)
            finally:
                spark.conf.set(
                    "spark.sql.execution.arrow.pyspark.enabled", prev
                )
        except Exception:
            pass
    return spark.createDataFrame(rows, schema)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Reference-domain schemas (FIXTURES.md §A), declared instead of inferred.
# ---------------------------------------------------------------------------

AUDIO_FEATURES = (
    "acousticness",
    "danceability",
    "energy",
    "instrumentalness",
    "liveness",
    "loudness",
    "speechiness",
    "tempo",
    "valence",
)

TRACKS_SCHEMA = T.StructType(
    [T.StructField("id", T.StringType(), False),
     T.StructField("name", T.StringType(), True),
     T.StructField("artists_id", T.StringType(), True),  # stringified list; see functions.scalars.parse_stringified_list
     T.StructField("album_id", T.StringType(), True)]
    + [T.StructField(f, T.DoubleType(), True) for f in AUDIO_FEATURES]
    + [T.StructField("popularity", T.DoubleType(), True),
       T.StructField("duration_ms", T.DoubleType(), True),
       T.StructField("key", T.IntegerType(), True),
       T.StructField("mode", T.IntegerType(), True),
       T.StructField("time_signature", T.IntegerType(), True),
       T.StructField("preview_url", T.StringType(), True),
       T.StructField("href", T.StringType(), True)]
)

ARTISTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("followers", T.LongType(), True),
        T.StructField("genres", T.StringType(), True),
        T.StructField("popularity", T.DoubleType(), True),
    ]
)

ALBUMS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("release_date", T.StringType(), True),
        T.StructField("total_tracks", T.IntegerType(), True),
    ]
)

EMOTIONS_SCHEMA = T.StructType(
    [
        T.StructField("artist", T.StringType(), True),
        T.StructField("song", T.StringType(), True),
        T.StructField("emotion", T.StringType(), True),
        T.StructField("variance", T.DoubleType(), True),
        T.StructField("Genre", T.StringType(), True),
    ]
)

INTERACTION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType(), True),
        T.StructField("track_id", T.StringType(), True),
        T.StructField("rating", T.DoubleType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("play_duration_ms", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField(
            "context",
            T.StructType(
                [
                    T.StructField("device", T.StringType(), True),
                    T.StructField("location", T.StringType(), True),
                    T.StructField("time_of_day", T.IntegerType(), True),
                    T.StructField("day_of_week", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def read_csv_hardened(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """CSV scan with the reference's defensive options (S1,
    ``src/spark/training.py:37-42``) but a declared schema.

    All columns are read as string then cast via ANSI ``try_cast``
    semantics (``mode=PERMISSIVE`` + typed schema gives the same
    null-on-failure behavior), matching the reference's per-column
    cast-with-fallback loop (``src/spark/training.py:45-65``) in one
    vectorized pass.
    """
    return (
        spark.read.options(
            header=True,
            nullValue="",
            nanValue="NaN",
            mode="PERMISSIVE",
        )
        .schema(schema)
        .csv(path)
    )


def read_json_hardened(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON scan with declared schema (S3, ``src/spark/training.py:142-147``
    used inference; declaring the schema avoids a double read at scale)."""
    return spark.read.schema(schema).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan (round-trip twin of ``sinks.write_orc``). Self-
    describing like parquet; pass ``schema`` only to prune/validate —
    pushdown and column pruning work either way."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_parquet_evolving(
    spark: SparkSession,
    *paths: str,
    required: dict[str, str] | None = None,
) -> DataFrame:
    """Read parquet shards whose schemas EVOLVED across writes — the
    forever-ingest reality (a column added in epoch N must not break
    reads of epochs < N).

    ``mergeSchema=true`` unions the footer schemas (off by default in
    Spark because it costs one footer read per file — which is exactly
    the right trade on an evolving lake); rows from shards missing a
    column read as NULL.  ``required`` maps column → type and raises
    if the merged schema still lacks one (catching a *renamed* column
    early, instead of silently training on an all-NULL feature).

    Scale note: schema merge reads footers only (driver-side listing +
    parallel footer fetch), never data; pushdown and pruning are
    unaffected.  Columns DROPPED by a new writer stay readable for old
    shards the same way — NULL where absent.
    """
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if required:
        have = {f.name: f.dataType.simpleString() for f in df.schema}
        missing = {
            c: t for c, t in required.items()
            if have.get(c) != t
        }
        if missing:
            raise ValueError(
                f"evolving read at {paths}: required columns absent or "
                f"mistyped: {missing}; merged schema has {have}"
            )
    return df
