"""SparkSession factory.

Replaces the three ad-hoc session builders in the reference
(``src/spark/training.py:13-18``, ``src/app.py:16-22``,
``src/app_optimized.py:50-60``) with one configurable factory.

Defaults are tuned for correctness-comparable, scale-ready plans:

- AQE + partition coalescing + skew-join handling on (the reference
  enabled the first two; skew join is the scale superset).
- UTC session timezone so results compare bit-for-bit against the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for any pandas interchange (Pandas UDFs, toPandas).
- ``spark.sql.shuffle.partitions`` sized to the local core count
  rather than the 200 default; on a real cluster this should be
  ~2-3x total executor cores (or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "big_data_song_recommendation_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # lets Python DataSources (sources/batchfile_source.py) receive
        # pushed filters for file-level pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
