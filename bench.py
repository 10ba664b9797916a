"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced with a count-style action that materializes the
full result (``df.write.format("noop")``) so nothing is skipped by
laziness, and timed after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from big_data_song_recommendation_spark.plans import QUERIES
from big_data_song_recommendation_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    # Warm the JVM/session so the first timed query doesn't pay startup:
    # JIT the parquet reader/writer, hash-agg, broadcast-join, and window
    # paths on throwaway data (never the benchmark inputs).
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    with tempfile.TemporaryDirectory() as d:
        spark.range(100_000).selectExpr(
            "id", "id % 7 AS k", "cast(id AS double) AS v"
        ).write.mode("overwrite").parquet(f"{d}/warm")
        w = spark.read.parquet(f"{d}/warm")
        dim = w.groupBy("k").count()
        w.join(F.broadcast(dim), "k").groupBy("k").sum("v").collect()
        w.withColumn(
            "r", F.row_number().over(Window.partitionBy("k").orderBy("id"))
        ).filter("r <= 3").collect()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_all, 4)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
