"""Scaling probe: replicate the driver documents/embeddings N× (in a
temp dir — never touching /root/testdata) and measure how the dedup
paths scale. Evidence for the 100-TB design claims:

- exact all-pairs Jaccard (q17 path) grows superlinearly (pair join);
- MinHash+LSH (q20 path) stays near-linear (banded buckets);
- blocked-GEMM embedding dedup grows with n^2/cores but at GEMM
  throughput (~10^9 mul-add/s/core), not expression-eval throughput.

Run: python scripts/scale_probe.py [replications ...]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from big_data_song_recommendation_spark.operators import dedup  # noqa: E402
from big_data_song_recommendation_spark.session import get_spark  # noqa: E402
from big_data_song_recommendation_spark.sources.readers import load_table  # noqa: E402


def replicate(df, times: int, id_col: str):
    rep = df.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(times - 1))))
    return rep.withColumn(
        id_col, F.col(id_col) * times + F.col("__r")
    ).drop("__r")


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, "/root/testdata/sf0.1", "documents")
    emb0 = load_table(spark, "/root/testdata/sf0.1", "embeddings")

    with tempfile.TemporaryDirectory() as d:
        for r in reps:
            docs_path, emb_path = f"{d}/docs_{r}", f"{d}/emb_{r}"
            replicate(docs0, r, "doc_id").write.mode("overwrite").parquet(docs_path)
            replicate(emb0, r, "vec_id").write.mode("overwrite").parquet(emb_path)
            docs = spark.read.parquet(docs_path)
            emb = spark.read.parquet(emb_path)
            n_docs, n_emb = docs.count(), emb.count()

            t0 = time.perf_counter()
            n_lsh = dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=32, bands=8, k=3
            ).count()
            t_lsh = time.perf_counter() - t0

            t0 = time.perf_counter()
            n_gemm = dedup.embedding_dup_pairs_blocked(
                emb, "vec_id", "embedding", threshold=0.4
            ).count()
            t_gemm = time.perf_counter() - t0

            print(
                f"x{r}: docs={n_docs} lsh_pairs={n_lsh} lsh={t_lsh:.1f}s | "
                f"emb={n_emb} gemm_pairs={n_gemm} gemm={t_gemm:.1f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
