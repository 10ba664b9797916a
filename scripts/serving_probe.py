"""Serving-latency harness (VERDICT r5 #9): p50/p95 per-request wall
for the §2.12 recommendation endpoints, measured two ways —

- ``on_demand``: the request computes its answer (ALS factor-cross /
  brute-force knn per call) — the reference's architecture, minus its
  driver-side display loop (``src/app.py:233-245``);
- ``precomputed``: the 100 TB serving layout — recommendations
  materialized ONCE by a batch job into a user-keyed (resp.
  item-keyed) parquet table, each request a key-filtered scan +
  broadcast display join. At scale the precompute is a nightly Spark
  job and the lookups hit a partitioned/bucketed store, so request
  latency is independent of model size; on-demand latency grows with
  factor count and corpus.

The hybrid endpoint is served from the two precomputed tables (blend
per request — the blend is per-user work, never corpus work).

Run: python scripts/serving_probe.py [sf_dir] [n_requests]
Writes SERVING_LATENCY.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_data_song_recommendation_spark.ml import recommend  # noqa: E402
from big_data_song_recommendation_spark.operators import similarity  # noqa: E402
from big_data_song_recommendation_spark.session import get_spark  # noqa: E402
from big_data_song_recommendation_spark.sources.readers import load_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SERVING_LATENCY.json",
)


def _pctl(xs: list[float], p: float) -> float:
    ys = sorted(xs)
    i = min(len(ys) - 1, int(round(p * (len(ys) - 1))))
    return ys[i]


def _timed(fn, reqs) -> dict:
    walls = []
    fn(reqs[0])  # warm the path (plan build + JIT) outside the timing
    for r in reqs:
        t0 = time.perf_counter()
        fn(r)
        walls.append((time.perf_counter() - t0) * 1000.0)
    return {
        "n_requests": len(walls),
        "p50_ms": round(_pctl(walls, 0.50), 1),
        "p95_ms": round(_pctl(walls, 0.95), 1),
        "mean_ms": round(sum(walls) / len(walls), 1),
    }


def run_probe(sf_dir: str, n_req: int = 30, spark=None) -> dict:
    """Measure the serving endpoints; importable so the latency pins in
    tests/test_serving_latency.py exercise the exact probe the
    SERVING_LATENCY.json artifact was recorded with."""
    if spark is None:
        spark = get_spark("serving-probe", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    ratings = recommend.derive_ratings_from_events(ev).cache()
    ratings.count()

    # Same-run load control: a minimal fresh-plan request (build a tiny
    # single-stage plan, run one job, collect a handful of rows) — the
    # same floor every endpoint below pays (py4j assembly + Catalyst +
    # job scheduling), with no data work. Host contention inflates this
    # and the endpoints together, so consumers that pin absolute p50s
    # (tests/test_serving_latency.py) scale their pins by
    # control_p50 / idle-box reference instead of failing on a loaded
    # box (VERDICT r12 "What's wrong #2"). Measured at the START and
    # END of the probe; ``control`` is the calmer of the two p50s, so
    # one transient (e.g. first-plan codegen warm-up) cannot inflate
    # the scale — only sustained load does.
    def _control(i):
        spark.range(100_000).filter(
            F.col("id") == (i * 101) % 99_991
        ).collect()

    report = {"sf_dir": sf_dir}
    report["control_start"] = _timed(_control, list(range(n_req)))

    t0 = time.perf_counter()
    res = recommend.train_als(
        ratings, evaluate=False, rank=8, maxIter=5, implicitPrefs=False
    )
    model = res.model
    t_train = time.perf_counter() - t0

    user_ids = [r[0] for r in ratings.select("user_id").distinct().limit(n_req).collect()]
    seed_ids = [r[0] for r in emb.select("vec_id").limit(n_req).collect()]
    users_df = {
        u: spark.createDataFrame([(u,)], "user_id int") for u in user_ids
    }

    report["als_train_s"] = round(t_train, 2)

    with tempfile.TemporaryDirectory() as d:
        # ---- batch precompute (the nightly job) -------------------
        t0 = time.perf_counter()
        all_recs = recommend.recommend_top_n(model, 10, bounded_users=False)
        all_recs.write.mode("overwrite").parquet(f"{d}/collab_recs")
        # item->item content neighbors: every embedding probes the
        # corpus once (one blocked all-pairs pass, not n_req scans)
        similarity.brute_force_knn(
            emb, emb, k=10, exclude_self=True
        ).write.mode("overwrite").parquet(f"{d}/content_recs")
        report["precompute_s"] = round(time.perf_counter() - t0, 2)

        collab_pre = spark.read.parquet(f"{d}/collab_recs")
        content_pre = spark.read.parquet(f"{d}/content_recs")

        # ---- per-request paths ------------------------------------
        def collab_on_demand(u):
            recommend.recommend_top_n(
                model, 10, users=users_df[u], bounded_users=True
            ).collect()

        def collab_precomputed(u):
            collab_pre.filter(F.col("user_id") == u).orderBy("rnk").collect()

        def content_on_demand(s):
            similarity.brute_force_knn(
                emb, emb.filter(F.col("vec_id") == s), k=10, exclude_self=True
            ).collect()

        def content_precomputed(s):
            content_pre.filter(F.col("query_id") == s).orderBy("rnk").collect()

        def hybrid_precomputed(u):
            fav = (
                ratings.filter(F.col("user_id") == u)
                .orderBy(F.desc("rating"), F.asc("item_id"))
                .limit(1)
            )
            c = collab_pre.filter(F.col("user_id") == u).select(
                F.col("item_id").alias("rec_id"),
                (F.lit(0.7) / F.col("rnk")).alias("score"),
            )
            t = (
                content_pre.join(
                    fav, content_pre["query_id"] == fav["item_id"]
                ).select(
                    F.col("neighbor_id").alias("rec_id"),
                    (F.lit(0.3) * F.col("sim")).alias("score"),
                )
            )
            w = Window.orderBy(F.desc("total"), F.asc("rec_id"))
            (
                c.unionByName(t)
                .groupBy("rec_id")
                .agg(F.sum("score").alias("total"))
                .withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= 10)
                .collect()
            )

        report["collaborative_on_demand"] = _timed(collab_on_demand, user_ids)
        report["collaborative_precomputed"] = _timed(collab_precomputed, user_ids)
        report["content_on_demand"] = _timed(content_on_demand, seed_ids)
        report["content_precomputed"] = _timed(content_precomputed, seed_ids)
        report["hybrid_precomputed"] = _timed(hybrid_precomputed, user_ids)

    # ---- BM25 retrieval: corpus re-scan vs postings index ---------
    from big_data_song_recommendation_spark.operators.retrieval import (
        build_bm25_index,
        bm25_topk,
        bm25_topk_indexed,
    )

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    tables = build_bm25_index(docs, name="probe_bm25", n_buckets=8)
    report["bm25_index_build_s"] = round(time.perf_counter() - t0, 2)
    try:
        vocab = [
            r["tok"]
            for r in spark.table(tables["terms"])
            .orderBy(F.desc("df"), F.asc("tok"))
            .limit(3 * n_req)
            .collect()
        ]
        term_reqs = [
            vocab[3 * i % len(vocab) : 3 * i % len(vocab) + 3] or vocab[:3]
            for i in range(n_req)
        ]

        def bm25_scan(terms):
            bm25_topk(docs, terms, k=10).collect()

        def bm25_indexed(terms):
            bm25_topk_indexed(spark, terms, name="probe_bm25", k=10).collect()

        report["bm25_scan"] = _timed(bm25_scan, term_reqs)
        report["bm25_indexed"] = _timed(bm25_indexed, term_reqs)

        # batch serving: the whole request set in ONE job — report the
        # amortized per-query latency next to the sequential p50s
        from big_data_song_recommendation_spark.operators.retrieval import (
            bm25_topk_indexed_many,
        )

        batch = {f"q{i}": ts for i, ts in enumerate(term_reqs)}
        t0 = time.perf_counter()
        bm25_topk_indexed_many(spark, batch, name="probe_bm25", k=10).collect()
        wall = (time.perf_counter() - t0) * 1000
        report["bm25_indexed_batch"] = {
            "n_queries": len(batch),
            "batch_ms": round(wall, 1),
            "per_query_ms": round(wall / len(batch), 1),
        }
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # ---- SRP ANN: in-session bucket join vs persisted index -------
    from big_data_song_recommendation_spark.operators.similarity import (
        build_srp_index,
        srp_knn,
        srp_knn_indexed,
    )

    emb_raw = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    srp_tables = build_srp_index(
        emb_raw, label_col="label", planes=6, name="probe_srp", n_buckets=8
    )
    report["srp_index_build_s"] = round(time.perf_counter() - t0, 2)
    try:
        n_vec = emb_raw.count()
        id_reqs = [[(7 * i) % n_vec] for i in range(n_req)]

        def srp_in_session(ids):
            probes = emb_raw.filter(F.col("vec_id").isin(ids))
            srp_knn(emb_raw, probes, planes=6, k=3).collect()

        def srp_indexed(ids):
            srp_knn_indexed(spark, ids, name="probe_srp", k=3).collect()

        report["srp_in_session"] = _timed(srp_in_session, id_reqs)
        report["srp_indexed"] = _timed(srp_indexed, id_reqs)

        # batch form (round 10): N probes amortize ONE job — the
        # bm25_topk_indexed_many discipline measured on the vector side
        batch_ids = [(7 * i) % n_vec for i in range(20)]
        srp_knn_indexed(spark, batch_ids, name="probe_srp", k=3).collect()
        t0 = time.perf_counter()
        srp_knn_indexed(spark, batch_ids, name="probe_srp", k=3).collect()
        wall = (time.perf_counter() - t0) * 1000
        report["srp_indexed_batch"] = {
            "n_queries": len(batch_ids),
            "batch_ms": round(wall, 1),
            "per_query_ms": round(wall / len(batch_ids), 1),
        }
    finally:
        for t in srp_tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # ---- IVF+PQ: persisted compressed ANN layout (round 10) --------
    from big_data_song_recommendation_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
    )

    t0 = time.perf_counter()
    pq_tables = build_ivfpq_index(emb_raw, name="probe_ivfpq", n_buckets=8)
    report["ivfpq_index_build_s"] = round(time.perf_counter() - t0, 2)
    try:
        id_reqs = [[(11 * i) % n_vec] for i in range(n_req)]

        def ivfpq_indexed(ids):
            ivfpq_topk_indexed(
                spark, ids, name="probe_ivfpq", k=3, nprobe=4
            ).collect()

        report["ivfpq_indexed"] = _timed(ivfpq_indexed, id_reqs)
        batch_ids = [(11 * i) % n_vec for i in range(20)]
        ivfpq_topk_indexed(
            spark, batch_ids, name="probe_ivfpq", k=3, nprobe=4
        ).collect()
        t0 = time.perf_counter()
        ivfpq_topk_indexed(
            spark, batch_ids, name="probe_ivfpq", k=3, nprobe=4
        ).collect()
        wall = (time.perf_counter() - t0) * 1000
        report["ivfpq_indexed_batch"] = {
            "n_queries": len(batch_ids),
            "batch_ms": round(wall, 1),
            "per_query_ms": round(wall / len(batch_ids), 1),
        }
    finally:
        for t in pq_tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # ---- IVF+PQ residual variant (round 11): same serving calls,
    # residual codes + stored offsets — the recall-preferred layout
    t0 = time.perf_counter()
    pqr_tables = build_ivfpq_index(
        emb_raw, name="probe_ivfpqr", n_buckets=8, residual=True
    )
    report["ivfpq_res_index_build_s"] = round(time.perf_counter() - t0, 2)
    try:
        id_reqs = [[(11 * i) % n_vec] for i in range(n_req)]

        def ivfpq_res_indexed(ids):
            ivfpq_topk_indexed(
                spark, ids, name="probe_ivfpqr", k=3, nprobe=4
            ).collect()

        report["ivfpq_res_indexed"] = _timed(ivfpq_res_indexed, id_reqs)
        batch_ids = [(11 * i) % n_vec for i in range(20)]
        ivfpq_topk_indexed(
            spark, batch_ids, name="probe_ivfpqr", k=3, nprobe=4
        ).collect()
        t0 = time.perf_counter()
        ivfpq_topk_indexed(
            spark, batch_ids, name="probe_ivfpqr", k=3, nprobe=4
        ).collect()
        wall = (time.perf_counter() - t0) * 1000
        report["ivfpq_res_indexed_batch"] = {
            "n_queries": len(batch_ids),
            "batch_ms": round(wall, 1),
            "per_query_ms": round(wall / len(batch_ids), 1),
        }
    finally:
        for t in pqr_tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # ---- near-dup admission: persisted MinHash band index ----------
    from big_data_song_recommendation_spark.operators.dedup import (
        build_minhash_index,
        near_dup_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    mh_tables = build_minhash_index(
        docs.select("doc_id", "text"), name="probe_mh", n_buckets=8
    )
    report["minhash_index_build_s"] = round(time.perf_counter() - t0, 2)
    try:
        n_docs = docs.count()
        # a 20-doc admission micro-batch per request, mutated so the
        # signatures differ from the indexed rows
        doc_reqs = [((17 * i) % n_docs) for i in range(n_req)]

        def admission_batch(start):
            batch = docs.filter(
                (F.col("doc_id") >= start) & (F.col("doc_id") < start + 20)
            ).select(
                (F.col("doc_id") + 50_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" probe tail")).alias("text"),
            )
            near_dup_probe(batch, name="probe_mh").collect()

        report["near_dup_admission_batch20"] = _timed(
            admission_batch, doc_reqs
        )
    finally:
        for t in mh_tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    ratings.unpersist()
    emb.unpersist()
    report["control_end"] = _timed(_control, list(range(n_req)))
    report["control"] = min(
        report["control_start"], report["control_end"], key=lambda c: c["p50_ms"]
    )
    return report


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    report = run_probe(sf_dir, n_req)
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
