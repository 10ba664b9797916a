"""Round-3 curation additions: winnowing fingerprints, deterministic
SRP-LSH, PII redaction. Behavioral tests on constructed fixtures (the
oracle-parity suite covers the q74/q75/q76/q77 end-to-end results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.functions import text as Ftext
from big_data_song_recommendation_spark.operators import dedup, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestWinnowing:
    def test_guarantee_shared_run_yields_shared_fingerprint(self, spark):
        # winnowing guarantee: a shared token run of length >= w + k - 1
        # (= 6 here) produces at least one shared fingerprint
        shared = "alpha beta gamma delta epsilon zeta"
        docs = _docs(
            spark,
            [
                (1, f"one two three {shared} four five six"),
                (2, f"{shared} seven eight nine ten eleven twelve"),
            ],
        )
        pairs = dedup.winnow_shared_pairs(
            docs, "doc_id", "text", k=3, window=4, min_shared=1
        ).collect()
        assert len(pairs) == 1 and pairs[0]["n_shared"] >= 1

    def test_selects_strict_subset_of_shingles(self, spark):
        text = " ".join(f"tok{i}" for i in range(60))
        docs = _docs(spark, [(1, text)])
        fps = dedup.winnow_fingerprints(docs, "doc_id", "text", k=3, window=4)
        n_fps = fps.count()
        n_shingles = 60 - 2
        # ~2/(w+1) density: far fewer fingerprints than shingles, never 0
        assert 0 < n_fps < n_shingles / 2

    def test_unrelated_docs_share_nothing(self, spark):
        docs = _docs(
            spark,
            [
                (1, " ".join(f"left{i}" for i in range(20))),
                (2, " ".join(f"right{i}" for i in range(20))),
            ],
        )
        assert (
            dedup.winnow_shared_pairs(
                docs, "doc_id", "text", k=3, window=4, min_shared=1
            ).count()
            == 0
        )

    def test_short_doc_yields_no_fingerprints(self, spark):
        # fewer shingles than the window -> no full frame -> no output
        docs = _docs(spark, [(1, "a b c d"), (2, "")])
        assert dedup.winnow_fingerprints(docs, "doc_id", "text", k=3, window=4).count() == 0


class TestSRP:
    def test_signature_deterministic_across_sessions(self, spark):
        emb = spark.createDataFrame(
            [(i, [float(i % 7) - 3.0 + 0.1 * d for d in range(8)]) for i in range(20)],
            ["vec_id", "embedding"],
        )
        a = {
            r["vec_id"]: r["bucket"]
            for r in similarity.srp_signatures(emb, planes=6).collect()
        }
        b = {
            r["vec_id"]: r["bucket"]
            for r in similarity.srp_signatures(emb, planes=6).collect()
        }
        assert a == b
        assert all(0 <= v < 64 for v in a.values())

    def test_identical_vectors_collide(self, spark):
        emb = spark.createDataFrame(
            [(1, [0.5, -1.0, 2.0]), (2, [0.5, -1.0, 2.0]), (3, [-0.5, 1.0, -2.0])],
            ["vec_id", "embedding"],
        )
        sig = {
            r["vec_id"]: r["bucket"]
            for r in similarity.srp_signatures(emb, planes=4).collect()
        }
        assert sig[1] == sig[2]
        # antipodal vector flips every non-zero projection
        assert sig[1] != sig[3]

    def test_knn_ranks_by_exact_cosine_within_bucket(self, spark):
        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [0.9, 0.1, 0.0]),
                (3, [0.8, 0.3, 0.0]),
            ],
            ["vec_id", "embedding"],
        )
        out = similarity.srp_knn(
            emb, emb.filter(F.col("vec_id") == 1), planes=1, k=2
        ).collect()
        got = [(r["neighbor_id"], r["rnk"]) for r in out]
        assert got == [(2, 1), (3, 2)]


class TestPIIRedaction:
    def test_redacts_all_three_categories(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@example.co.uk host 192.168.1.200 tel +1 (555) 123-4567 end"),
            ],
            ["id", "t"],
        )
        out = df.select(
            Ftext.redact_pii("t").alias("r"), Ftext.pii_counts("t").alias("c")
        ).collect()[0]
        assert "example" not in out["r"] and "192.168" not in out["r"]
        assert "555" not in out["r"]
        assert out["r"].count("[REDACTED]") == 3
        assert (out["c"]["email"], out["c"]["ipv4"], out["c"]["phone"]) == (1, 1, 1)

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([(1, "no pii here just words")], ["id", "t"])
        out = df.select(Ftext.redact_pii("t").alias("r")).collect()[0]
        assert out["r"] == "no pii here just words"
