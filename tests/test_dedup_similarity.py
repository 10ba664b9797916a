"""Behavioral tests for dedup + similarity operators on planted data
(exact dups, near-dups, distinct docs) — complements the oracle suite,
which checks engine parity but not semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import dedup, similarity

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill and birds sing in the garden outside today"
)
NEAR = BASE.replace("garden", "meadow")  # one-token change → high jaccard
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines here"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),            # exact dup of 1
        (3, "  THE quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill and birds sing in the garden outside today!!"),  # dup after normalization
        (4, NEAR),            # near-dup of 1
        (5, OTHER),
        (6, "tiny"),          # shorter than shingle size
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(docs):
    out = {r["doc_id"]: r["keep"] for r in dedup.exact_duplicates(docs, "doc_id", "text").collect()}
    assert out[1] is True and out[2] is False and out[3] is False
    assert out[4] is True and out[5] is True and out[6] is True


def test_short_doc_has_no_shingles(docs):
    sets = dedup._shingle_sets(docs, "doc_id", "text", 3)
    assert sets.filter(F.col("sid") == 6).count() == 0


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 3)] == 1.0 and pairs[(2, 3)] == 1.0
    assert 0.5 < pairs[(1, 4)] < 1.0  # near-dup
    assert not any(5 in p or 6 in p for p in pairs)


def test_minhash_lsh_recovers_true_pairs(docs):
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, verify_threshold=0.5
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert got == want  # high-similarity pairs ⇒ LSH recall ≈ 1


def test_simhash_near_dups_close(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id", "text", bits=32).collect()}
    assert sh[1] == sh[2] == sh[3]  # identical normalized text

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert hamming(sh[1], sh[4]) <= 6  # near-dup: few bits differ
    assert hamming(sh[1], sh[5]) > hamming(sh[1], sh[4])  # distinct doc further


def test_brute_force_knn_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") == 0)
    out = similarity.brute_force_knn(df, probes, k=3).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rnk"])]
    assert order == [1, 2, 3]  # cosine ranking


def test_ivf_knn_matches_brute_force_topk(spark, duck):
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    brute = similarity.brute_force_knn(emb, probes, k=3).collect()
    cents, assigned = similarity.ivf_index(emb, n_centroids=8)
    approx = similarity.ivf_knn(cents, assigned, probes, k=3, nprobe=8).collect()
    # nprobe == n_centroids ⇒ exhaustive ⇒ must equal brute force
    key = lambda rows: {(r["query_id"], r["rnk"]): r["neighbor_id"] for r in rows}
    assert key(brute) == key(approx)


def test_ivf_recall_improves_with_nprobe(spark):
    """ANN quality contract: recall@5 has a sane floor at nprobe=4 and
    is non-decreasing in nprobe (more clusters probed ⇒ superset of
    candidates). Synthetic embeddings are near-random, so absolute
    recall is modest by construction."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_knn(emb, probes, k=5).collect()
    }
    cents, assigned = similarity.ivf_index(emb, n_centroids=16, seed=42)
    assigned = assigned.cache()

    def recall(nprobe: int) -> float:
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_knn(
                cents, assigned, probes, k=5, nprobe=nprobe
            ).collect()
        }
        return len(exact & got) / len(exact)

    r4, r8, r16 = recall(4), recall(8), recall(16)
    assert r4 >= 0.35
    assert r4 <= r8 <= r16
    assert r16 == 1.0  # probing everything is exhaustive


def test_quantized_embeddings_roundtrip_error_bound(spark):
    """int8 scalar quantization: per-component reconstruction error is
    bounded by scale/2 = (hi-lo)/510, and the quantized array stays
    tinyint of the original dimension."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = similarity.dequantize_embeddings(similarity.quantize_embeddings(emb))
    stats = q.select(
        F.max(
            F.array_max(
                F.zip_with(
                    F.col("embedding"), F.col("embedding_hat"),
                    lambda a, b: F.abs(a - b),
                )
            )
            - F.col("q_emb_scale") / 2
        ).alias("worst_excess"),
        F.min(F.size("q_emb") == F.size("embedding")).alias("dims_ok"),
    ).first()
    assert stats["worst_excess"] <= 1e-9
    assert stats["dims_ok"]
    assert dict(q.dtypes)["q_emb"] == "array<tinyint>"


def test_quantized_knn_recall_against_brute_force(spark):
    """Asymmetric-distance search over the int8 corpus keeps near-exact
    top-5 (8 bits is plenty at these norms): recall ≥ 0.9."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_knn(emb, probes, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_quantized(emb, probes, k=5).collect()
    }
    assert len(exact & got) / len(exact) >= 0.9


def test_lsh_knn_recall_against_brute_force(spark):
    """BucketedRandomProjectionLSH tier (SURVEY §7 risk d: parameter
    calibration): with enough hash tables the approx top-5 must
    overlap the exact euclidean top-5 substantially on the driver
    embeddings. Also pins that more tables never hurt recall."""
    import numpy as np
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.filter(F.col("vec_id") < 10).collect()
    corpus = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in emb.collect()}

    def exact_top5(q):
        d = sorted(
            ((np.linalg.norm(q - v), vid) for vid, v in corpus.items()),
            key=lambda t: (t[0], t[1]),
        )
        return {vid for _, vid in d[:5]}

    def recall(num_tables: int) -> float:
        hit = tot = 0
        for r in rows[:5]:
            got = {
                x["vec_id"]
                for x in similarity.lsh_knn(
                    emb, r["embedding"], k=5,
                    bucket_length=2.0, num_tables=num_tables,
                ).collect()
            }
            want = exact_top5(np.array(r["embedding"], dtype=float))
            hit += len(got & want)
            tot += len(want)
        return hit / tot

    r1, r8 = recall(1), recall(8)
    assert r8 >= 0.8, f"8-table LSH recall too low: {r8}"
    assert r8 >= r1 - 0.2  # more tables must not collapse recall


def test_connected_components_matches_union_find(spark):
    """Label propagation vs a local union-find on a graph that needs
    multiple rounds: a 7-node path (diameter 6), a triangle, an
    isolated pair."""
    edges = (
        [(i, i + 1) for i in range(10, 16)]   # path 10-11-...-16
        + [(1, 2), (2, 3), (1, 3)]            # triangle
        + [(100, 200)]                        # pair
    )
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["comp"]
        for r in dedup.connected_components(pairs, max_iter=10).collect()
    }

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


def test_drop_near_duplicates_keeps_canonicals(spark):
    """End-to-end removal: one doc per cluster survives (the smallest
    id), untouched docs pass through."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 12, 13, 14, 15, 16, 99)],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16)],
        ["id_a", "id_b"],
    )
    kept = sorted(
        r["doc_id"] for r in dedup.drop_near_duplicates(docs, pairs).collect()
    )
    assert kept == [1, 10, 99]


def test_blocked_gemm_construction_is_lazy_and_matches_brute(spark):
    """VERDICT r1 #9: embedding_dup_pairs_blocked must not run a job
    (eager count) during construction — block sizing comes from
    Catalyst file stats / caller n_blocks. And its output must equal
    the brute-force all-pairs path."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(120):
        v = rng.normal(size=16)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # plant near-dups: 100+i ≈ i for i in 0..9
    for i in range(10):
        v = np.array(rows[i][1]) + rng.normal(scale=0.01, size=16)
        rows.append((200 + i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, ["doc_id", "vec"])

    tracker = spark.sparkContext.statusTracker()
    jobs_before = set(tracker.getJobIdsForGroup(None) or [])
    blocked = dedup.embedding_dup_pairs_blocked(
        df, "doc_id", "vec", threshold=0.95
    )
    jobs_after = set(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before, (
        "operator construction fired a Spark job (eager action)"
    )

    got = {(r["id_a"], r["id_b"]) for r in blocked.collect()}
    brute = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_dup_pairs(
            df, "doc_id", "vec", threshold=0.95
        ).collect()
    }
    assert got == brute and len(got) >= 10


def test_blocked_gemm_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, vec array<double>")
    out = dedup.embedding_dup_pairs_blocked(df, "doc_id", "vec")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cosine"]


def test_chunk_dedup_first_occurrence_wins(spark):
    # 12 tokens -> chunks of 4: doc 1 has 3 chunks; doc 2 repeats doc 1's
    # first chunk verbatim then diverges; doc 3 is all-fresh.
    a = "a b c d e f g h i j k l"
    b = "a b c d x y z w"
    c = "m n o p"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    out = dedup.chunk_dedup(df, "doc_id", "text", chunk_tokens=4)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk"], r["retained"])
            for r in out.collect()}
    assert rows[(1, 0)] == ("a b c d", True)
    assert rows[(1, 1)] == ("e f g h", True)
    assert rows[(1, 2)] == ("i j k l", True)
    assert rows[(2, 0)] == ("a b c d", False)  # dup of doc 1 chunk 0
    assert rows[(2, 1)] == ("x y z w", True)
    assert rows[(3, 0)] == ("m n o p", True)


def test_chunk_dedup_ragged_tail_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "  !!  "), (3, "a b c d e")],
        ["doc_id", "text"],
    )
    out = dedup.chunk_dedup(df, "doc_id", "text", chunk_tokens=4)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk"], r["retained"])
            for r in out.collect()}
    # ragged tail chunk is its own unit; doc 2 tokenizes to nothing
    assert rows[(1, 0)] == ("a b c d", True)
    assert rows[(1, 1)] == ("e", True)
    assert rows[(3, 0)] == ("a b c d", False)
    assert rows[(3, 1)] == ("e", False)
    assert not any(k[0] == 2 for k in rows)


def test_select_canonicals_keeps_best_scored_member(spark):
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        ["doc_id", "quality"],
    )
    # cluster {1,2,3}: best quality 0.9 tied 2/3 -> min id 2; {4} and
    # {9} are singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = {r["doc_id"]: r for r in
           dedup.select_canonicals(scored, pairs, "doc_id", "quality").collect()}
    assert out[2]["is_canonical"] is True
    assert out[1]["is_canonical"] is False and out[3]["is_canonical"] is False
    assert out[1]["cluster"] == out[2]["cluster"] == out[3]["cluster"] == 1
    assert out[2]["n_members"] == 3
    assert out[4]["is_canonical"] is True and out[4]["n_members"] == 1
    assert out[9]["is_canonical"] is True


def test_dedup_against_store_verdict_precedence(spark):
    batch = spark.createDataFrame(
        [(10, "fresh content here"),
         (11, "seen before text"),
         (12, "fresh content here"),   # within-batch repeat of 10
         (13, "also new stuff")],
        ["doc_id", "text"],
    )
    store_docs = spark.createDataFrame(
        [(1, "seen BEFORE text!!")], ["doc_id", "text"]  # same fingerprint as 11
    )
    from big_data_song_recommendation_spark.functions import text as Ftext
    store = store_docs.select(Ftext.fingerprint("text").alias("fp"))
    out = {r["doc_id"]: r["verdict"] for r in
           dedup.dedup_against_store(batch, store, "doc_id", "text").collect()}
    assert out == {10: "accept", 11: "dup_store", 12: "dup_batch", 13: "accept"}


def test_containment_catches_excerpt_jaccard_misses(spark):
    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = (
        "intro words before the excerpt begins now "
        + small
        + " and then a long unrelated tail keeps going with many more "
        "words about completely different topics until the end of it"
    )
    df = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
    cont = dedup.containment_pairs(df, "doc_id", "text", k=3, threshold=0.8)
    [row] = cont.collect()
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["containment"] == 1.0  # every shingle of small is in big
    # the symmetric metric misses it at the same bar
    jac = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.8)
    assert jac.count() == 0


# -- exact-substring duplicate spans (round-8, Lee et al. 2022) -------------

def test_duplicated_spans_semantics(spark):
    """Keep-first: the earliest (doc,pos) occurrence is NOT flagged;
    overlapping flagged k-grams merge into one maximal span; clean
    docs come back zero-filled, not dropped."""
    from big_data_song_recommendation_spark.operators.dedup import (
        duplicated_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"intro words {shared} closing remark"),          # first -> clean
        (2, f"other preamble {shared} and a different tail"), # copy -> span
        (3, "completely unrelated text with no repeats here"),
        (4, f"{shared}"),                                     # exact copy
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            k=8,
        ).collect()
    }
    assert len(out) == 4  # zero-fill keeps every doc
    assert out[1]["n_dup_spans"] == 0  # first occurrence kept
    assert out[3]["n_dup_spans"] == 0
    # docs 2 and 4 contain the 10-token shared run: 3 overlapping
    # 8-grams merge into ONE span of exactly 10 tokens
    for d in (2, 4):
        assert out[d]["n_dup_spans"] == 1, out[d]
        assert out[d]["dup_tokens"] == 10, out[d]
    assert out[4]["dup_ratio_micro"] == 1_000_000  # whole doc duplicated


def test_duplicated_spans_distinct_islands(spark):
    """Two repeated runs separated by MORE than k unique tokens are
    reported as two spans, not one."""
    from big_data_song_recommendation_spark.operators.dedup import (
        duplicated_spans,
    )

    a = "one two three four five six seven eight"        # 8 tokens
    b = "red orange yellow green blue indigo violet pink"
    gap = " ".join(f"u{i}" for i in range(12))
    gap2 = " ".join(f"v{i}" for i in range(12))
    rows = [
        (1, f"{a} {gap} {b}"),
        (2, f"prefix {a} {gap2} {b} suffix"),
    ]
    out = {
        r["doc_id"]: r
        for r in duplicated_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            k=8,
        ).collect()
    }
    assert out[1]["n_dup_spans"] == 0  # doc 1 holds the firsts
    assert out[2]["n_dup_spans"] == 2
    assert out[2]["dup_tokens"] == 16


def test_duplicated_spans_short_doc_no_shingles(spark):
    from big_data_song_recommendation_spark.operators.dedup import (
        duplicated_spans,
    )

    out = duplicated_spans(
        spark.createDataFrame(
            [(1, "too short"), (2, None)], "doc_id long, text string"
        ),
        k=8,
    ).collect()
    got = {r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"]) for r in out}
    assert got == {1: (0, 0), 2: (0, 0)}


def test_remove_duplicated_spans_surgery(spark):
    """Removal is the detector's complement: the first occurrence
    keeps its full text, later occurrences lose EXACTLY the dup_tokens
    the detector counted, and clean docs pass through untouched."""
    from big_data_song_recommendation_spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"intro words {shared} closing remark"),
        (2, f"other preamble {shared} and a different tail"),
        (3, "completely unrelated text with no repeats here"),
        (4, shared),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rem = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, k=8).collect()}
    det = {r["doc_id"]: r for r in duplicated_spans(df, k=8).collect()}
    for d in (1, 2, 3, 4):
        assert rem[d]["n_removed"] == det[d]["dup_tokens"], d
    assert rem[1]["text_dedup"] == f"intro words {shared} closing remark"
    assert rem[2]["text_dedup"] == "other preamble and a different tail"
    assert rem[4]["text_dedup"] == ""  # fully duplicated -> empty
    assert rem[5]["text_dedup"] is None and rem[5]["n_removed"] is None


def test_centroid_assign_argmin_and_tie_rule(spark):
    """Committed-centroid assignment (round 10): exact integer argmin,
    ties toward the LOWEST centroid index, dim mismatch raises."""
    import pytest as _pytest

    from big_data_song_recommendation_spark.operators.similarity import (
        centroid_assign,
    )

    cents = [[0, 0], [1_000_000, 0], [1_000_000, 0]]  # 1 and 2 identical
    df = spark.createDataFrame(
        [(0, [0.1, 0.0]), (1, [0.9, 0.0]), (2, [0.5, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r.cluster for r in centroid_assign(df, cents).collect()}
    # 0.5 is equidistant (250000² each side in micro² units) → lowest idx
    assert got == {0: 0, 1: 1, 2: 0}
    with _pytest.raises(ValueError, match="dim"):
        centroid_assign(
            spark.createDataFrame(
                [(0, [0.1])], "vec_id long, embedding array<double>"
            ),
            cents,
        )


def test_ivf_committed_matches_full_scan_at_full_nprobe(spark):
    """ivf_knn_committed with nprobe == K must equal the exact scan
    (routing covers every cell), and with small nprobe stays a subset
    of each probe's cells — the committed-artifact twin of the seeded
    ivf_knn contract above."""
    from big_data_song_recommendation_spark.ml.centroids import IVF_CENTROIDS
    from big_data_song_recommendation_spark.operators.similarity import (
        brute_force_knn,
        ivf_knn_committed,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    full = ivf_knn_committed(
        emb, probes, IVF_CENTROIDS, k=3, nprobe=len(IVF_CENTROIDS)
    )
    exact = brute_force_knn(emb, probes, k=3)
    got = sorted(tuple(r) for r in full.collect())
    want = sorted(tuple(r) for r in exact.collect())
    assert got == want and len(got) == 9


def test_recommend_top_n_committed_matches_float_dot(spark):
    """Integer micro² scoring ranks identically to a float dot over the
    same committed factors; users without factors drop (cold start)."""
    from big_data_song_recommendation_spark.ml.als_factors import (
        ALS_ITEM_FACTORS,
        ALS_USER_FACTORS,
    )
    from big_data_song_recommendation_spark.ml.recommend import (
        recommend_top_n_committed,
    )

    users = spark.createDataFrame(
        [(ALS_USER_FACTORS[0][0],), (999_999,)], "user_id int"
    )
    recs = recommend_top_n_committed(spark, users, 3).collect()
    assert {r.user_id for r in recs} == {ALS_USER_FACTORS[0][0]}
    uf = ALS_USER_FACTORS[0][1]
    scored = sorted(
        (
            (-sum(a * b for a, b in zip(uf, itf)), item)
            for item, itf in ALS_ITEM_FACTORS
        )
    )[:3]
    assert [(r.item_id, r.score_micro2) for r in sorted(recs, key=lambda r: r.rnk)] == [
        (item, -neg) for neg, item in scored
    ]


# -- semantic decontamination (round 11) ----------------------------------------


def _decontam_fixture(spark):
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bench = emb.filter(F.col("vec_id") % 41 == 1).select(
        (F.col("vec_id") + 10**9).alias("vec_id"),
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), (x, i) -> "
            "CASE WHEN i = 0 THEN x + 0.002 ELSE x END)"
        ).alias("embedding"),
    )
    return emb, bench


def test_semantic_decontaminate_finds_planted_copies(spark):
    """Every perturbed benchmark copy flags exactly its source vector
    at dup-grade similarity, and nothing else reaches the threshold."""
    from big_data_song_recommendation_spark.operators.quality import (
        semantic_decontaminate,
    )

    emb, bench = _decontam_fixture(spark)
    rows = semantic_decontaminate(emb, bench, threshold=0.999).collect()
    assert len(rows) == bench.count()
    assert all(r["bench_id"] - 10**9 == r["vec_id"] for r in rows)
    assert all(r["sim"] >= 0.999 for r in rows)


def test_semantic_decontaminate_matches_exhaustive_truth(spark):
    """LSH-candidate recall at the designed operating point: the
    flagged id set equals the exhaustive cross-join truth at the same
    threshold (brute force is the baseline, LSH the scale path)."""
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.functions import vectors
    from big_data_song_recommendation_spark.operators.quality import (
        semantic_decontaminate,
    )

    emb, bench = _decontam_fixture(spark)
    dim = vectors.infer_dim(emb, "embedding")
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")).withColumn(
        "cn", F.sqrt(vectors.sq_norm_expanded("cv", dim))
    )
    b = bench.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv")).withColumn(
        "bn", F.sqrt(vectors.sq_norm_expanded("bv", dim))
    )
    truth = {
        r["cid"]
        for r in c.crossJoin(F.broadcast(b))
        .withColumn(
            "sim",
            F.round(
                vectors.dot_expanded("cv", "bv", dim)
                / (F.col("cn") * F.col("bn")),
                6,
            ),
        )
        .filter(F.col("sim") >= 0.999)
        .select("cid")
        .distinct()
        .collect()
    }
    got = {
        r["vec_id"]
        for r in semantic_decontaminate(emb, bench, threshold=0.999).collect()
    }
    assert got == truth and truth


def test_semantic_decontaminate_clean_benchmark_flags_nothing(spark):
    """Near-orthogonal synthetic vectors never reach dup-grade cosine:
    an UNperturbed disjoint benchmark yields an empty result."""
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.quality import (
        semantic_decontaminate,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    bench = emb.filter(F.col("vec_id") % 37 == 0).select(
        (F.col("vec_id") + 10**9).alias("vec_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 37 != 0)
    assert semantic_decontaminate(corpus, bench, threshold=0.999).isEmpty()


def test_semantic_decontaminate_benchmark_side_broadcasts(spark):
    """The 100 TB shape: the (multi-probed) benchmark side rides a
    broadcast hash join — the corpus is never shuffled for the pairing
    and never crosses |corpus|x|benchmark|."""
    from big_data_song_recommendation_spark.operators.quality import (
        semantic_decontaminate,
    )

    emb, bench = _decontam_fixture(spark)
    df = semantic_decontaminate(emb, bench, threshold=0.999)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_decontaminate_multiprobe_superset(spark):
    """Hamming-1 probing can only ADD candidates: the exact-bucket
    result is a subset of the multi-probed one."""
    from big_data_song_recommendation_spark.operators.quality import (
        semantic_decontaminate,
    )

    emb, bench = _decontam_fixture(spark)
    single = {
        (r["vec_id"], r["bench_id"])
        for r in semantic_decontaminate(
            emb, bench, threshold=0.999, multiprobe=False
        ).collect()
    }
    multi = {
        (r["vec_id"], r["bench_id"])
        for r in semantic_decontaminate(
            emb, bench, threshold=0.999, multiprobe=True
        ).collect()
    }
    assert single <= multi


def test_admission_two_tier_matches_composed(spark):
    """The r13 fused two-tier admission (one shingle pipeline per
    side; signatures from DISTINCT sets — min is dedup-invariant) must
    be row-identical to the composed near_dup_pairs_vs_corpus →
    admission_verify_exact path q172 used before."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    probes = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" appended tail note.")).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
    )
    cols = ["probe_id", "corpus_id", "est_jaccard_micro", "exact_jaccard_micro"]
    pairs = dedup.near_dup_pairs_vs_corpus(old, probes)
    composed = sorted(
        map(tuple, dedup.admission_verify_exact(old, probes, pairs).select(*cols).collect())
    )
    fused = sorted(
        map(tuple, dedup.admission_two_tier(old, probes).select(*cols).collect())
    )
    assert fused == composed
    assert len(fused) > 0
