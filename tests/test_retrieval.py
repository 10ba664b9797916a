"""BM25 retrieval operator semantics (operators/retrieval.py)."""

import pytest

from big_data_song_recommendation_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rare_term_outranks_common(spark):
    """idf: a doc matching the rare term beats a doc matching only
    the ubiquitous one, even at equal tf."""
    rows = [(i, "common word filler text here") for i in range(20)]
    rows.append((100, "common needle word filler here"))  # rare hit
    rows.append((101, "common common word filler here"))  # tf=2 common
    out = bm25_topk(_docs(spark, rows), ["needle", "common"], k=3).collect()
    assert out[0]["doc_id"] == 100
    assert out[0]["n_terms_hit"] == 2


def test_length_normalization_penalizes_long_docs(spark):
    """b=0.75: same tf, the shorter doc scores higher."""
    rows = [
        (1, "needle short doc"),
        (2, "needle " + " ".join(["pad"] * 60)),
        (3, "no match at all"),
        (4, "other words entirely"),
    ]
    out = {r["doc_id"]: r["score"] for r in
           bm25_topk(_docs(spark, rows), ["needle"], k=4).collect()}
    assert out[1] > out[2] > 0
    assert 3 not in out or out.get(3) == 0


def test_tf_saturates(spark):
    """k1=1.2: doubling tf must raise the score by LESS than 2x
    (the saturation BM25 adds over raw TF-IDF)."""
    rows = [
        (1, "needle pad pad pad pad pad pad pad"),
        (2, "needle needle pad pad pad pad pad pad"),
        (3, "filler text"),
    ] + [(10 + i, "pad filler") for i in range(10)]
    out = {r["doc_id"]: r["score"] for r in
           bm25_topk(_docs(spark, rows), ["needle"], k=5).collect()}
    assert out[1] < out[2] < 2 * out[1]


def test_only_matching_docs_return(spark):
    rows = [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha alpha")]
    out = bm25_topk(_docs(spark, rows), ["alpha"], k=10).collect()
    assert {r["doc_id"] for r in out} == {1, 3}
    assert [r["rank"] for r in sorted(out, key=lambda r: r["doc_id"])] == [
        2,
        1,
    ]  # doc 3 has tf=2 in a same-length doc -> rank 1


def test_query_terms_dedupe_and_lowercase(spark):
    rows = [(1, "alpha beta"), (2, "beta gamma")]
    a = bm25_topk(_docs(spark, rows), ["Alpha", "alpha"], k=5).collect()
    b = bm25_topk(_docs(spark, rows), ["alpha"], k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "x")]), [])


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_only_ranks_matter(spark):
    """Fusion must be invariant to the retrievers' score scales —
    feeding the same ranks twice doubles every contribution and
    cannot reorder."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        rrf_fuse,
    )

    a = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
    out = rrf_fuse([("x", a), ("y", a)], id_col="doc_id", top=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert all(
        r["rrf_micro"] == 2 * (1_000_000_000 // (60 + r["fused_rank"]))
        for r in out
    )


def test_rrf_single_list_membership_is_null_ranked(spark):
    from big_data_song_recommendation_spark.operators.retrieval import (
        rrf_fuse,
    )

    a = _ranking(spark, [(1, 1), (2, 2)])
    b = _ranking(spark, [(2, 1), (9, 2)])
    got = {
        r["doc_id"]: (r["a_rank"], r["b_rank"], r["rrf_micro"])
        for r in rrf_fuse(
            [("a", a), ("b", b)], id_col="doc_id", top=10
        ).collect()
    }
    assert got[2] == (2, 1, 1_000_000_000 // 62 + 1_000_000_000 // 61)
    assert got[1] == (1, None, 1_000_000_000 // 61)
    assert got[9] == (None, 2, 1_000_000_000 // 62)
    # consensus doc 2 must outrank either single-list doc
    fused = {r["doc_id"]: r["fused_rank"] for r in rrf_fuse(
        [("a", a), ("b", b)], id_col="doc_id", top=10).collect()}
    assert fused[2] == 1


def test_rrf_top_bound_and_tie_break(spark):
    from big_data_song_recommendation_spark.operators.retrieval import (
        rrf_fuse,
    )

    a = _ranking(spark, [(i, i) for i in range(1, 30)])
    out = rrf_fuse([("a", a)], id_col="doc_id", top=5).collect()
    assert len(out) == 5
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4, 5]


# -- postings-index serving layout (round-8) --------------------------------

@pytest.fixture(scope="module")
def bm25_index(spark):
    from big_data_song_recommendation_spark.operators.retrieval import (
        build_bm25_index,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    tables = build_bm25_index(docs, name="t_bm25", n_buckets=4)
    yield docs, tables
    for t in tables.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_indexed_matches_scan_form(spark, bm25_index):
    """The postings-backed server must return the EXACT rows (ids,
    ranks, scores, term hits) of the per-query corpus scan — shared
    scoring tail + global df == query-restricted df."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
    )

    docs, _ = bm25_index
    for terms in (["dup", "key", "vector"], ["dup"], ["the", "zebra"]):
        want = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
        got = [
            tuple(r)
            for r in bm25_topk_indexed(
                spark, terms, name="t_bm25", k=10
            ).collect()
        ]
        assert got == want, terms


def test_indexed_plan_prunes_buckets_and_never_tokenizes(spark, bm25_index):
    """The serving plan must read selected BUCKETS of the postings
    table (bucket pruning on the tok filter) and contain no Generate
    (explode/tokenize) node — per-query IO is the terms' postings,
    not a corpus re-tokenization."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk_indexed,
    )

    q = bm25_topk_indexed(spark, ["dup"], name="t_bm25", k=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"no bucket pruning in plan:\n{plan}"
    assert int(m.group(1)) < int(m.group(2)), m.group(0)


def test_batch_indexed_matches_single_query_form(spark, bm25_index):
    """bm25_topk_indexed_many must return, per query id, the EXACT
    rows of the single-query indexed form — shared _s_int_expr
    contribution and tie-break."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk_indexed,
        bm25_topk_indexed_many,
    )

    qs = {
        "a": ["dup", "key", "vector"],
        "b": ["dup"],
        "c": ["the", "zebra"],
    }
    rows = bm25_topk_indexed_many(spark, qs, name="t_bm25", k=10).collect()
    got: dict = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["score"], r["n_terms_hit"])
        )
    for qid, terms in qs.items():
        want = [
            (r["doc_id"], r["rank"], r["score"], r["n_terms_hit"])
            for r in bm25_topk_indexed(
                spark, terms, name="t_bm25", k=10
            ).collect()
        ]
        assert sorted(got.get(qid, []), key=lambda x: x[1]) == want, qid


def test_batch_indexed_rejects_bad_input(spark, bm25_index):
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk_indexed_many,
    )

    with pytest.raises(ValueError):
        bm25_topk_indexed_many(spark, {}, name="t_bm25")
    with pytest.raises(ValueError):
        bm25_topk_indexed_many(spark, {"a": []}, name="t_bm25")


def test_index_empty_query_raises(spark):
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk_indexed,
    )

    with pytest.raises(ValueError):
        bm25_topk_indexed(spark, [], name="t_bm25")
