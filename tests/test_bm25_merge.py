"""Incremental BM25 index maintenance (operators/retrieval.py
merge_bm25_index): insert-only merge == full rebuild, exactly; bucket
pruning survives the append; id-overlap and missing-index failure
modes are loud."""

import re

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_indexed,
    build_bm25_index,
    merge_bm25_index,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR

TERM_SETS = (["dup", "key", "vector"], ["dup"], ["the", "spark", "zebra"])


def _drop(spark, tables):
    for t in tables.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture(scope="module")
def merged_index(spark):
    docs = load_table(spark, SF_DIR, "documents")
    initial = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    tables = build_bm25_index(initial, name="t_bm25m", n_buckets=4)
    merge_bm25_index(delta, name="t_bm25m")
    rebuilt = build_bm25_index(docs, name="t_bm25r", n_buckets=4)
    yield docs
    _drop(spark, tables)
    _drop(spark, rebuilt)


def test_merge_equals_full_rebuild_and_scan(spark, merged_index):
    """Every quantity the scorer reads is additive over disjoint doc
    sets, so the merged index must return the EXACT rows of (a) an
    index rebuilt on the union corpus and (b) the per-query scan."""
    docs = merged_index
    for terms in TERM_SETS:
        got = [
            tuple(r)
            for r in bm25_topk_indexed(spark, terms, name="t_bm25m", k=10).collect()
        ]
        rebuilt = [
            tuple(r)
            for r in bm25_topk_indexed(spark, terms, name="t_bm25r", k=10).collect()
        ]
        scan = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
        assert got == rebuilt == scan, terms
        assert len(got) > 0 or terms == ["the", "spark", "zebra"]


def test_merged_plan_still_prunes_buckets(spark, merged_index):
    q = bm25_topk_indexed(spark, ["dup"], name="t_bm25m", k=10)
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan


def test_overlapping_ids_rejected(spark, merged_index):
    docs = merged_index
    with pytest.raises(ValueError, match="already indexed"):
        merge_bm25_index(docs.limit(5), name="t_bm25m")


def test_missing_index_rejected(spark):
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="missing"):
        merge_bm25_index(docs, name="t_no_such_index")


def test_totals_and_terms_are_exact_sums(spark, merged_index):
    """The staged-swap terms/totals must equal the rebuild's tables
    row-for-row (df per token, one totals row)."""
    mt = {
        r["tok"]: r["df"] for r in spark.table("t_bm25m_terms").collect()
    }
    rt = {
        r["tok"]: r["df"] for r in spark.table("t_bm25r_terms").collect()
    }
    assert mt == rt
    assert [tuple(r) for r in spark.table("t_bm25m_totals").collect()] == [
        tuple(r) for r in spark.table("t_bm25r_totals").collect()
    ]


def test_idempotent_merge_replay_inserts_nothing_twice(spark):
    """Round-10 replay contract (the CurationSink intent-marker
    reconcile): re-merging the same delta with idempotent=True leaves
    postings/terms/totals identical; a partial overlap folds in only
    the genuinely new ids."""
    docs = load_table(spark, SF_DIR, "documents")
    initial = docs.filter(F.col("doc_id") % 3 == 1)
    d1 = docs.filter(F.col("doc_id") % 3 == 2)
    tables = build_bm25_index(initial, name="t_bm25i", n_buckets=4)
    try:
        merge_bm25_index(d1, name="t_bm25i", check_new_ids=False)
        snap = {
            t: sorted(tuple(r) for r in spark.table(n).collect())
            for t, n in tables.items()
        }
        merge_bm25_index(d1, name="t_bm25i", idempotent=True)
        for t, n in tables.items():
            assert sorted(tuple(r) for r in spark.table(n).collect()) == snap[t], t
        d2 = docs.filter(F.col("doc_id") % 3 != 1)  # d1 ∪ the rest
        merge_bm25_index(d2, name="t_bm25i", idempotent=True)
        ids = {r[0] for r in spark.table(tables["postings"]).select("doc_id").distinct().collect()}
        assert ids == {r[0] for r in docs.select("doc_id").collect()}
    finally:
        _drop(spark, tables)
