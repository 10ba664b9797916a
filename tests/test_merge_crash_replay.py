"""Mid-merge crash windows (round 11, ADVICE r10 #1/#2): every
multi-table index merge writes its tables SEQUENTIALLY, so a crash can
leave the first table ahead of the guard table. The idempotent replay
must REPAIR that state — not duplicate the first table's rows (bands /
by_bucket / codes) and not leave derivable aggregates stale (BM25
terms/totals, which are rebuilt from postings on the replay path).

Each test constructs the exact crash state by swapping the partial
index's first-written table for the full corpus's (valid because
merged == rebuilt is bit-exact — pinned by the per-index merge tests),
then replays the merge with ``idempotent=True`` and asserts every
table equals the clean full rebuild, row for row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.sources.bucketing import write_bucketed
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR

SF001 = "/root/testdata/sf0.001"


def _rows(spark, table: str):
    return sorted(tuple(r) for r in spark.table(table).collect())


def _drop(spark, *table_dicts):
    for tables in table_dicts:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def _swap_in(spark, src_table: str, dst_table: str, key: str, n_buckets: int):
    """Make ``dst_table`` hold exactly ``src_table``'s rows under the
    same bucket spec — the crash state where the first append landed
    but everything after it did not."""
    rows = spark.table(src_table).localCheckpoint(eager=True)
    spark.sql(f"DROP TABLE {dst_table}")
    write_bucketed(rows, dst_table, key, n_buckets=n_buckets)


def test_bm25_replay_rebuilds_terms_and_totals_after_mid_merge_crash(spark):
    """ADVICE r10 #1 (medium): crash AFTER the postings append but
    BEFORE the terms/totals rebuild used to make the replay a no-op
    (the guard anti-join sees all delta ids in postings), leaving
    df/N/avgdl permanently behind the postings. The replay now
    rebuilds both aggregates from postings unconditionally."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        merge_bm25_index,
        build_bm25_index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    part = build_bm25_index(base, name="t_cr_bm25p", n_buckets=4)
    full = build_bm25_index(docs, name="t_cr_bm25f", n_buckets=4)
    try:
        # crash state: postings has the delta, terms/totals do not
        _swap_in(spark, full["postings"], part["postings"], "tok", 4)
        assert _rows(spark, part["terms"]) != _rows(spark, full["terms"])
        merge_bm25_index(delta, name="t_cr_bm25p", idempotent=True)
        for t in ("postings", "terms", "totals"):
            assert _rows(spark, part[t]) == _rows(spark, full[t]), t
    finally:
        _drop(spark, part, full)


def test_bm25_replay_repairs_totals_only_crash(spark):
    """The later window — crash between the terms swap and the totals
    swap — is repaired by the same replay rebuild."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        merge_bm25_index,
        build_bm25_index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    part = build_bm25_index(base, name="t_cr_bm25p2", n_buckets=4)
    full = build_bm25_index(docs, name="t_cr_bm25f2", n_buckets=4)
    try:
        _swap_in(spark, full["postings"], part["postings"], "tok", 4)
        spark.table(full["terms"]).localCheckpoint(eager=True).write.format(
            "parquet"
        ).mode("overwrite").saveAsTable("t_cr_bm25p2_terms_new")
        spark.sql(f"DROP TABLE {part['terms']}")
        spark.sql(
            f"ALTER TABLE t_cr_bm25p2_terms_new RENAME TO {part['terms']}"
        )
        merge_bm25_index(delta, name="t_cr_bm25p2", idempotent=True)
        for t in ("postings", "terms", "totals"):
            assert _rows(spark, part[t]) == _rows(spark, full[t]), t
    finally:
        _drop(spark, part, full)


def test_minhash_replay_does_not_duplicate_band_rows(spark):
    """ADVICE r10 #2: crash between the bands append and the sigs
    append — the guard (sigs, LAST-written) passes the whole delta
    through, and without the per-table reconcile the bands rows would
    double, double-reporting every candidate pair."""
    from big_data_song_recommendation_spark.operators.dedup import (
        build_minhash_index,
        merge_minhash_index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    part = build_minhash_index(base, name="t_cr_mh", n_buckets=4)
    full = build_minhash_index(docs, name="t_cr_mhf", n_buckets=4)
    try:
        _swap_in(spark, full["bands"], part["bands"], "key", 4)
        merge_minhash_index(delta, name="t_cr_mh", idempotent=True)
        for t in ("bands", "sigs"):
            assert _rows(spark, part[t]) == _rows(spark, full[t]), t
    finally:
        _drop(spark, part, full)


def test_srp_replay_does_not_duplicate_bucket_rows(spark):
    """Crash between the by_bucket and by_id appends: replay must not
    re-append by_bucket (duplicate ANN candidates)."""
    from big_data_song_recommendation_spark.operators.similarity import (
        build_srp_index,
        merge_srp_index,
    )

    emb = load_table(spark, SF001, "embeddings")
    base = emb.filter("vec_id % 4 != 0")
    delta = emb.filter("vec_id % 4 = 0")
    part = build_srp_index(base, name="t_cr_srp", n_buckets=4)
    full = build_srp_index(emb, name="t_cr_srpf", n_buckets=4)
    try:
        _swap_in(spark, full["by_bucket"], part["by_bucket"], "bucket", 4)
        merge_srp_index(delta, name="t_cr_srp", idempotent=True)
        for t in ("by_bucket", "by_id"):
            assert _rows(spark, part[t]) == _rows(spark, full[t]), t
    finally:
        _drop(spark, part, full)


def test_ivfpq_replay_does_not_duplicate_code_rows(spark):
    """Crash between the codes and by_id appends: without the
    per-table reconcile the replayed codes pass the ADC/rerank windows
    as repeated neighbor_id rows in top-k."""
    from big_data_song_recommendation_spark.operators.similarity import (
        build_ivfpq_index,
        merge_ivfpq_index,
    )

    emb = load_table(spark, SF001, "embeddings")
    base = emb.filter("vec_id % 4 != 0")
    delta = emb.filter("vec_id % 4 = 0")
    part = build_ivfpq_index(base, name="t_cr_ivfpq", n_buckets=4)
    full = build_ivfpq_index(emb, name="t_cr_ivfpqf", n_buckets=4)
    try:
        _swap_in(spark, full["codes"], part["codes"], "cluster", 4)
        merge_ivfpq_index(delta, name="t_cr_ivfpq", idempotent=True)
        for t in ("codes", "by_id"):
            assert _rows(spark, part[t]) == _rows(spark, full[t]), t
    finally:
        _drop(spark, part, full)


def test_ivfpq_indexed_raises_on_missing_probe_ids(spark):
    """ADVICE r10 #3: a typo'd or unmerged probe id must fail loudly,
    not serve an empty result."""
    from big_data_song_recommendation_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
    )

    emb = load_table(spark, SF001, "embeddings").limit(40)
    tables = build_ivfpq_index(emb, name="t_cr_ivfpq_m", n_buckets=4)
    try:
        ok = [r.vec_id for r in emb.select("vec_id").limit(2).collect()]
        with pytest.raises(ValueError, match="probe ids not in"):
            ivfpq_topk_indexed(
                spark, ok + [10**12], name="t_cr_ivfpq_m", k=2
            )
    finally:
        _drop(spark, tables)
