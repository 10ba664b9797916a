"""compact_bucketed_table: after N incremental merges a bucketed index
is N files per bucket — the compactor must rewrite to one file per
bucket, preserve rows/spec/pruning bit-exactly, and refuse
non-bucketed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators.dedup import (
    build_minhash_index,
    merge_minhash_index,
    near_dup_probe,
)
from big_data_song_recommendation_spark.sources.bucketing import (
    compact_bucketed_table,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


@pytest.fixture()
def fragmented_index(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    build_minhash_index(
        docs.filter(F.col("doc_id") % 4 == 0),
        num_hashes=16,
        bands=8,
        name="t_cpt",
        n_buckets=4,
    )
    for rem in (1, 2, 3):
        merge_minhash_index(
            docs.filter(F.col("doc_id") % 4 == rem), name="t_cpt"
        )
    yield docs
    for s in ("bands", "sigs", "meta"):
        spark.sql(f"DROP TABLE IF EXISTS t_cpt_{s}")
        spark.sql(f"DROP TABLE IF EXISTS t_cpt_{s}_compact_stage")


def test_compaction_preserves_rows_spec_and_pruning(spark, fragmented_index):
    docs = fragmented_index
    probes = docs.limit(5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    before_rows = sorted(
        tuple(r) for r in spark.table("t_cpt_bands").collect()
    )
    before_probe = sorted(
        tuple(r) for r in near_dup_probe(probes, name="t_cpt").collect()
    )
    stats = compact_bucketed_table(spark, "t_cpt_bands")
    # 1 build + 3 merges = 4 file sets; compacted to one per bucket
    assert stats["files_before"] > stats["n_buckets"]
    assert stats["files_after"] == stats["n_buckets"] == 4
    after_rows = sorted(
        tuple(r) for r in spark.table("t_cpt_bands").collect()
    )
    assert after_rows == before_rows
    after = near_dup_probe(probes, name="t_cpt")
    assert sorted(tuple(r) for r in after.collect()) == before_probe
    plan = after._jdf.queryExecution().executedPlan().toString()
    bands_scan = next(
        line for line in plan.splitlines()
        if "FileScan" in line and "t_cpt_bands" in line
    )
    assert "Bucketed: true" in bands_scan, bands_scan
    assert "SelectedBucketsCount" in bands_scan, bands_scan


def test_compaction_refuses_unbucketed(spark, tmp_path):
    spark.range(10).write.mode("overwrite").saveAsTable("t_cpt_plain")
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            compact_bucketed_table(spark, "t_cpt_plain")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cpt_plain")


def test_compaction_on_bm25_postings(spark):
    """The retrieval index's postings table (bucketed AND sorted by
    tok) must compact to one file per bucket with served top-k
    unchanged — the triad's third member under the same pass."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
        merge_bm25_index,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    tables = build_bm25_index(
        docs.filter(F.col("doc_id") % 2 == 0), name="t_cpt_bm", n_buckets=4
    )
    try:
        merge_bm25_index(
            docs.filter(F.col("doc_id") % 2 == 1), name="t_cpt_bm"
        )
        before = [
            tuple(r)
            for r in bm25_topk_indexed(
                spark, ["data", "the"], name="t_cpt_bm", k=5
            ).collect()
        ]
        stats = compact_bucketed_table(spark, "t_cpt_bm_postings")
        assert stats["files_after"] == 4 < stats["files_before"]
        after = [
            tuple(r)
            for r in bm25_topk_indexed(
                spark, ["data", "the"], name="t_cpt_bm", k=5
            ).collect()
        ]
        assert after == before and len(after) > 0
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql("DROP TABLE IF EXISTS t_cpt_bm_postings_compact_stage")
