"""Streaming curation end-to-end (VERDICT r4 #10): file-discovery
source → quality filter → dedup-against-persistent-store → sharded
export, driven through a real Structured Streaming query with
micro-batch-per-file, plus the foreachBatch retry (idempotency)
contract exercised directly."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from big_data_song_recommendation_spark.streaming import jobs

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

GOOD_A = "the quick brown fox jumps over the lazy dog near the river bank today"
GOOD_B = "a completely different document with plenty of ordinary readable words in it"
GOOD_C = "yet another clean document about data pipelines and their many moving parts"
JUNK = "x!!! @@@@ ###"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_curation_end_to_end(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: one junk doc, one within-batch dup pair, one unique
    _write_batch(
        spark,
        in_dir,
        [(1, GOOD_A, "en"), (2, GOOD_A, "en"), (3, GOOD_B, "en"), (4, JUNK, "en")],
    )

    sink = jobs.CurationSink(out_dir, quality_threshold=0.5, n_shards=2)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", ckpt
    ).start()
    try:
        q.processAllAvailable()

        # batch 2: replays batch-1 content (must be dup_store) + new doc
        _write_batch(spark, in_dir, [(5, GOOD_A, "en"), (6, GOOD_C, "en")])
        q.processAllAvailable()
    finally:
        q.stop()

    audits = sorted((tmp_path / "out" / "audit").glob("batch_*.json"))
    assert len(audits) == 2
    a0, a1 = (json.loads(p.read_text()) for p in audits)
    assert a0["n_accepted"] == 2 and a0["n_dup_batch"] == 1
    assert a0["n_quality_fail"] == 1
    assert a1["n_dup_store"] == 1 and a1["n_accepted"] == 1

    lake = spark.read.parquet(f"{out_dir}/data/epoch=*")
    assert set(r.doc_id for r in lake.collect()) == {1, 3, 6}
    # store holds exactly the accepted distinct fingerprints
    store = spark.read.parquet(f"{out_dir}/store")
    assert store.distinct().count() == 3


def test_curation_sink_epoch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch can re-deliver an epoch after failure: a second
    call with the same epoch must NOT mark its own rows dup_store or
    change any output."""
    out_dir = str(tmp_path / "out")
    sink = jobs.CurationSink(out_dir, n_shards=1)
    batch = spark.createDataFrame(
        [(1, GOOD_A, "en"), (2, GOOD_B, "en")], SCHEMA
    )
    sink(batch, 0)
    first = json.loads((tmp_path / "out" / "audit" / "batch_000000.json").read_text())
    sink(batch, 0)  # retry of the SAME epoch
    retry = json.loads((tmp_path / "out" / "audit" / "batch_000000.json").read_text())
    assert first == retry == {
        "epoch": 0, "n_in": 2, "n_quality_fail": 0,
        "n_dup_store": 0, "n_dup_batch": 0, "n_accepted": 2,
    }
    # a LATER epoch replaying the content is rejected against the store
    sink(spark.createDataFrame([(9, GOOD_A, "en")], SCHEMA), 1)
    a1 = json.loads((tmp_path / "out" / "audit" / "batch_000001.json").read_text())
    assert a1["n_dup_store"] == 1 and a1["n_accepted"] == 0
