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
        "n_dup_store": 0, "n_dup_batch": 0, "n_near_dup_index": 0,
        "n_accepted": 2, "indexed": False, "mh_indexed": False,
    }
    # a LATER epoch replaying the content is rejected against the store
    sink(spark.createDataFrame([(9, GOOD_A, "en")], SCHEMA), 1)
    a1 = json.loads((tmp_path / "out" / "audit" / "batch_000001.json").read_text())
    assert a1["n_dup_store"] == 1 and a1["n_accepted"] == 0


def test_curation_sink_maintains_bm25_index(spark, tmp_path):
    """Streaming retrieval-index maintenance: each epoch's accepted
    docs merge into a persisted BM25 layout; the merged index equals
    a rebuild over initial+accepted corpus; an epoch REPLAY skips the
    merge (marker files), so postings never double."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
    )

    out_dir = str(tmp_path / "out")
    initial = spark.createDataFrame([(100, GOOD_C, "en")], SCHEMA)
    tables = build_bm25_index(
        initial.select("doc_id", "text"), name="t_cur_idx", n_buckets=2
    )
    try:
        sink = jobs.CurationSink(out_dir, n_shards=1, bm25_index="t_cur_idx")
        batch = spark.createDataFrame(
            [(1, GOOD_A, "en"), (2, GOOD_B, "en"), (3, JUNK, "en")], SCHEMA
        )
        sink(batch, 0)
        audit = json.loads(
            (tmp_path / "out" / "audit" / "batch_000000.json").read_text()
        )
        assert audit["indexed"] is True and audit["n_accepted"] == 2
        terms_before = {
            r["tok"]: r["df"] for r in spark.table("t_cur_idx_terms").collect()
        }
        sink(batch, 0)  # epoch replay: merge must be SKIPPED
        replay = json.loads(
            (tmp_path / "out" / "audit" / "batch_000000.json").read_text()
        )
        assert replay["indexed"] is False
        terms_after = {
            r["tok"]: r["df"] for r in spark.table("t_cur_idx_terms").collect()
        }
        assert terms_before == terms_after
        # merged index == rebuild over initial + the accepted docs
        union = initial.select("doc_id", "text").unionByName(
            spark.createDataFrame(
                [(1, GOOD_A), (2, GOOD_B)], "doc_id long, text string"
            )
        )
        rebuilt = build_bm25_index(union, name="t_cur_ref", n_buckets=2)
        try:
            for terms in (["the", "fox"], ["document"], ["data"]):
                got = [
                    tuple(r)
                    for r in bm25_topk_indexed(
                        spark, terms, name="t_cur_idx", k=5
                    ).collect()
                ]
                want = [
                    tuple(r)
                    for r in bm25_topk_indexed(
                        spark, terms, name="t_cur_ref", k=5
                    ).collect()
                ]
                assert got == want, terms
        finally:
            for t in rebuilt.values():
                spark.sql(f"DROP TABLE IF EXISTS {t}")
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# -- round-8: crawl front door plugged into the streaming sink --------------

HTML_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("html", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def _page(*, chrome: str, lines: list[str]) -> str:
    body = "".join(f"<p>{ln}.</p>" for ln in lines)
    return (
        f"<html><head><script>var x = 1;</script></head><body>"
        f"<nav>{chrome}</nav><article>{body}</article>"
        f"<footer>(c) corp</footer></body></html>"
    )


def test_streaming_curation_with_crawl_front_door(spark, tmp_path):
    """HTML in, curated clean text out: extraction + C4 cleaning +
    canonical-URL dedup run INSIDE the streaming sink, and the content
    fingerprint store keys on the CLEANED text — mirror pages with
    different chrome/URL params still collapse to one admission."""
    from big_data_song_recommendation_spark.operators.quality import (
        crawl_front_door,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [
        # the original
        (1, _page(chrome="Home | About", lines=[GOOD_A, GOOD_B]),
         "HTTPS://WWW.Example.com:443/a?utm_source=x&id=1"),
        # same CONTENT, different chrome and different url -> extraction
        # removes the chrome, so the content fingerprint collapses them
        (2, _page(chrome="totally different nav", lines=[GOOD_A, GOOD_B]),
         "https://mirror.example.org/copy"),
        # different content but the SAME canonical url as doc 1 ->
        # within-batch canonical-url dedup drops it before fp dedup
        (3, _page(chrome="Home", lines=[GOOD_C, GOOD_B]),
         "https://example.com/a?id=1"),
        # boilerplate-only page: every line fails C4 -> dropped at the gate
        (4, _page(chrome="Home", lines=["short", "no punct here at all x"[:-1]]),
         "https://example.com/junk"),
    ]
    spark.createDataFrame(rows1, HTML_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    sink = jobs.CurationSink(
        out_dir,
        quality_threshold=0.5,
        n_shards=2,
        preprocess=lambda df: crawl_front_door(df, url_col="url"),
    )
    stream = (
        spark.readStream.schema(HTML_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", ckpt
    ).start()
    try:
        q.processAllAvailable()
        # batch 2: replay of doc-1 content under a fresh url (must be
        # dup_store) plus one genuinely new page (must be accepted)
        rows2 = [
            (5, _page(chrome="other", lines=[GOOD_A, GOOD_B]),
             "https://elsewhere.example.net/replay"),
            (6, _page(chrome="Home", lines=[GOOD_C, GOOD_B]),
             "https://example.com/fresh"),
        ]
        spark.createDataFrame(rows2, HTML_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    audits = sorted((tmp_path / "out" / "audit").glob("batch_*.json"))
    assert len(audits) == 2
    a0, a1 = (json.loads(p.read_text()) for p in audits)
    # batch 1: doc 3 (url dup) + doc 4 (C4 gate) leave before the fp
    # store; docs 1+2 collapse to one admission via the cleaned-text fp
    assert a0["n_in"] == 4
    assert a0["n_accepted"] == 1 and a0["n_dup_batch"] == 1
    assert a0["n_quality_fail"] == 2
    # batch 2: the replay is a store dup, the new page is accepted
    assert a1["n_dup_store"] == 1 and a1["n_accepted"] == 1

    import pyspark.sql.functions as F  # noqa: N812

    data = spark.read.parquet(str(tmp_path / "out" / "data" / "epoch=0"))
    row = data.filter(F.col("doc_id") == 1).collect()[0]
    # accepted rows carry the CLEANED extraction, not the raw html
    assert row["text"] == f"{GOOD_A}.\n{GOOD_B}."
    assert row["canonical_url"] == "https://example.com/a?id=1"


def test_curation_sink_near_dup_admission_gate(spark, tmp_path):
    """minhash_index=: exact mirrors of INDEXED content (content-new to
    the fingerprint store) are rejected at admission, survivors merge
    into the index, and an epoch replay reloads the persisted verdict
    instead of re-probing (the index would self-match by then)."""
    import json as _json

    from big_data_song_recommendation_spark.operators.dedup import (
        build_minhash_index,
        near_dup_probe,
    )

    out_dir = str(tmp_path / "out")
    seed = spark.createDataFrame(
        [(100, GOOD_A, "en"), (101, GOOD_B, "en")], SCHEMA
    )
    try:
        build_minhash_index(
            seed.select("doc_id", "text"),
            num_hashes=16,
            bands=8,
            name="t_cur_mh",
            n_buckets=2,
        )
        sink = jobs.CurationSink(out_dir, n_shards=1, minhash_index="t_cur_mh")
        batch = spark.createDataFrame([(1, GOOD_A, "en"), (2, GOOD_C, "en")], SCHEMA)
        sink(batch, 0)
        audit = _json.loads(
            (tmp_path / "out" / "audit" / "batch_000000.json").read_text()
        )
        assert audit["n_near_dup_index"] == 1
        assert audit["n_accepted"] == 1 and audit["mh_indexed"] is True
        lake = spark.read.parquet(f"{out_dir}/data/epoch=*")
        assert set(r.doc_id for r in lake.collect()) == {2}
        # the admitted doc entered the index: a future mirror is caught
        mirror = spark.createDataFrame([(9, GOOD_C, "en")], SCHEMA)
        got = near_dup_probe(mirror.select("doc_id", "text"), name="t_cur_mh")
        assert {(r.corpus_id, r.est_jaccard_micro) for r in got.collect()} == {
            (2, 1_000_000)
        }
        # replay of epoch 0: same verdicts from the persisted set, no
        # double-merge (marker), no self-match rejection of doc 2
        sink(batch, 0)
        replay = _json.loads(
            (tmp_path / "out" / "audit" / "batch_000000.json").read_text()
        )
        assert replay["n_near_dup_index"] == 1 and replay["n_accepted"] == 1
        assert replay["mh_indexed"] is False
        assert spark.table("t_cur_mh_sigs").filter("doc_id = 2").count() == 1
        lake2 = spark.read.parquet(f"{out_dir}/data/epoch=*")
        assert set(r.doc_id for r in lake2.collect()) == {2}
    finally:
        for s in ("bands", "sigs", "meta"):
            spark.sql(f"DROP TABLE IF EXISTS t_cur_mh_{s}")


def test_curation_sink_crash_replay_reconciles_merge(spark, tmp_path):
    """Round-10 crash window: a failure between an epoch's index merge
    and its commit marker leaves the INTENT marker behind; the replay
    must re-run the merge in idempotent mode (already-indexed ids
    anti-joined out) instead of double-appending postings — the
    ADVICE-r9 scenario, end to end through the sink."""
    from big_data_song_recommendation_spark.operators.retrieval import (
        build_bm25_index,
    )

    out_dir = str(tmp_path / "out")
    initial = spark.createDataFrame([(100, GOOD_C, "en")], SCHEMA)
    tables = build_bm25_index(
        initial.select("doc_id", "text"), name="t_cur_crash", n_buckets=2
    )
    try:
        sink = jobs.CurationSink(out_dir, n_shards=1, bm25_index="t_cur_crash")
        batch = spark.createDataFrame(
            [(1, GOOD_A, "en"), (2, GOOD_B, "en")], SCHEMA
        )
        sink(batch, 0)
        snap = sorted(
            tuple(r) for r in spark.table("t_cur_crash_postings").collect()
        )
        # simulate the crash: commit marker gone, intent left behind
        marker_dir = tmp_path / "out" / "index_epochs"
        (marker_dir / "epoch=0").unlink()
        (marker_dir / "epoch=0.intent").write_text("merging")
        sink(batch, 0)  # replay takes the idempotent reconcile path
        replay = json.loads(
            (tmp_path / "out" / "audit" / "batch_000000.json").read_text()
        )
        assert replay["indexed"] is True  # merge ran (reconcile mode)
        assert (marker_dir / "epoch=0").exists()
        assert not (marker_dir / "epoch=0.intent").exists()
        assert (
            sorted(
                tuple(r) for r in spark.table("t_cur_crash_postings").collect()
            )
            == snap
        )  # nothing double-inserted
    finally:
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
