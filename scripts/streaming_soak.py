"""Streaming curation soak (VERDICT r6 #8 stretch): drive CurationSink
with a real Structured Streaming ``rate`` source for minutes at a few
thousand docs/s and verify the forever-ingest properties the unit
tests can't see:

- **store-dedup flatness**: the synthetic corpus cycles through a
  fixed pool of ``--pool`` distinct texts, so once the pool is
  exhausted every later batch must be rejected by the persistent
  fingerprint store — accepted-per-epoch drops to ~0 and the distinct
  store size plateaus at exactly the pool size;
- **no state growth**: persistent-RDD count and driver heap are
  sampled per epoch; the sink must unpersist its scratch blocks
  (finally-block discipline) so the session ends as flat as it began.

Run: python scripts/streaming_soak.py [--secs 600] [--rate 5000]
                                      [--pool 20000]
Prints one JSON line (soak report) and exits nonzero on any violation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_song_recommendation_spark.session import get_spark  # noqa: E402
from big_data_song_recommendation_spark.streaming.jobs import (  # noqa: E402
    CurationSink,
)

# ≥50 tokens, stopword-rich, punctuation-light → quality_score ≥ 0.5,
# so the dedup store (not the quality gate) decides every verdict
_FILLER = (
    "the quick brown fox jumps over the lazy dog and then it runs to "
    "the river where the water is cold and the stones are smooth and "
    "the evening light settles on the far bank while the birds call "
    "softly from the reeds and the wind moves through the tall grass "
)


def _q170_style_mojibake(text: str) -> str:
    """UTF-8 bytes misread as cp1252 — the q170 generator, so the
    front door's repair stage has real work on every kind-3 doc."""
    from big_data_song_recommendation_spark.functions.text import (
        _cp1252_or_latin1,
    )

    return "".join(_cp1252_or_latin1(b) for b in text.encode("utf-8"))


def _interleaved_text(marker):
    """_FILLER with ``marker`` inserted after every 2nd word: every
    3-token shingle contains the marker, so texts with different
    markers share zero shingles (the salted-replica trick), while the
    stopword-rich filler keeps quality_score above the sink's gate."""
    words = _FILLER.split()
    parts, lit_run = [], []
    for i, w in enumerate(words):
        lit_run.append(w)
        if i % 2 == 1:
            parts.append(F.lit(" ".join(lit_run) + " "))
            parts.append(marker)
            parts.append(F.lit(" "))
            lit_run = []
    if lit_run:
        parts.append(F.lit(" ".join(lit_run)))
    return F.concat(*parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=600)
    ap.add_argument("--rate", type=int, default=5000)
    ap.add_argument("--pool", type=int, default=20000)
    ap.add_argument("--trigger", default="2 seconds")
    ap.add_argument(
        "--minhash",
        action="store_true",
        help="seed a MinHash index with a SEED text pool and gate the "
        "stream on it: half the stream are exact copies of seed texts "
        "(fingerprint-NEW, so only the near-dup gate can reject them - "
        "deterministically, est 1.0 at threshold 1.0); the index is "
        "merged incrementally every epoch with the accepted docs",
    )
    ap.add_argument(
        "--frontdoor",
        action="store_true",
        help="run the q176 CCNet stage order (blocklist -> mojibake "
        "repair -> extract -> C4 -> line dedup -> canonical-URL dedup "
        "-> trigram-LM gate) as the sink's preprocess stage, with the "
        "per-stage audit (front_door_audit) accumulated per epoch and "
        "verified to account every input row",
    )
    args = ap.parse_args()

    spark = get_spark("curation-soak", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    jvm_rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()

    samples: list[dict] = []

    def _sample(tag: str) -> dict:
        s = {
            "tag": tag,
            "t": round(time.time() - t_start, 1),
            "persistent_rdds": int(
                spark.sparkContext._jsc.getPersistentRDDs().size()
            ),
            "driver_heap_mb": round(
                (jvm_rt.totalMemory() - jvm_rt.freeMemory()) / 1e6
            ),
        }
        samples.append(s)
        return s

    with tempfile.TemporaryDirectory() as d:
        out_dir = os.path.join(d, "curated")
        sink_kw = {}
        if args.minhash:
            from big_data_song_recommendation_spark.operators.dedup import (
                build_minhash_index,
            )

            # pre-clean any stale tables/locations from a killed run
            import shutil

            for t in ("bands", "sigs", "meta"):
                spark.sql(f"DROP TABLE IF EXISTS soak_mh_{t}")
                shutil.rmtree(
                    os.path.join("spark-warehouse", f"soak_mh_{t}"),
                    ignore_errors=True,
                )
            seeds = spark.range(args.pool).select(
                (F.col("id") + 1_000_000_000).alias("doc_id"),
                _interleaved_text(
                    F.concat(F.lit("s"), F.col("id").cast("string"))
                ).alias("text"),
            )
            build_minhash_index(seeds, name="soak_mh", n_buckets=8)
            sink_kw = dict(
                minhash_index="soak_mh",
                near_dup_threshold_micro=1_000_000,
            )
        fd_cfg = None
        fd_stage_counts: dict[str, int] = {}
        fd_epoch_fails: list[str] = []
        if args.frontdoor:
            # pool % 10 == 0 makes kind a pure function of the marker
            # (value % 10 == (value % pool) % 10), so the accepted
            # text pool is a fixed SUBSET of the marker pool and the
            # store-flatness pins apply unchanged
            assert args.pool % 10 == 0, "--frontdoor needs pool % 10 == 0"
            from big_data_song_recommendation_spark.operators.quality import (
                FrontDoorConfig,
                crawl_front_door_configured,
                front_door_audit,
            )

            fd_cfg = FrontDoorConfig(
                url_col="url",
                blocked_domains=("blocked.test",),
                fix_encoding=True,
                dedup_lines=True,
                lm_buckets=("head", "middle"),
                cut_lineage=False,  # forever-process: no pinned blocks
            )
            # the cleaned text is vocab-poor for the heuristic quality
            # gate (the LM gate IS the quality stage here), so the
            # sink's own text gate is opened wide
            sink_kw = dict(
                preprocess=lambda df: crawl_front_door_configured(
                    df, fd_cfg
                ).select("doc_id", "text"),
                quality_threshold=0.0,
            )
        sink = CurationSink(out_dir, n_shards=4, **sink_kw)

        def batch_fn(df, epoch_id):
            if args.frontdoor and not df.isEmpty():
                from big_data_song_recommendation_spark.operators.quality import (
                    front_door_audit,
                )

                # one source eval for audit+sink; RELEASED in finally —
                # the in-flight max stays bounded and the end count 0
                df = df.persist()
                audit = front_door_audit(df, fd_cfg)
                n_batch = df.count()
                if audit[0]["n_in"] != n_batch:
                    fd_epoch_fails.append(
                        f"epoch {epoch_id}: audit n_in {audit[0]['n_in']}"
                        f" != batch rows {n_batch}"
                    )
                if (
                    sum(a["n_rejected"] for a in audit) + audit[-1]["n_kept"]
                    != n_batch
                ):
                    fd_epoch_fails.append(
                        f"epoch {epoch_id}: audit rows do not sum to events_in"
                    )
                # accumulate only AFTER the sink commits this epoch:
                # a batch interrupted mid-sink must appear in neither
                # ledger, or the totals can't reconcile (events_in is
                # the sum of the sink's per-epoch audits)
                pending = audit
            else:
                pending = None
            try:
                sink(df, epoch_id)
                if pending is not None:
                    for a in pending:
                        fd_stage_counts[a["stage"]] = (
                            fd_stage_counts.get(a["stage"], 0)
                            + a["n_rejected"]
                        )
                    fd_stage_counts["__kept"] = (
                        fd_stage_counts.get("__kept", 0)
                        + pending[-1]["n_kept"]
                    )
            finally:
                if args.frontdoor:
                    df.unpersist()
            _sample(f"epoch_{epoch_id}")

        base_text = F.concat(
            F.lit(_FILLER),
            F.lit("unique marker "),
            (F.col("value") % args.pool).cast("string"),
        )
        if args.minhash:
            # odd values: EXACT copies of seed texts — new to the
            # fingerprint store, caught only by the near-dup gate.
            # Texts are marker-INTERLEAVED (every 3rd token), so every
            # 3-shingle contains the marker and docs with different
            # markers share ZERO shingles — base docs can never
            # near-match seeds, and the gate's rejections are exactly
            # the seed copies (deterministic verdict).
            base_m = F.concat(
                F.lit("u"), (F.col("value") % args.pool).cast("string")
            )
            seed_m = F.concat(
                F.lit("s"),
                (F.floor(F.col("value") / 2) % args.pool).cast("string"),
            )
            marker = F.when(F.col("value") % 2 == 1, seed_m).otherwise(
                base_m
            )
            text = _interleaved_text(marker)
        else:
            text = base_text
        if args.frontdoor:
            # deterministic kinds on the rate source's value stream:
            #   kind 0 -> blocked domain        (blocklist reject)
            #   kind 1 -> shared canonical URL  (url_dedup rejects all
            #             but the smallest id per batch)
            #   kind 2 -> OOV gibberish body    (LM tail -> lm_gate)
            #   kind 3 -> mojibake'd extra line (repaired, accepted)
            #   kind 4 -> punct-less body, no other keepable lines
            #             (c4 kept-lines gate reject)
            #   else   -> clean                 (accepted -> store gate)
            # bodies carry the pool marker so the store-dedup flatness
            # pin holds on the accepted subset; the head phrase is a
            # greedy chain over the committed trigram tables, verified
            # head-bucket WITH the OOV marker and C4 survivors included
            # (scripts comment — see NOTES_r11).
            good_body = (
                "part spark line data the part column part slow scan "
                "query merge slow window hash line slow value slow hash "
                "batch small fast a the table line"
            )
            bad_body = "zz qq ww vv kk jj pp mm nn oo"
            moji_line = _q170_style_mojibake("Caf\u00e9 corner mix.")
            kind = F.col("value") % 10
            # kind-1 docs share ONE marker: exactly one survives the
            # url dedup per batch, and a constant text keeps that
            # survivor from trickling new fingerprints into the tail
            marker = F.when(kind == 1, F.lit("udup")).otherwise(
                F.concat(
                    F.lit("u"), (F.col("value") % args.pool).cast("string")
                )
            )
            body = F.concat(
                F.when(kind == 2, F.lit(bad_body)).otherwise(
                    F.lit(good_body)
                ),
                F.lit(" "),
                marker,
                # kind 4: no terminal punctuation -> the line fails C4
                F.when(kind == 4, F.lit(" end")).otherwise(F.lit(" end.")),
            )
            extra = F.when(
                kind == 3, F.lit("<p>" + moji_line + "</p>")
            ).otherwise(F.lit(""))
            subs = F.when(kind == 4, F.lit("")).otherwise(
                F.lit(
                    "<p>Subscribe to our newsletter today.</p>"
                    "<p>Subscribe to our newsletter today.</p>"
                )
            )
            page = F.concat(
                F.lit(
                    "<html><head><script>var x = 1;</script></head>"
                    '<body><nav><a href="/">Home</a></nav><p>'
                ),
                body,
                F.lit("</p>"),
                subs,
                extra,
                F.lit(
                    "<p>Enable javascript to continue.</p>"
                    "<footer>&copy; corp</footer></body></html>"
                ),
            )
            url = F.when(
                kind == 0,
                F.concat(
                    F.lit("https://blocked.test/p/"),
                    F.col("value").cast("string"),
                ),
            ).when(kind == 1, F.lit("https://dup.test/shared")).otherwise(
                F.concat(
                    F.lit("https://ok"),
                    (F.col("value") % 7).cast("string"),
                    F.lit(".test/p/"),
                    F.col("value").cast("string"),
                )
            )
            docs = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", args.rate)
                .load()
                .select(
                    F.col("value").alias("doc_id"),
                    page.alias("html"),
                    url.alias("url"),
                )
            )
        else:
            docs = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", args.rate)
                .load()
                .select(F.col("value").alias("doc_id"), text.alias("text"))
            )
        t_start = time.time()
        _sample("start")
        q = (
            docs.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(processingTime=args.trigger)
            .start()
        )
        try:
            while time.time() - t_start < args.secs:
                time.sleep(5)
                if q.exception() is not None:
                    raise q.exception()
        finally:
            q.stop()
            q.awaitTermination(60)
        if args.frontdoor:
            # harness state, not sink state: the batch-level persist of
            # an in-flight batch interrupted by q.stop() bypasses the
            # foreachBatch finally; release it before the end sample so
            # the leak checks measure the SINK
            jsc_rdds = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jsc_rdds.keySet().toArray()):
                jsc_rdds.get(rid).unpersist()
        # per-epoch heap samples are GC-noise (the JVM only collects
        # under pressure); one explicit GC makes the END number a real
        # retained-state measurement
        spark.sparkContext._jvm.java.lang.System.gc()
        time.sleep(2)
        _sample("end_after_gc")

        # ---- verdicts --------------------------------------------------
        audits = []
        audit_dir = os.path.join(out_dir, "audit")
        for f in sorted(os.listdir(audit_dir)):
            if f.endswith(".json"):
                audits.append(json.load(open(os.path.join(audit_dir, f))))
        store = spark.read.parquet(os.path.join(out_dir, "store"))
        store_distinct = store.select("fp").distinct().count()
        store_total = store.count()
        n_in = sum(a["n_in"] for a in audits)
        n_acc = sum(a["n_accepted"] for a in audits)
        tail = audits[len(audits) * 2 // 3 :]
        tail_acc = sum(a["n_accepted"] for a in tail)

        rdd_counts = [s["persistent_rdds"] for s in samples]
        n_near_dup = sum(a.get("n_near_dup_index", 0) for a in audits)
        mh_merges = sum(1 for a in audits if a.get("mh_indexed"))
        report = {
            "secs": args.secs,
            "rate": args.rate,
            "pool": args.pool,
            "epochs": len(audits),
            "events_in": n_in,
            "accepted_total": n_acc,
            "accepted_tail_third": tail_acc,
            "store_distinct_fp": store_distinct,
            "store_total_rows": store_total,
            "persistent_rdds_max": max(rdd_counts),
            "persistent_rdds_end": rdd_counts[-1],
            "driver_heap_mb_start": samples[0]["driver_heap_mb"],
            "driver_heap_mb_end": samples[-1]["driver_heap_mb"],
            "throughput_docs_s": round(n_in / max(args.secs, 1), 1),
        }
        if args.minhash:
            lake = spark.read.parquet(os.path.join(out_dir, "data"))
            seed_leak = lake.filter(
                F.col("text").contains("seed marker")
            ).count()
            idx_rows = spark.table("soak_mh_sigs").count()
            report.update(
                near_dup_rejected=n_near_dup,
                mh_merge_epochs=mh_merges,
                seed_docs_in_lake=seed_leak,
                mh_index_rows_end=idx_rows,
            )

        fails = []
        fails.extend(fd_epoch_fails)
        if args.frontdoor:
            report["frontdoor_stage_rejections"] = {
                k: v for k, v in sorted(fd_stage_counts.items())
            }
            kept_fd = fd_stage_counts.get("__kept", 0)
            rejected_fd = sum(
                v for k, v in fd_stage_counts.items() if k != "__kept"
            )
            if kept_fd + rejected_fd != n_in:
                fails.append(
                    f"front-door audit total {kept_fd + rejected_fd} != "
                    f"events_in {n_in}"
                )
            for gate in ("blocklist", "c4", "url_dedup", "lm_gate"):
                if fd_stage_counts.get(gate, 0) == 0 and n_in > 100:
                    fails.append(f"front-door gate {gate!r} never fired")
            lake = spark.read.parquet(os.path.join(out_dir, "data"))
            moji_left = lake.filter(F.col("text").contains("\u00c3")).count()
            if moji_left:
                fails.append(
                    f"{moji_left} docs reached the lake with unrepaired "
                    "mojibake"
                )
        if args.minhash:
            # the gate is the ONLY defense against seed copies (their
            # fingerprints are new) — any leak is a gate failure
            if report["seed_docs_in_lake"]:
                fails.append(
                    f"{report['seed_docs_in_lake']} seed copies reached "
                    "the lake past the near-dup gate"
                )
            if n_near_dup == 0:
                fails.append("near-dup gate never fired")
            # incremental maintenance: index = seeds + every accepted doc
            if idx_rows != args.pool + n_acc:
                fails.append(
                    f"index rows {idx_rows} != seeds {args.pool} + "
                    f"accepted {n_acc}"
                )
        # every distinct text admitted exactly once, ever
        if store_distinct != store_total:
            fails.append("store holds duplicate fingerprints across epochs")
        if n_acc != store_distinct:
            fails.append("accepted count != store size (double admission)")
        if n_acc > args.pool:
            fails.append("accepted more than the distinct pool")
        # flatness: once the pool cycles, acceptance must stop. The
        # pool is exhausted within the first rate*secs/pool fraction;
        # allow the tail only what a single in-flight batch could add.
        if n_in > 2 * args.pool and tail_acc > 0:
            fails.append(f"tail third still accepting ({tail_acc})")
        # scratch-state discipline: the sink must not leak blocks.
        # Compare the end sample against the max of the MID-RUN
        # samples (max over all samples trivially includes the end —
        # that comparison can never fire).
        mid_max = max(rdd_counts[:-1], default=0)
        if rdd_counts[-1] > mid_max:
            fails.append(
                f"persistent RDDs grew past in-flight max "
                f"({rdd_counts[-1]} > {mid_max})"
            )
        if rdd_counts[-1] > 2:
            fails.append(f"persistent RDDs leaked: {rdd_counts[-1]} at end")

        report["fails"] = fails
        if args.minhash:
            for t in ("bands", "sigs", "meta"):
                spark.sql(f"DROP TABLE IF EXISTS soak_mh_{t}")
        print(json.dumps(report))
        sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
