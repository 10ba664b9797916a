"""Declarative front-door config + per-stage audit (round 11, VERDICT
r10 #5): the kwargs form and the FrontDoorConfig form are the same
implementation; the audit accounts every input row to exactly one
gating stage or to the survivors, and the verdict pipeline's survivor
set is identical to the dropping pipeline's."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators.quality import (
    FrontDoorConfig,
    crawl_front_door,
    crawl_front_door_configured,
    front_door_audit,
    front_door_verdicts,
)
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def _capstone_cfg() -> FrontDoorConfig:
    # the q176 stage set: blocklist -> mojibake -> extract -> c4 ->
    # line dedup -> url dedup -> LM gate
    return FrontDoorConfig(
        url_col="url",
        blocked_domains=("example.co.uk",),
        fix_encoding=True,
        dedup_lines=True,
        lm_buckets=("head", "middle"),
    )


def _source(spark):
    from big_data_song_recommendation_spark.plans.queries import _q171_source

    return _q171_source(load_table(spark, SF_DIR, "documents"))


def test_stage_and_gate_lists():
    cfg = _capstone_cfg()
    assert cfg.stage_list() == [
        "blocklist",
        "mojibake_repair",
        "extract",
        "c4",
        "line_dedup",
        "url_dedup",
        "lm_gate",
    ]
    assert cfg.gate_list() == ["blocklist", "c4", "url_dedup", "lm_gate"]
    # thresholds gate only when set
    bare = FrontDoorConfig(quality_weights=([1] * 4, 0))
    assert "quality" in bare.stage_list()
    assert "quality" not in bare.gate_list()
    thr = FrontDoorConfig(quality_weights=([1] * 4, 0), min_score_micro=0)
    assert "quality" in thr.gate_list()


def test_config_form_equals_kwargs_form(spark):
    """crawl_front_door is a shim over the configured form — same rows
    (the q176 hash-unchanged contract, checked here at row grain)."""
    src = _source(spark)
    via_kwargs = crawl_front_door(
        src,
        url_col="url",
        blocked_domains=["example.co.uk"],
        fix_encoding=True,
        dedup_lines=True,
        lm_buckets=("head", "middle"),
    )
    via_cfg = crawl_front_door_configured(src, _capstone_cfg())
    assert sorted(map(tuple, via_kwargs.collect())) == sorted(
        map(tuple, via_cfg.collect())
    )


def test_audit_accounts_every_row(spark):
    """Audit chaining: n_in(stage 1) == events_in; each stage's n_kept
    is the next stage's n_in; the final n_kept equals the dropping
    pipeline's output count; rejected + kept == events_in."""
    src = _source(spark)
    cfg = _capstone_cfg()
    audit = front_door_audit(src, cfg)
    events_in = src.count()
    assert [a["stage"] for a in audit] == cfg.gate_list()
    assert audit[0]["n_in"] == events_in
    for prev, nxt in zip(audit, audit[1:]):
        assert prev["n_kept"] == nxt["n_in"]
        assert prev["n_in"] == prev["n_rejected"] + prev["n_kept"]
    assert audit[-1]["n_in"] == audit[-1]["n_rejected"] + audit[-1]["n_kept"]
    kept = crawl_front_door_configured(src, cfg).count()
    assert audit[-1]["n_kept"] == kept
    assert sum(a["n_rejected"] for a in audit) + kept == events_in
    # this corpus must actually exercise >= 2 gates or the test is vacuous
    assert sum(1 for a in audit if a["n_rejected"] > 0) >= 2


def test_verdict_survivors_equal_pipeline_survivors(spark):
    """The no-drop verdict pipeline marks exactly the docs the dropping
    pipeline keeps (NULL verdict) — including the cross-doc canonical-
    URL stage, whose winner must be chosen among still-alive docs."""
    src = _source(spark)
    cfg = _capstone_cfg()
    verdicts = front_door_verdicts(src, cfg)
    alive = {
        r["doc_id"]
        for r in verdicts.filter(F.col("verdict").isNull()).collect()
    }
    kept = {
        r["doc_id"]
        for r in crawl_front_door_configured(src, cfg)
        .select("doc_id")
        .collect()
    }
    assert alive == kept
    # every verdict value is a configured gate
    labels = {
        r["verdict"]
        for r in verdicts.filter(F.col("verdict").isNotNull()).collect()
    }
    assert labels <= set(cfg.gate_list())


def test_quality_and_langid_gates_in_audit(spark):
    """The learned gates join the accounting when their thresholds are
    set (committed artifacts; thresholds chosen to reject something)."""
    from big_data_song_recommendation_spark.ml.langid_weights import (
        LID_BIASES_MICRO,
        LID_WEIGHTS_MICRO,
    )
    from big_data_song_recommendation_spark.ml.quality_weights import (
        QCLF_BIAS_MICRO,
        QCLF_WEIGHTS_MICRO,
    )

    src = _source(spark)
    cfg = FrontDoorConfig(
        url_col="url",
        quality_weights=(QCLF_WEIGHTS_MICRO, QCLF_BIAS_MICRO),
        min_score_micro=10**12,  # impossible bar: everything rejects
        langid_weights=(LID_WEIGHTS_MICRO, LID_BIASES_MICRO),
        allowed_langs=("en",),
    )
    audit = front_door_audit(src, cfg)
    stages = {a["stage"]: a for a in audit}
    assert set(stages) == {"c4", "url_dedup", "quality", "langid"}
    assert stages["quality"]["n_kept"] == 0  # the impossible bar
    assert stages["langid"]["n_in"] == 0  # nothing reaches it
    assert crawl_front_door_configured(src, cfg).count() == 0


def test_batch_line_dedup_stage(spark):
    """CCNet's per-shard paragraph dedup as a front-door stage: with
    batch_line_cap=1, the 'Subscribe' boilerplate shared by every page
    drops from the cleaned text, the stage appears in stage_list (not
    gate_list — it drops lines, not documents), and the no-drop
    verdict pipeline still marks exactly the pipeline's survivors
    (its batch counts must run over still-alive docs only)."""
    from pyspark.sql import functions as F

    src = _source(spark)
    cfg = FrontDoorConfig(
        url_col="url",
        blocked_domains=("example.co.uk",),
        fix_encoding=True,
        dedup_lines=True,
        batch_line_cap=1,
        lm_buckets=("head", "middle", "tail"),  # LM verdict kept permissive
    )
    assert "batch_line_dedup" in cfg.stage_list()
    assert "batch_line_dedup" not in cfg.gate_list()
    out = crawl_front_door_configured(src, cfg)
    assert "n_batch_dup_lines" in out.columns
    rows = out.collect()
    assert rows and all(
        "Subscribe to our newsletter" not in r["text"] for r in rows
    )
    assert sum(r["n_batch_dup_lines"] for r in rows) > 0
    alive = {
        r["doc_id"]
        for r in front_door_verdicts(src, cfg)
        .filter(F.col("verdict").isNull())
        .collect()
    }
    assert alive == {r["doc_id"] for r in out.select("doc_id").collect()}
