"""Intra-document repeated-line removal (keep-first) — semantics,
normalization toggle, degenerate inputs, and the map-only plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators.quality import (
    dedup_lines_within_doc,
)


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    return dedup_lines_within_doc(df, **kw).collect()[0]


def test_keep_first_in_order(spark):
    r = _run(spark, "a.\nb.\na.\nc.\nb.")
    assert r.n_lines == 5
    assert r.n_kept_lines == 3
    assert r.n_removed == 2
    assert r.dedup_text == "a.\nb.\nc."


def test_normalized_key_collapses_case_and_padding(spark):
    r = _run(spark, "Nav | Home.\n  nav | home.  \nNAV | HOME.")
    assert r.n_kept_lines == 1
    # the FIRST original line survives verbatim
    assert r.dedup_text == "Nav | Home."


def test_raw_mode_keeps_case_variants(spark):
    r = _run(spark, "Nav.\nnav.\nNav.", normalize=False)
    assert r.n_kept_lines == 2
    assert r.dedup_text == "Nav.\nnav."


def test_repeated_blank_lines_collapse_to_first(spark):
    r = _run(spark, "a.\n\nb.\n\n\nc.")
    assert r.n_lines == 6
    assert r.n_kept_lines == 4  # a., the first blank, b., c.
    assert r.dedup_text == "a.\n\nb.\nc."


def test_empty_and_single_line_docs_pass_through(spark):
    r = _run(spark, "")
    assert (r.n_lines, r.n_kept_lines, r.n_removed) == (1, 1, 0)
    assert r.dedup_text == ""
    r = _run(spark, "only line")
    assert (r.n_lines, r.n_kept_lines) == (1, 1)
    assert r.dedup_text == "only line"


def test_input_columns_preserved_and_audited(spark):
    df = spark.createDataFrame(
        [(7, "x", "a.\na.")], "doc_id int, extra string, text string"
    )
    out = dedup_lines_within_doc(df)
    assert set(out.columns) == {
        "doc_id", "extra", "text",
        "n_lines", "n_kept_lines", "n_removed", "dedup_text",
    }
    row = out.collect()[0]
    assert row.extra == "x" and row.text == "a.\na."


def test_plan_is_map_only(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l.\nl.\n"), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        dedup_lines_within_doc(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
