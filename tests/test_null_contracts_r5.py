"""Round-5 ADVICE closures: NULL-category contracts for the
contingency-table statistics, the NULL-text fingerprint sentinel in
incremental dedup, and the winnowing pos-overflow guard firing
loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators import dedup
from big_data_song_recommendation_spark.operators.aggregates import (
    chi_square,
    mutual_information,
)


def _with_nulls(spark):
    rows = (
        [Row(a="x", b="p")] * 6
        + [Row(a="x", b="q")] * 2
        + [Row(a="y", b="p")] * 3
        + [Row(a="y", b="q")] * 5
        + [Row(a=None, b="p")] * 4
        + [Row(a="x", b=None)] * 3
        + [Row(a=None, b=None)] * 2
    )
    return spark.createDataFrame(rows)


def test_chi_square_excludes_null_categories(spark):
    """NULL rows are complete-case filtered: the statistic equals the
    one computed on the pre-filtered frame (previously NULL groups
    inflated chi2 via unjoinable cells counted in the marginals)."""
    df = _with_nulls(spark)
    clean = df.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    got = chi_square(df, "a", "b").collect()[0]
    want = chi_square(clean, "a", "b").collect()[0]
    assert got.asDict() == want.asDict()
    assert got.n == 16 and got.r == 2 and got.c == 2 and got.dof == 1


def test_mutual_information_excludes_null_categories(spark):
    df = _with_nulls(spark)
    clean = df.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    got = mutual_information(df, "a", "b").collect()[0]
    want = mutual_information(clean, "a", "b").collect()[0]
    assert got.asDict() == want.asDict()
    assert got.n == 16


def test_dedup_store_null_text_sentinel(spark):
    """A NULL-text row fingerprints as a deterministic sentinel: the
    first is accepted, later NULL-text rows in the same batch are
    dup_batch, and once its fp is appended to the store the next
    batch's NULL-text row is dup_store (previously it was re-accepted
    forever)."""
    b1 = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text=None),
         Row(doc_id=3, text="real content here")]
    )
    store = spark.createDataFrame([], "fp string")
    out1 = dedup.dedup_against_store(b1, store)
    v1 = {r.doc_id: r.verdict for r in out1.collect()}
    assert v1 == {1: "accept", 2: "dup_batch", 3: "accept"}
    fps = out1.filter(F.col("verdict") == "accept").select("fp")
    assert fps.filter(F.col("fp").isNull()).count() == 0

    b2 = spark.createDataFrame([(9, None)], "doc_id long, text string")
    out2 = dedup.dedup_against_store(b2, fps)
    assert [r.verdict for r in out2.collect()] == ["dup_store"]


def test_winnow_pos_overflow_raises(spark, monkeypatch):
    """Docs whose shingle count exceeds the pos pack budget fail
    LOUDLY (raise_error) instead of silently corrupting packed
    fingerprints. Budget shrunk via WINNOW_POS_BITS so the test stays
    cheap; the legit path under the same budget still works."""
    monkeypatch.setattr(dedup, "WINNOW_POS_BITS", 4)
    ok = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"t{i}" for i in range(12)))]
    )
    assert dedup.winnow_fingerprints(ok, "doc_id", "text").count() > 0

    too_long = spark.createDataFrame(
        [Row(doc_id=2, text=" ".join(f"t{i}" for i in range(40)))]
    )
    with pytest.raises(Exception, match="winnowing"):
        dedup.winnow_fingerprints(too_long, "doc_id", "text").count()
