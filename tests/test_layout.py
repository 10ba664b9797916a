"""Z-order layout: prove the pruning property, not just the write.

A linear sort on (user_id, value) prunes range filters on user_id but
leaves value filters reading ~every row group; the Z-layout prunes
BOTH dimensions. Asserted from parquet row-group statistics — the same
min/max decision a scan makes — so the test is engine-independent and
deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.sources import layout
from big_data_song_recommendation_spark.sources.readers import load_table

from .conftest import SF_DIR


def _write_linear(df, path, cols, n_files=8):
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(path)
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "value", "event_id")
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    layout.write_zordered(
        ev, zpath, ["user_id", "value"], tiny_rowgroups=True, n_files=16
    )
    _write_linear(ev, lpath, ["user_id", "value"], n_files=16)

    # ~5%-of-MASS band per dimension (quantile-based: `value` is
    # mass-skewed, so a range-fraction band would not be selective)
    qu, qv = ev.approxQuantile(["user_id", "value"], [0.4, 0.45], 0.001)
    uband, vband = (qu[0], qu[1]), (qv[0], qv[1])

    zm_u, zt = layout.rowgroups_matching(zpath, "user_id", *uband)
    lm_u, lt = layout.rowgroups_matching(lpath, "user_id", *uband)
    zm_v, _ = layout.rowgroups_matching(zpath, "value", *vband)
    lm_v, _ = layout.rowgroups_matching(lpath, "value", *vband)

    assert zt >= 16 and lt >= 16, "need enough row groups for the claim"
    # leading dimension: both layouts prune hard
    assert zm_u / zt < 0.5 and lm_u / lt < 0.5
    # second dimension: linear layout reads ~everything, Z prunes
    assert lm_v / lt > 0.85, f"linear layout unexpectedly pruned value ({lm_v}/{lt})"
    assert zm_v / zt < 0.8, f"z-layout failed to prune value ({zm_v}/{zt})"
    assert zm_v / zt < (lm_v / lt) / 1.2, "z must beat linear on the 2nd dim"

    # layout preserves the data
    assert spark.read.parquet(zpath).count() == ev.count()
    assert spark.read.parquet(zpath).columns == ev.columns


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    key = df.select(layout.zorder_key(["a", "b"], bits=3).alias("k")).first()["k"]
    # bit j of col i -> position j*2+i: a=101, b=011 ->
    # pos0=a0=1, pos1=b0=1, pos2=a1=0, pos3=b1=1, pos4=a2=1, pos5=b2=0
    # -> 0b011011
    assert key == 0b011011


def test_zorder_rejects_overflow_and_bad_arity():
    import pytest

    with pytest.raises(ValueError):
        layout.zorder_key([], bits=8)
    with pytest.raises(ValueError):
        layout.zorder_key(["a", "b", "c", "d", "e"], bits=8)
    with pytest.raises(ValueError):
        layout.zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 62


def test_compact_parquet_merges_small_leaves_big(spark, tmp_path):
    """Small files coalesce toward the target; healthy files are
    untouched; row content is preserved exactly."""
    import os

    from big_data_song_recommendation_spark.sources.layout import (
        compact_parquet,
    )

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    # 6 tiny shards (micro-batch debris)
    for i in range(6):
        spark.range(i * 100, (i + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    # one "big" file (above small_ratio·target) that must survive
    # untouched, by name
    spark.range(600, 20600).coalesce(1).write.mode("append").parquet(path)
    sizes = {
        f: os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    big_name, big_sz = max(sizes.items(), key=lambda kv: kv[1])
    target = int(big_sz * 1.5)  # big file > 0.5·target; shards far below
    before = sorted(sizes)
    assert len(before) >= 7
    stats = compact_parquet(spark, path, target_bytes=target)
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert stats["files_rewritten"] >= 6
    assert len(after) < len(before)
    assert big_name in after  # healthy file untouched
    # exact content preservation
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == list(range(20600))
    assert stats["files_after"] == len(after)


def test_compact_parquet_noop_below_two_small(spark, tmp_path):
    import os

    from big_data_song_recommendation_spark.sources.layout import (
        compact_parquet,
    )

    path = str(tmp_path / "tbl1")
    os.makedirs(path)
    spark.range(100).coalesce(1).write.mode("append").parquet(path)
    before = sorted(os.listdir(path))
    stats = compact_parquet(spark, path, target_bytes=1 << 20)
    assert sorted(os.listdir(path)) == before
    # a no-op must report itself as one (regression: a lone small
    # file used to count as files_rewritten=1 + its bytes)
    assert stats["files_rewritten"] == 0
    assert stats["bytes_compacted"] == 0


def test_compact_parquet_respects_target_sizing(spark, tmp_path):
    """Output file count tracks ceil(small_bytes/target), so raising
    the target produces fewer, larger files."""
    import os

    from big_data_song_recommendation_spark.sources.layout import (
        compact_parquet,
    )

    path = str(tmp_path / "tbl2")
    os.makedirs(path)
    for i in range(8):
        spark.range(i * 1000, (i + 1) * 1000).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    sz = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    stats = compact_parquet(
        spark, path, target_bytes=max(sz // 2, 1), small_ratio=1.0
    )
    after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after) <= 3  # ceil ratio ≈ 2 (+rounding)
    assert stats["files_after"] == len(after)
