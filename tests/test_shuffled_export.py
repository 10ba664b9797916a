"""Seeded deterministic shuffle export (sources/sinks.py
export_shuffled_shards / shuffled_shard_manifest): same seed ⇒
byte-level-identical shard layout (same files, same row order),
different seed ⇒ different permutation, balanced shards, loud NULLs."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.sources.readers import load_table
from big_data_song_recommendation_spark.sources.sinks import (
    export_shuffled_shards,
    shuffled_shard_manifest,
)

from .conftest import SF_DIR


def _layout(path):
    """shard -> ordered id list, read per FILE with pyarrow so the test
    pins the physical row order a training loader would stream."""
    out = {}
    for d in sorted(glob.glob(os.path.join(path, "shard=*"))):
        shard = int(d.rsplit("=", 1)[1])
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        ids = []
        for f in files:
            ids.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        out[shard] = ids
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_same_seed_same_layout_different_seed_differs(spark, docs, tmp_path_factory):
    paths = [str(tmp_path_factory.mktemp("shuf") / f"run{i}") for i in range(3)]
    export_shuffled_shards(docs, paths[0], id_col="doc_id", seed="ep1", n_shards=4)
    export_shuffled_shards(docs, paths[1], id_col="doc_id", seed="ep1", n_shards=4)
    export_shuffled_shards(docs, paths[2], id_col="doc_id", seed="ep2", n_shards=4)
    a, b, c = _layout(paths[0]), _layout(paths[1]), _layout(paths[2])
    assert a == b, "same seed must reproduce the exact shard layout"
    assert a != c, "a different seed must permute differently"
    # a permutation: every doc appears exactly once across shards
    n_docs = docs.count()
    flat = [i for ids in a.values() for i in ids]
    assert len(flat) == n_docs and len(set(flat)) == n_docs
    # the permutation is shuffled, not id-ordered
    assert any(ids != sorted(ids) for ids in a.values())
    # manifests agree for the same seed and differ across seeds
    ma = [tuple(r) for r in shuffled_shard_manifest(spark, paths[0]).collect()]
    mb = [tuple(r) for r in shuffled_shard_manifest(spark, paths[1]).collect()]
    mc = [tuple(r) for r in shuffled_shard_manifest(spark, paths[2]).collect()]
    assert ma == mb and ma != mc
    assert all(r[3] == "ep1" for r in ma)  # seed recorded


def test_shards_balanced(spark, docs, tmp_path):
    path = str(tmp_path / "bal")
    export_shuffled_shards(docs, path, id_col="doc_id", seed=42, n_shards=4)
    sizes = [len(v) for v in _layout(path).values()]
    assert len(sizes) == 4
    assert max(sizes) <= 2 * min(sizes), sizes


def test_null_id_fails_loudly(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        export_shuffled_shards(
            df, str(tmp_path / "nulls"), id_col="doc_id", seed=1, n_shards=2
        )


def test_bad_shard_count_raises(spark, docs, tmp_path):
    with pytest.raises(ValueError):
        export_shuffled_shards(
            docs, str(tmp_path / "x"), id_col="doc_id", seed=1, n_shards=0
        )


def test_reader_sees_no_meta_rows(spark, docs, tmp_path):
    """The _shuffle_meta sidecar must stay invisible to parquet
    readers (underscore-prefixed paths are hidden), so a loader
    pointed at the directory sees only corpus rows."""
    path = str(tmp_path / "vis")
    export_shuffled_shards(docs, path, id_col="doc_id", seed="s", n_shards=2)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert "seed" not in back.columns
    # shuffle_key survives as an audit column and matches the formula
    recomputed = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("s"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    assert back.filter(F.col("shuffle_key") != recomputed).count() == 0
