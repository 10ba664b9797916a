"""Every oracle-checked query must match DuckDB bit-for-bit at the
test scale factor — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from big_data_song_recommendation_spark.plans import ORACLES, QUERIES

from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert name in QUERIES, f"oracle {name} has no spark query"
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_every_query_has_oracle_or_is_declared():
    # queries without oracles are allowed (rows-only gate) but must be
    # deliberate: keep the allowlist here explicit.
    rows_only_allowed = {
        # MLlib-pipeline TF-IDF (hash-bucketed vocabulary order) —
        # golden-pinned; the exact relational TF-IDF twin is q73.
        # q40/q41/q43/q47 left this list in round 10: they now serve
        # from committed artifacts (ml/als_factors.py, ml/centroids.py)
        # and are oracle-checked.
        "q42_tfidf_features",
        # iterative BPE trainer — an oracle would need n_merges
        # unrolled recursive list-rebuild CTEs; pinned against a
        # pure-Python reference trainer instead (tests/test_bpe.py)
        "q139_bpe_merges",
    }
    missing = set(QUERIES) - set(ORACLES) - rows_only_allowed
    assert not missing, f"queries missing oracles: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["r_name", "n_name", "revenue", "n_orders", "n_customers"]
