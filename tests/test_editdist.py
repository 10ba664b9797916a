"""Edit-distance similarity join (operators/similarity.
edit_distance_pairs): length-band completeness, dedup, carried
counts."""

from big_data_song_recommendation_spark.operators.similarity import (
    edit_distance_pairs,
)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "s string")


def test_known_distances(spark):
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in edit_distance_pairs(
            _df(spark, ["kitten", "sitting", "abc", "abd", "abcd"]),
            "s",
            max_dist=2,
        ).collect()
    }
    # kitten/sitting is distance 3 -> excluded at d=2
    assert got == {("abc", "abd"): 1, ("abc", "abcd"): 1, ("abcd", "abd"): 1}


def test_length_band_boundary_pair_included(spark):
    """|len(a)-len(b)| == max_dist sits on the band edge — the
    blocking must not drop it."""
    got = edit_distance_pairs(
        _df(spark, ["ab", "abcd"]), "s", max_dist=2
    ).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in got] == [
        ("ab", "abcd", 2)
    ]


def test_counts_carried_and_fact_grain_collapsed(spark):
    got = edit_distance_pairs(
        _df(spark, ["aa"] * 5 + ["ab"] * 3 + [None, None]),
        "s",
        max_dist=1,
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["name_a"], r["name_b"], r["n_a"], r["n_b"]) == ("aa", "ab", 5, 3)


def test_no_self_pairs_and_each_pair_once(spark):
    rows = edit_distance_pairs(
        _df(spark, ["x1", "x2", "x3"]), "s", max_dist=1
    ).collect()
    pairs = [(r["name_a"], r["name_b"]) for r in rows]
    assert len(pairs) == len(set(pairs)) == 3
    assert all(a < b for a, b in pairs)
