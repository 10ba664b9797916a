"""Prefix-filter exact Jaccard join (operators/dedup.
prefix_filter_jaccard_pairs): losslessness vs the naive baseline and
the integer threshold boundary."""

import pytest

from big_data_song_recommendation_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_naive_baseline(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "a completely different document about spark plans",
        "a completely different document about spark engines",
        "nothing in common with anything here at all",
    ]
    docs = _docs(spark, texts)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(docs, "doc_id", "text").collect()
    }
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    assert {(a, b) for a, b, _ in got} == {(a, b) for a, b, _ in want}
    assert got == want  # jaccard values agree too


def test_threshold_boundary_is_exact(spark):
    """Jaccard EXACTLY at the threshold must be kept: 7-token docs
    differing in the last token share 3 of 5+5-3=7... build an exact
    1/2 case instead: sets of 6 shingles sharing 4 -> j = 4/8 = 0.5."""
    # k=1-gram-like control via words: craft texts whose 3-shingle
    # sets share exactly half the union: 6 shingles each, 4 shared
    a = "w1 w2 w3 w4 w5 w6 w7 w8"  # shingles: 6
    b = "w1 w2 w3 w4 w5 w6 x7 x8"  # shares shingles from w1..w6 run: 4
    docs = _docs(spark, [a, b])
    out = prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", threshold_num=1, threshold_den=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_shared"], r["n_union"], r["jaccard"]) == (4, 8, 0.5)
    # and a strictly-above threshold excludes it
    out2 = prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", threshold_num=51, threshold_den=100
    ).collect()
    assert out2 == []


def test_disjoint_docs_produce_nothing(spark):
    docs = _docs(spark, ["a b c d e", "v w x y z"])
    assert (
        prefix_filter_jaccard_pairs(docs, "doc_id", "text").collect() == []
    )


def test_bad_threshold_raises(spark):
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(
            _docs(spark, ["x"]), "doc_id", "text", threshold_num=3,
            threshold_den=2,
        )


def test_positional_filter_is_lossless_and_prunes(spark):
    """PPJoin positional filter: identical output to the AllPairs
    baseline (positional=False) on a corpus with near-dups at several
    similarity grades, while the candidate tier shrinks. Uses a
    varied mix so matched-prefix positions actually differ."""
    import random

    from big_data_song_recommendation_spark.operators.dedup import (
        _prefix_candidates,
        _shingle_sets,
    )

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(60)]
    texts = []
    for i in range(30):
        base = rng.sample(vocab, 12)
        texts.append(" ".join(base))
        if i % 3 == 0:  # a near-dup with a mutated tail
            mutated = base[:-2] + rng.sample(vocab, 2)
            texts.append(" ".join(mutated))
    docs = _docs(spark, texts)
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    got = key(prefix_filter_jaccard_pairs(docs, "doc_id", "text").collect())
    want = key(
        prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", positional=False
        ).collect()
    )
    assert got == want and len(got) > 0
    sets = _shingle_sets(docs, "doc_id", "text", 3, None).localCheckpoint()
    n_base = _prefix_candidates(sets, 1, 2, positional=False).count()
    n_pos = _prefix_candidates(sets, 1, 2, positional=True).count()
    assert n_pos <= n_base
    # every surviving candidate superset must still include the truth
    assert n_pos >= len(got)


def test_stop_shingle_corpus_rejected_without_false_positives(spark):
    """A corpus sharing one common shingle everywhere: the naive join
    sees every pair as a candidate; the verified output must still be
    empty (one shared shingle out of ~6 never reaches 0.5), and the
    prefix filter must not spuriously emit any of the 190 pairs."""
    common = "alpha beta gamma "  # one shared 3-shingle per doc
    texts = [common + f"unique{i} tail{i} end{i}" for i in range(20)]
    docs = _docs(spark, texts)
    assert prefix_filter_jaccard_pairs(docs, "doc_id", "text").collect() == []


def test_suffix_filter_is_lossless(spark):
    """Round 10 (PPJoin+ suffix filter, anchor-sketch form): the chunk
    bound never prunes a true pair — result sets with the filter on
    and off are identical at two thresholds. (Defaulted OFF after
    measurement: ~0% prune on same-distribution corpora — see the
    operator docstring — but the losslessness contract must hold for
    the heterogeneous corpora it exists for.)"""
    from big_data_song_recommendation_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from big_data_song_recommendation_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for n_, d_ in ((1, 2), (4, 5)):
        off = sorted(
            tuple(r)
            for r in prefix_filter_jaccard_pairs(
                docs, "doc_id", "text", k=3,
                threshold_num=n_, threshold_den=d_, suffix=False,
            ).collect()
        )
        on = sorted(
            tuple(r)
            for r in prefix_filter_jaccard_pairs(
                docs, "doc_id", "text", k=3,
                threshold_num=n_, threshold_den=d_, suffix=True,
            ).collect()
        )
        assert on == off and len(on) > 0


def test_anchor_sketches_shape_and_tiny_docs(spark):
    """Anchor sketches always carry exactly E aligned (key, position)
    entries — tiny documents (L < E) repeat early keys instead of
    shrinking the arrays the unrolled pair expression indexes into."""
    from big_data_song_recommendation_spark.operators.dedup import (
        _SUFFIX_ANCHORS,
        _anchor_sketches,
        _ranked_shingles,
        _shingle_sets,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "one two three four five six seven eight "
                             "nine ten eleven twelve thirteen")],
        "doc_id long, text string",
    )
    sets = _shingle_sets(docs, "doc_id", "text", 3, None)
    sk = {r.sid: r for r in _anchor_sketches(_ranked_shingles(sets)).collect()}
    for sid, r in sk.items():
        ak, ap = r["__ak"], r["__ap"]
        assert len(ak) == _SUFFIX_ANCHORS and len(ap) == _SUFFIX_ANCHORS
        assert list(ap) == sorted(ap)
        assert list(ak) == sorted(ak)
        assert ap[-1] == max(ap)
