"""Distributed BPE trainer (operators/bpe.py) vs a pure-Python
reference implementing the classic Sennrich loop with identical
normalization and tie-breaks — merge sequences must be IDENTICAL."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from big_data_song_recommendation_spark.operators import bpe

from .conftest import SF_DIR

END = bpe.END_MARK


# -- pure-Python reference -------------------------------------------------

def _py_tokens(text: str) -> list[str]:
    norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
    return [w for w in norm.split(" ") if w]


def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(_py_tokens(t or ""))
    return {w: (list(w) + [END], n) for w, n in c.items()}


def _py_merge(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_train(wf: dict, n_merges: int):
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, freq in wf.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += freq
        if not pc:
            break
        # count desc, then lexicographic (left, right) — the trainer's
        # documented tie-break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        wf = {
            w: (_py_merge(syms, l, r), freq) for w, (syms, freq) in wf.items()
        }
    return merges, wf


# -- tests -----------------------------------------------------------------

def test_toy_corpus_matches_reference(spark):
    texts = ["low lower lowest low low", "new newer newest new"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, final = bpe.bpe_train(
        bpe.word_frequency_table(docs), n_merges=6
    )
    ref_merges, ref_wf = _py_train(_py_word_freqs(texts), 6)
    assert merges == ref_merges
    got = {r.word: r.syms for r in final.collect()}
    assert got == {w: syms for w, (syms, _) in ref_wf.items()}


def test_corpus_merges_match_reference(spark):
    """Full pipeline on the real documents table: identical merge
    sequence (rule, order, AND weighted count) to the Python trainer."""
    texts = [
        t[0]
        for t in duckdb.connect()
        .execute(f"SELECT text FROM '{SF_DIR}/documents.parquet'")
        .fetchall()
    ]
    from big_data_song_recommendation_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    merges, _ = bpe.bpe_train(bpe.word_frequency_table(docs), n_merges=8)
    ref_merges, _ = _py_train(_py_word_freqs(texts), 8)
    assert merges == ref_merges


def test_merge_fold_is_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(
        bpe.merge_pair_expr(df.syms, "a", "a").alias("m")
    ).head()["m"]
    assert out == ["aa", "a"]


def test_apply_preserves_concatenation(spark):
    """Conservation: merges re-segment a word, never change its
    characters — concat(syms) is invariant under bpe_apply."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("banana bandana ban",)], "text string"
    )
    wf = bpe.word_frequency_table(docs)
    merges, _ = bpe.bpe_train(wf, n_merges=4)
    applied = bpe.bpe_apply(wf, merges)
    bad = applied.filter(
        F.concat_ws("", "syms") != F.concat(F.col("word"), F.lit(END))
    ).count()
    assert bad == 0


def test_train_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([("a b c",)], "text string")
    merges, _ = bpe.bpe_train(
        bpe.word_frequency_table(docs), n_merges=50
    )
    # single-char words have one pair each (char + </w>); after those
    # merge there is nothing left — far fewer than 50 rules
    assert 0 < len(merges) < 50
