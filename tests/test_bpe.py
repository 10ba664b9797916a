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


# -- batched selection (round-8) ------------------------------------------

def _row(left, right, cnt, newmax=0):
    return {"left": left, "right": right, "pair_count": cnt,
            "newmax": newmax}


def test_safe_batch_interaction_and_newmax_rules():
    """_safe_batch stop rules: (1) a candidate ENDING in a selected
    left or STARTING with a selected right may have decreased — stop;
    merely starting-with-a-left / ending-with-a-right is invariant
    and stays; (2) a candidate not strictly above every selected
    newmax could be tied by a created pair — stop; (3) the argmax
    fallback when rule 2 rejects immediately."""
    # (e,r) selected; (e,</w>) STARTS with the left 'e' -> invariant,
    # selected; (x,e) ENDS in 'e' -> at risk, stops the batch
    page = [
        _row("e", "r", 100, newmax=50),
        _row("e", "</w>", 90, newmax=40),
        _row("x", "e", 80),
        _row("c", "d", 70),
    ]
    assert bpe._safe_batch(page) == [("e", "r", 100), ("e", "</w>", 90)]
    # starting with a selected RIGHT is at risk too: (r,y) after (e,r)
    assert bpe._safe_batch(
        [_row("e", "r", 100, newmax=10), _row("r", "y", 90)]
    ) == [("e", "r", 100)]
    # rule 2: created-pair bound — second candidate ties newmax 90
    assert bpe._safe_batch(
        [_row("e", "r", 100, newmax=90), _row("c", "d", 90)]
    ) == [("e", "r", 100)]
    # strictly above the bound -> both batch
    assert bpe._safe_batch(
        [_row("e", "r", 100, newmax=89), _row("c", "d", 90, newmax=0)]
    ) == [("e", "r", 100), ("c", "d", 90)]
    # rule 3: immediate rule-2 rejection still yields the argmax
    assert bpe._safe_batch(
        [_row("a", "a", 5, newmax=5), _row("c", "d", 5)]
    ) == [("a", "a", 5)]


def test_batched_sequence_equals_sequential(spark, monkeypatch):
    """The batched trainer must learn the EXACT sequence the
    one-pair-per-round trainer learns, in fewer rounds (driver
    actions scale with rounds — the 30k-merge scale lever)."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    wf = bpe.word_frequency_table(docs)

    rounds = {"n": 0}
    orig = bpe._pair_page

    def counting(df, cap):
        rounds["n"] += 1
        return orig(df, cap)

    monkeypatch.setattr(bpe, "_pair_page", counting)

    rounds["n"] = 0
    seq, _ = bpe.bpe_train(wf, n_merges=24, batch_cap=1, driver_vocab_cap=0)
    seq_rounds = rounds["n"]

    rounds["n"] = 0
    batched, _ = bpe.bpe_train(wf, n_merges=24, batch_cap=64, driver_vocab_cap=0)
    bat_rounds = rounds["n"]

    assert batched == seq
    assert seq_rounds == 24
    # exact-sequence batching saturates ~2-3x on natural language
    # (sequential picks just-created chain pairs within 2-3 steps)
    assert bat_rounds * 2 <= seq_rounds, (bat_rounds, seq_rounds)

    # standard batched-BPE (exact_sequence=False): >=4x fewer driver
    # actions, near-identical vocabulary (deviation only where a
    # created pair out-prioritized a tail selection)
    rounds["n"] = 0
    fast, _ = bpe.bpe_train(
        wf, n_merges=24, batch_cap=8, exact_sequence=False,
        driver_vocab_cap=0,
    )
    fast_rounds = rounds["n"]
    assert fast_rounds * 4 <= seq_rounds, (fast_rounds, seq_rounds)
    overlap = {(l, r) for l, r, _ in seq} & {(l, r) for l, r, _ in fast}
    assert len(overlap) >= 18, sorted(overlap)


def test_apply_equals_trainer_final(spark):
    """bpe_apply(wf, merges) must reproduce the trainer's own final
    vocabulary exactly — the encode path and the train path share
    merge_pair_expr, so q152's encode is the q139 chain by
    construction."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    wf = bpe.word_frequency_table(docs).localCheckpoint(eager=False)
    merges, final = bpe.bpe_train(wf, n_merges=8)
    applied = bpe.bpe_apply(wf, merges)
    a = {r["word"]: r["syms"] for r in applied.collect()}
    b = {r["word"]: r["syms"] for r in final.collect()}
    assert a == b


# -- _safe_batch algebra property (round-8) ---------------------------------
# The exact_sequence=True claim ("the batched trainer picks EXACTLY the
# one-at-a-time sequence") rests on the interaction algebra documented
# in _safe_batch. Property-test it in pure Python against the reference
# sequential trainer over adversarial tiny alphabets (maximal merge
# interaction + constant count ties), independent of Spark plumbing.

from hypothesis import given, settings
from hypothesis import strategies as st


def _py_page(wf: dict, cap: int) -> list[dict]:
    """Pure-Python twin of bpe._pair_page: count-sorted pair page with
    per-pair created-pair bounds from adjacent-triple counts."""
    pc: Counter = Counter()
    tc: Counter = Counter()
    for syms, freq in wf.values():
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += freq
        for a, b, c in zip(syms, syms[1:], syms[2:]):
            tc[(a, b, c)] += freq
    newmax: dict = {}
    for (a, b, c), n in tc.items():
        newmax[(b, c)] = max(newmax.get((b, c), 0), n)
        newmax[(a, b)] = max(newmax.get((a, b), 0), n)
    ordered = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    return [
        {"left": l, "right": r, "pair_count": n,
         "newmax": newmax.get((l, r), 0)}
        for (l, r), n in ordered
    ]


def _py_train_batched(wf: dict, n_merges: int, cap: int):
    merges = []
    while len(merges) < n_merges:
        page = _py_page(wf, cap)
        if not page:
            break
        batch = bpe._safe_batch(page, exact_sequence=True)[
            : n_merges - len(merges)
        ]
        merges.extend(batch)
        for left, right, _ in batch:
            wf = {
                w: (_py_merge(s, left, right), f)
                for w, (s, f) in wf.items()
            }
    return merges


@settings(max_examples=400, deadline=None)
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(min_value=1, max_value=8),
    cap=st.sampled_from([1, 2, 3, 64]),
)
def test_safe_batch_equals_sequential_property(words, n_merges, cap):
    wf = {w: (list(w) + [END], f) for w, f in words}
    want = _py_train(dict(wf), n_merges)[0]
    got = _py_train_batched(dict(wf), n_merges, cap)
    assert got == want


def test_driver_fast_path_matches_distributed_pager(spark):
    """The r13 small-vocabulary fast path (one bounded collect +
    driver-side classic loop) must learn the IDENTICAL sequence the
    distributed pager learns, and its final_wf must row-match."""
    from big_data_song_recommendation_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    wf = bpe.word_frequency_table(docs)

    fast, fast_final = bpe.bpe_train(wf, n_merges=12)  # default cap: fast path
    paged, paged_final = bpe.bpe_train(wf, n_merges=12, driver_vocab_cap=0)
    assert fast == paged
    a = {r["word"]: r["syms"] for r in fast_final.collect()}
    b = {r["word"]: r["syms"] for r in paged_final.collect()}
    assert a == b
