"""Property-based tests (hypothesis) for the cross-engine primitives
the oracle gate rests on, and algebraic invariants of the cleaning and
dedup operators. Each example evaluates one small Spark job over a
generated batch."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.functions.scalars import (
    format_duration,
    md5_bucket,
    stable_round,
)
from big_data_song_recommendation_spark.operators.clean import clean
from big_data_song_recommendation_spark.operators.dedup import hash60

SETTINGS = dict(max_examples=10, deadline=None)

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@settings(**SETTINGS)
@given(st.lists(finite_doubles, min_size=1, max_size=40))
def test_stable_round_matches_duckdb(spark, duck, xs):
    """floor(x·1e4)/1e4 must agree bit-for-bit across engines — the
    portability claim stable_round exists for (plain ROUND does not
    hold cross-engine on .5 boundaries)."""
    df = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    got = [r["y"] for r in df.select(stable_round("x", 4).alias("y")).collect()]
    want = [
        r[0]
        for r in duck.execute(
            "SELECT floor(x * 10000) / 10000 FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            [list(map(float, xs))],
        ).fetchall()
    ]
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=30))
def test_hash60_matches_duckdb_and_range(spark, duck, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = [r["h"] for r in df.select(hash60(F.col("k")).alias("h")).collect()]
    want = [
        r[0]
        for r in duck.execute(
            "SELECT CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT)"
            " FROM (SELECT unnest(?::VARCHAR[]) AS k)",
            [list(keys)],
        ).fetchall()
    ]
    assert got == want
    assert all(0 <= h < 2**60 for h in got)


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=30))
def test_format_duration_matches_python(spark, ms_list):
    df = spark.createDataFrame([(m,) for m in ms_list], ["ms"])
    got = [r["d"] for r in df.select(format_duration("ms").alias("d")).collect()]
    want = [f"{m // 60000}:{(m % 60000) // 1000:02d}" for m in ms_list]
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(
            finite_doubles,
            st.just(float("nan")),
            st.just(float("inf")),
            st.just(float("-inf")),
            st.none(),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_clean_is_idempotent_and_total(spark, xs):
    """clean() leaves no missing values in defaulted columns and is a
    fixpoint: clean(clean(df)) == clean(df)."""
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    once = clean(df, {"x": 0.5})
    vals = [r["x"] for r in once.collect()]
    assert all(v is not None and math.isfinite(v) for v in vals)
    twice = [r["x"] for r in clean(once, {"x": 0.5}).collect()]
    assert vals == twice


@settings(**SETTINGS)
@given(st.lists(st.text(st.characters(codec="ascii"), max_size=20), min_size=1, max_size=25))
def test_md5_bucket_stable_and_bounded(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    a = [r["b"] for r in df.select(md5_bucket("k", 100).alias("b")).collect()]
    b = [r["b"] for r in df.select(md5_bucket("k", 100).alias("b")).collect()]
    assert a == b  # deterministic across evaluations
    assert all(0 <= x < 100 for x in a)


@settings(**SETTINGS)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
def test_normalized_text_matches_duckdb_on_unicode(spark, duck, texts):
    """The dedup-normalization expression agrees with its oracle SQL
    twin on arbitrary unicode — beyond the ASCII-only corpus the
    oracle queries exercise."""
    from big_data_song_recommendation_spark.functions import text as Ftext

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["t"] for r in df.select(Ftext.normalized_text("text").alias("t")).collect()]
    sql = (
        "trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9\\s]', ' ', 'g'),"
        " '\\s+', ' ', 'g'))"
    )
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {sql} FROM (SELECT unnest(?::VARCHAR[]) AS t)", [list(texts)]
        ).fetchall()
    ]
    assert got == want


# Code points from Unicode blocks stably assigned since ≤ Unicode 13
# (Java 17's regex table version). The two engines CANNOT agree on
# letter-hood of code points assigned later (e.g. U+1E4D0 Nag Mundari,
# Unicode 15: RE2's newer tables say \p{L}, Java 17 says unassigned) —
# that's a JVM-table-version gap, not a pattern bug, and it vanishes
# as the JDK updates. Parity is claimed and tested for text drawn
# from long-stable scripts: ASCII + controls (incl. \x0B), Latin
# extended, Greek, Cyrillic, Devanagari, kana, CJK, emoji.
_STABLE_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x09, max_codepoint=0x0D),  # \t\n\x0b\f\r
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),  # ASCII
        st.characters(min_codepoint=0xA0, max_codepoint=0x24F),  # Latin ext
        st.characters(min_codepoint=0x391, max_codepoint=0x4FF),  # Greek/Cyr
        st.characters(min_codepoint=0x904, max_codepoint=0x939),  # Devanagari
        st.characters(min_codepoint=0x3041, max_codepoint=0x30FE),  # kana
        st.characters(min_codepoint=0x4E00, max_codepoint=0x9FCC),  # CJK
        st.characters(min_codepoint=0x1F300, max_codepoint=0x1F64F),  # emoji
    ),
    max_size=60,
)


@settings(**SETTINGS)
@given(st.lists(_STABLE_TEXT, min_size=1, max_size=20))
def test_bpe_token_count_matches_duckdb_on_unicode(spark, duck, texts):
    """The BPE pre-tokenizer counter must agree across Java regex
    (Spark) and RE2 (DuckDB) on multilingual text from stably-assigned
    Unicode blocks — the portability the lookahead-free, explicit-
    whitespace pattern exists for (see _STABLE_TEXT for why arbitrary
    code points can't be promised across engine table versions)."""
    from big_data_song_recommendation_spark.functions.text import (
        BPE_TOKEN_PATTERN,
        bpe_token_count,
    )

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["n"] for r in df.select(bpe_token_count("text").alias("n")).collect()]
    want = [
        r[0]
        for r in duck.execute(
            "SELECT len(regexp_extract_all(t, ?))"
            " FROM (SELECT unnest(?::VARCHAR[]) AS t)",
            [BPE_TOKEN_PATTERN, list(texts)],
        ).fetchall()
    ]
    assert got == want


_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=4)


@settings(max_examples=8, deadline=None)
@given(
    pre=st.lists(_tok, min_size=0, max_size=10),
    shared=st.lists(_tok, min_size=6, max_size=12),  # >= window + k - 1
    post=st.lists(_tok, min_size=0, max_size=10),
)
def test_winnowing_guarantee(spark, pre, shared, post):
    """Schleimer et al. thm: two docs sharing a token run of length
    >= window + k - 1 (= 6 at k=3, w=4) share at least one selected
    fingerprint, for ANY surrounding context."""
    from big_data_song_recommendation_spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(pre + shared)),
            (2, " ".join(shared + post)),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=3, window=4)
    by_doc = {
        r["doc_id"]: set()
        for r in fps.select("doc_id").distinct().collect()
    }
    for r in fps.collect():
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc.get(1, set()) & by_doc.get(2, set()), (
        f"no shared fingerprint for shared run {shared!r}"
    )


word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
doc_text = st.lists(word, min_size=0, max_size=40).map(" ".join)


@settings(**SETTINGS)
@given(st.lists(doc_text, min_size=1, max_size=12))
def test_chunk_dedup_invariants(spark, texts):
    """(1) retained chunk contents are globally unique, (2) every
    distinct chunk content has exactly one retained copy, (3) the
    retained copy is the lexicographically-first (id, idx) holder —
    for any corpus."""
    from big_data_song_recommendation_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = chunk_dedup(df, "doc_id", "text", chunk_tokens=3).collect()
    retained = [r for r in rows if r["retained"]]
    assert len({r["chunk"] for r in retained}) == len(retained)
    assert {r["chunk"] for r in retained} == {r["chunk"] for r in rows}
    first = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        first.setdefault(r["chunk"], (r["doc_id"], r["chunk_idx"]))
    for r in rows:
        assert r["retained"] == (first[r["chunk"]] == (r["doc_id"], r["chunk_idx"]))


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=20),
)
def test_pack_sequences_conservation_and_monotonicity(spark, toks, budget):
    """Packs are contiguous in doc order, ids are non-decreasing, and
    every pack except possibly the last STARTS below the budget
    boundary it belongs to (greedy concat-and-chunk semantics)."""
    from big_data_song_recommendation_spark.operators.quality import (
        pack_sequences,
    )

    rows = [("g", i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["g", "doc_id", "n"])
    out = sorted(
        pack_sequences(df, "g", "doc_id", "n", budget=budget).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    prev_pack = 0
    for r in out:
        assert r["pack_id"] == cum // budget
        assert r["pack_id"] >= prev_pack
        prev_pack = r["pack_id"]
        cum += r["n"]


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e6, max_value=1e6),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_bucketed_rank_equals_global_window(spark, rows, bins):
    """Two-phase bucketed_rank must reproduce the global row_number
    for ANY value distribution (ties, negatives, constants) and ANY
    bin count — the exactness contract the single-partition-window
    rewrites rest on."""
    from pyspark.sql import Window

    from big_data_song_recommendation_spark.operators.ranks import (
        bucketed_rank,
        with_equi_width_bucket,
    )

    df = spark.createDataFrame(
        [(float(v), i) for i, (v, _) in enumerate(rows)], ["v", "k"]
    )
    w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
    want = {
        (r.k, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    got = bucketed_rank(
        with_equi_width_bucket(df, "v", bins=bins),
        [F.col("v").asc(), F.col("k").asc()],
        ["__vb"],
        out="rn",
    )
    assert {(r.k, r.rn) for r in got.collect()} == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e6, max_value=1e6),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_bucketed_cumsum_and_avg_rank_equal_window_forms(spark, rows, bins):
    """bucketed_cumsum must reproduce the inclusive running window sum
    and bucketed_avg_rank the rank()+(ties−1)/2 fractional rank for
    ANY value distribution and bin count."""
    from pyspark.sql import Window

    from big_data_song_recommendation_spark.operators.ranks import (
        bucketed_avg_rank,
        bucketed_cumsum,
        with_equi_width_bucket,
    )

    df = spark.createDataFrame(
        [(float(v), int(w), i) for i, (v, w) in enumerate(rows)],
        ["v", "wgt", "k"],
    )
    wc = (
        Window.orderBy("v", "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want_cum = {
        (r.k, r.c)
        for r in df.withColumn("c", F.sum("wgt").over(wc)).collect()
    }
    got_cum = bucketed_cumsum(
        with_equi_width_bucket(df, "v", bins=bins),
        [F.col("v").asc(), F.col("k").asc()],
        ["__vb"],
        "wgt",
        out="c",
    )
    assert {(r.k, r.c) for r in got_cum.collect()} == want_cum

    wr = Window.orderBy("v")
    wt = Window.partitionBy("v")
    want_ar = {
        (r.k, r.ar)
        for r in df.withColumn(
            "ar", F.rank().over(wr) + (F.count("*").over(wt) - 1) / 2.0
        ).collect()
    }
    got_ar = bucketed_avg_rank(
        with_equi_width_bucket(df, "v", bins=bins), "v", ["__vb"], out="ar"
    )
    assert {(r.k, r.ar) for r in got_ar.collect()} == want_ar


# ---- round-7 operators ----------------------------------------------------

_gap_lists = st.lists(
    st.floats(min_value=0.01, max_value=30.0, allow_nan=False),
    min_size=1,
    max_size=50,
)


@settings(**SETTINGS)
@given(gaps=_gap_lists, cd=st.floats(min_value=0.5, max_value=20.0))
def test_debounce_fold_matches_python_reference(spark, gaps, cd):
    """The Catalyst run-fold must implement vs-last-KEPT debounce for
    ANY gap structure — boundary gaps equal to the cooldown, long
    runs, single events."""
    import datetime as dt

    from big_data_song_recommendation_spark.operators.debounce import (
        debounce_py_reference,
        debounce_stateful,
    )

    base = dt.datetime(2026, 1, 1)
    t, rows, secs = 0.0, [], []
    for i, g in enumerate(gaps):
        t += g
        # quantize to whole µs BEFORE both paths: timestamps store µs,
        # and timedelta's half-µs rounding would otherwise hand the
        # reference a gap a half-µs larger than the fold sees — a
        # false mismatch exactly at gap == cooldown (hypothesis found
        # gaps=[1.015625, 0.5234375], cd=0.5234375)
        t_us = round(t * 1e6)
        rows.append((1, base + dt.timedelta(microseconds=t_us), i))
        secs.append((1, t_us / 1e6, i))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = sorted(
        r.event_id
        for r in debounce_stateful(
            df, keys=["user_id"], cooldown_s=cd, impl="fold"
        ).collect()
    )
    want = sorted(tie for _, _, tie in debounce_py_reference(secs, cd))
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            st.sampled_from("abcd efgh "), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=15,
    )
)
def test_dsir_weights_deterministic_and_bounded(spark, texts):
    """DSIR scores: integer weights, invariant under repartitioning,
    and bounded by the max per-bucket score (scale·(t_max+1))."""
    from pyspark.sql import functions as F  # noqa: F811

    from big_data_song_recommendation_spark.operators.quality import (
        dsir_scores,
    )

    rows = [(i, s, "en" if i % 2 == 0 else "de") for i, s in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    a = {
        r.doc_id: r.weight_pt
        for r in dsir_scores(df, F.col("lang") == "en", n_buckets=32).collect()
    }
    b = {
        r.doc_id: r.weight_pt
        for r in dsir_scores(
            df.repartition(5), F.col("lang") == "en", n_buckets=32
        ).collect()
    }
    assert a == b
    n_grams_total = sum(
        max(len([w for w in s.split() if w]) - 1, 0) for s in texts
    )
    assert all(
        isinstance(v, int) and 0 <= v <= 1_000_000 * (n_grams_total + 1)
        for v in a.values()
    )


# -- round-9 continuation operators ------------------------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", blacklist_characters="\n"
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_line_dedup_matches_python_reference(spark, lines):
    """Keep-first on the normalized key, survivors in original order —
    the array-lambda plan must equal the obvious Python fold."""
    from big_data_song_recommendation_spark.operators.quality import (
        dedup_lines_within_doc,
    )

    text = "\n".join(lines)
    row = dedup_lines_within_doc(
        spark.createDataFrame([(1, text)], "i int, text string")
    ).collect()[0]
    seen, want = set(), []
    for ln in text.split("\n"):
        # strip(' ') — SPACES ONLY, matching the operator's documented
        # key lower(trim(line)) (SQL trim in Spark AND DuckDB removes
        # only ' '; Python's bare .strip() also eats \r/\t, which
        # hypothesis eventually caught with lines=['', '\r']). CRLF
        # ownership: control-char normalization belongs to the
        # extraction/mojibake stages upstream, not the line key.
        key = ln.strip(" ").lower()
        if key not in seen:
            seen.add(key)
            want.append(ln)
    assert row.dedup_text == "\n".join(want)
    assert row.n_kept_lines == len(want)
    assert row.n_removed == len(text.split("\n")) - len(want)


@settings(**SETTINGS)
@given(
    st.text(
        alphabet=(
            "abc éè—’“”€…ñç½"  # targets + ascii; no raw mojibake input
        ),
        min_size=0,
        max_size=60,
    )
)
def test_mojibake_repair_roundtrip_property(spark, s):
    """repair(misread(s)) == s for any string over the repaired
    alphabet, and repair(s) == s (clean text is a fixed point)."""
    from big_data_song_recommendation_spark.functions.text import (
        _cp1252_or_latin1,
        repair_mojibake,
    )

    moji = "".join(_cp1252_or_latin1(b) for b in s.encode("utf-8"))
    df = spark.createDataFrame([(moji,), (s,)], ["t"])
    got = [r.f for r in df.select(repair_mojibake("t").alias("f")).collect()]
    assert got == [s, s]


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
            min_size=3,
            max_size=12,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_near_dup_estimate_is_signature_agreement(spark, docs):
    """The probe's est_jaccard_micro must equal the Python-computed
    signature agreement for every banded candidate pair (corpus =
    even rows, probes = odd rows of the generated batch)."""
    from big_data_song_recommendation_spark.operators.dedup import (
        MINHASH_PRIME,
        _affine,
        near_dup_pairs_vs_corpus,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    corpus = [r for r in rows if r[0] % 2 == 0]
    probes = [r for r in rows if r[0] % 2 == 1]
    if not probes:
        return
    got = {
        (r.probe_id, r.corpus_id): r.est_jaccard_micro
        for r in near_dup_pairs_vs_corpus(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            spark.createDataFrame(probes, "doc_id long, text string"),
            threshold_micro=0,
        ).collect()
    }

    import hashlib

    def sig(text):
        shingles = set()
        toks = [t for t in "".join(
            ch if ch.isalnum() else " " for ch in text.lower()
        ).split() if t]
        for i in range(len(toks) - 2):
            shingles.add(" ".join(toks[i : i + 3]))
        if not shingles:
            return None
        out = []
        for hi in range(16):
            a, b = _affine(hi)
            out.append(
                min(
                    (a * (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                          % MINHASH_PRIME) + b) % MINHASH_PRIME
                    for s in shingles
                )
            )
        return tuple(out)

    sigs = {i: sig(t) for i, t in rows}
    for (p, c), est in got.items():
        sp, sc = sigs[p], sigs[c]
        agree = sum(1 for a, b in zip(sp, sc) if a == b)
        assert est == (agree * 1_000_000) // 16, (p, c)
