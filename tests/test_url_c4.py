"""URL canonicalization (functions/url.py) and C4 line cleaning
(operators/quality.c4_line_filter) semantics on handcrafted cases;
cross-engine byte parity lives in the q153/q154 oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.functions import url as U
from big_data_song_recommendation_spark.operators.quality import (
    c4_line_filter,
)


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    rows = (
        df.select(
            "id",
            U.canonical_url(F.col("url")).alias("c"),
            U.registrable_domain(U.host(F.col("url"))).alias("d"),
        )
        .orderBy("id")
        .collect()
    )
    return [(r["c"], r["d"]) for r in rows]


def test_canonicalization_rules(spark):
    got = _canon(
        spark,
        [
            # case, www., default port, fragment, tracking params, sort
            "HTTPS://WWW.Example.COM:443/a?utm_source=x&b=2&a=1#top",
            # non-default port kept; empty path -> /
            "http://example.com:8080?id=1",
            # http default port dropped; userinfo preserved
            "http://user:pw@Example.com:80/x",
            # all params tracking -> no '?'
            "https://example.com/p?utm_a=1&gclid=2&fbclid=3",
        ],
    )
    assert got[0][0] == "https://example.com/a?a=1&b=2"
    assert got[1][0] == "http://example.com:8080/?id=1"
    assert got[2][0] == "http://user:pw@example.com/x"
    assert got[3][0] == "https://example.com/p"


def test_registrable_domain_heuristic(spark):
    got = _canon(
        spark,
        [
            "https://a.b.example.com/",
            "https://shop.example.co.uk/",
            "https://x.example.com.cn/",
            "https://localhost/",
            # 2-letter TLD with a NON-listed second level: 2 labels
            "https://www.example.de/",
        ],
    )
    assert [d for _, d in got] == [
        "example.com",
        "example.co.uk",
        "example.com.cn",
        "localhost",
        "example.de",
    ]


def test_canonical_is_idempotent(spark):
    urls = [
        "HTTPS://WWW.Example.COM:443/a?utm_source=x&b=2&a=1#top",
        "http://example.com:8080?id=1",
    ]
    once = [c for c, _ in _canon(spark, urls)]
    twice = [c for c, _ in _canon(spark, once)]
    assert once == twice


# -- C4 line filter ---------------------------------------------------------

def _clean(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_line_filter(df, **kw).collect()[0]


def test_c4_each_rule_fires(spark):
    text = "\n".join(
        [
            "This line survives the filter.",  # kept
            "too few.",  # < 3 words
            "no terminal punctuation here",  # no punct
            "Please enable JavaScript to view.",  # blacklist (ci)
            'He said "stop".',  # quote counts as terminal
            "Read our Cookie Policy today.",  # blacklist
            "function() { return 1; }",  # '{' blacklist
        ]
    )
    r = _clean(spark, text)
    assert (r["n_lines"], r["n_kept"]) == (7, 2)
    assert r["clean_text"] == 'This line survives the filter.\nHe said "stop".'
    assert bool(r["kept_doc"]) is True


def test_c4_document_gate_and_options(spark):
    r = _clean(spark, "Only one good line here.\nbad", min_lines_kept=2)
    assert bool(r["kept_doc"]) is False and r["n_kept"] == 1
    # punctuation requirement can be relaxed
    r = _clean(
        spark,
        "three words here\nmore words on this line",
        require_terminal_punct=False,
    )
    assert r["n_kept"] == 2


def test_c4_is_single_projection(spark):
    df = spark.createDataFrame([(1, "a.\nb.")], "doc_id long, text string")
    out = c4_line_filter(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


# -- concat-then-chunk manifest (round-8) ------------------------------------

def test_sequence_manifest_splits_boundary_docs(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        sequence_manifest,
    )

    rows = [("g", 1, 3), ("g", 2, 8), ("g", 3, 0), ("g", 4, 5)]
    df = spark.createDataFrame(rows, "s string, doc long, nt long")
    out = sequence_manifest(df, "s", "doc", "nt", budget=4).collect()
    got = sorted(
        (r["doc"], r["seq_id"], r["doc_from"], r["doc_to"],
         r["n_tokens_in_seq"])
        for r in out
    )
    # stream: doc1 [0,3) doc2 [3,11) doc4 [11,16); budget 4 ->
    # sequences [0,4) [4,8) [8,12) [12,16); doc3 (0 tokens) vanishes
    assert got == [
        (1, 0, 0, 3, 3),
        (2, 0, 0, 1, 1),
        (2, 1, 1, 5, 4),
        (2, 2, 5, 8, 3),
        (4, 2, 0, 1, 1),
        (4, 3, 1, 5, 4),
    ]
    # invariants: each doc's spans partition [0, nt); every sequence
    # except the stratum-last holds exactly `budget` tokens
    per_doc = {}
    per_seq = {}
    for d, s, f, t, n in got:
        per_doc.setdefault(d, []).append((f, t))
        per_seq[s] = per_seq.get(s, 0) + n
    for d, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    assert per_seq == {0: 4, 1: 4, 2: 4, 3: 4}


def test_sequence_manifest_strata_independent(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        sequence_manifest,
    )

    rows = [("a", 1, 5), ("b", 1, 5)]
    df = spark.createDataFrame(rows, "s string, doc long, nt long")
    out = sequence_manifest(df, "s", "doc", "nt", budget=4).collect()
    # each stratum starts its own stream at seq 0
    assert sorted((r["s"], r["seq_id"], r["n_tokens_in_seq"]) for r in out) \
        == [("a", 0, 4), ("a", 1, 1), ("b", 0, 4), ("b", 1, 1)]


# -- URL blocklist stage (q169 operator + front-door composition) ------------


def test_url_blocklist_filter_tiers(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        url_blocklist_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "https://www.spam.example.co.uk/x"),
            (2, "https://ok.example.com/articles/9?x=1"),
            (3, "https://ok.example.com/casino/9?x=1"),
            (4, "https://sub.deep.good.org/fine"),
        ],
        "doc_id long, url string",
    )
    rows = {
        r.doc_id: r
        for r in url_blocklist_filter(
            df,
            ["example.co.uk"],
            blocked_url_patterns=(r"/casino/",),
        ).collect()
    }
    assert rows[1].blocked_domain and not rows[1].blocked_pattern
    assert rows[1].url_domain == "example.co.uk"
    assert not rows[2].blocked_domain and not rows[2].blocked_pattern
    assert rows[2].kept_url
    assert rows[3].blocked_pattern and not rows[3].kept_url
    assert rows[4].kept_url and rows[4].url_domain == "good.org"
    # blocklist can also arrive as a DataFrame
    bdf = spark.createDataFrame([("good.org",)], "domain string")
    rows2 = {
        r.doc_id: r for r in url_blocklist_filter(df, bdf).collect()
    }
    assert rows2[4].blocked_domain and not rows2[1].blocked_domain


def test_url_blocklist_null_url_gets_explicit_verdict(spark):
    """ADVICE r9: rlike(NULL) is NULL — a null/unparseable URL must get
    an explicit kept_url verdict (kept, url_domain NULL as the audit
    signal), never a NULL that downstream filters silently drop."""
    from big_data_song_recommendation_spark.operators.quality import (
        url_blocklist_filter,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "https://ok.example.com/a")],
        "doc_id long, url string",
    )
    rows = {
        r.doc_id: r
        for r in url_blocklist_filter(
            df, ["example.co.uk"], blocked_url_patterns=(r"/casino/",)
        ).collect()
    }
    assert rows[1].kept_url is True and rows[1].blocked_pattern is False
    assert rows[1].url_domain is None
    assert rows[2].kept_url is True


def test_front_door_blocks_urls_before_extraction(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        crawl_front_door,
    )

    html = (
        "<html><body><p>Plenty of ordinary readable words right here.</p>"
        "<p>And a second clean line for the keep gate.</p></body></html>"
    )
    df = spark.createDataFrame(
        [
            (1, html, "https://blocked.example.co.uk/a"),
            (2, html, "https://fine.example.com/b"),
        ],
        "doc_id long, html string, url string",
    )
    out = crawl_front_door(
        df, url_col="url", blocked_domains=["example.co.uk"]
    )
    assert [r.doc_id for r in out.collect()] == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="needs url_col"):
        crawl_front_door(df, blocked_domains=["example.co.uk"])


# -- mojibake repair (q170 operator) ------------------------------------------


def test_mojibake_roundtrip_and_passthrough(spark):
    from big_data_song_recommendation_spark.functions.text import (
        _MOJIBAKE_TARGETS,
        _cp1252_or_latin1,
        repair_mojibake,
    )
    from pyspark.sql import functions as F

    def moji(s):
        return "".join(_cp1252_or_latin1(b) for b in s.encode("utf-8"))

    clean = "café — it’s “great” naïve ½ " + _MOJIBAKE_TARGETS
    df = spark.createDataFrame(
        [(1, moji(clean)), (2, clean), (3, "plain ascii only.")],
        "i int, t string",
    )
    rows = {
        r.i: r.fixed
        for r in df.select("i", repair_mojibake("t").alias("fixed")).collect()
    }
    # one-decode-deep mojibake repairs exactly; clean text unchanged
    assert rows[1] == clean
    assert rows[2] == clean
    assert rows[3] == "plain ascii only."


def test_mojibake_pairs_are_longest_first(spark):
    from big_data_song_recommendation_spark.functions.text import (
        MOJIBAKE_PAIRS,
    )

    lens = [len(m) for m, _ in MOJIBAKE_PAIRS]
    assert lens == sorted(lens, reverse=True)
    assert all(len(f) == 1 for _, f in MOJIBAKE_PAIRS)
    # generated, not hand-typed: every pair round-trips at byte level
    from big_data_song_recommendation_spark.functions.text import (
        _cp1252_or_latin1,
    )

    for m, f in MOJIBAKE_PAIRS:
        assert m == "".join(_cp1252_or_latin1(b) for b in f.encode("utf-8"))


# -- C4's GLOBAL line rule (round 11) -------------------------------------------


def test_corpus_line_dedup_removes_every_copy_above_cap(spark):
    from pyspark.sql import functions as F

    from big_data_song_recommendation_spark.operators.quality import (
        dedup_lines_across_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "Cookie banner.\nunique one.\nshared twice."),
            (2, "Cookie banner.\nunique two.\nShared Twice. "),
            (3, "Cookie banner.\nunique three."),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines_across_corpus(docs, max_occurrences=1).collect()
    }
    # banner (3 copies) drops everywhere; the normalized-key pair
    # ("shared twice." vs "Shared Twice. ") counts as 2 > cap → drops
    assert out[1]["clean_text"] == "unique one."
    assert out[2]["clean_text"] == "unique two."
    assert out[3]["clean_text"] == "unique three."
    assert out[1]["n_removed"] == 2 and out[3]["n_removed"] == 1
    # cap=2 keeps the pair, still drops the 3-copy banner
    out2 = {
        r["doc_id"]: r
        for r in dedup_lines_across_corpus(docs, max_occurrences=2).collect()
    }
    assert out2[1]["clean_text"] == "unique one.\nshared twice."
    assert out2[2]["clean_text"] == "unique two.\nShared Twice. "


def test_corpus_line_dedup_empty_exempt_and_zero_fill(spark):
    from big_data_song_recommendation_spark.operators.quality import (
        dedup_lines_across_corpus,
    )

    docs = spark.createDataFrame(
        [
            (1, "same.\n\nsame."),
            (2, "same.\n\nsame."),
            (3, "keep me."),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines_across_corpus(docs, max_occurrences=1).collect()
    }
    # "same." has 4 corpus copies → all drop; empty lines are exempt
    # (the sole survivor), so the rebuilt text is the one empty line
    assert out[1]["clean_text"] == "" and out[2]["clean_text"] == ""
    assert out[1]["n_kept_lines"] == 1  # the exempt empty line
    assert out[3]["clean_text"] == "keep me."
    # a doc can lose every non-empty line and still emit its audit row
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
