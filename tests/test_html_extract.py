"""HTML → text extraction tiers (functions/html.py).

The cross-engine byte-parity claim lives in the q151 oracle; these
tests pin the SEMANTICS of each tier on handcrafted markup, including
the degradation contract for pathological input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_song_recommendation_spark.functions import html as H


def _extract(spark, pages):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "id long, html string"
    )
    rows = (
        df.select(
            "id",
            H.extract_text(F.col("html")).alias("t"),
            H.link_density_micro(F.col("html")).alias("ld"),
        )
        .orderBy("id")
        .collect()
    )
    return [(r["t"], r["ld"]) for r in rows]


def test_full_page_pipeline(spark):
    page = (
        '<html><head><style>p{}</style><script>var x = "<p>no</p>";'
        "</script></head><body><nav>Home | About</nav>"
        "<article><h1>Title</h1><p>Hello &amp;amp; world &lt;tag&gt;"
        " &nbsp; ok</p><ul><li>a</li><li>b</li></ul></article>"
        "<footer>(c) corp</footer></body></html>"
    )
    [(t, _)] = _extract(spark, [page])
    # script/style/nav/footer gone; article isolated; blocks become
    # newlines; &amp;amp; single-pass decodes to the literal &amp;
    assert t == "Title\nHello &amp; world <tag> ok\na\nb"


def test_noise_blocks_removed_wholesale(spark):
    [(t, _)] = _extract(
        spark,
        [
            "<body>keep<script>drop();</script><style>.x{}</style>"
            "<nav>drop</nav><header>drop</header><aside>drop</aside>"
            "<form><input>drop</form><noscript>drop</noscript>"
            "<footer>drop</footer><!-- drop -->also keep</body>"
        ],
    )
    assert t == "keepalso keep"


def test_main_content_preference_order(spark):
    # article beats main beats body; missing tiers fall through
    got = _extract(
        spark,
        [
            "<body>x<main>y<article>z</article></main></body>",
            "<body>x<main>y</main></body>",
            "<body>x</body>",
            "plain, no markup",
        ],
    )
    assert [t for t, _ in got] == ["z", "y", "x", "plain, no markup"]


def test_entities_and_whitespace(spark):
    [(t, _)] = _extract(
        spark,
        ["<p>a&nbsp;&nbsp;b\t c</p>\n\n  <p>&quot;q&#39;s&quot; &gt;&lt;</p>"],
    )
    assert t == 'a b c\n"q\'s" ><'


def test_link_density_signal(spark):
    got = _extract(
        spark,
        [
            '<body><a href="/1">l1</a><a href="/2">l2</a>x</body>',
            "<body>no links at all here</body>",
            '<body><a href="/">everything is a link</a></body>',
        ],
    )
    assert got[0][1] == 4_000_000 // 5  # 4 anchor chars / "l1l2x"
    assert got[1][1] == 0
    assert got[2][1] == 1_000_000
    # <article>/<aside> must never be counted as anchors
    [(_, ld)] = _extract(
        spark, ["<article>long prose body with no anchor</article>"]
    )
    assert ld == 0


def test_pathological_markup_degrades_gracefully(spark):
    # an unclosed <script> can't match the block pattern, so its TEXT
    # leaks through after tag flattening (deterministic degradation,
    # never a crash); unclosed <p> soup stays deterministic; NULL in →
    # NULL out
    got = _extract(
        spark,
        [
            "<body>keep<script>var x = 1; never closed</body>",
            "<body><p>a<p>b</body>",
            None,
        ],
    )
    assert got[0][0] == "keepvar x = 1; never closed"
    assert got[1][0] == "a\nb"
    assert got[2] == (None, 0)


def test_extraction_is_pure_codegen(spark):
    """No UDF / Python / Generate node anywhere in the plan — the
    100 TB claim is that extraction rides whole-stage codegen."""
    df = spark.createDataFrame([(1, "<p>x</p>")], "id long, html string")
    out = df.select(H.extract_text(F.col("html")).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SQL UDF"):
        assert bad not in plan, plan
    # the codegen'd Project prints with the `*(n)` stage marker
    assert plan.lstrip().startswith("*("), plan
