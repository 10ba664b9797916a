"""DuckDB oracle SQL twins for :mod:`.queries`.

Dialect parity notes (the gotchas encoded below):

- DuckDB ``regexp_replace`` is first-match unless the ``'g'`` flag is
  passed; Spark replaces all occurrences. Every oracle regex carries
  ``'g'``.
- DuckDB numeric literals like ``5.0`` are DECIMAL; Spark's are double.
  CASE branches cast explicitly so output schemas line up.
- Timestamps are formatted to strings in both engines (Spark is
  session-TZ'd UTC, DuckDB naive-UTC).
- Computed floats are rounded identically on both sides.
"""

from __future__ import annotations

_NORMALIZED_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)

_TOKEN_COUNT = (
    "CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)

# 60-bit md5-derived hash — the SQL twin of operators.dedup.hash60
def _hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# 32-bit md5 bucket — the SQL twin of functions.scalars.md5_bucket
def _MD5B(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# distinct 3-word shingle sets of normalized text, as a CTE body
_SHINGLE_SETS = f"""
    SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(t) - 2, 0) + 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM (SELECT doc_id, string_split({_NORMALIZED_TEXT}, ' ') AS t
              FROM documents)
    )
"""

_JACCARD_PAIRS = f"""
    WITH sets AS ({_SHINGLE_SETS}),
    sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
    FROM inter
    JOIN sizes na ON id_a = na.doc_id
    JOIN sizes nb ON id_b = nb.doc_id
    WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5
    ORDER BY id_a, id_b
"""

# affine family h_i = (a_i*base + b_i) mod p over one 60-bit base hash
# (the SQL twin of operators.dedup.signatures_from_sets / _affine)
_MINHASH_P = 2_147_483_647
_MINHASH_COLS = ",\n               ".join(
    f"MIN(({2 * i + 1} * ({_hash60('s')} % {_MINHASH_P}) + {1_000_003 * i + 12_345})"
    f" % {_MINHASH_P}) AS h{i}"
    for i in range(8)
)

_SIMHASH_BITS = 16
_SIMHASH_SUMS = ",\n               ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(_SIMHASH_BITS)
)
_SIMHASH_PACK = " + ".join(
    f"(CASE WHEN b{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for b in range(_SIMHASH_BITS)
)

_STOPWORD_LISTS = {
    "en": "['the','a','and','of','to','in','is','it','that','for']",
    "es": "['el','la','de','que','y','en','un','una','los','por']",
    "fr": "['le','la','de','et','un','une','les','des','que','pour']",
    "de": "['der','die','das','und','ein','eine','zu','mit','von','ist']",
}

_RAW_TOKENS_LOWER = "list_transform(regexp_split_to_array(trim(text), '\\s+'), t -> lower(t))"


# (doc_id, lang, quality) — the q22 quality score as a reusable CTE
# body (q94's survivorship policy ranks clusters by it)
_DOC_QUALITY = f"""
    SELECT doc_id, lang,
           floor((CAST(0.4 AS DOUBLE) * len_score
                  + CAST(0.3 AS DOUBLE) * punct_score
                  + CAST(0.3 AS DOUBLE) * sw_score) * 10000.0) / 10000.0
             AS quality
    FROM (
        SELECT doc_id, lang,
               CASE WHEN n_tokens >= 50 THEN CAST(1.0 AS DOUBLE)
                    ELSE n_tokens / CAST(50.0 AS DOUBLE) END AS len_score,
               greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                   CAST(1.0 AS DOUBLE) - punct_ratio * 4)) AS punct_score,
               greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                   sw_ratio * 5)) AS sw_score
        FROM (
            SELECT doc_id, lang,
                   {{tc}} AS n_tokens,
                   CASE WHEN len(text) > 0 THEN
                       (len(text) - len(regexp_replace(text,
                            '[^A-Za-z0-9 ]', '', 'g')))
                       * 1.0 / len(text)
                   ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
                   CASE WHEN {{tc}} > 0 THEN
                       len(list_filter({{raw}},
                           t -> list_contains({{sw}}, t)))
                       * 1.0 / ({{tc}})
                   ELSE CAST(0.0 AS DOUBLE) END AS sw_ratio
            FROM documents
        )
    )
""".format(tc=_TOKEN_COUNT, raw=_RAW_TOKENS_LOWER, sw=_STOPWORD_LISTS["en"])


def _votes(lang: str) -> str:
    return (
        f"len(list_filter({_RAW_TOKENS_LOWER},"
        f" t -> list_contains({_STOPWORD_LISTS[lang]}, t)))"
    )


def _bpe_base_ctes() -> list[str]:
    """word_frequency_table's twin: corpus → (word, freq, char syms)."""
    return [
        """words AS (
            SELECT tok AS word, COUNT(*) AS freq FROM (
                SELECT unnest(string_split_regex(lower(text),
                              '[^a-z0-9]+')) AS tok
                FROM documents
            ) WHERE tok <> '' GROUP BY 1
        )""",
        """r0 AS (
            SELECT word, freq,
                   list_append(string_split(word, ''), '</w>') AS s
            FROM words
        )""",
    ]


def _bpe_round_ctes(n_merges: int, *, need_final: bool) -> list[str]:
    """The shared per-round CTE chain of the BPE twins (q139/q152):
    pair counts, argmax with the trainer's tie-break, the greedy
    re-merge. ``need_final=True`` also materializes ``r{n_merges}`` —
    the vocabulary with ALL merges applied (the encode twin)."""
    ctes: list[str] = []
    for i in range(n_merges):
        ctes.append(
            f"""e{i} AS (
            SELECT freq, s, unnest(range(1, len(s))) AS ix FROM r{i}
        )"""
        )
        ctes.append(
            f"""p{i} AS (
            SELECT s[ix] AS pl, s[ix + 1] AS pr, SUM(freq) AS cnt
            FROM e{i} GROUP BY 1, 2
        )"""
        )
        ctes.append(
            f"""b{i} AS (
            SELECT pl, pr, cnt FROM p{i}
            ORDER BY cnt DESC, pl, pr LIMIT 1
        )"""
        )
        if need_final or i < n_merges - 1:
            ctes.append(
                f"""r{i + 1} AS (
            SELECT word, freq,
                   string_split(trim(replace(
                       '|' || array_to_string(s, '||') || '|',
                       '|' || b.pl || '||' || b.pr || '|',
                       '|' || b.pl || b.pr || '|'), '|'), '||') AS s
            FROM r{i}, b{i} b
        )"""
            )
    return ctes


def _bpe_merges_sql(n_merges: int) -> str:
    """q139 twin: the BPE trainer's merge rounds UNROLLED as chained
    CTE stages (the round count is a fixed query parameter, so no
    recursion is needed). Each round is (a) adjacent-pair counts via
    unnest over 1..len(s)-1, (b) argmax pair with the trainer's exact
    tie-break (count desc, left asc, right asc), (c) the greedy
    LEFTMOST NON-OVERLAPPING re-merge — expressed as plain string
    ``replace`` over the symbol list joined as ``|sym1||sym2||…|``:
    SQL replace scans left-to-right and never rematches inside its own
    replacement, which IS the reference's regex merge semantics
    (operators/bpe.merge_pair_expr replicates the same fold in
    Catalyst), and the doubled-``|`` wrapping keeps each symbol's
    delimiters intact so back-to-back merges still match
    (``|a||a||a||a|`` → ``|aa||aa|``). ``|`` can never occur in a
    symbol: tokens are [a-z0-9]+ plus the ``</w>`` end mark.
    SUM(freq) is HUGEINT in DuckDB — cast back to BIGINT for the
    output schema."""
    ctes = _bpe_base_ctes() + _bpe_round_ctes(n_merges, need_final=False)
    unions = "\n            UNION ALL ".join(
        f'SELECT {i + 1} AS step, pl AS "left", pr AS "right",'
        f" pl || pr AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return (
        "WITH " + ",\n        ".join(ctes) + f"""
        SELECT * FROM (
            {unions}
        ) ORDER BY step
    """
    )


def _bpe_tokens_sql(n_merges: int, top: int) -> str:
    """q152 twin: the trainer chain carried one re-merge further (the
    vocabulary with ALL ``n_merges`` rules applied = the ENCODED
    corpus at word grain), then token statistics — occurrences keep
    word multiplicity (unnest before grouping), words are counted
    distinct. Same tie-break as the Spark side (total_freq desc,
    token asc)."""
    ctes = _bpe_base_ctes() + _bpe_round_ctes(n_merges, need_final=True)
    return (
        "WITH " + ",\n        ".join(ctes) + f"""
        SELECT tok AS token,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
               CAST(SUM(freq) AS BIGINT) AS total_freq
        FROM (SELECT word, freq, unnest(s) AS tok FROM r{n_merges})
        GROUP BY 1
        ORDER BY total_freq DESC, token ASC
        LIMIT {top}
    """
    )


#: the q151 page synthesis (module constant so q158 can reference it)
_Q151_PAGE = (
    "'<html><head><title>d</title><style>p{margin:0}</style>"
    '<script>var a = "<p>not text</p>";</script></head><body>'
    """<nav><a href="/">Home</a> | <a href="/about">About</a></nav>"""
    "<article><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'"
    " || text || ' &amp; more &lt;raw&gt;</p><ul><li>lang: '"
    " || lang || '</li><li>source: ' || source || "
    """'</li></ul><a href="/next">next doc</a></article>"""
    "<footer>&copy; corp</footer></body></html>'"
)


def _extraction_ctes(page: str) -> str:
    """The functions/html.py tier chain as a reusable CTE fragment
    ``h → s → m → f`` (f carries ``doc_id, extracted, atxt``) over an
    arbitrary page-synthesis SQL expression — shared by the q151 twin
    and the q158 front-door rollup twin (patterns generated from the
    SAME lists as the Spark side, so the twins cannot drift)."""
    from ..functions.html import (
        _BLOCK_TAGS,
        _ENTITIES,
        noise_block_patterns,
    )

    noise = "html"
    for pat in noise_block_patterns():
        noise = f"regexp_replace({noise}, '{pat}', '', 'g')"
    main = "t"
    for tag in ("article", "main", "body"):
        pat = f"(?is)<{tag}[^>]*>(.*?)</{tag}>"
        main = (
            f"CASE WHEN regexp_matches({main}, '{pat}')"
            f" THEN regexp_extract({main}, '{pat}', 1) ELSE {main} END"
        )

    def flatten(expr: str) -> str:
        e = (
            f"regexp_replace({expr},"
            f" '(?is)</?(?:{_BLOCK_TAGS})[^>]*>', chr(10), 'g')"
        )
        e = f"regexp_replace({e}, '(?s)<[^>]*>', '', 'g')"
        for ent, ch in _ENTITIES:
            e = f"replace({e}, '{ent}', '{ch.replace(chr(39), chr(39) * 2)}')"
        e = f"regexp_replace({e}, '[ \\t\\r]+', ' ', 'g')"
        e = f"regexp_replace({e}, ' ?\\n[ \\n]*', chr(10), 'g')"
        return f"trim({e}, ' ' || chr(10))"

    anchors = (
        "array_to_string(regexp_extract_all(html,"
        " '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), '')"
    )
    return f"""h AS (SELECT doc_id, {page} AS html FROM documents),
        s AS (SELECT doc_id, html, {noise} AS t FROM h),
        m AS (SELECT doc_id, html, {main} AS t FROM s),
        f AS (SELECT doc_id, {flatten('t')} AS extracted,
                     {flatten(anchors)} AS atxt
              FROM m)"""


def _html_extraction_sql() -> str:
    """q151 twin: the SAME regex tiers as functions/html.py (patterns
    generated from one list — Java-regex ∩ RE2 subset), run through
    DuckDB's RE2 with the 'g' option standing in for Spark's
    always-global regexp_replace. Byte-identical extracted text is the
    parity claim."""
    return f"""
        WITH {_extraction_ctes(_Q151_PAGE)}
        SELECT doc_id, extracted,
               CAST(length(extracted) AS BIGINT) AS n_chars_extracted,
               CASE WHEN length(extracted) > 0
                    THEN (CAST(length(atxt) AS BIGINT) * 1000000)
                         // CAST(length(extracted) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS link_density_micro
        FROM f ORDER BY doc_id
    """


def _c4_kept(lines_expr: str) -> str:
    """quality.c4_line_filter's per-line predicate as a list_filter
    over a line-list SQL expression — shared by q153 and q158."""
    veto = "".join(
        f"\n              AND NOT contains(lower(trim(x)), '{t}')"
        for t in (
            "javascript",
            "lorem ipsum",
            "cookie policy",
            "terms of use",
            "{",
        )
    )
    return f"""list_filter({lines_expr}, x ->
                       len(string_split_regex(trim(x), ' +')) >= 3
                       AND regexp_matches(trim(x), '[.!?"]$'){veto}
                   )"""


def _c4_line_cleaning_sql() -> str:
    """q153 twin: the same 7-line page synthesis and the same per-line
    predicates (word count, terminal punctuation, blacklist) as
    quality.c4_line_filter, expressed as list_filter lambdas."""
    return f"""
        WITH p AS (
            SELECT doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) || ' of the corpus.'
                   || chr(10) || text || ' tail marker.'
                   || chr(10) || 'lang ' || lang
                   || chr(10) || 'Enable javascript to continue.'
                   || chr(10) || 'Short line.'
                   || chr(10) || 'See our cookie policy for details.'
                   || chr(10) || 'source ' || source || ' verified entry.'
                   AS page
            FROM documents
        ),
        l AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM p),
        k AS (
            SELECT doc_id, lines, {_c4_kept("lines")} AS kept
            FROM l
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept,
               len(kept) >= 2 AS kept_doc,
               array_to_string(kept, chr(10)) AS clean_text
        FROM k ORDER BY doc_id
    """


def _url_canonicalization_sql() -> str:
    """q154 twin: the same URL synthesis and the same regex tiers as
    functions/url.py (Java-regex ∩ RE2 subset; anchored single-match
    patterns, so DuckDB's first-match regexp_replace equals Spark's
    global one here)."""
    from ..functions.url import SECOND_LEVEL, TRACKING_PREFIXES, _AUTH

    veto = " AND ".join(
        f"NOT starts_with(x, '{p}')" for p in TRACKING_PREFIXES
    )
    seconds = ", ".join(f"'{s}'" for s in SECOND_LEVEL)
    return f"""
        WITH u AS (
            SELECT doc_id,
                   'HTTPS://WWW.' || source || '-cdn.Example.' ||
                   CASE lang WHEN 'en' THEN 'com' WHEN 'de' THEN 'co.uk'
                             WHEN 'zh' THEN 'com.cn' WHEN 'fr' THEN 'fr'
                             ELSE 'org' END ||
                   CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8443' END
                   || '/articles/' || CAST(doc_id AS VARCHAR)
                   || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
                   || '&ref=' || source || '&utm_campaign=x#sec'
                   || CAST(doc_id AS VARCHAR) AS url
            FROM documents
        ),
        parts AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url,
                       '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS sch,
                   regexp_extract(url, '{_AUTH}', 1) AS auth,
                   regexp_extract(url, '{_AUTH}([^?#]*)', 2) AS pth,
                   regexp_extract(regexp_replace(url, '#.*$', ''),
                                  '\\?(.*)$', 1) AS q
            FROM u
        ),
        hp AS (
            SELECT doc_id, sch, auth, pth, q,
                   lower(regexp_replace(regexp_replace(auth,
                       '^[^@]*@', ''), ':[0-9]+$', '')) AS host,
                   regexp_extract(auth, ':([0-9]+)$', 1) AS prt,
                   regexp_extract(auth, '^([^@]*@)', 1) AS userinfo
            FROM parts
        ),
        canon AS (
            SELECT doc_id, host,
                   sch || '://' || userinfo
                   || regexp_replace(host, '^www\\.', '')
                   || CASE WHEN prt <> '' AND NOT (
                            (sch = 'https' AND prt = '443') OR
                            (sch = 'http' AND prt = '80'))
                       THEN ':' || prt ELSE '' END
                   || CASE WHEN pth = '' THEN '/' ELSE pth END
                   || CASE WHEN array_to_string(list_sort(list_filter(
                            string_split(q, '&'),
                            x -> x <> '' AND {veto})), '&') <> ''
                       THEN '?' || array_to_string(list_sort(list_filter(
                            string_split(q, '&'),
                            x -> x <> '' AND {veto})), '&')
                       ELSE '' END AS canonical_url,
                   string_split(host, '.') AS labels
            FROM hp
        )
        SELECT doc_id, host,
               CASE WHEN len(labels) >= 3
                         AND labels[-2] IN ({seconds})
                         AND length(labels[-1]) = 2
                    THEN array_to_string(labels[-3:], '.')
                    WHEN len(labels) >= 2
                    THEN array_to_string(labels[-2:], '.')
                    ELSE host END AS domain,
               canonical_url
        FROM canon ORDER BY doc_id
    """


def _tokenizer_fertility_sql(n_merges: int) -> str:
    """q155 twin: the trainer chain's final vocabulary joined back to
    the per-document word stream, per-language exact counts."""
    ctes = _bpe_base_ctes() + _bpe_round_ctes(n_merges, need_final=True)
    return (
        "WITH " + ",\n        ".join(ctes) + f"""
        , dw AS (
            SELECT lang, tok AS word FROM (
                SELECT lang, unnest(string_split_regex(lower(text),
                              '[^a-z0-9]+')) AS tok
                FROM documents
            ) WHERE tok <> ''
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_word_occurrences,
               CAST(SUM(len(v.s)) AS BIGINT) AS n_subword_tokens,
               (CAST(SUM(len(v.s)) AS BIGINT) * 1000000)
                   // CAST(COUNT(*) AS BIGINT) AS fertility_micro
        FROM dw JOIN r{n_merges} v USING (word)
        GROUP BY lang ORDER BY lang
    """
    )


def _dup_span_ctes(k: int) -> str:
    """Shared CTE core of the q156/q160 twins: token arrays, k-gram
    hash counts (md5-60), packed-int64 keep-first tie-break,
    gaps-and-islands — ending at ``spans(doc_id, i, s, e)`` with
    1-based inclusive token ranges."""
    pack = 1 << 20  # WINNOW_POS_BITS — the operators/dedup.py pack
    sh = _hash60(f"array_to_string(arr[pos:pos + {k - 1}], ' ')")
    return f"""d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                       '[^a-z0-9]+'), t -> t <> '') AS arr
            FROM documents
        ),
        tot AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens FROM d),
        pos0 AS (
            SELECT doc_id, arr,
                   unnest(range(1, len(arr) - {k} + 2)) AS pos
            FROM d
        ),
        occ AS (SELECT doc_id, pos, {sh} AS h FROM pos0),
        g AS (
            SELECT h, COUNT(*) AS c,
                   MIN(doc_id * {pack} + pos) AS first_packed
            FROM occ GROUP BY h
        ),
        fl AS (
            SELECT o.doc_id, o.pos
            FROM occ o JOIN g USING (h)
            WHERE g.c > 1 AND o.doc_id * {pack} + o.pos <> g.first_packed
        ),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                             OR pos - lag(pos) OVER w > {k}
                        THEN 1 ELSE 0 END AS b
            FROM fl WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        isl AS (
            SELECT doc_id, pos,
                   SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS i
            FROM brk
        ),
        spans AS (
            SELECT doc_id, i, MIN(pos) AS s, MAX(pos) + {k} - 1 AS e
            FROM isl GROUP BY doc_id, i
        )"""


def _duplicated_spans_sql(k: int) -> str:
    """q156 twin: the shared span core + the per-doc zero-filled
    report."""
    return f"""
        WITH {_dup_span_ctes(k)},
        da AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                   CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_tokens,
               COALESCE(da.n_dup_spans, 0) AS n_dup_spans,
               COALESCE(da.dup_tokens, 0) AS dup_tokens,
               CASE WHEN t.n_tokens > 0
                    THEN (COALESCE(da.dup_tokens, 0) * 1000000)
                         // t.n_tokens
                    ELSE CAST(0 AS BIGINT) END AS dup_ratio_micro
        FROM tot t LEFT JOIN da USING (doc_id)
        ORDER BY t.doc_id
    """


def _remove_spans_sql(k: int) -> str:
    """q160 twin: the shared span core + the in-list surgery —
    DuckDB's list_filter index is 1-based like the span ordinals, so
    a token survives iff no span covers its index; clean/NULL docs
    pass through via the empty-span coalesce."""
    return f"""
        WITH {_dup_span_ctes(k)},
        spl AS (
            SELECT doc_id,
                   list(struct_pack(s := s, e := e)) AS sps
            FROM spans GROUP BY doc_id
        ),
        j AS (
            SELECT d.doc_id, d.arr,
                   COALESCE(spl.sps,
                            CAST([] AS STRUCT(s BIGINT, e BIGINT)[]))
                       AS sps
            FROM d LEFT JOIN spl USING (doc_id)
        ),
        kept AS (
            SELECT doc_id, arr,
                   list_filter(arr, (x, i) ->
                       len(list_filter(sps,
                           sp -> sp.s <= i AND i <= sp.e)) = 0) AS kp
            FROM j
        )
        SELECT doc_id,
               CAST(len(arr) AS BIGINT) AS n_tokens,
               CAST(len(arr) - len(kp) AS BIGINT) AS n_removed,
               -- DuckDB's array_to_string of an EMPTY list is NULL;
               -- Spark's array_join is '' — align on Spark's contract
               -- ('' for a fully-removed doc, NULL only for NULL text)
               CASE WHEN arr IS NULL THEN NULL
                    ELSE COALESCE(array_to_string(kp, ' '), '') END
                   AS text_dedup
        FROM kept ORDER BY doc_id
    """


def _quantile_sketch_sql(k: int) -> str:
    """q157 twin: the same deterministic bottom-k-by-hash sample (a
    global per-group bottom-k equals the operator's two-phase form by
    construction), the same value-grain integer-threshold quantiles,
    the same p40/p60 band gate."""
    h = _hash60("'qsk:' || CAST(o_orderkey AS VARCHAR)")
    return f"""
        WITH s AS (
            SELECT o_orderpriority AS pri, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY {h}, o_orderkey) AS rnk
            FROM orders
        ),
        sv AS (
            SELECT pri, o_totalprice AS v, COUNT(*) AS w
            FROM s WHERE rnk <= {k} GROUP BY 1, 2
        ),
        sc AS (
            SELECT pri, v,
                   SUM(w) OVER (PARTITION BY pri ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(w) OVER (PARTITION BY pri) AS tot
            FROM sv
        ),
        est AS (
            SELECT pri, MIN(CASE WHEN cum * 2 >= tot THEN v END)
                       AS est_median,
                   CAST(MAX(tot) AS BIGINT) AS sample_n
            FROM sc GROUP BY pri
        ),
        fv AS (
            SELECT o_orderpriority AS pri, o_totalprice AS v,
                   COUNT(*) AS w
            FROM orders GROUP BY 1, 2
        ),
        fc AS (
            SELECT pri, v,
                   SUM(w) OVER (PARTITION BY pri ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(w) OVER (PARTITION BY pri) AS tot
            FROM fv
        ),
        band AS (
            SELECT pri,
                   MIN(CASE WHEN cum * 5 >= 2 * tot THEN v END) AS p40,
                   MIN(CASE WHEN cum * 2 >= tot THEN v END)
                       AS exact_median,
                   MIN(CASE WHEN cum * 5 >= 3 * tot THEN v END) AS p60,
                   CAST(MAX(tot) AS BIGINT) AS n_rows
            FROM fc GROUP BY pri
        )
        -- gate pinned literal TRUE (q142 discipline): estimate
        -- drift outside the band becomes a hash FAIL, not a silent
        -- matching-False
        SELECT band.pri AS o_orderpriority, n_rows, sample_n,
               est_median, exact_median, p40, p60, TRUE AS in_band
        FROM est JOIN band USING (pri)
        ORDER BY 1
    """


_Q158_PAGE = (
    "'<html><head><script>var x = 1;</script></head><body>"
    """<nav><a href="/">Home</a> | <a href="/about">About</a></nav>"""
    "<article><p>Doc ' || CAST(doc_id AS VARCHAR)"
    " || ' of the corpus.</p><p>' || text"
    " || ' tail marker.</p><p>lang ' || lang ||"
    " '</p><p>Enable javascript to continue.</p></article>"
    "<footer>&copy; corp</footer></body></html>'"
)


def _domain_rollup_sql() -> str:
    """q158 twin: COMPOSED from the same generators as the stage twins
    — shared extraction CTEs (q151), the shared C4 predicate (q153),
    and the q154 canonicalization oracle verbatim as a subquery — so
    the end-to-end front door is oracle-proven, not just its stages.
    (The front door's within-batch canonical-url dedup is a no-op
    here: the synthesized urls are unique per doc_id by construction,
    which the q154 twin reproduces.)"""
    return f"""
        WITH {_extraction_ctes(_Q158_PAGE)},
        c AS (
            SELECT doc_id,
                   {_c4_kept("string_split(extracted, chr(10))")} AS kept
            FROM f
        ),
        cl AS (
            SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept,
                   array_to_string(kept, chr(10)) AS clean_text
            FROM c WHERE len(kept) >= 2
        ),
        u AS ({_url_canonicalization_sql()})
        SELECT u.domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT u.host) AS BIGINT) AS n_hosts,
               CAST(SUM(cl.n_kept) AS BIGINT) AS kept_lines,
               CAST(SUM(length(cl.clean_text)) AS BIGINT) AS clean_chars
        FROM cl JOIN u USING (doc_id)
        GROUP BY u.domain ORDER BY u.domain
    """


def _qclf_sql() -> str:
    """q161 twin: the committed integer micro-unit weights embedded as
    a DuckDB list literal (parallel unnests zip positionally), the
    identical md5-60 bigram bucketing as q131, and the per-occurrence
    weight sum — exact int64 both engines. LEFT JOIN from documents
    zero-fills bigram-less docs at the bare bias, matching the Spark
    fold's empty-array init."""
    from ..ml.quality_weights import QCLF_BIAS_MICRO, QCLF_WEIGHTS_MICRO

    n = len(QCLF_WEIGHTS_MICRO)
    return f"""
        WITH toks AS (
            SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
            FROM (SELECT doc_id,
                         string_split({_NORMALIZED_TEXT}, ' ') AS t
                  FROM documents)
        ),
        grams AS (
            SELECT doc_id,
                   {_hash60("'qclf:' || t[i] || ' ' || t[i+1]")} % {n} AS b
            FROM toks WHERE i < len(t) AND t[i] <> ''
        ),
        w AS (
            SELECT unnest(range(0, {n})) AS b,
                   unnest({QCLF_WEIGHTS_MICRO!r}) AS wt
        ),
        sums AS (
            SELECT g.doc_id, COUNT(*) AS nb, SUM(w.wt) AS s
            FROM grams g JOIN w USING (b) GROUP BY 1
        )
        SELECT d.doc_id, d.lang,
               CAST(COALESCE(sums.nb, 0) AS BIGINT) AS n_bigrams,
               CAST({QCLF_BIAS_MICRO} + COALESCE(sums.s, 0) AS BIGINT)
                   AS score_micro,
               ({QCLF_BIAS_MICRO} + COALESCE(sums.s, 0)) > 0 AS is_quality
        FROM documents d LEFT JOIN sums USING (doc_id)
        ORDER BY d.doc_id
    """


def _langid_ctes() -> tuple[str, str]:
    """Scoring CTE chain of the q163/q164 twins, GENERATED from the
    committed Bernoulli weights (``ml/langid_weights.py``) so the twin
    cannot drift from the scorer: padded-boundary char trigrams →
    distinct md5-60 buckets per doc → per-class weight sums + biases →
    argmax with the alphabetical tie-break. Returns ``(ctes_sql,
    final_cte_name)`` with the final CTE exposing
    ``(doc_id, lang, pred_lang)``."""
    from ..ml.langid_weights import LID_BIASES_MICRO, LID_WEIGHTS_MICRO

    classes = sorted(LID_WEIGHTS_MICRO)
    n = len(LID_WEIGHTS_MICRO[classes[0]])
    w_cols = ",\n                   ".join(
        f"unnest({LID_WEIGHTS_MICRO[c]!r}) AS w_{i}"
        for i, c in enumerate(classes)
    )
    sums = ", ".join(f"SUM(w.w_{i}) AS s_{i}" for i in range(len(classes)))
    scores = ",\n                   ".join(
        f"{LID_BIASES_MICRO[c]} + COALESCE(ls.s_{i}, 0) AS sc_{i}"
        for i, c in enumerate(classes)
    )
    best = (
        "greatest(" + ", ".join(f"sc_{i}" for i in range(len(classes))) + ")"
        if len(classes) > 1
        else "sc_0"
    )
    pred = (
        "CASE "
        + " ".join(
            f"WHEN sc_{i} = best THEN '{c}'" for i, c in enumerate(classes)
        )
        + " END"
    )
    ctes = f"""lid_nrm AS (
            SELECT doc_id, {_NORMALIZED_TEXT} AS nrm FROM documents
        ),
        lid_tri AS (
            SELECT DISTINCT doc_id,
                   {_hash60("'lid:' || substr(s, i, 3)")} % {n} AS b
            FROM (
                SELECT doc_id, ' ' || nrm || ' ' AS s,
                       unnest(range(1, len(nrm) + 1)) AS i
                FROM lid_nrm WHERE len(nrm) > 0
            )
        ),
        lid_w AS (
            SELECT unnest(range(0, {n})) AS b,
                   {w_cols}
        ),
        lid_sums AS (
            SELECT t.doc_id, {sums}
            FROM lid_tri t JOIN lid_w w USING (b) GROUP BY 1
        ),
        lid_scored AS (
            SELECT d.doc_id, d.lang,
                   {scores}
            FROM documents d LEFT JOIN lid_sums ls USING (doc_id)
        ),
        lid_pred AS (
            SELECT doc_id, lang, {pred} AS pred_lang
            FROM (SELECT *, {best} AS best FROM lid_scored)
        )"""
    return ctes, "lid_pred"


def _langid_confusion_sql() -> str:
    """q163 twin: model vs heuristic vs labeled-lang confusion with
    the corpus-wide agreement gate (integer micro division)."""
    ctes, pred_cte = _langid_ctes()
    agree = (
        "SUM(CASE WHEN pred_lang = heur_lang THEN n_docs ELSE 0 END)"
        " OVER ()"
    )
    total = "SUM(n_docs) OVER ()"
    return f"""
        WITH {ctes},
        lid_heur AS (
            SELECT doc_id,
                   CASE WHEN best = 0 THEN 'und'
                        WHEN vde = best THEN 'de'
                        WHEN ven = best THEN 'en'
                        WHEN ves = best THEN 'es'
                        WHEN vfr = best THEN 'fr'
                        ELSE 'und' END AS heur_lang
            FROM (
                SELECT doc_id, vde, ven, ves, vfr,
                       greatest(vde, ven, ves, vfr) AS best
                FROM (
                    SELECT doc_id,
                           {_votes("de")} AS vde,
                           {_votes("en")} AS ven,
                           {_votes("es")} AS ves,
                           {_votes("fr")} AS vfr
                    FROM documents
                )
            )
        ),
        conf AS (
            SELECT p.lang, p.pred_lang, h.heur_lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM {pred_cte} p JOIN lid_heur h USING (doc_id)
            GROUP BY 1, 2, 3
        )
        SELECT lang, pred_lang, heur_lang, n_docs,
               CAST(({agree} * 1000000) // {total} AS BIGINT)
                   AS agreement_micro,
               (({agree} * 1000000) // {total}) >= 950000
                   AS gate_agreement
        FROM conf
        ORDER BY lang, pred_lang, heur_lang
    """


def _fertility_by_model_lang_sql(n_merges: int) -> str:
    """q164 twin: the q155 fertility computation grouped by the
    LEARNED language label (the lid CTE chain) instead of the labeled
    column — the model's labels driving a downstream eval."""
    lid_ctes, pred_cte = _langid_ctes()
    ctes = _bpe_base_ctes() + _bpe_round_ctes(n_merges, need_final=True)
    return (
        "WITH " + ",\n        ".join(ctes) + f""",
        {lid_ctes},
        dw AS (
            SELECT doc_id, tok AS word FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text),
                              '[^a-z0-9]+')) AS tok
                FROM documents
            ) WHERE tok <> ''
        )
        SELECT p.pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_word_occurrences,
               CAST(SUM(len(v.s)) AS BIGINT) AS n_subword_tokens,
               (CAST(SUM(len(v.s)) AS BIGINT) * 1000000)
                   // CAST(COUNT(*) AS BIGINT) AS fertility_micro
        FROM dw
        JOIN {pred_cte} p USING (doc_id)
        JOIN r{n_merges} v USING (word)
        GROUP BY 1 ORDER BY 1
    """
    )


def _mh_sets_cte(src: str) -> str:
    """Distinct 3-shingle sets over arbitrary (doc_id, text) source
    SQL — shared by the q167/q172 admission twins."""
    return f"""
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 2, 0) + 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
            FROM (SELECT doc_id, string_split({_NORMALIZED_TEXT}, ' ') AS t
                  FROM ({src}))
        )"""


#: the q167/q172 corpus/probe split (even docs vs mutated odds +
#: every-10th mirror re-ingest)
_MH_SRC_C = "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"
_MH_SRC_P = """
        SELECT doc_id + 1000000 AS doc_id,
               text || ' appended tail note.' AS text
        FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    """


def _near_dup_admission_sql(
    nh: int = 16, bands: int = 8, thr: int = 500_000
) -> str:
    """q167 twin: the full MinHash admission chain — normalization,
    distinct 3-shingles, the affine signature family (q18's twin),
    band-index-salted md5 keys (dedup._band_key_rows), candidate
    banding join, and the integer agreement estimate — replayed for
    the corpus side (even docs) and the probe side (odd docs with an
    appended tail + every-10th mirror re-ingest)."""
    r = nh // bands
    sig_cols = ",\n               ".join(
        f"MIN(({2 * i + 1} * ({_hash60('s')} % {_MINHASH_P}) "
        f"+ {1_000_003 * i + 12_345}) % {_MINHASH_P}) AS h{i}"
        for i in range(nh)
    )
    band_keys = ", ".join(
        "md5('%d' %s)"
        % (
            b,
            " ".join(
                f"|| ',' || CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN p.h{i} = c.h{i} THEN 1 ELSE 0 END)" for i in range(nh)
    )

    sets = _mh_sets_cte
    src_c, src_p = _MH_SRC_C, _MH_SRC_P
    return f"""
        WITH sets_c AS ({sets(src_c)}),
        sig_c AS (SELECT doc_id, {sig_cols} FROM sets_c GROUP BY doc_id),
        sets_p AS ({sets(src_p)}),
        sig_p AS (SELECT doc_id, {sig_cols} FROM sets_p GROUP BY doc_id),
        bands_c AS (SELECT doc_id, unnest([{band_keys}]) AS key FROM sig_c),
        bands_p AS (SELECT doc_id, unnest([{band_keys}]) AS key FROM sig_p),
        cand AS (
            SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS corpus_id
            FROM bands_p p JOIN bands_c c USING (key)
        )
        SELECT probe_id, corpus_id,
               CAST((({agree}) * 1000000) // {nh} AS BIGINT)
                   AS est_jaccard_micro
        FROM cand
        JOIN sig_p p ON probe_id = p.doc_id
        JOIN sig_c c ON corpus_id = c.doc_id
        WHERE (({agree}) * 1000000) // {nh} >= {thr}
        ORDER BY probe_id, corpus_id
    """


def _pq_rerank_recall_sql() -> str:
    """q168 twin: the committed PQ codebooks (ml/pq_codebooks.py)
    embedded as list literals; encode (integer micro squared-distance
    argmin, first-match tie-break = lowest centroid), ADC scoring
    (int64 inner products against the selected centroids), the
    20-candidate cut, and the exact-cosine re-rank replayed exactly.
    GENERATED from the committed weights, so query and twin cannot
    drift."""
    from ..ml.pq_codebooks import PQ_CODEBOOKS, PQ_DIM, PQ_K, PQ_M

    d = PQ_DIM // PQ_M
    cb_cols = ",\n                   ".join(
        f"[{', '.join(map(str, PQ_CODEBOOKS[m]))}] AS l{m}"
        for m in range(PQ_M)
    )
    dist_cols = []
    for m in range(PQ_M):
        terms = " + ".join(
            f"((x[{m * d + j + 1}] - l{m}[c*{d} + {j + 1}])"
            f" * (x[{m * d + j + 1}] - l{m}[c*{d} + {j + 1}]))"
            for j in range(d)
        )
        dist_cols.append(
            f"list_transform(range(0, {PQ_K}), c -> {terms}) AS d{m}"
        )
    codes = ", ".join(
        f"CAST(list_position(d{m}, list_min(d{m})) - 1 AS INTEGER)"
        for m in range(PQ_M)
    )
    score = " + ".join(
        f"p.x[{m * d + j + 1}] * l{m}[e.codes[{m + 1}]*{d} + {j + 1}]"
        for m in range(PQ_M)
        for j in range(d)
    )
    return f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        xq AS (
            SELECT vec_id,
                   list_transform(v,
                       x -> CAST(round(x * 1000000) AS BIGINT)) AS x
            FROM vecs
        ),
        cbs AS (SELECT {cb_cols}),
        dists AS (
            SELECT xq.vec_id,
                   {", ".join(dist_cols)}
            FROM xq CROSS JOIN cbs
        ),
        enc AS (SELECT vec_id, [{codes}] AS codes FROM dists),
        adc AS (
            SELECT p.vec_id AS query_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY ({score}) DESC, e.vec_id ASC) AS rnk
            FROM xq p
            JOIN enc e ON e.vec_id <> p.vec_id
            CROSS JOIN cbs
            WHERE p.vec_id < 8
        ),
        rerank AS (
            SELECT query_id, neighbor_id FROM (
                SELECT c.query_id, c.neighbor_id,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pv.v, cv.v), 6) DESC,
                                    c.neighbor_id ASC) AS rrk
                FROM (SELECT query_id, neighbor_id FROM adc
                      WHERE rnk <= 20) c
                JOIN vecs pv ON pv.vec_id = c.query_id
                JOIN vecs cv ON cv.vec_id = c.neighbor_id
            ) WHERE rrk <= 3
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        p.v, c.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM vecs p JOIN vecs c ON c.vec_id <> p.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        ),
        ha AS (
            SELECT e.query_id, COUNT(a.neighbor_id) AS n_hits_adc
            FROM exact e
            LEFT JOIN (SELECT query_id, neighbor_id FROM adc
                       WHERE rnk <= 3) a
              ON e.query_id = a.query_id
                 AND e.neighbor_id = a.neighbor_id
            GROUP BY e.query_id
        ),
        hr AS (
            SELECT e.query_id, COUNT(r.neighbor_id) AS n_hits_rerank
            FROM exact e
            LEFT JOIN rerank r
              ON e.query_id = r.query_id
                 AND e.neighbor_id = r.neighbor_id
            GROUP BY e.query_id
        )
        SELECT ha.query_id, n_hits_adc, n_hits_rerank,
               n_hits_rerank >= n_hits_adc AS gate_no_worse
        FROM ha JOIN hr ON ha.query_id = hr.query_id
        ORDER BY ha.query_id
    """


def _url_blocklist_sql() -> str:
    """q169 twin: the q154 URL synthesis + host parsing + registrable
    domain CASE, then the blocklist IN and the pattern regex."""
    from ..functions.url import SECOND_LEVEL, _AUTH

    seconds = ", ".join(f"'{s}'" for s in SECOND_LEVEL)
    return f"""
        WITH u AS (
            SELECT doc_id,
                   'HTTPS://WWW.' || source || '-cdn.Example.' ||
                   CASE lang WHEN 'en' THEN 'com' WHEN 'de' THEN 'co.uk'
                             WHEN 'zh' THEN 'com.cn' WHEN 'fr' THEN 'fr'
                             ELSE 'org' END ||
                   CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8443' END
                   || '/articles/' || CAST(doc_id AS VARCHAR)
                   || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
                   || '&ref=' || source || '&utm_campaign=x#sec'
                   || CAST(doc_id AS VARCHAR) AS url
            FROM documents
        ),
        hp AS (
            SELECT doc_id, url,
                   lower(regexp_replace(regexp_replace(
                       regexp_extract(url, '{_AUTH}', 1),
                       '^[^@]*@', ''), ':[0-9]+$', '')) AS host
            FROM u
        ),
        dom AS (
            SELECT doc_id, url, host,
                   string_split(host, '.') AS labels
            FROM hp
        ),
        d2 AS (
            SELECT doc_id, url,
                   CASE WHEN len(labels) >= 3
                             AND labels[-2] IN ({seconds})
                             AND length(labels[-1]) = 2
                        THEN array_to_string(labels[-3:], '.')
                        WHEN len(labels) >= 2
                        THEN array_to_string(labels[-2:], '.')
                        ELSE host END AS url_domain
            FROM dom
        )
        SELECT doc_id, url_domain,
               url_domain IN ('example.co.uk', 'example.com.cn')
                   AS blocked_domain,
               regexp_matches(url, '(/articles/[0-9]*7\\?)')
                   AS blocked_pattern,
               NOT url_domain IN ('example.co.uk', 'example.com.cn')
                   AND NOT regexp_matches(url, '(/articles/[0-9]*7\\?)')
                   AS kept_url
        FROM d2 ORDER BY doc_id
    """


def _sql_str(s: str) -> str:
    """A DuckDB string expression for ``s`` that never embeds control
    characters in the SQL text: printable runs as quoted literals
    (single quotes doubled), control codepoints via chr()."""
    parts: list[str] = []
    run = ""
    for ch in s:
        o = ord(ch)
        if o < 32 or 127 <= o < 160:
            if run:
                parts.append("'" + run.replace("'", "''") + "'")
                run = ""
            parts.append(f"chr({o})")
        else:
            run += ch
    if run:
        parts.append("'" + run.replace("'", "''") + "'")
    return " || ".join(parts) if parts else "''"


def _mojibake_repair_sql() -> str:
    """q170 twin: the SAME generated repair table
    (functions/text.MOJIBAKE_PAIRS) as a nested replace chain, and the
    SAME generated mojibake tail — query and twin share one source of
    truth, so they cannot drift."""
    from ..functions.text import MOJIBAKE_PAIRS
    from .queries import _Q170_CLEAN_TAIL, _q170_mojibake

    expr = "page"
    for moji, fixed in MOJIBAKE_PAIRS:
        expr = f"replace({expr}, {_sql_str(moji)}, {_sql_str(fixed)})"
    return f"""
        WITH staged AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 3 = 0
                       THEN {_sql_str(_q170_mojibake(_Q170_CLEAN_TAIL))}
                       ELSE {_sql_str(_Q170_CLEAN_TAIL)} END AS page
            FROM documents
        ),
        fixed AS (
            SELECT doc_id, page, {expr} AS fixed_text FROM staged
        )
        SELECT doc_id,
               page <> fixed_text AS had_mojibake,
               CAST(length(page) - length(fixed_text) AS BIGINT)
                   AS n_chars_fixed,
               fixed_text
        FROM fixed ORDER BY doc_id
    """


def _full_front_door_sql() -> str:
    """q171 twin: COMPOSED from the stage generators — extraction CTEs
    (q151) over the CLEAN synthesized page (the Spark side receives
    the mojibake'd variant and must repair it back to exactly this —
    q170's round-trip is the load-bearing claim), the shared C4
    predicate (q153), the q166 keep-first line-dedup algebra, the
    q154 canonicalization subquery, and the q169 blocklist as a
    domain filter."""
    from .queries import _Q171_CLEAN_LINE

    line_lit = _Q171_CLEAN_LINE.replace("'", "''")
    page = (
        "'<html><head><script>var x = 1;</script></head><body>"
        '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
        "<article><p>Doc ' || CAST(doc_id AS VARCHAR) || "
        "' of the corpus.</p><p>' || text || ' tail marker.</p>"
        "<p>Subscribe to our newsletter today.</p>"
        "<p>Subscribe to our newsletter today.</p><p>"
        f"{line_lit}" + "</p><p>lang ' || lang || "
        "'</p><p>Enable javascript to continue.</p></article>"
        "<footer>&copy; corp</footer></body></html>'"
    )
    return f"""
        WITH {_extraction_ctes(page)},
        c AS (
            SELECT doc_id,
                   {_c4_kept("string_split(extracted, chr(10))")} AS kept
            FROM f
        ),
        cl AS (
            SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept, kept
            FROM c WHERE len(kept) >= 2
        ),
        lines AS (
            SELECT doc_id, unnest(kept) AS line,
                   unnest(range(1, len(kept) + 1)) AS pos
            FROM cl
        ),
        ranked AS (
            SELECT doc_id, line, pos,
                   row_number() OVER (
                       PARTITION BY doc_id, lower(trim(line))
                       ORDER BY pos) AS rn
            FROM lines
        ),
        dl AS (
            SELECT doc_id,
                   CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
                       AS n_dup_lines,
                   COALESCE(string_agg(line, chr(10) ORDER BY pos)
                       FILTER (WHERE rn = 1), '') AS text
            FROM ranked GROUP BY doc_id
        ),
        u AS ({_url_canonicalization_sql()})
        SELECT u.domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT u.host) AS BIGINT) AS n_hosts,
               CAST(SUM(cl.n_kept) AS BIGINT) AS kept_lines,
               CAST(SUM(dl.n_dup_lines) AS BIGINT) AS dup_lines_removed,
               CAST(SUM(length(dl.text)) AS BIGINT) AS clean_chars
        FROM cl JOIN dl USING (doc_id) JOIN u USING (doc_id)
        WHERE u.domain <> 'example.co.uk'
        GROUP BY u.domain ORDER BY u.domain
    """


def _admission_two_tier_sql() -> str:
    """q172 twin: the q167 admission oracle verbatim as the candidate
    subquery, plus the EXACT tier — true shingle intersections and
    integer-exact Jaccard per admitted pair."""
    return f"""
        WITH pairs AS ({_near_dup_admission_sql()}),
        sets_c AS ({_mh_sets_cte(_MH_SRC_C)}),
        sets_p AS ({_mh_sets_cte(_MH_SRC_P)}),
        np AS (SELECT doc_id, count(*) AS n FROM sets_p GROUP BY doc_id),
        nc AS (SELECT doc_id, count(*) AS n FROM sets_c GROUP BY doc_id),
        inter AS (
            SELECT p.doc_id AS probe_id, c.doc_id AS corpus_id,
                   count(*) AS cnt
            FROM sets_p p
            JOIN sets_c c ON p.s = c.s
            JOIN pairs ON pairs.probe_id = p.doc_id
                      AND pairs.corpus_id = c.doc_id
            GROUP BY 1, 2
        )
        SELECT pr.probe_id, pr.corpus_id, pr.est_jaccard_micro,
               CAST((COALESCE(i.cnt, 0) * 1000000)
                    // (np.n + nc.n - COALESCE(i.cnt, 0)) AS BIGINT)
                   AS exact_jaccard_micro
        FROM pairs pr
        LEFT JOIN inter i ON i.probe_id = pr.probe_id
                         AND i.corpus_id = pr.corpus_id
        JOIN np ON np.doc_id = pr.probe_id
        JOIN nc ON nc.doc_id = pr.corpus_id
        ORDER BY pr.probe_id, pr.corpus_id
    """




def _als_factor_cte() -> str:
    """Shared factor CTEs for the q40/q43 twins: the COMMITTED ALS
    factor matrices (ml/als_factors.py — written once by
    scripts/gen_als_factors.py) embedded as long-form VALUES
    (id, rank-position j, micro-unit weight), so the serving dot
    product replays as an exact int64 SUM — the ml/quality_weights.py
    embedding discipline applied to the recommender."""
    from ..ml.als_factors import ALS_ITEM_FACTORS, ALS_USER_FACTORS

    def vals(rows):
        return ", ".join(
            f"({i},{j + 1},{w})"
            for i, fs in rows
            for j, w in enumerate(fs)
        )

    # CAST(w AS BIGINT): VALUES integers land as INT32 and the
    # micro-unit product uf.w * itf.w overflows 32 bits
    return f"""
        uf AS (SELECT user_id, j, CAST(w AS BIGINT) AS w
               FROM (VALUES {vals(ALS_USER_FACTORS)})
               AS t(user_id, j, w)),
        itf AS (SELECT item_id, j, CAST(w AS BIGINT) AS w
                FROM (VALUES {vals(ALS_ITEM_FACTORS)})
                AS t(item_id, j, w))"""


def _als_scored_cte(below: int) -> str:
    """users + factor CTEs + the integer dot-product scoring CTE."""
    return f"""
        users AS (
            SELECT DISTINCT user_id FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
              AND user_id < {below}
        ),{_als_factor_cte()},
        scored AS (
            SELECT uf.user_id, itf.item_id,
                   CAST(SUM(uf.w * itf.w) AS BIGINT) AS score_micro2
            FROM uf
            JOIN users ON users.user_id = uf.user_id
            JOIN itf ON itf.j = uf.j
            GROUP BY 1, 2
        )"""


def _als_topk_sql() -> str:
    """q40 twin: committed-factor top-5 per user (users < 20), exact
    int64 scoring, ties toward the smaller item id."""
    return f"""
        WITH {_als_scored_cte(20)}
        SELECT user_id, item_id, score_micro2, rnk
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY score_micro2 DESC, item_id ASC) AS rnk
            FROM scored
        )
        WHERE rnk <= 5
        ORDER BY user_id, rnk
    """


def _centroid_assign_ctes(centroids: list) -> str:
    """Shared CTE chain for the q41/q47 twins: embeddings quantized to
    micro ints, the COMMITTED centroid table (ml/centroids.py) as
    long-form VALUES, exact integer squared distances, and the argmin
    assignment (ties toward the lowest centroid index — Spark's
    array_position first-match)."""
    vals = ", ".join(
        f"({c},{j},{v})"
        for c, row in enumerate(centroids)
        for j, v in enumerate(row)
    )
    return f"""
        vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        el AS (
            SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM vecs
        ),
        elx AS (
            SELECT vec_id, i - 1 AS j,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM el
        ),
        cents AS (SELECT * FROM (VALUES {vals}) AS t(c, j, cv)),
        cd AS (
            SELECT e.vec_id, c.c,
                   SUM((e.xq - c.cv) * (e.xq - c.cv)) AS d
            FROM elx e JOIN cents c ON c.j = e.j
            GROUP BY 1, 2
        ),
        assign AS (
            SELECT vec_id, c AS cluster FROM (
                SELECT vec_id, c, row_number() OVER (
                           PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
                FROM cd
            ) WHERE rn = 1
        )"""


def _tfidf_features_sql() -> str:
    """q42 twin: replay the COMMITTED TF-IDF model (ml/tfidf_vocab.py
    — MLlib pipeline fit once offline, scripts/gen_tfidf_vocab.py).
    nnz = committed-vocab members among the whitespace tokens
    (list_intersect dedups, matching Spark's array_intersect); the
    per-doc mass is Σ tf·idf_micro summed as exact int64 (each
    surviving token row contributes its idf once)."""
    from ..ml.tfidf_vocab import MICRO, TFIDF_IDF_MICRO, TFIDF_VOCAB

    active = [
        (v, w) for v, w in zip(TFIDF_VOCAB, TFIDF_IDF_MICRO) if w != 0
    ]
    vocab_rows = ", ".join(f"('{v}', {w})" for v, w in active)
    # literal list, not a subquery: DuckDB's list_intersect lowers to
    # a lambda, and lambdas reject subqueries
    vocab_list = "[" + ", ".join(f"'{v}'" for v, _ in active) + "]"
    return f"""
        WITH vocab(tok, idf_micro) AS (VALUES {vocab_rows}),
        toks AS (
            SELECT doc_id, lang,
                   string_split(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       ' ') AS toks
            FROM documents
        ),
        nnz AS (
            SELECT doc_id, lang,
                   len(list_intersect(toks, {vocab_list})) AS nnz
            FROM toks
        ),
        mass AS (
            SELECT t.doc_id, SUM(v.idf_micro)::BIGINT AS score_micro
            FROM (SELECT doc_id, unnest(toks) AS tok FROM toks) t
            JOIN vocab v USING (tok)
            GROUP BY t.doc_id
        )
        SELECT lang, COUNT(*) AS n_docs,
               FLOOR(AVG(nnz) * 100) / 100 AS avg_terms,
               FLOOR(AVG(COALESCE(score_micro, 0)) / {float(MICRO)}
                     * 100) / 100 AS avg_score
        FROM nnz LEFT JOIN mass USING (doc_id)
        GROUP BY lang
        ORDER BY lang
    """


def _kmeans_histogram_sql() -> str:
    """q41 twin: committed-centroid integer argmin assignment →
    cluster-size histogram."""
    from ..ml.centroids import KM_CENTROIDS

    return f"""
        WITH {_centroid_assign_ctes(KM_CENTROIDS)}
        SELECT cluster, COUNT(*) AS n
        FROM assign
        GROUP BY cluster
        ORDER BY n DESC, cluster ASC
    """


def _ivf_knn_sql() -> str:
    """q47 twin: committed coarse centroids route probes (vec_id < 5)
    to their 4 nearest cells; exact cosine top-5 inside routed cells
    only (the IVF layout — same integer routing rule as the Spark
    plan, cosine at 6 dp via the q16 idiom)."""
    from ..ml.centroids import IVF_CENTROIDS

    return f"""
        WITH {_centroid_assign_ctes(IVF_CENTROIDS)},
        route AS (
            SELECT vec_id AS query_id, c AS cluster FROM (
                SELECT vec_id, c, row_number() OVER (
                           PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
                FROM cd WHERE vec_id < 5
            ) WHERE rn <= 4
        ),
        cand AS (
            SELECT r.query_id, a.vec_id AS neighbor_id
            FROM route r JOIN assign a ON a.cluster = r.cluster
            WHERE a.vec_id <> r.query_id
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   ROUND(list_cosine_similarity(pv.v, cv.v), 6) AS sim
            FROM cand
            JOIN vecs pv ON pv.vec_id = cand.query_id
            JOIN vecs cv ON cv.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, sim, rnk
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC) AS rnk
            FROM scored
        )
        WHERE rnk <= 5
        ORDER BY query_id, rnk
    """


def _hybrid_sql() -> str:
    """q43 twin: 0.7·committed-factor collaborative (reciprocal-rank
    weights) + 0.3·cosine neighbors of each user's most-played item
    (integer play-count argmax, ties to the smaller item id), summed
    per (user, item), top-5."""
    return f"""
        WITH {_als_scored_cte(10)},
        collab AS (
            SELECT user_id, item_id,
                   CAST(0.7 AS DOUBLE) * (CAST(1.0 AS DOUBLE) / rnk) AS score
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY score_micro2 DESC, item_id ASC) AS rnk
                FROM scored
            ) WHERE rnk <= 10
        ),
        plays AS (
            SELECT user_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER)
                       AS item_id,
                   COUNT(*) AS n_plays
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
              AND user_id < 10
            GROUP BY 1, 2
        ),
        fav AS (
            SELECT user_id, item_id AS fav_item FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY n_plays DESC, item_id ASC) AS rn
                FROM plays
            ) WHERE rn = 1
        ),
        vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        content AS (
            SELECT user_id, item_id,
                   CAST(0.3 AS DOUBLE) * sim AS score
            FROM (
                SELECT f.user_id, c.vec_id AS item_id, f.fav_item,
                       ROUND(list_cosine_similarity(pv.v, c.v), 6) AS sim,
                       row_number() OVER (
                           PARTITION BY f.user_id
                           ORDER BY ROUND(list_cosine_similarity(pv.v, c.v),
                                          6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM fav f
                JOIN vecs pv ON pv.vec_id = f.fav_item
                CROSS JOIN vecs c
            ) WHERE rnk <= 10 AND item_id <> fav_item
        ),
        tot AS (
            SELECT user_id, item_id, ROUND(SUM(score), 6) AS total
            FROM (
                SELECT * FROM collab
                UNION ALL
                SELECT * FROM content
            )
            GROUP BY 1, 2
        )
        SELECT user_id, item_id, total, rnk
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY total DESC, item_id ASC) AS rnk
            FROM tot
        )
        WHERE rnk <= 5
        ORDER BY user_id, rnk
    """




def _ivf_pq_sql() -> str:
    """q173 twin: the IVF+PQ composition replayed from the SAME
    committed literals — coarse assignment/routing from
    ml/centroids.IVF_CENTROIDS (the q41/q47 CTE chain), PQ encode/ADC
    from ml/pq_codebooks (the q168 generator), the 20-candidate cut,
    the exact cosine re-rank, recall vs brute-force truth, and the
    per-probe scanned-row count that gates sub-linearity."""
    from ..ml.centroids import IVF_CENTROIDS
    from ..ml.pq_codebooks import PQ_CODEBOOKS, PQ_DIM, PQ_K, PQ_M

    d = PQ_DIM // PQ_M
    cb_cols = ",\n                   ".join(
        f"[{', '.join(map(str, PQ_CODEBOOKS[m]))}] AS l{m}"
        for m in range(PQ_M)
    )
    dist_cols = []
    for m in range(PQ_M):
        terms = " + ".join(
            f"((x[{m * d + j + 1}] - l{m}[c*{d} + {j + 1}])"
            f" * (x[{m * d + j + 1}] - l{m}[c*{d} + {j + 1}]))"
            for j in range(d)
        )
        dist_cols.append(
            f"list_transform(range(0, {PQ_K}), c -> {terms}) AS d{m}"
        )
    codes = ", ".join(
        f"CAST(list_position(d{m}, list_min(d{m})) - 1 AS INTEGER)"
        for m in range(PQ_M)
    )
    score = " + ".join(
        f"p.x[{m * d + j + 1}] * l{m}[e.codes[{m + 1}]*{d} + {j + 1}]"
        for m in range(PQ_M)
        for j in range(d)
    )
    return f"""
        WITH {_centroid_assign_ctes(IVF_CENTROIDS)},
        route AS (
            SELECT vec_id AS query_id, c AS cluster FROM (
                SELECT vec_id, c, row_number() OVER (
                           PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
                FROM cd WHERE vec_id < 8
            ) WHERE rn <= 4
        ),
        xq AS (
            SELECT vec_id,
                   list_transform(v,
                       x -> CAST(round(x * 1000000) AS BIGINT)) AS x
            FROM vecs
        ),
        cbs AS (SELECT {cb_cols}),
        dists AS (
            SELECT xq.vec_id,
                   {", ".join(dist_cols)}
            FROM xq CROSS JOIN cbs
        ),
        enc0 AS (SELECT vec_id, [{codes}] AS codes FROM dists),
        cellcand AS (
            SELECT r.query_id, a.vec_id AS neighbor_id
            FROM route r JOIN assign a ON a.cluster = r.cluster
            WHERE a.vec_id <> r.query_id
        ),
        scanned AS (
            SELECT query_id, COUNT(*) AS n_scanned FROM cellcand GROUP BY 1
        ),
        adc AS (
            SELECT cc.query_id, cc.neighbor_id,
                   row_number() OVER (
                       PARTITION BY cc.query_id
                       ORDER BY ({score}) DESC, cc.neighbor_id ASC) AS rnk
            FROM cellcand cc
            JOIN xq p ON p.vec_id = cc.query_id
            JOIN enc0 e ON e.vec_id = cc.neighbor_id
            CROSS JOIN cbs
        ),
        rerank AS (
            SELECT query_id, neighbor_id FROM (
                SELECT c.query_id, c.neighbor_id,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pv.v, cv.v), 6) DESC,
                                    c.neighbor_id ASC) AS rrk
                FROM (SELECT query_id, neighbor_id FROM adc
                      WHERE rnk <= 20) c
                JOIN vecs pv ON pv.vec_id = c.query_id
                JOIN vecs cv ON cv.vec_id = c.neighbor_id
            ) WHERE rrk <= 3
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT pp.vec_id AS query_id, cc.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY pp.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pp.v, cc.v), 6) DESC,
                                    cc.vec_id ASC) AS rnk
                FROM vecs pp JOIN vecs cc ON cc.vec_id <> pp.vec_id
                WHERE pp.vec_id < 8
            ) WHERE rnk <= 3
        ),
        hits AS (
            SELECT e.query_id, COUNT(r.neighbor_id) AS n_hits
            FROM exact e LEFT JOIN rerank r
              ON e.query_id = r.query_id AND e.neighbor_id = r.neighbor_id
            GROUP BY 1
        )
        SELECT h.query_id, h.n_hits,
               COALESCE(s.n_scanned, 0) AS n_scanned,
               (SELECT COUNT(*) FROM embeddings) AS n_corpus,
               COALESCE(s.n_scanned, 0) < (SELECT COUNT(*) FROM embeddings)
                   AS gate_sublinear
        FROM hits h LEFT JOIN scanned s ON s.query_id = h.query_id
        ORDER BY h.query_id
    """




def _lm_score_ctes(src: str) -> str:
    """The committed-trigram-LM scoring CTE chain over ``src`` (any
    CTE/table exposing (doc_id, text)) — vocabulary mapping to <unk>,
    trigram formation, three-tier stupid-backoff lookups against
    score tables derived by the SAME ``ml/lm.score_maps()`` the Spark
    scorer uses, integer-DIV doc averages. Ends in ``lmfin(doc_id,
    n_trigrams, lm_score_micro)``. Shared by the q174 twin (over
    ``documents``) and the q176 capstone twin (over the post-front-
    door text)."""
    from ..ml import lm

    tri, bi23, uni = lm.score_maps()

    def vals(m):
        return ", ".join(f"('{k}',{v})" for k, v in sorted(m.items()))

    vocab_in = ", ".join(f"'{t}'" for t in lm.vocab())
    return f"""
        lmtoks AS (
            SELECT doc_id,
                   list_filter(string_split({_NORMALIZED_TEXT}, ' '),
                               t -> t <> '') AS tk
            FROM {src}
        ),
        lmmapped AS (
            SELECT doc_id,
                   list_transform(tk,
                       t -> CASE WHEN t IN ({vocab_in}) THEN t
                                 ELSE '<unk>' END) AS m
            FROM lmtoks
        ),
        lmtri AS (
            SELECT doc_id, m[i] || ' ' || m[i + 1] || ' ' || m[i + 2] AS sh
            FROM lmmapped,
                 unnest(range(1, greatest(len(m) - 1, 1))) AS t(i)
        ),
        lmts AS (SELECT * FROM (VALUES {vals(tri)}) AS t(k, s)),
        lmbs AS (SELECT * FROM (VALUES {vals(bi23)}) AS t(k, s)),
        lmus AS (SELECT * FROM (VALUES {vals(uni)}) AS t(k, s)),
        lmsc AS (
            SELECT r.doc_id,
                   CAST(COALESCE(lmts.s, lmbs.s, lmus.s, 0) AS BIGINT) AS s
            FROM lmtri r
            LEFT JOIN lmts ON lmts.k = r.sh
            LEFT JOIN lmbs
              ON lmbs.k = string_split(r.sh, ' ')[2] || ' '
                        || string_split(r.sh, ' ')[3]
            LEFT JOIN lmus ON lmus.k = string_split(r.sh, ' ')[3]
        ),
        lmagg AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                   SUM(s) AS ss
            FROM lmsc GROUP BY 1
        ),
        lmfin AS (
            SELECT d.doc_id,
                   COALESCE(a.n_trigrams, 0) AS n_trigrams,
                   CASE WHEN COALESCE(a.n_trigrams, 0) > 0
                        -- SUM(BIGINT) widens to HUGEINT (→ pandas
                        -- float); pin the engine-boundary type
                        THEN CAST(a.ss // a.n_trigrams AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END AS lm_score_micro
            FROM {src} d LEFT JOIN lmagg a ON a.doc_id = d.doc_id
        )"""


def _lm_bucket_case() -> str:
    from ..ml import lm_counts as LMC

    return (
        f"CASE WHEN lm_score_micro >= {LMC.LM_HEAD_MIN_MICRO} THEN 'head' "
        f"WHEN lm_score_micro >= {LMC.LM_MID_MIN_MICRO} THEN 'middle' "
        f"ELSE 'tail' END"
    )


def _lm_buckets_sql() -> str:
    """q174 twin: committed trigram LM replayed over the documents
    table (see :func:`_lm_score_ctes`), committed tertile buckets."""
    return f"""
        WITH {_lm_score_ctes("documents").lstrip()}
        SELECT doc_id, n_trigrams, lm_score_micro,
               {_lm_bucket_case()} AS ppl_bucket
        FROM lmfin
        ORDER BY doc_id
    """


def _residual_pq_sql() -> str:
    """q175 twin: raw-PQ vs residual-PQ recall under identical IVF
    routing, both paths replayed in uniform component-row relational
    form — the coarse assignment/routing CTEs are shared with
    q41/q47/q173, each codebook is a long-form VALUES table
    (m, centroid, component, value), codes are per-(vec, subspace)
    integer argmins, and the residual score adds the routed cell's
    ⟨q, c_L⟩ offset. Every quantity is exact int64; ranking ties break
    on the neighbor id; the re-rank is the q16 cosine idiom."""
    from ..ml.centroids import IVF_CENTROIDS
    from ..ml.pq_codebooks import PQ_CODEBOOKS, PQ_DIM, PQ_M
    from ..ml.pq_residual_codebooks import RPQ_CODEBOOKS

    d = PQ_DIM // PQ_M

    def book_values(books):
        return ", ".join(
            f"({m},{c},{jj},{books[m][c * d + jj]})"
            for m in range(PQ_M)
            for c in range(len(books[m]) // d)
            for jj in range(d)
        )

    def code_ctes(tag: str, src: str) -> str:
        """codes for every corpus vector from component rows ``src``
        (vec_id, j, comp) against VALUES table ``{tag}pq``."""
        return f"""
        {tag}dist AS (
            SELECT s.vec_id, rp.m, rp.c,
                   SUM((s.comp - rp.v) * (s.comp - rp.v)) AS dd
            FROM {src} s
            JOIN {tag}pq rp ON rp.m = s.j // {d} AND rp.jj = s.j % {d}
            GROUP BY 1, 2, 3
        ),
        {tag}code AS (
            SELECT vec_id, m, c AS code FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY vec_id, m
                           ORDER BY dd ASC, c ASC) AS rn
                FROM {tag}dist
            ) WHERE rn = 1
        ),
        {tag}lut AS (
            SELECT p.vec_id AS query_id, rp.m, rp.c,
                   SUM(p.xq * rp.v) AS lut
            FROM elx p
            JOIN {tag}pq rp ON rp.m = p.j // {d} AND rp.jj = p.j % {d}
            WHERE p.vec_id < 8
            GROUP BY 1, 2, 3
        )"""

    def rerank(tag: str, score_expr: str, extra_group: str) -> str:
        return f"""
        {tag}score AS (
            SELECT cc.query_id, cc.neighbor_id,
                   {score_expr} AS score
            FROM cellcand cc
            JOIN {tag}code rc ON rc.vec_id = cc.neighbor_id
            JOIN {tag}lut l ON l.query_id = cc.query_id
                 AND l.m = rc.m AND l.c = rc.code
            GROUP BY cc.query_id, cc.neighbor_id{extra_group}
        ),
        {tag}cand AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score DESC, neighbor_id ASC) AS rn
                FROM {tag}score
            ) WHERE rn <= 5
        ),
        {tag}top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT c.query_id, c.neighbor_id,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pv.v, cv.v), 6) DESC,
                                    c.neighbor_id ASC) AS rrk
                FROM {tag}cand c
                JOIN vecs pv ON pv.vec_id = c.query_id
                JOIN vecs cv ON cv.vec_id = c.neighbor_id
            ) WHERE rrk <= 3
        ),
        {tag}hits AS (
            SELECT e.query_id, COUNT(t.neighbor_id) AS n_hits
            FROM exact e LEFT JOIN {tag}top t
              ON e.query_id = t.query_id
                 AND e.neighbor_id = t.neighbor_id
            GROUP BY 1
        )"""

    return f"""
        WITH {_centroid_assign_ctes(IVF_CENTROIDS)},
        cdq AS (
            SELECT e.vec_id, c.c,
                   SUM((e.xq - c.cv) * (e.xq - c.cv)) AS dd,
                   SUM(e.xq * c.cv) AS qc
            FROM elx e JOIN cents c ON c.j = e.j
            WHERE e.vec_id < 8
            GROUP BY 1, 2
        ),
        route AS (
            SELECT vec_id AS query_id, c AS cluster, qc FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY vec_id
                           ORDER BY dd ASC, c ASC) AS rn
                FROM cdq
            ) WHERE rn <= 4
        ),
        cellcand AS (
            SELECT r.query_id, a.vec_id AS neighbor_id, r.qc
            FROM route r JOIN assign a ON a.cluster = r.cluster
            WHERE a.vec_id <> r.query_id
        ),
        rawpq AS (SELECT * FROM (VALUES {book_values(PQ_CODEBOOKS)})
                  AS t(m, c, jj, v)),
        respq AS (SELECT * FROM (VALUES {book_values(RPQ_CODEBOOKS)})
                  AS t(m, c, jj, v)),
        rawcomp AS (SELECT vec_id, j, xq AS comp FROM elx),
        rescomp AS (
            SELECT e.vec_id, e.j, e.xq - c.cv AS comp
            FROM elx e
            JOIN assign a ON a.vec_id = e.vec_id
            JOIN cents c ON c.c = a.cluster AND c.j = e.j
        ),
        {code_ctes("raw", "rawcomp").lstrip()},
        {code_ctes("res", "rescomp").lstrip()},
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT pp.vec_id AS query_id, cc.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY pp.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pp.v, cc.v), 6) DESC,
                                    cc.vec_id ASC) AS rnk
                FROM vecs pp JOIN vecs cc ON cc.vec_id <> pp.vec_id
                WHERE pp.vec_id < 8
            ) WHERE rnk <= 3
        ),
        {rerank("raw", "SUM(l.lut)", "").lstrip()},
        {rerank("res", "cc.qc + SUM(l.lut)", ", cc.qc").lstrip()}
        SELECT hr.query_id,
               hr.n_hits AS n_hits_raw,
               hs.n_hits AS n_hits_res,
               SUM(hs.n_hits) OVER () >= SUM(hr.n_hits) OVER ()
                   AS gate_residual_total_no_worse
        FROM rawhits hr JOIN reshits hs ON hs.query_id = hr.query_id
        ORDER BY hr.query_id
    """




def _front_door_batch_dedup_sql() -> str:
    """q179 twin: the q176 stage composition (clean-page synthesis →
    extraction → C4 → intra-doc line dedup) extended with the
    batch_line_cap stage's CTEs — the q178 count/flag/rebuild pattern
    over the POST-intra-dedup text (count each non-empty normalized
    line across the corpus, drop every copy past the cap, rebuild in
    original order)."""
    from .queries import _Q171_CLEAN_LINE

    line_lit = _Q171_CLEAN_LINE.replace("'", "''")
    page = (
        "'<html><head><script>var x = 1;</script></head><body>"
        '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
        "<article><p>Doc ' || CAST(doc_id AS VARCHAR) || "
        "' of the corpus.</p><p>' || text || ' tail marker.</p>"
        "<p>Subscribe to our newsletter today.</p>"
        "<p>Subscribe to our newsletter today.</p><p>"
        f"{line_lit}" + "</p><p>lang ' || lang || "
        "'</p><p>Enable javascript to continue.</p></article>"
        "<footer>&copy; corp</footer></body></html>'"
    )
    return f"""
        WITH {_extraction_ctes(page)},
        c AS (
            SELECT doc_id,
                   {_c4_kept("string_split(extracted, chr(10))")} AS kept
            FROM f
        ),
        cl AS (
            SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept, kept
            FROM c WHERE len(kept) >= 2
        ),
        lines AS (
            SELECT doc_id, unnest(kept) AS line,
                   unnest(range(1, len(kept) + 1)) AS pos
            FROM cl
        ),
        ranked AS (
            SELECT doc_id, line, pos,
                   row_number() OVER (
                       PARTITION BY doc_id, lower(trim(line))
                       ORDER BY pos) AS rn
            FROM lines
        ),
        dl AS (
            SELECT doc_id,
                   CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
                       AS n_dup_lines,
                   COALESCE(string_agg(line, chr(10) ORDER BY pos)
                       FILTER (WHERE rn = 1), '') AS text
            FROM ranked GROUP BY doc_id
        ),
        blines AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   unnest(range(1, len(string_split(text, chr(10))) + 1))
                       AS pos
            FROM dl
        ),
        bkeyed AS (
            SELECT doc_id, pos, line, lower(trim(line)) AS key
            FROM blines
        ),
        bcounts AS (
            SELECT key, count(*) AS n FROM bkeyed
            WHERE key <> '' GROUP BY key
        ),
        bflag AS (
            SELECT k.doc_id, k.pos, k.line,
                   (k.key = '' OR c.n IS NULL OR c.n <= 2) AS kept
            FROM bkeyed k LEFT JOIN bcounts c USING (key)
        ),
        bd AS (
            SELECT doc_id,
                   CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT)
                       AS n_batch_dup_lines,
                   CAST(length(COALESCE(
                       string_agg(line, chr(10) ORDER BY pos)
                           FILTER (WHERE kept), '')) AS BIGINT)
                       AS clean_chars
            FROM bflag GROUP BY doc_id
        )
        SELECT cl.doc_id, cl.n_kept, dl.n_dup_lines,
               bd.n_batch_dup_lines, bd.clean_chars
        FROM cl
        JOIN dl USING (doc_id)
        JOIN bd USING (doc_id)
        ORDER BY cl.doc_id
    """


def _front_door_lm_sql() -> str:
    """q176 twin: the q171 stage composition (extraction → C4 →
    line-dedup → canonicalization → blocklist) extended with the
    committed-LM scoring CTEs over the POST-pipeline text and the
    CCNet keep (head+middle), rolled up per domain with the bucket
    mix and score mass."""
    from .queries import _Q171_CLEAN_LINE

    line_lit = _Q171_CLEAN_LINE.replace("'", "''")
    page = (
        "'<html><head><script>var x = 1;</script></head><body>"
        '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>'
        "<article><p>Doc ' || CAST(doc_id AS VARCHAR) || "
        "' of the corpus.</p><p>' || text || ' tail marker.</p>"
        "<p>Subscribe to our newsletter today.</p>"
        "<p>Subscribe to our newsletter today.</p><p>"
        f"{line_lit}" + "</p><p>lang ' || lang || "
        "'</p><p>Enable javascript to continue.</p></article>"
        "<footer>&copy; corp</footer></body></html>'"
    )
    return f"""
        WITH {_extraction_ctes(page)},
        c AS (
            SELECT doc_id,
                   {_c4_kept("string_split(extracted, chr(10))")} AS kept
            FROM f
        ),
        cl AS (
            SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept, kept
            FROM c WHERE len(kept) >= 2
        ),
        lines AS (
            SELECT doc_id, unnest(kept) AS line,
                   unnest(range(1, len(kept) + 1)) AS pos
            FROM cl
        ),
        ranked AS (
            SELECT doc_id, line, pos,
                   row_number() OVER (
                       PARTITION BY doc_id, lower(trim(line))
                       ORDER BY pos) AS rn
            FROM lines
        ),
        dl AS (
            SELECT doc_id,
                   CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
                       AS n_dup_lines,
                   COALESCE(string_agg(line, chr(10) ORDER BY pos)
                       FILTER (WHERE rn = 1), '') AS text
            FROM ranked GROUP BY doc_id
        ),
        {_lm_score_ctes("dl").lstrip()},
        lmb AS (
            SELECT doc_id, lm_score_micro,
                   {_lm_bucket_case()} AS ppl_bucket
            FROM lmfin
        ),
        u AS ({_url_canonicalization_sql()})
        SELECT u.domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN lmb.ppl_bucket = 'head' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_head,
               CAST(SUM(CASE WHEN lmb.ppl_bucket = 'middle' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_middle,
               CAST(SUM(cl.n_kept) AS BIGINT) AS kept_lines,
               CAST(SUM(dl.n_dup_lines) AS BIGINT) AS dup_lines_removed,
               CAST(SUM(lmb.lm_score_micro) AS BIGINT) AS lm_score_sum,
               CAST(SUM(length(dl.text)) AS BIGINT) AS clean_chars
        FROM cl
        JOIN dl USING (doc_id)
        JOIN lmb USING (doc_id)
        JOIN u USING (doc_id)
        WHERE u.domain <> 'example.co.uk'
          AND lmb.ppl_bucket IN ('head', 'middle')
        GROUP BY u.domain ORDER BY u.domain
    """


ORACLES: dict[str, str] = {
    # round-12: the front door's CCNet per-shard paragraph dedup stage
    "q179_front_door_batch_dedup": _front_door_batch_dedup_sql(),

    # round-10: capstone with the CCNet LM gate composed last
    "q176_front_door_lm_rollup": _front_door_lm_sql(),

    # round-10: residual vs raw PQ recall under IVF routing (IVFADC)
    "q175_residual_pq_recall": _residual_pq_sql(),

    # round-10: committed trigram LM perplexity buckets (VERDICT r9 #4)
    "q174_lm_perplexity": _lm_buckets_sql(),

    # round-10: IVF+PQ composition (VERDICT r9 #2)
    "q173_ivf_pq_search": _ivf_pq_sql(),

    # round-10: the committed-artifact ML tail (VERDICT r9 #1) — the
    # iterative fits ran once offline; serving replays exactly
    "q40_als_recommendations": _als_topk_sql(),
    "q41_kmeans_clusters": _kmeans_histogram_sql(),
    "q42_tfidf_features": _tfidf_features_sql(),
    "q43_hybrid_recommendations": _hybrid_sql(),
    "q47_ivf_ann_search": _ivf_knn_sql(),

    # q172: two-tier admission — q167's estimate tier + exact-Jaccard
    # verification of every admitted pair
    "q172_admission_two_tier": _admission_two_tier_sql(),
    # q171: the complete composed front door — blocklist + repair +
    # extract + C4 + line dedup + canonicalize, per-domain rollup
    "q171_full_front_door_rollup": _full_front_door_sql(),
    # q170: encoding repair — generated pair table replayed as a
    # nested replace chain
    "q170_mojibake_repair": _mojibake_repair_sql(),
    # q169: URL blocklist stage — host parse + registrable domain +
    # IN + pattern regex replay
    "q169_url_blocklist": _url_blocklist_sql(),
    # q168: PQ two-stage retrieval — committed-codebook encode + ADC
    # + exact re-rank, recall gated vs brute force
    "q168_pq_rerank_recall": _pq_rerank_recall_sql(),
    # q167: near-dup admission probe — full MinHash banding +
    # agreement replay, corpus/probe split in-SQL
    "q167_near_dup_admission": _near_dup_admission_sql(),
    # q166: intra-document keep-first line dedup — positional unnest
    # + row_number keep-first + ordered string_agg replays the
    # operator's array_position(norm, norm[i]) == i+1 filter exactly
    # q178: C4's GLOBAL line rule — corpus-wide normalized-line counts,
    # every copy above the cap removed, empty lines exempt; per-doc
    # audit + ordered rebuild length
    "q178_corpus_line_dedup": """
        WITH pages AS (
            SELECT doc_id,
                   'Accept all cookies to continue.' || chr(10) ||
                   'Doc ' || CAST(doc_id AS VARCHAR) || ': ' || text
                       || chr(10) ||
                   'lang ' || lang || ' section.' || chr(10) ||
                   'pair ' ||
                   CAST(CAST(floor(doc_id / 2) AS BIGINT) AS VARCHAR)
                       || ' marker.' || chr(10) ||
                   '' AS page
            FROM documents
        ),
        arr AS (
            SELECT doc_id, string_split(page, chr(10)) AS lines
            FROM pages
        ),
        lines AS (
            SELECT doc_id, unnest(lines) AS line,
                   unnest(range(1, len(lines) + 1)) AS pos
            FROM arr
        ),
        keyed AS (
            SELECT doc_id, pos, line, lower(trim(line)) AS key FROM lines
        ),
        counts AS (
            SELECT key, count(*) AS n FROM keyed
            WHERE key <> '' GROUP BY key
        ),
        flagged AS (
            SELECT k.doc_id, k.pos, k.line,
                   (k.key = '' OR c.n IS NULL OR c.n <= 2) AS kept
            FROM keyed k LEFT JOIN counts c USING (key)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(*) FILTER (WHERE kept) AS BIGINT)
                   AS n_kept_lines,
               CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT)
                   AS n_removed,
               CAST(length(COALESCE(
                   string_agg(line, chr(10) ORDER BY pos)
                       FILTER (WHERE kept), '')) AS BIGINT) AS clean_chars
        FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    "q166_line_dedup": """
        WITH pages AS (
            SELECT doc_id,
                   'Home | About | Contact.' || chr(10) ||
                   'Doc ' || CAST(doc_id AS VARCHAR) || ': ' || text
                       || chr(10) ||
                   'lang ' || lang || ' entry.' || chr(10) ||
                   'Home | About | Contact.' || chr(10) ||
                   'Doc ' || CAST(doc_id AS VARCHAR) || ': ' || text
                       || chr(10) ||
                   'Copyright 2026.' || chr(10) ||
                   'copyright 2026. ' || chr(10) ||
                   'lang ' || lang || ' entry.' AS page
            FROM documents
        ),
        arr AS (
            SELECT doc_id, string_split(page, chr(10)) AS lines
            FROM pages
        ),
        lines AS (
            SELECT doc_id, unnest(lines) AS line,
                   unnest(range(1, len(lines) + 1)) AS pos
            FROM arr
        ),
        ranked AS (
            SELECT doc_id, line, pos,
                   row_number() OVER (
                       PARTITION BY doc_id, lower(trim(line))
                       ORDER BY pos) AS rn
            FROM lines
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT)
                   AS n_kept_lines,
               CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
                   AS n_removed,
               COALESCE(string_agg(line, chr(10) ORDER BY pos)
                   FILTER (WHERE rn = 1), '') AS dedup_text
        FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
    # q165: multi-probe SRP recall vs single-probe vs brute force —
    # same bit-exact hyperplane replay as q119, plus Hamming-1 flips
    "q165_multiprobe_recall": f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        el AS (
            SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM vecs
        ),
        elx AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM el
        ),
        planes AS (SELECT unnest(range(0, 6)) AS p),
        proj AS (
            SELECT vec_id, p,
                   SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                            THEN 1 ELSE -1 END) AS proj
            FROM elx CROSS JOIN planes
            GROUP BY 1, 2
        ),
        bucket AS (
            SELECT vec_id,
                   SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS bucket
            FROM proj GROUP BY 1
        ),
        pb AS (
            SELECT vec_id,
                   CASE WHEN j = 6 THEN bucket
                        ELSE xor(bucket, CAST(1 AS BIGINT) << j) END
                       AS bucket
            FROM bucket, (SELECT unnest(range(0, 7)) AS j)
            WHERE vec_id < 8
        ),
        approx_s AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pv.v, cv.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM bucket p
                JOIN bucket c ON p.bucket = c.bucket
                             AND c.vec_id <> p.vec_id
                JOIN vecs pv ON pv.vec_id = p.vec_id
                JOIN vecs cv ON cv.vec_id = c.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        ),
        approx_m AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pv.v, cv.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM pb p
                JOIN bucket c ON p.bucket = c.bucket
                             AND c.vec_id <> p.vec_id
                JOIN vecs pv ON pv.vec_id = p.vec_id
                JOIN vecs cv ON cv.vec_id = c.vec_id
            ) WHERE rnk <= 3
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        p.v, c.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM vecs p JOIN vecs c ON c.vec_id <> p.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        ),
        hs AS (
            SELECT e.query_id,
                   CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits_single
            FROM exact e LEFT JOIN approx_s a
              ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
            GROUP BY 1
        ),
        hm AS (
            SELECT e.query_id,
                   CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits_multi
            FROM exact e LEFT JOIN approx_m a
              ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
            GROUP BY 1
        )
        SELECT query_id, n_hits_single, n_hits_multi,
               n_hits_multi >= n_hits_single AS gate_no_worse
        FROM hs JOIN hm USING (query_id)
        ORDER BY query_id
    """,
    # q164: fertility eval consuming the LEARNED language labels
    "q164_fertility_by_model_lang": _fertility_by_model_lang_sql(8),
    # q163: model-based language ID (Bernoulli NB, committed weights)
    # vs heuristic vs labeled lang, with the agreement gate
    "q163_langid_model": _langid_confusion_sql(),
    # q162: IVM refresh — same two-batch summary algebra, both gates
    "q162_incremental_view_refresh": """
        WITH base AS (
            SELECT l_returnflag, l_orderkey,
                   CAST(l_quantity AS BIGINT) AS qty
            FROM lineitem
        ),
        ini AS (
            SELECT l_returnflag, COUNT(*) AS n, SUM(qty) AS s,
                   MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
            FROM base WHERE l_orderkey % 5 <> 0 GROUP BY 1
        ),
        del AS (
            SELECT l_returnflag, COUNT(*) AS n, SUM(qty) AS s,
                   MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
            FROM base WHERE l_orderkey % 5 = 0 GROUP BY 1
        ),
        mv1 AS (
            SELECT l_returnflag, SUM(n) AS n, SUM(s) AS s,
                   MIN(mn) AS mn, MAX(mx) AS mx
            FROM (SELECT * FROM ini UNION ALL SELECT * FROM del)
            GROUP BY 1
        ),
        fl AS (
            SELECT l_returnflag, COUNT(*) AS n, SUM(qty) AS s,
                   MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
            FROM base GROUP BY 1
        ),
        mv2 AS (
            SELECT l_returnflag, SUM(n) AS n, SUM(s) AS s
            FROM (SELECT l_returnflag, n, s FROM mv1
                  UNION ALL
                  SELECT l_returnflag, -n, -s FROM del)
            GROUP BY 1
        )
        SELECT mv1.l_returnflag,
               CAST(mv1.n AS BIGINT) AS n_rows,
               CAST(mv1.s AS BIGINT) AS sum_qty,
               mv1.mn AS min_ok, mv1.mx AS max_ok,
               (mv1.n = fl.n AND mv1.s = fl.s AND mv1.mn = fl.mn
                AND mv1.mx = fl.mx) AS matches_full,
               (mv2.n = ini.n AND mv2.s = ini.s)
                   AS retract_matches_initial
        FROM mv1
        JOIN fl USING (l_returnflag)
        JOIN ini USING (l_returnflag)
        JOIN mv2 USING (l_returnflag)
        ORDER BY mv1.l_returnflag
    """,
    # q161: model-based quality classifier scoring, committed weights
    "q161_quality_classifier": _qclf_sql(),
    # q160: exact-substring span REMOVAL — shared span core + surgery
    "q160_span_removal": _remove_spans_sql(8),
    # q159: concat-then-chunk manifest — same cumsum/div/clamp algebra
    "q159_sequence_manifest": f"""
        WITH d AS (
            SELECT lang, doc_id,
                   CAST({_TOKEN_COUNT} AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT lang, doc_id, n_tokens,
                   -- window SUM(BIGINT) is HUGEINT: cast back so
                   -- range()/div stay in int64 (the standing rule)
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS strt
            FROM d WHERE n_tokens > 0
        ),
        e AS (
            SELECT lang, doc_id, n_tokens, strt,
                   strt + n_tokens AS fin,
                   unnest(range(strt // 512,
                                (strt + n_tokens - 1) // 512 + 1)) AS sq
            FROM c
        )
        SELECT lang, doc_id, n_tokens,
               CAST(sq AS BIGINT) AS seq_id,
               CAST(greatest(strt, sq * 512) - strt AS BIGINT)
                   AS doc_from,
               CAST(least(fin, (sq + 1) * 512) - strt AS BIGINT)
                   AS doc_to,
               CAST(least(fin, (sq + 1) * 512)
                    - greatest(strt, sq * 512) AS BIGINT)
                   AS n_tokens_in_seq
        FROM e ORDER BY lang, seq_id, doc_id
    """,
    # q158: domain rollup — composed from the q151/q153/q154 twins
    "q158_domain_curation_rollup": _domain_rollup_sql(),
    # q157: quantile sketch — bottom-k sample + exact band twin
    "q157_quantile_sketch": _quantile_sketch_sql(1024),
    # q156: exact-substring duplicate spans — k-gram islands twin
    "q156_duplicated_spans": _duplicated_spans_sql(8),
    # q155: tokenizer fertility twin — final vocab joined to doc words
    "q155_tokenizer_fertility": _tokenizer_fertility_sql(8),
    # q154: URL canonicalization twin — same regex tiers + list ops
    "q154_url_canonicalization": _url_canonicalization_sql(),
    # q153: C4 line-cleaning twin — same page, list_filter lambdas
    "q153_c4_line_cleaning": _c4_line_cleaning_sql(),
    # q152: BPE encode twin — trainer chain + final re-merge + stats
    "q152_bpe_token_stats": _bpe_tokens_sql(8, 20),
    # q151: HTML extraction twin — same regex tiers, RE2 'g' option
    "q151_html_extraction": _html_extraction_sql(),
    # q139: distributed BPE trainer twin — 8 unrolled merge rounds
    "q139_bpe_merges": _bpe_merges_sql(8),
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 2) AS avg_qty,
               ROUND(AVG(l_extendedprice), 2) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_top_orders_by_revenue": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_orderpriority,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q03_region_revenue": """
        SELECT r_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               COUNT(DISTINCT c_custkey) AS n_customers
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """,
    "q04_event_type_stats": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(SUM(value), 2) AS sum_value,
               ROUND(MIN(value), 2) AS min_value,
               ROUND(MAX(value), 2) AS max_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q05_top_events_per_type": """
        SELECT event_type, event_id, user_id, value, rnk
        FROM (
            SELECT event_type, event_id, user_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC
                   ) AS rnk
            FROM events
        )
        WHERE rnk <= 3
        ORDER BY event_type, rnk
    """,
    "q06_orders_page": """
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders
        ORDER BY o_orderkey
        LIMIT 20 OFFSET 40
    """,
    "q07_active_customers": """
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
        ORDER BY c_custkey
    """,
    "q08_inactive_customers": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        ORDER BY c_custkey
    """,
    "q09_value_buckets": """
        SELECT CASE WHEN value >= 80 THEN CAST(5.0 AS DOUBLE)
                    WHEN value >= 60 THEN CAST(4.0 AS DOUBLE)
                    WHEN value >= 40 THEN CAST(3.0 AS DOUBLE)
                    WHEN value >= 20 THEN CAST(2.0 AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE) END AS rating,
               COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value
        FROM events
        GROUP BY 1
        ORDER BY rating
    """,
    "q10_hourly_events": """
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_ts,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY hour_ts
    """,
    "q11_union_order_classes": """
        SELECT bucket, o_orderstatus, COUNT(*) AS n
        FROM (
            SELECT 'high_value' AS bucket, o_orderstatus
            FROM orders WHERE o_totalprice > 50000
            UNION ALL
            SELECT 'recent' AS bucket, o_orderstatus
            FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        )
        GROUP BY bucket, o_orderstatus
        ORDER BY bucket, o_orderstatus
    """,
    "q12_part_type_revenue": """
        SELECT p_type,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(AVG(p_retailprice), 2) AS avg_retail,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
        ORDER BY p_type
    """,
    "q13_props_json": """
        SELECT event_type,
               ROUND(AVG(k), 4) AS avg_k,
               MAX(k) AS max_k,
               MIN(k) AS min_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q14_doc_stats_by_lang": f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_tokens), 2) AS avg_tokens,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               MAX(n_chars) AS max_chars
        FROM (
            SELECT lang, n_chars, {_TOKEN_COUNT} AS n_tokens
            FROM documents
        )
        GROUP BY lang
        ORDER BY lang
    """,
    "q15_doc_exact_dedup": f"""
        SELECT doc_id, fp,
               (ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1) AS keep
        FROM (
            SELECT doc_id, md5({_NORMALIZED_TEXT}) AS fp
            FROM documents
        )
        ORDER BY doc_id
    """,
    "q16_knn_cosine": """
        WITH probes AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 3
        ),
        corpus AS (
            SELECT vec_id AS neighbor_id, label AS neighbor_label,
                   CAST(embedding AS DOUBLE[]) AS nv
            FROM embeddings
        ),
        scored AS (
            SELECT query_id, neighbor_id, neighbor_label,
                   ROUND(list_cosine_similarity(qv, nv), 6) AS sim
            FROM corpus, probes
            WHERE neighbor_id <> query_id
        )
        SELECT query_id, neighbor_id, neighbor_label, sim, rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC
                   ) AS rnk
            FROM scored
        )
        WHERE rnk <= 5
        ORDER BY query_id, rnk
    """,
    "q17_ngram_jaccard_pairs": _JACCARD_PAIRS,
    # q20's LSH pipeline must recover exactly the true pair set (every
    # true pair here has j≈0.98 → band-collision probability ≈1), so
    # its oracle is the same exact-Jaccard SQL.
    "q20_minhash_lsh_pairs": _JACCARD_PAIRS,
    "q18_minhash_signatures": f"""
        WITH sets AS ({_SHINGLE_SETS})
        SELECT doc_id,
               {_MINHASH_COLS}
        FROM sets
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "q19_simhash": f"""
        SELECT doc_id, CAST({_SIMHASH_PACK} AS BIGINT) AS simhash
        FROM (
            SELECT doc_id,
               {_SIMHASH_SUMS}
            FROM (
                SELECT doc_id, {_hash60("tok")} AS h
                FROM (SELECT doc_id,
                             unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
                      FROM documents)
            )
            GROUP BY doc_id
        )
        ORDER BY doc_id
    """,
    "q21_embedding_dup_pairs": """
        SELECT id_a, id_b, cosine FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        )
        WHERE cosine >= 0.4
        ORDER BY id_a, id_b
    """,
    "q22_doc_quality": f"""
        SELECT doc_id, n_tokens,
               floor(punct_ratio * 10000.0) / 10000.0 AS punct_ratio,
               floor(sw_ratio * 10000.0) / 10000.0 AS stopword_ratio,
               floor((CAST(0.4 AS DOUBLE) * len_score
                      + CAST(0.3 AS DOUBLE) * punct_score
                      + CAST(0.3 AS DOUBLE) * sw_score) * 10000.0) / 10000.0 AS quality
        FROM (
            SELECT doc_id, n_tokens, punct_ratio, sw_ratio,
                   CASE WHEN n_tokens >= 50 THEN CAST(1.0 AS DOUBLE)
                        ELSE n_tokens / CAST(50.0 AS DOUBLE) END AS len_score,
                   greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                       CAST(1.0 AS DOUBLE) - punct_ratio * 4)) AS punct_score,
                   greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                       sw_ratio * 5)) AS sw_score
            FROM (
                SELECT doc_id,
                       {_TOKEN_COUNT} AS n_tokens,
                       CASE WHEN len(text) > 0 THEN
                           (len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                           * 1.0 / len(text)
                       ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
                       CASE WHEN {_TOKEN_COUNT} > 0 THEN
                           len(list_filter({_RAW_TOKENS_LOWER},
                               t -> list_contains({_STOPWORD_LISTS["en"]}, t)))
                           * 1.0 / ({_TOKEN_COUNT})
                       ELSE CAST(0.0 AS DOUBLE) END AS sw_ratio
                FROM documents
            )
        )
        ORDER BY doc_id
    """,
    "q23_lang_confusion": f"""
        SELECT lang, predicted, COUNT(*) AS n
        FROM (
            SELECT lang,
                   CASE WHEN best = 0 THEN 'und'
                        WHEN vde = best THEN 'de'
                        WHEN ven = best THEN 'en'
                        WHEN ves = best THEN 'es'
                        WHEN vfr = best THEN 'fr'
                        ELSE 'und' END AS predicted
            FROM (
                SELECT lang, vde, ven, ves, vfr,
                       greatest(vde, ven, ves, vfr) AS best
                FROM (
                    SELECT lang,
                           {_votes("de")} AS vde,
                           {_votes("en")} AS ven,
                           {_votes("es")} AS ves,
                           {_votes("fr")} AS vfr
                    FROM documents
                )
            )
        )
        GROUP BY lang, predicted
        ORDER BY lang, predicted
    """,
    "q24_user_running_totals": """
        SELECT user_id, event_id, value,
               lag(value) OVER w AS prev_value,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend,
               ROW_NUMBER() OVER w AS rn
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn
    """,
    "q25_sessionization": """
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR (epoch(ts) - epoch(lag(ts) OVER w)) > 1800.0
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WHERE user_id < 100
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM gaps
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "q26_rollup_revenue": """
        SELECT r_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items,
               GROUPING(r_name, n_name) AS grp_id
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY grp_id, r_name, n_name
    """,
    "q27_daily_event_pivot": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    "q28_value_percentiles": """
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS median_value,
               MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90_value,
               MAX(n) AS n
        FROM ranked
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q29_asof_last_click": """
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
               strftime((
                   SELECT MAX(c.ts) FROM events c
                   WHERE c.user_id = p.user_id
                     AND c.event_type = 'click'
                     AND c.ts < p.ts
               ), '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
        FROM events p
        WHERE p.event_type = 'purchase'
        ORDER BY p.event_id
    """,
    "q30_hash_attributes": """
        SELECT color, COUNT(*) AS n,
               ROUND(AVG(p_retailprice), 2) AS avg_retail
        FROM (
            SELECT (['red','green','blue','gold','silver'])[
                       CAST(CAST(('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS INTEGER) + 1
                   ] AS color,
                   p_retailprice
            FROM part
        )
        GROUP BY color
        ORDER BY color
    """,
    "q31_duration_format": """
        SELECT printf('%d:%02d',
                      CAST(floor(value * 1000) AS BIGINT) // 60000,
                      (CAST(floor(value * 1000) AS BIGINT) % 60000) // 1000) AS dur,
               COUNT(*) AS n
        FROM events
        GROUP BY 1
        ORDER BY dur
    """,
    "q32_cube_order_stats": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority
    """,
    "q33_intersect_buyers": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
        ORDER BY custkey
    """,
    "q34_except_customers": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey
    """,
    "q54_item_cooccurrence": """
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        uic AS (
            -- mirror of the Spark-side DEFAULT_MAX_ITEMS_PER_USER=200
            -- fan-out cap: each user keeps its 200 lowest item ids
            SELECT user_id, item_id FROM (
                SELECT user_id, item_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY item_id) AS rn
                FROM ui
            ) WHERE rn <= 200
        ),
        nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ui),
        item_n AS (SELECT item_id, COUNT(*) AS n FROM ui GROUP BY item_id),
        co AS (
            SELECT a.item_id AS item_a, b.item_id AS item_b, COUNT(*) AS n_co
            FROM uic a JOIN uic b
              ON a.user_id = b.user_id AND a.item_id < b.item_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        )
        SELECT item_a, item_b, n_co,
               ROUND(n_co * (SELECT n_users FROM nu) / (na.n * nb.n), 4) AS lift
        FROM co
        JOIN item_n na ON co.item_a = na.item_id
        JOIN item_n nb ON co.item_b = nb.item_id
        ORDER BY n_co DESC, item_a ASC, item_b ASC
        LIMIT 50
    """,
    "q53_click_attribution": """
        SELECT p.user_id,
               COUNT(DISTINCT p.event_id) AS attributed_purchases,
               COUNT(*) AS click_pairs
        FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts
         AND c.ts > p.ts - INTERVAL 30 MINUTE
        GROUP BY p.user_id
        ORDER BY p.user_id
    """,
    "q51_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_effect,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q52_unpivot_event_stats": """
        WITH wide AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS DOUBLE) AS total,
                   CAST(ROUND(SUM(value), 2) AS DOUBLE) AS sum_value,
                   CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
            FROM events
            GROUP BY 1
        )
        SELECT day, metric, ROUND(metric_value, 2) AS metric_value
        FROM (UNPIVOT wide ON total, sum_value, n_users
              INTO NAME metric VALUE metric_value)
        ORDER BY day, metric
    """,
    "q50_user_event_arrays": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',')
                   AS event_types,
               CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types
        FROM events
        WHERE user_id < 40
        GROUP BY user_id
        ORDER BY user_id
    """,
    "q48_ntile_quartiles": """
        SELECT c_mktsegment, quartile, COUNT(*) AS n,
               ROUND(MIN(c_acctbal), 2) AS min_bal,
               ROUND(MAX(c_acctbal), 2) AS max_bal
        FROM (
            SELECT c_mktsegment, c_acctbal,
                   ntile(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
            FROM customer
        )
        GROUP BY c_mktsegment, quartile
        ORDER BY c_mktsegment, quartile
    """,
    "q49_first_last_gap": """
        SELECT user_id, event_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER w AS last_type,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(first_value(ts) OVER w)) AS BIGINT)
                 AS sec_since_first
        FROM events
        WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, event_id
    """,
    "q36_supplier_diversity": """
        SELECT p_brand, p_size % 5 AS size_bucket,
               COUNT(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_size % 5
        HAVING COUNT(DISTINCT l_suppkey) >= 5
        ORDER BY p_brand, size_bucket
    """,
    "q37_order_count_distribution": """
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY n_orders
        ORDER BY n_orders
    """,
    "q38_small_quantity_revenue": """
        WITH bounds AS (
            SELECT l_partkey AS bp,
                   SUM(l_quantity) / COUNT(*) * 0.5 AS half_avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN bounds ON l_partkey = bp
        WHERE l_quantity < half_avg_qty
    """,
    "q39_late_shipment_priorities": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q35_fuzzy_category_match": """
        WITH dim AS (
            SELECT * FROM (VALUES
                ('economy','budget'), ('stand','mainline'), ('omo','deal'),
                ('large','big'), ('smallest','tiny')
            ) AS t(k, category)
        ),
        f AS (SELECT lower(trim(p_type)) AS ft FROM part),
        e AS (
            SELECT f.ft, d.category AS ep
            FROM f LEFT JOIN dim d ON f.ft = d.k
        ),
        c AS (
            SELECT m.ft, MIN(d.category) AS cp
            FROM (SELECT DISTINCT ft FROM e WHERE ep IS NULL) m
            JOIN dim d
              ON m.ft LIKE '%' || d.k || '%' OR d.k LIKE '%' || m.ft || '%'
            GROUP BY m.ft
        )
        SELECT COALESCE(ep, cp, 'misc') AS category,
               CASE WHEN ep IS NOT NULL THEN 'exact'
                    WHEN cp IS NOT NULL THEN 'contains'
                    ELSE 'fallback' END AS tier,
               COUNT(*) AS n
        FROM e LEFT JOIN c USING (ft)
        GROUP BY 1, 2
        ORDER BY category, tier
    """,
    # Multimodal fake-media contract (operators.multimodal): modality and
    # visual dims are md5-bucket-derived from doc_id; payload = utf-8
    # bytes of text, so byte stats are expressible on the text column.
    "q44_multimodal_decode": f"""
        WITH media AS (
            SELECT doc_id,
                   (['audio','image','video'])[
                       CAST({_MD5B("CAST(doc_id AS VARCHAR)")} % 3 AS INTEGER) + 1
                   ] AS modality,
                   text
            FROM documents
        )
        SELECT doc_id,
               modality,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS checksum,
               CAST(list_sum(list_transform(
                   range(1, length(text) + 1),
                   i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS BIGINT) AS byte_sum,
               CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
                    ELSE floor(CAST(list_sum(list_transform(
                             range(1, length(text) + 1),
                             i -> ascii(substr(text, CAST(i AS INTEGER), 1))))
                         AS DOUBLE) / octet_length(encode(text)) * 10000) / 10000
               END AS mean_byte,
               CASE WHEN modality IN ('image','video')
                    THEN CAST(64 + {_MD5B("'w:' || CAST(doc_id AS VARCHAR)")} % 961 AS INTEGER)
               END AS width,
               CASE WHEN modality IN ('image','video')
                    THEN CAST(64 + {_MD5B("'h:' || CAST(doc_id AS VARCHAR)")} % 961 AS INTEGER)
               END AS height,
               CASE WHEN modality = 'audio'
                    THEN ([8000, 16000, 22050, 44100])[
                        CAST({_MD5B("'sr:' || CAST(doc_id AS VARCHAR)")} % 4 AS INTEGER) + 1
                    ]
               END AS sample_rate,
               CAST(NULL AS BIGINT) AS n_samples
        FROM media
        ORDER BY doc_id
    """,
    "q45_video_frame_sample": f"""
        WITH vids AS (
            SELECT doc_id,
                   CAST(1 + {_MD5B("'nf:' || CAST(doc_id AS VARCHAR)")} % 300 AS INTEGER)
                       AS n_frames
            FROM documents
            WHERE (['audio','image','video'])[
                      CAST({_MD5B("CAST(doc_id AS VARCHAR)")} % 3 AS INTEGER) + 1
                  ] = 'video'
        ),
        frames AS (
            SELECT doc_id, n_frames,
                   unnest(generate_series(0, n_frames - 1, 7)) AS frame_index
            FROM vids
        )
        SELECT doc_id, n_frames, CAST(frame_index AS INTEGER) AS frame_index,
               round(frame_index / 24.0, 6) AS frame_ts_sec
        FROM frames
        ORDER BY doc_id, frame_index
    """,
    "q46_image_resize_plan": f"""
        WITH media AS (
            SELECT doc_id,
                   (['audio','image','video'])[
                       CAST({_MD5B("CAST(doc_id AS VARCHAR)")} % 3 AS INTEGER) + 1
                   ] AS modality,
                   CAST(64 + {_MD5B("'w:' || CAST(doc_id AS VARCHAR)")} % 961 AS INTEGER) AS width,
                   CAST(64 + {_MD5B("'h:' || CAST(doc_id AS VARCHAR)")} % 961 AS INTEGER) AS height
            FROM documents
        )
        SELECT doc_id, modality, width, height,
               CAST(greatest(1, floor(width * least(1.0, 256.0 / width, 256.0 / height)))
                    AS INTEGER) AS target_w,
               CAST(greatest(1, floor(height * least(1.0, 256.0 / width, 256.0 / height)))
                    AS INTEGER) AS target_h
        FROM media
        WHERE modality IN ('image','video')
        ORDER BY doc_id
    """,
    "q55_local_supplier_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q56_bilateral_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               extract(year FROM l_shipdate) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q57_national_market_share": """
        SELECT extract(year FROM o_orderdate) AS o_year,
               ROUND(SUM(CASE WHEN n1.n_name = 'NATION_1'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE CAST(0 AS DOUBLE) END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_volume
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
        GROUP BY 1
        ORDER BY o_year
    """,
    "q58_returned_item_revenue": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q59_promo_revenue_share": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE CAST(0 AS DOUBLE) END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
        ORDER BY ship_month
    """,
    "q60_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
        FROM supplier
        JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "q61_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING ROUND(SUM(l_quantity), 2) > 300
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_totalprice, sum_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q62_brand_quantity_revenue": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 35)
    """,
    "q68_variant_props": """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               floor(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE) * 10000.0) / 10000.0 AS pct_high
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q67_decayed_confidence": """
        SELECT user_id, item_id,
               floor(SUM(POWER(0.5,
                   (epoch(TIMESTAMP '2025-07-01 00:00:00') - epoch(ts))
                   / 86400.0 / 30.0)) * 1000.0) / 1000.0 AS confidence
        FROM (
            SELECT user_id, ts,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id
            FROM events
        )
        WHERE item_id IS NOT NULL
        GROUP BY user_id, item_id
        ORDER BY confidence DESC, user_id ASC, item_id ASC
        LIMIT 100
    """,
    "q66_near_dup_removal": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL
            SELECT id_b AS u, id_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        ),
        comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
        losers AS (SELECT node FROM comp WHERE comp < node)
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN losers.node IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               COUNT(*) - CAST(SUM(CASE WHEN losers.node IS NOT NULL THEN 1 ELSE 0 END)
                               AS BIGINT) AS n_kept
        FROM documents
        LEFT JOIN losers ON doc_id = losers.node
        GROUP BY lang
        ORDER BY lang
    """,
    "q65_grouping_sets_events": """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(hr AS VARCHAR), 'ALL') AS hr,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM (SELECT event_type, hour(ts) AS hr, value FROM events)
        GROUP BY GROUPING SETS ((event_type), (hr), ())
        ORDER BY event_type, hr
    """,
    "q64_token_budget_by_lang": f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(ws) AS BIGINT) AS ws_tokens,
               CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
               CASE WHEN SUM(ws) > 0 THEN
                   floor(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE)
                         * 10000.0) / 10000.0
               END AS fertility
        FROM (
            SELECT lang,
                   {_TOKEN_COUNT} AS ws,
                   len(regexp_extract_all(text,
                       '''(?:[sdmt]|ll|ve|re)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^ \\t\\n\\f\\r\\p{{L}}\\p{{N}}]+|[ \\t\\n\\f\\r]+'
                   )) AS bpe
            FROM documents
        )
        GROUP BY lang
        ORDER BY lang
    """,
    "q63_dormant_high_balance": """
        SELECT n_name,
               COUNT(*) AS n_custs,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01'
          )
        GROUP BY n_name
        ORDER BY n_name
    """,
    # -- round-2 curation suite -------------------------------------------
    "q69_incident_window_join": """
        WITH win AS (
            SELECT event_id AS window_id,
                   ts AS w_start,
                   ts + INTERVAL 1 HOUR AS w_end
            FROM events
            WHERE event_type = 'error'
            ORDER BY value DESC, event_id ASC
            LIMIT 20
        )
        SELECT w.window_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users,
               CAST(SUM(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               floor(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
                     * 100.0) / 100.0 AS sum_value
        FROM events e
        JOIN win w
          ON e.ts >= w.w_start AND e.ts < w.w_end
         AND e.event_id <> w.window_id
        GROUP BY w.window_id
        ORDER BY w.window_id
    """,
    "q70_repetition_quality": f"""
        WITH toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id,
                         unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        counts AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   COUNT(DISTINCT tok) AS n_distinct
            FROM toks GROUP BY doc_id
        ),
        bigrams AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(t) - 1, 0) + 1),
                       i -> t[i] || ' ' || t[i+1])) AS sh
            FROM (SELECT doc_id, string_split({_NORMALIZED_TEXT}, ' ') AS t
                  FROM documents)
        ),
        per_bigram AS (
            SELECT doc_id, sh, COUNT(*) AS c FROM bigrams GROUP BY doc_id, sh
        ),
        top AS (
            SELECT doc_id, sh AS top_bigram, c AS top_c
            FROM (SELECT doc_id, sh, c,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY c DESC, sh ASC) AS rn
                  FROM per_bigram)
            WHERE rn = 1
        )
        SELECT counts.doc_id,
               n_tokens,
               floor(CAST(n_distinct AS DOUBLE) / n_tokens * 10000.0)
                   / 10000.0 AS distinct_ratio,
               top_bigram,
               floor(CASE WHEN n_tokens >= 2
                          THEN least(1.0, top_c * 2.0 / n_tokens)
                          ELSE 0.0 END * 10000.0) / 10000.0 AS top_bigram_frac,
               (CASE WHEN n_tokens >= 2
                     THEN least(1.0, top_c * 2.0 / n_tokens)
                     ELSE 0.0 END > 0.20
                OR CAST(n_distinct AS DOUBLE) / n_tokens < 0.30) AS repetitive
        FROM counts LEFT JOIN top ON counts.doc_id = top.doc_id
        ORDER BY counts.doc_id
    """,
    "q71_decontamination": f"""
        WITH sets AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(t) - 4, 0) + 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                || ' ' || t[i+3] || ' ' || t[i+4])) AS s
                FROM (SELECT doc_id, string_split({_NORMALIZED_TEXT}, ' ') AS t
                      FROM documents)
            )
        ),
        corpus AS (SELECT doc_id, s FROM sets WHERE doc_id % 20 <> 0),
        bench AS (SELECT doc_id AS bench_id, s FROM sets WHERE doc_id % 20 = 0)
        SELECT c.doc_id,
               COUNT(DISTINCT c.s) AS n_overlap,
               COUNT(DISTINCT b.bench_id) AS n_bench_docs
        FROM corpus c JOIN bench b ON c.s = b.s
        GROUP BY c.doc_id
        HAVING COUNT(DISTINCT c.s) >= 1
        ORDER BY c.doc_id
    """,
    "q72_stratified_sample": f"""
        SELECT lang,
               COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM documents
        WHERE {_MD5B("CAST(doc_id AS VARCHAR) || ':r2'")} % 10000
              < CASE lang WHEN 'en' THEN 5000
                          WHEN 'zh' THEN 2500
                          WHEN 'de' THEN 1000
                          ELSE 500 END
        GROUP BY lang
        ORDER BY lang
    """,
    "q73_keyword_tfidf": f"""
        WITH toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id,
                         unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df
                  FROM toks GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT doc_id, tok,
                   floor(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000000.0)
                       / 1000000.0 AS s6
            FROM tf JOIN dfreq USING (tok) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, tok, s6,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY s6 DESC, tok ASC) AS rnk
            FROM scored
        )
        SELECT doc_id, rnk AS "rank", tok AS token,
               floor(s6 * 10000.0) / 10000.0 AS tfidf
        FROM ranked WHERE rnk <= 3
        ORDER BY doc_id, rnk
    """,
    # winnowing: (hash,pos) packed into one BIGINT so the frame MIN is
    # the lexicographic minimum; frame/count/shift mirror the Spark op
    "q74_winnow_fingerprint_pairs": f"""
        WITH base AS (
            SELECT doc_id, string_split({_NORMALIZED_TEXT}, ' ') AS t
            FROM documents
        ),
        idx AS (
            SELECT doc_id, t,
                   unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
            FROM base
        ),
        sh AS (
            SELECT doc_id, i - 1 AS pos,
                   ({_hash60("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")}
                       % {_MINHASH_P}) * 1048576 + (i - 1) AS combo
            FROM idx
        ),
        win AS (
            SELECT doc_id,
                   min(combo) OVER w AS sel,
                   count(*) OVER w AS n_in
            FROM sh
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
        ),
        fps AS (
            SELECT DISTINCT doc_id, sel >> 20 AS fp
            FROM win WHERE n_in = 4
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
        ORDER BY id_a, id_b
    """,
    # SRP-LSH: fixed-point projections keep the sign computation in
    # exact int64 arithmetic on both engines (see similarity.py)
    # q177: semantic decontamination — synthesized benchmark (every
    # 41st vector, first component +0.002, id remapped), the q75 SRP
    # chain (planes=6) on BOTH sides, Hamming-1 probe expansion on the
    # benchmark side, exact 6-dp cosine >= 0.999, argmax per corpus id
    "q177_semantic_decontamination": f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        bvecs AS (
            SELECT vec_id + 1000000000 AS bench_id,
                   list_prepend(v[1] + 0.002, v[2:]) AS v
            FROM vecs WHERE vec_id % 41 = 1
        ),
        planes AS (SELECT unnest(range(0, 6)) AS p),
        celx AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i
                  FROM vecs)
        ),
        cbucket AS (
            SELECT vec_id,
                   SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS bucket
            FROM (
                SELECT vec_id, p,
                       SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                                THEN 1 ELSE -1 END) AS proj
                FROM celx CROSS JOIN planes GROUP BY 1, 2
            ) GROUP BY 1
        ),
        belx AS (
            SELECT bench_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM (SELECT bench_id, v, unnest(range(1, len(v) + 1)) AS i
                  FROM bvecs)
        ),
        bbucket AS (
            SELECT bench_id,
                   SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS bucket
            FROM (
                SELECT bench_id, p,
                       SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                                THEN 1 ELSE -1 END) AS proj
                FROM belx CROSS JOIN planes GROUP BY 1, 2
            ) GROUP BY 1
        ),
        bprobe AS (
            SELECT bench_id, bucket FROM bbucket
            UNION ALL
            SELECT bench_id, xor(bucket, (CAST(1 AS BIGINT) << p)) AS bucket
            FROM bbucket CROSS JOIN planes
        ),
        cand AS (
            SELECT c.vec_id, b.bench_id,
                   ROUND(list_cosine_similarity(cv.v, bv.v), 6) AS sim
            FROM cbucket c
            JOIN bprobe b ON c.bucket = b.bucket
            JOIN vecs cv ON cv.vec_id = c.vec_id
            JOIN bvecs bv ON bv.bench_id = b.bench_id
        )
        SELECT vec_id, bench_id, sim FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY sim DESC, bench_id ASC) AS rn
            FROM cand WHERE sim >= 0.999
        ) WHERE rn = 1
        ORDER BY vec_id
    """,
    "q75_srp_lsh_ann": f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        el AS (
            SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM vecs
        ),
        elx AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM el
        ),
        planes AS (SELECT unnest(range(0, 6)) AS p),
        proj AS (
            SELECT vec_id, p,
                   SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                            THEN 1 ELSE -1 END) AS proj
            FROM elx CROSS JOIN planes
            GROUP BY 1, 2
        ),
        bucket AS (
            SELECT vec_id,
                   SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS bucket
            FROM proj GROUP BY 1
        ),
        cand AS (
            SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(pv.v, cv.v), 6) AS sim
            FROM bucket p
            JOIN bucket c ON p.bucket = c.bucket AND c.vec_id <> p.vec_id
            JOIN vecs pv ON pv.vec_id = p.vec_id
            JOIN vecs cv ON cv.vec_id = c.vec_id
            WHERE p.vec_id < 8
        )
        SELECT query_id, neighbor_id, sim, rnk FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id ASC) AS rnk
            FROM cand
        ) WHERE rnk <= 3
        ORDER BY query_id, rnk
    """,
    # the salted two-phase rewrite is row-identical to the naive form
    "q76_salted_distinct_users": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # q150: Bloom twin — identical md5-60 bit positions
    # ('bloom:j:key' % 65536), identical all-k-bits-set verdicts;
    # no-false-negatives pinned TRUE, fp bound is integer arithmetic
    "q150_bloom_membership": f"""
        WITH js AS (SELECT unnest(range(0, 4)) AS j),
        bits AS (
            SELECT DISTINCT
                {_hash60("'bloom:' || j || ':' || CAST(o_custkey AS VARCHAR)")}
                    % 65536 AS bit
            FROM orders CROSS JOIN js
        ),
        pb AS (
            SELECT c_custkey, j,
                {_hash60("'bloom:' || j || ':' || CAST(c_custkey AS VARCHAR)")}
                    % 65536 AS bit
            FROM customer CROSS JOIN js
        ),
        hits AS (
            SELECT c_custkey, COUNT(*) AS h
            FROM pb JOIN bits USING (bit) GROUP BY 1
        ),
        t AS (SELECT DISTINCT o_custkey FROM orders),
        flags AS (
            SELECT c.c_custkey,
                   COALESCE(h.h, 0) = 4 AS maybe,
                   t.o_custkey IS NOT NULL AS has
            FROM customer c
            LEFT JOIN hits h ON h.c_custkey = c.c_custkey
            LEFT JOIN t ON t.o_custkey = c.c_custkey
        ),
        agg AS (
            SELECT COUNT(*) AS n_customers,
                   COUNT(*) FILTER (WHERE has) AS n_with_orders,
                   COUNT(*) FILTER (WHERE maybe) AS n_flagged,
                   COUNT(*) FILTER (WHERE has AND NOT maybe)
                       AS n_false_neg,
                   COUNT(*) FILTER (WHERE NOT has AND maybe)
                       AS n_false_pos
            FROM flags
        )
        SELECT n_customers, n_with_orders, n_flagged, n_false_neg,
               n_false_pos,
               TRUE AS no_false_neg,
               n_false_pos <= greatest(
                   16, (n_customers - n_with_orders) // 100) AS fp_ok
        FROM agg
    """,
    # q149: prefix-filter twin — the oracle is the NAIVE all-pairs
    # shingle join with the same integer threshold (i·(n+d) ≥
    # n·(la+lb)); identical results prove the prefix filter lossless
    "q149_prefix_filter_pairs": f"""
        WITH sets AS ({_SHINGLE_SETS}),
        sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
            FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, CAST(c AS BIGINT) AS n_shared,
               CAST(na.n + nb.n - c AS BIGINT) AS n_union,
               ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
        FROM inter
        JOIN sizes na ON id_a = na.doc_id
        JOIN sizes nb ON id_b = nb.doc_id
        WHERE c * 3 >= (na.n + nb.n)
        ORDER BY id_a, id_b
    """,
    # q148: weighted-median twin — integer cum·2 ≥ tot threshold on
    # long weights (l_quantity is integral; DuckDB double→BIGINT cast
    # rounds, Spark truncates — equal on integral values), the price
    # is ordered/MIN'd only so doubles pass through bit-identical
    "q148_weighted_median_price": """
        WITH vg AS (
            SELECT p_brand, l_extendedprice AS v,
                   SUM(CAST(l_quantity AS BIGINT)) AS w
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1, 2
        ),
        c AS (
            SELECT p_brand, v,
                   SUM(w) OVER (PARTITION BY p_brand ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                   SUM(w) OVER (PARTITION BY p_brand) AS tot
            FROM vg
        )
        SELECT p_brand,
               MIN(CASE WHEN cum * 2 >= tot THEN v END) AS median_price,
               CAST(MAX(tot) AS BIGINT) AS total_qty
        FROM c GROUP BY 1 ORDER BY 1
    """,
    # q147: RRF twin — replays the q143 BM25 ranking and the q22
    # quality ranking, then fuses with exact integer 1e9//(60+rank)
    # contributions (no floating point in the fusion at all)
    "q147_hybrid_rrf": f"""
        WITH toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id,
                         unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
               WHERE tok IN ('dup', 'key', 'vector') GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        tot AS (SELECT SUM(dl) AS s, COUNT(*) AS n FROM dl),
        scored AS (
            SELECT tf.doc_id,
                   CAST(floor(
                       ln(1.0 + (n - df + 0.5) / (df + 0.5))
                       * CAST(22 * tf * s AS DOUBLE)
                       / CAST(10 * tf * s + 3 * s + 9 * dl * n AS DOUBLE)
                       * 1000000.0) AS BIGINT) AS s_int
            FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (tok)
            CROSS JOIN tot
        ),
        bm25 AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY s_total DESC, doc_id) AS r
            FROM (SELECT doc_id, SUM(s_int) AS s_total
                  FROM scored GROUP BY 1)
            ORDER BY s_total DESC, doc_id LIMIT 50
        ),
        qscore AS (
            SELECT doc_id,
                   floor((CAST(0.4 AS DOUBLE) * len_score
                          + CAST(0.3 AS DOUBLE) * punct_score
                          + CAST(0.3 AS DOUBLE) * sw_score) * 10000.0)
                       / 10000.0 AS quality
            FROM (
                SELECT doc_id,
                       CASE WHEN n_tokens >= 50 THEN CAST(1.0 AS DOUBLE)
                            ELSE n_tokens / CAST(50.0 AS DOUBLE)
                       END AS len_score,
                       greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                           CAST(1.0 AS DOUBLE) - punct_ratio * 4)) AS punct_score,
                       greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                           sw_ratio * 5)) AS sw_score
                FROM (
                    SELECT doc_id,
                           {_TOKEN_COUNT} AS n_tokens,
                           CASE WHEN len(text) > 0 THEN
                               (len(text) - len(regexp_replace(text,
                                   '[^A-Za-z0-9 ]', '', 'g')))
                               * 1.0 / len(text)
                           ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
                           CASE WHEN {_TOKEN_COUNT} > 0 THEN
                               len(list_filter({_RAW_TOKENS_LOWER},
                                   t -> list_contains({_STOPWORD_LISTS["en"]}, t)))
                               * 1.0 / ({_TOKEN_COUNT})
                           ELSE CAST(0.0 AS DOUBLE) END AS sw_ratio
                    FROM documents
                )
            )
        ),
        qual AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY quality DESC, doc_id) AS r
            FROM qscore
            ORDER BY quality DESC, doc_id LIMIT 50
        ),
        contrib AS (
            SELECT doc_id, r FROM bm25
            UNION ALL
            SELECT doc_id, r FROM qual
        ),
        fused AS (
            SELECT doc_id,
                   CAST(SUM(1000000000 // (60 + r)) AS BIGINT) AS rrf_micro
            FROM contrib GROUP BY 1
        ),
        top AS (
            SELECT doc_id, rrf_micro FROM fused
            ORDER BY rrf_micro DESC, doc_id LIMIT 10
        )
        SELECT t.doc_id,
               row_number() OVER (ORDER BY t.rrf_micro DESC, t.doc_id)
                   AS fused_rank,
               t.rrf_micro,
               b.r AS bm25_rank,
               q.r AS quality_rank
        FROM top t
        LEFT JOIN bm25 b USING (doc_id)
        LEFT JOIN qual q USING (doc_id)
        ORDER BY fused_rank
    """,
    # q146: centroid-drift twin — identical floor(v·1e6) int64
    # component sums, hugeint dot/norm products (Spark decimal(38,0)),
    # doubles only at the final sqrt/divide, floored at 6 decimals
    "q146_embedding_drift": """
        WITH e AS (
            SELECT vec_id, label,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        idx AS (
            SELECT vec_id, label, v,
                   unnest(range(1, len(v) + 1)) AS i
            FROM e
        ),
        q AS (
            SELECT label, vec_id % 2 = 0 AS is_ref, i AS dim,
                   CAST(floor(v[i] * 1000000.0) AS BIGINT) AS q
            FROM idx
        ),
        s AS (
            SELECT label, dim,
                   SUM(CASE WHEN is_ref THEN q ELSE 0 END) AS sr,
                   SUM(CASE WHEN NOT is_ref THEN q ELSE 0 END) AS sc
            FROM q GROUP BY 1, 2
        ),
        st AS (
            SELECT label,
                   SUM(CAST(sr AS HUGEINT) * CAST(sc AS HUGEINT)) AS dot,
                   SUM(CAST(sr AS HUGEINT) * CAST(sr AS HUGEINT)) AS na,
                   SUM(CAST(sc AS HUGEINT) * CAST(sc AS HUGEINT)) AS nb
            FROM s GROUP BY 1
        ),
        cnt AS (
            SELECT label,
                   COUNT(*) FILTER (WHERE vec_id % 2 = 0) AS n_ref,
                   COUNT(*) FILTER (WHERE vec_id % 2 <> 0) AS n_cur
            FROM embeddings GROUP BY 1
        )
        SELECT st.label, n_ref, n_cur,
               CASE WHEN na > 0 AND nb > 0 THEN
                 floor(CAST(dot AS DOUBLE)
                       / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
                       * 1000000.0) / 1000000.0
               END AS centroid_cos,
               CASE WHEN na > 0 AND n_cur > 0 THEN
                 floor((sqrt(CAST(nb AS DOUBLE)) * n_ref)
                       / (sqrt(CAST(na AS DOUBLE)) * n_cur)
                       * 1000000.0) / 1000000.0
               END AS mean_norm_ratio
        FROM st JOIN cnt USING (label)
        ORDER BY st.label
    """,
    # q145: edit-distance twin — the oracle takes the NAIVE all-pairs
    # join (correct by definition); Spark's length-band blocking is
    # lossless so the sets must be identical
    "q145_name_typo_pairs": """
        WITH names AS (
            SELECT p_name, COUNT(*) AS n FROM part
            WHERE p_name IS NOT NULL GROUP BY 1
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               levenshtein(a.p_name, b.p_name) AS dist,
               a.n AS n_a, b.n AS n_b
        FROM names a JOIN names b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2
        ORDER BY name_a, name_b
    """,
    # q144: KMV twin — identical md5-60 hashes ('kmv:user'), identical
    # k-min sets (a global rank equals the two-phase sharded k-min),
    # identical (k−1)·2^60/h_k estimate doubles; gate pinned TRUE
    "q144_kmv_audience_overlap": f"""
        WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        dh AS (
            SELECT DISTINCT event_type,
                   {_hash60("'kmv:' || CAST(user_id AS VARCHAR)")} AS h
            FROM du
        ),
        sk AS (
            SELECT event_type, h FROM (
                SELECT event_type, h,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h) AS r
                FROM dh)
            WHERE r <= 64
        ),
        exact AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS exact_inter
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        ),
        u AS (
            SELECT e.type_a, e.type_b, s.h
            FROM exact e JOIN sk s ON s.event_type = e.type_a
            UNION
            SELECT e.type_a, e.type_b, s.h
            FROM exact e JOIN sk s ON s.event_type = e.type_b
        ),
        uk AS (
            SELECT type_a, type_b, h FROM (
                SELECT type_a, type_b, h,
                       row_number() OVER (PARTITION BY type_a, type_b
                                          ORDER BY h) AS r
                FROM u)
            WHERE r <= 64
        ),
        agg AS (
            SELECT uk.type_a, uk.type_b,
                   COUNT(*) AS n_u, MAX(uk.h) AS h_k,
                   SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                            THEN 1 ELSE 0 END) AS n_both
            FROM uk
            LEFT JOIN sk sa
              ON sa.event_type = uk.type_a AND sa.h = uk.h
            LEFT JOIN sk sb
              ON sb.event_type = uk.type_b AND sb.h = uk.h
            GROUP BY 1, 2
        ),
        est AS (
            SELECT type_a, type_b, n_u,
                   CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
                        ELSE 72634054790231359488.0 / CAST(h_k AS DOUBLE)
                   END AS u_est,
                   CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE) AS jacc
            FROM agg
        )
        SELECT e.type_a, e.type_b,
               floor(u_est * 10000.0) / 10000.0 AS est_union,
               floor(jacc * 10000.0) / 10000.0 AS est_jaccard,
               floor(jacc * u_est * 10000.0) / 10000.0 AS est_inter,
               x.exact_inter,
               TRUE AS gate_ok
        FROM est e JOIN exact x
          ON x.type_a = e.type_a AND x.type_b = e.type_b
        ORDER BY e.type_a, e.type_b
    """,
    # q143: BM25 twin — identical tokenize, the exact-rational int64
    # denominator (22·tf·S / (10·tf·S + 3·S + 9·dl·N) for k1=1.2,
    # b=0.75, avgdl=S/N), one ln() then floor to int64 micro-units,
    # integer sum per doc (double sums are order-dependent)
    "q143_bm25_search": f"""
        WITH toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id,
                         unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
               WHERE tok IN ('dup', 'key', 'vector') GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        tot AS (SELECT SUM(dl) AS s, COUNT(*) AS n FROM dl),
        scored AS (
            SELECT tf.doc_id,
                   CAST(floor(
                       ln(1.0 + (n - df + 0.5) / (df + 0.5))
                       * CAST(22 * tf * s AS DOUBLE)
                       / CAST(10 * tf * s + 3 * s + 9 * dl * n AS DOUBLE)
                       * 1000000.0) AS BIGINT) AS s_int
            FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (tok)
            CROSS JOIN tot
        ),
        agg AS (
            SELECT doc_id, SUM(s_int) AS s_total,
                   COUNT(*) AS n_terms_hit
            FROM scored GROUP BY 1
        ),
        top AS (
            SELECT doc_id, s_total, n_terms_hit FROM agg
            ORDER BY s_total DESC, doc_id LIMIT 10
        )
        SELECT doc_id,
               row_number() OVER (ORDER BY s_total DESC, doc_id)
                   AS "rank",
               s_total / 1000000.0 AS score,
               n_terms_hit
        FROM top ORDER BY doc_id
    """,
    # q142: CMS twin — identical md5-60 row hashes ('cms:j:value' %
    # width), identical min-over-rows estimate; the gate flags are
    # LITERAL TRUE (self-gate: a Spark-side sketch deviation beyond
    # the ε-bound flips its computed flag and the hash fails)
    "q142_cms_heavy_hitters": f"""
        WITH exact AS (
            SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
        ),
        top AS (
            SELECT * FROM exact ORDER BY exact_n DESC, user_id LIMIT 10
        ),
        rows_j AS (SELECT unnest(range(0, 4)) AS j),
        counters AS (
            SELECT j,
                   {_hash60("'cms:' || j || ':' || CAST(user_id AS VARCHAR)")}
                       % 1024 AS bucket,
                   COUNT(*) AS cnt
            FROM events CROSS JOIN rows_j
            GROUP BY 1, 2
        ),
        est AS (
            SELECT t.user_id, t.exact_n,
                   MIN(COALESCE(c.cnt, 0)) AS est_n
            FROM top t CROSS JOIN rows_j x
            LEFT JOIN counters c
              ON c.j = x.j
             AND c.bucket =
                 {_hash60("'cms:' || x.j || ':' || CAST(t.user_id AS VARCHAR)")}
                     % 1024
            GROUP BY 1, 2
        )
        SELECT user_id, exact_n, est_n,
               TRUE AS over_ok, TRUE AS bound_ok
        FROM est ORDER BY user_id
    """,
    # q141: PSI twin — identical integer epoch-µs midpoint split,
    # integer edge ranks ((i·n+9)//10 — float q·n skips ranks), same
    # Laplace smoothing; psi_total sums floor-scaled integer
    # micro-units so the ln() doubles never accumulate cross-engine
    "q141_drift_psi": """
        WITH rng AS (
            SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
            FROM events
        ),
        ref AS (
            SELECT value, event_id FROM events, rng
            WHERE epoch_us(ts) < mid AND value IS NOT NULL
        ),
        cur AS (
            SELECT value FROM events, rng
            WHERE epoch_us(ts) >= mid AND value IS NOT NULL
        ),
        ranked AS (
            SELECT value,
                   row_number() OVER (ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM ref
        ),
        edges AS (
            SELECT list(e ORDER BY e) AS l FROM (
                SELECT i,
                       MIN(CASE WHEN rn = (i * n + 9) // 10
                           THEN value END) AS e
                FROM ranked
                CROSS JOIN (SELECT unnest(range(1, 10)) AS i)
                GROUP BY i
            )
        ),
        binned AS (
            SELECT len(list_filter(l, x -> x < value)) AS bin,
                   'ref' AS p
            FROM ref, edges
            UNION ALL
            SELECT len(list_filter(l, x -> x < value)), 'cur'
            FROM cur, edges
        ),
        counts AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN p = 'ref' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN p = 'cur' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_cur
            FROM binned GROUP BY 1
        ),
        tot AS (
            SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM counts
        ),
        terms AS (
            SELECT bin, n_ref, n_cur,
                   (n_ref + 1) / CAST(tr + 10 AS DOUBLE) AS rs,
                   (n_cur + 1) / CAST(tc + 10 AS DOUBLE) AS cs
            FROM counts CROSS JOIN tot
        ),
        m AS (
            SELECT *,
                   CAST(floor((cs - rs) * ln(cs / rs) * 1000000.0)
                        AS BIGINT) AS micro
            FROM terms
        )
        SELECT bin, n_ref, n_cur,
               floor(rs * 1000000.0) / 1000000.0 AS ref_share,
               floor(cs * 1000000.0) / 1000000.0 AS cur_share,
               floor((cs - rs) * ln(cs / rs) * 1000000.0) / 1000000.0
                   AS psi_term,
               CAST(SUM(micro) OVER () AS DOUBLE) / 1000000.0
                   AS psi_total
        FROM m
        ORDER BY bin
    """,
    # q140: graded ranking-eval twin — identical integer-surrogate DCG
    # weights (round(1e9/log2(r+1)), embedded as literals both sides),
    # exact int64 DCG/IDCG sums, doubles only in the final ratios
    "q140_ranking_ndcg": """
        WITH W AS (
            SELECT * FROM (VALUES
                (1, 1000000000), (2, 630929754), (3, 500000000),
                (4, 430676558), (5, 386852807), (6, 356207187),
                (7, 333333333), (8, 315464877), (9, 301029996),
                (10, 289064826)) AS t(rnk, wt)
        ),
        pop AS (
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item,
                   COUNT(*) AS n
            FROM events
            WHERE event_type = 'purchase'
              AND json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY 1
        ),
        cand AS (
            SELECT item, rnk FROM (
                SELECT item,
                       row_number() OVER (ORDER BY n DESC, item ASC)
                           AS rnk
                FROM pop
            ) WHERE rnk <= 10
        ),
        rel AS (
            SELECT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                       AS item,
                   COUNT(*) AS rel
            FROM events
            WHERE event_type = 'click' AND user_id < 30
              AND json_extract_string(props, '$.k') IS NOT NULL
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT u.user_id, c.item, c.rnk,
                   COALESCE(r.rel, 0) AS g
            FROM (SELECT DISTINCT user_id FROM rel) u
            CROSS JOIN cand c
            LEFT JOIN rel r
              ON r.user_id = u.user_id AND r.item = c.item
        ),
        agg AS (
            SELECT g.user_id,
                   SUM(g.g * w.wt) AS dcg,
                   CAST(SUM(CASE WHEN g.g > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS hits,
                   MIN(CASE WHEN g.g > 0 THEN g.rnk END) AS fh,
                   list(g.g ORDER BY g.g DESC) AS gains
            FROM grid g JOIN W w ON w.rnk = g.rnk
            GROUP BY 1
        ),
        ideal AS (
            SELECT a.user_id,
                   SUM(a.gains[w.rnk] * w.wt) AS idcg
            FROM agg a CROSS JOIN W w
            GROUP BY 1
        )
        SELECT a.user_id,
               CASE WHEN i.idcg > 0
                    THEN floor(CAST(a.dcg AS DOUBLE)
                               / CAST(i.idcg AS DOUBLE) * 1000000)
                         / 1000000
                    ELSE 0.0 END AS ndcg,
               CASE WHEN a.fh IS NOT NULL
                    THEN floor(1.0 / a.fh * 1000000) / 1000000
                    ELSE 0.0 END AS mrr,
               a.hits
        FROM agg a JOIN ideal i USING (user_id)
        ORDER BY a.user_id
    """,
    # q138: hard-negative twin — the q75 SRP bucket CTE (planes=6)
    # with the label-mismatch predicate before the rank window (self
    # is excluded by its own label; no separate id filter, mirroring
    # the Spark side)
    "q138_hard_negative_mining": f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
            FROM embeddings
        ),
        el AS (
            SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM vecs
        ),
        elx AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM el
        ),
        planes AS (SELECT unnest(range(0, 6)) AS p),
        proj AS (
            SELECT vec_id, p,
                   SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                            THEN 1 ELSE -1 END) AS proj
            FROM elx CROSS JOIN planes
            GROUP BY 1, 2
        ),
        bucket AS (
            SELECT vec_id,
                   SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS bucket
            FROM proj GROUP BY 1
        ),
        cand AS (
            SELECT p.vec_id AS anchor_id, pv.label AS anchor_label,
                   c.vec_id AS negative_id, cv.label AS negative_label,
                   ROUND(list_cosine_similarity(pv.v, cv.v), 6) AS sim
            FROM bucket p
            JOIN bucket c ON p.bucket = c.bucket
            JOIN vecs pv ON pv.vec_id = p.vec_id
            JOIN vecs cv ON cv.vec_id = c.vec_id
            WHERE p.vec_id < 8 AND cv.label <> pv.label
        )
        SELECT anchor_id, anchor_label, negative_id, negative_label,
               sim, rnk
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY anchor_id
                       ORDER BY sim DESC, negative_id ASC) AS rnk
            FROM cand
        ) WHERE rnk <= 3
        ORDER BY anchor_id, rnk
    """,
    # q133: gaps-and-islands twin — the first-row OR state-change flag
    # mirrors operators/scd.collapse_runs (lag-of-constant first-row
    # detection + null-safe state compare); half-open intervals via
    # lead(valid_from)
    "q133_status_intervals": """
        WITH e AS (
            SELECT user_id, event_type, ts, event_id
            FROM events WHERE user_id < 40
        ),
        l AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR lag(event_type) OVER w
                                IS DISTINCT FROM event_type
                        THEN 1 ELSE 0 END AS chg
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        r AS (
            SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                           AS BIGINT) AS version
            FROM l
        ),
        i AS (
            SELECT user_id, version,
                   any_value(event_type) AS state,
                   MIN(ts) AS vf,
                   COUNT(*) AS n_obs
            FROM r GROUP BY 1, 2
        )
        SELECT user_id, version, state,
               strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(lead(vf) OVER wv,
                        '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               n_obs,
               (lead(vf) OVER wv IS NULL) AS is_current
        FROM i
        WINDOW wv AS (PARTITION BY user_id ORDER BY version)
        ORDER BY user_id, version
    """,
    # q134: TWAP twin — identical integer-µs durations and
    # decimal(18,6)·µs exact accumulation; only the final ratio is a
    # double (stable_round floor semantics)
    "q134_time_weighted_value": """
        WITH e AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   ts, event_id, value
            FROM events
        ),
        d AS (
            SELECT event_type, day,
                   epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur,
                   CAST(value AS DECIMAL(18,6)) AS v
            FROM e
            WINDOW w AS (PARTITION BY event_type, day
                         ORDER BY ts, event_id)
        )
        SELECT event_type, day,
               COUNT(*) AS n_intervals,
               floor(CAST(SUM(v * dur) AS DOUBLE)
                     / CAST(SUM(dur) AS DOUBLE) * 1000000) / 1000000
                   AS twav
        FROM d WHERE dur IS NOT NULL
        GROUP BY 1, 2
        ORDER BY event_type, day
    """,
    # q135: cluster-balanced sample twin — the q75 SRP bucket CTE at
    # planes=5, then a per-bucket md5-uniform row_number cap
    "q135_semantic_balanced_sample": f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        el AS (
            SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM vecs
        ),
        elx AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM el
        ),
        planes AS (SELECT unnest(range(0, 5)) AS p),
        proj AS (
            SELECT vec_id, p,
                   SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                            THEN 1 ELSE -1 END) AS proj
            FROM elx CROSS JOIN planes
            GROUP BY 1, 2
        ),
        bucket AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN proj >= 0
                                 THEN (CAST(1 AS BIGINT) << p)
                            ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY 1
        )
        SELECT vec_id, bucket, smp_rank FROM (
            SELECT vec_id, bucket,
                   row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY {_hash60("'smp:' || vec_id")}, vec_id
                   ) AS smp_rank
            FROM bucket
        ) WHERE smp_rank <= 8
        ORDER BY bucket, smp_rank
    """,
    # q136: last-touch attribution twin — latest strictly-prior touch
    # within 3 days; tie at equal ts broken by highest event_id
    # (operators/asof.py frame order: ts asc, event_id asc, last wins)
    "q136_purchase_attribution": """
        SELECT COALESCE(attr, 'unattributed') AS channel,
               COUNT(*) AS n_purchases,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                   AS total_value
        FROM (
            SELECT p.value, (
                SELECT c.event_type FROM events c
                WHERE c.user_id = p.user_id
                  AND c.event_type IN ('click', 'view')
                  AND c.ts < p.ts
                  AND c.ts >= p.ts - INTERVAL 3 DAY
                ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
            ) AS attr
            FROM events p WHERE p.event_type = 'purchase'
        )
        GROUP BY 1
        ORDER BY channel
    """,
    # q137: expectation-suite twin — one aggregate CTE, one metric per
    # check, unioned to labeled rows (operators/expectations.py)
    "q137_expectation_audit": """
        WITH m AS (
            SELECT COUNT(*) AS m0,
                   SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS m1,
                   COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS m2,
                   SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS m3,
                   SUM(CASE WHEN o_orderstatus IS NOT NULL
                                 AND o_orderstatus NOT IN ('F','O','P')
                            THEN 1 ELSE 0 END) AS m4,
                   SUM(CASE WHEN o_totalprice < 0.0
                                 OR o_totalprice > 1000000.0
                            THEN 1 ELSE 0 END) AS m5,
                   SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS m6
            FROM orders
        ),
        rows_out AS (
                      SELECT 'min_rows' AS check_kind, '*' AS column_name,
                             CAST(m0 AS BIGINT) AS metric,
                             m0 >= 1000 AS passed FROM m
            UNION ALL SELECT 'not_null', 'o_orderkey',
                             CAST(m1 AS BIGINT), m1 = 0 FROM m
            UNION ALL SELECT 'unique', 'o_orderkey',
                             CAST(m2 AS BIGINT), m2 = 0 FROM m
            UNION ALL SELECT 'not_null', 'o_custkey',
                             CAST(m3 AS BIGINT), m3 = 0 FROM m
            UNION ALL SELECT 'accepted', 'o_orderstatus',
                             CAST(m4 AS BIGINT), m4 = 0 FROM m
            UNION ALL SELECT 'range', 'o_totalprice',
                             CAST(m5 AS BIGINT), m5 = 0 FROM m
            UNION ALL SELECT 'not_null', 'o_orderdate',
                             CAST(m6 AS BIGINT), m6 = 0 FROM m
        )
        SELECT * FROM rows_out ORDER BY check_kind, column_name
    """,
    # q132: gap-debounce twin — INTEGER µs gap arithmetic (epoch
    # seconds in doubles resolve only ~0.24 µs at epoch magnitude, so
    # a gap exactly equal to the cooldown could flip with the date);
    # kept = gap NULL or >= 600s in whole µs
    "q132_event_debounce": """
        WITH g AS (
            SELECT user_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR (epoch_us(ts) - epoch_us(lag(ts) OVER w))
                                >= 600000000
                        THEN 1 ELSE 0 END AS kept
            FROM events
            WINDOW w AS (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id)
        )
        SELECT user_id, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_dropped
        FROM g GROUP BY 1, 2
        ORDER BY user_id, event_type
    """,
    # q131: DSIR selection twin — identical md5-60 bigram buckets,
    # identical integer arithmetic (DuckDB // on positive BIGINTs ==
    # JVM `div` truncation), so weights are bit-exact. Same bigram CTE
    # discipline as q77 (normalized text has no interior/edge empties).
    "q131_dsir_selection": f"""
        WITH toks AS (
            SELECT doc_id, lang, t, unnest(range(1, len(t) + 1)) AS i
            FROM (SELECT doc_id, lang,
                         string_split({_NORMALIZED_TEXT}, ' ') AS t
                  FROM documents)
        ),
        grams AS (
            SELECT doc_id, lang,
                   {_hash60("'dsir:' || t[i] || ' ' || t[i+1]")} % 512 AS b
            FROM toks WHERE i < len(t) AND t[i] <> ''
        ),
        counts AS (
            SELECT b, COUNT(*) AS r,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t
            FROM grams GROUP BY 1
        ),
        scores AS (
            SELECT b, ((t + 1) * 1000000) // (r + 1) AS score FROM counts
        ),
        docw AS (
            SELECT g.doc_id, g.lang,
                   COUNT(*) AS n_bigrams,
                   SUM(s.score) AS w
            FROM grams g JOIN scores s USING (b)
            GROUP BY g.doc_id, g.lang
        )
        SELECT doc_id, lang, n_bigrams,
               CAST(w // n_bigrams AS BIGINT) AS weight_pt
        FROM docw
        ORDER BY weight_pt DESC, doc_id ASC
        LIMIT 50
    """,
    "q77_corpus_bigrams": f"""
        WITH toks AS (
            SELECT lang, doc_id, t, unnest(range(1, len(t) + 1)) AS i
            FROM (SELECT lang, doc_id,
                         string_split({_NORMALIZED_TEXT}, ' ') AS t
                  FROM documents)
        ),
        big AS (
            SELECT lang, doc_id, t[i] || ' ' || t[i+1] AS bigram
            FROM toks WHERE i < len(t) AND t[i] <> ''
        ),
        agg AS (
            SELECT lang, bigram, COUNT(*) AS n,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM big GROUP BY 1, 2
        )
        SELECT lang, bigram, n, n_docs, rnk FROM (
            SELECT *, row_number() OVER (PARTITION BY lang
                       ORDER BY n DESC, bigram ASC) AS rnk
            FROM agg
        ) WHERE rnk <= 10
        ORDER BY lang, rnk
    """,
    # q78: patterns are the PII_PATTERNS from functions/text.py, valid
    # in both Java regex and RE2 (no backrefs/lookaround); counts use
    # len(regexp_extract_all) since DuckDB lacks regexp_count, and the
    # replace chain carries the 'g' flag (see module docstring).
    "q78_pii_redaction": """
        WITH seeded AS (
            SELECT lang,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com'
                        || CASE WHEN doc_id % 3 = 0
                                THEN ' from 10.0.'
                                     || CAST(doc_id % 256 AS VARCHAR) || '.7'
                                ELSE '' END
                        || CASE WHEN doc_id % 5 = 0
                                THEN ' call +1 555-000-1234'
                                ELSE '' END AS t
            FROM documents
        ), red AS (
            SELECT lang, t,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(t,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '[REDACTED]', 'g'),
                       '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b',
                       '[REDACTED]', 'g'),
                     '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]',
                     '[REDACTED]', 'g') AS rt
            FROM seeded
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(len(regexp_extract_all(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT)
                 AS n_email,
               CAST(SUM(len(regexp_extract_all(t,
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b'))) AS BIGINT)
                 AS n_ipv4,
               CAST(SUM(len(regexp_extract_all(t,
                 '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]'))) AS BIGINT)
                 AS n_phone,
               CAST(SUM(
                   len(regexp_extract_all(rt,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(rt,
                     '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b'))
                 + len(regexp_extract_all(rt,
                     '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]'))) AS BIGINT)
                 AS n_residual
        FROM red
        GROUP BY lang
        ORDER BY lang
    """,
    # q120: DuckDB isodow is already Monday=1
    "q120_activity_heatmap": """
        WITH cell AS (
            SELECT CAST(isodow(ts) AS INT) AS dow,
                   CAST(hour(ts) AS INT) AS hr, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cell)
        SELECT dow, hr, n,
               floor(n / t * 1000000.0) / 1000000.0 AS share
        FROM cell CROSS JOIN tot
        ORDER BY dow, hr
    """,
    # q121: decimal-exact monthly revenue; MoM from the lag window
    "q121_nation_revenue_momentum": """
        WITH monthly AS (
            SELECT n.n_name,
                   strftime(date_trunc('month', o.o_orderdate), '%Y-%m')
                     AS month,
                   SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(18,4))) AS rev
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT n_name, month, rev,
                   lag(rev) OVER (PARTITION BY n_name ORDER BY month)
                     AS prev
            FROM monthly
        )
        SELECT n_name, month, CAST(rev AS DOUBLE) AS revenue,
               CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
                    floor(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE)
                          * 10000.0) / 10000.0 END AS mom_growth
        FROM lagged ORDER BY n_name, month
    """,
    # q119: q75's SRP chain + q16's brute-force, intersected per probe
    "q119_ann_recall_eval": f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        el AS (
            SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM vecs
        ),
        elx AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xq
            FROM el
        ),
        planes AS (SELECT unnest(range(0, 6)) AS p),
        proj AS (
            SELECT vec_id, p,
                   SUM(xq * CASE WHEN {_hash60("p || '_' || d")} % 2 = 0
                            THEN 1 ELSE -1 END) AS proj
            FROM elx CROSS JOIN planes
            GROUP BY 1, 2
        ),
        bucket AS (
            SELECT vec_id,
                   SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << p)
                       ELSE 0 END) AS bucket
            FROM proj GROUP BY 1
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        pv.v, cv.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM bucket p
                JOIN bucket c ON p.bucket = c.bucket
                             AND c.vec_id <> p.vec_id
                JOIN vecs pv ON pv.vec_id = p.vec_id
                JOIN vecs cv ON cv.vec_id = c.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        p.v, c.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM vecs p JOIN vecs c ON c.vec_id <> p.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        )
        SELECT e.query_id, COUNT(a.neighbor_id) AS n_hits,
               floor(COUNT(a.neighbor_id) / 3.0 * 10000.0) / 10000.0
                 AS recall_at_3
        FROM exact e LEFT JOIN approx a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id ORDER BY e.query_id
    """,
    # q117: ntile + exact-decimal cumulative sums; one division/row
    "q117_revenue_lorenz": """
        WITH pc AS (
            SELECT o_custkey,
                   CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(18,4))), 2)
                        AS DECIMAL(18,2)) AS rev
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        ),
        tiled AS (
            SELECT rev, ntile(10) OVER (
                       ORDER BY rev ASC, o_custkey ASC) AS decile
            FROM pc
        ),
        per AS (
            SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS d_rev
            FROM tiled GROUP BY 1
        ),
        tot AS (SELECT SUM(d_rev) AS t_rev FROM per),
        cum AS (
            SELECT decile, n_customers, d_rev,
                   SUM(d_rev) OVER (ORDER BY decile
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_rev
            FROM per
        )
        SELECT decile, n_customers,
               CAST(d_rev AS DOUBLE) AS decile_revenue,
               floor(CAST(cum_rev AS DOUBLE) / CAST(t_rev AS DOUBLE)
                     * 1000000.0) / 1000000.0 AS cum_share
        FROM cum CROSS JOIN tot ORDER BY decile
    """,
    # q118: same fixed-6-decimal digit extraction; expected freq as
    # ln/ln(10) to mirror Spark's log(base, x) exactly
    "q118_benford_audit": """
        WITH obs AS (
            SELECT CAST(substr(regexp_replace(
                       printf('%.6f', abs(o_totalprice)),
                       '[0.,]', '', 'g'), 1, 1) AS INT) AS d,
                   COUNT(*) AS o
            FROM orders WHERE o_totalprice <> 0 GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
        SELECT d, o,
               floor(o / n * 1000000.0) / 1000000.0 AS obs_freq,
               floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000.0)
                 / 1000000.0 AS benford_freq,
               floor((o - ln(1.0 + 1.0 / d) / ln(10.0) * n)
                     * (o - ln(1.0 + 1.0 / d) / ln(10.0) * n)
                     / (ln(1.0 + 1.0 / d) / ln(10.0) * n)
                     * 10000.0) / 10000.0 AS chi_term
        FROM obs CROSS JOIN tot ORDER BY d
    """,
    # q115: q28's discrete-percentile method on ship latency
    "q115_fulfillment_latency": """
        WITH lat AS (
            SELECT o_orderpriority, l_orderkey, l_linenumber,
                   date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS days
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        ranked AS (
            SELECT o_orderpriority, days,
                   row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY days, l_orderkey, l_linenumber) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM lat
        )
        SELECT o_orderpriority, MAX(n) AS n_lines,
               floor(AVG(days) * 10000.0) / 10000.0 AS mean_days,
               MIN(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                        THEN days END) AS median_days,
               MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN days END) AS p90_days
        FROM ranked GROUP BY 1 ORDER BY 1
    """,
    # q116: directional confidence over q54's pair machinery; rounded
    # confidence drives the top-20 order on both sides
    "q116_association_rules": """
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        uic AS (
            -- mirror of the Spark-side DEFAULT_MAX_ITEMS_PER_USER=200
            -- fan-out cap: each user keeps its 200 lowest item ids
            SELECT user_id, item_id FROM (
                SELECT user_id, item_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY item_id) AS rn
                FROM ui
            ) WHERE rn <= 200
        ),
        co AS (
            SELECT a.item_id AS item_a, b.item_id AS item_b,
                   COUNT(*) AS n_co
            FROM uic a JOIN uic b
              ON a.user_id = b.user_id AND a.item_id < b.item_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        ),
        supp AS (SELECT item_id, COUNT(*) AS n FROM ui GROUP BY 1),
        dirs AS (
            SELECT item_a AS ante, item_b AS cons, n_co FROM co
            UNION ALL
            SELECT item_b AS ante, item_a AS cons, n_co FROM co
        )
        SELECT ante, cons, n_co, s.n AS n_ante,
               floor(n_co / s.n * 10000.0) / 10000.0 AS confidence
        FROM dirs JOIN supp s ON ante = s.item_id
        ORDER BY confidence DESC, ante ASC, cons ASC
        LIMIT 20
    """,
    # q112: entropies/MI from the contingency table; BIGINT products
    # exact before the double divisions; unrounded h's feed nmi
    "q112_type_hour_mutual_info": """
        WITH obs AS (
            SELECT event_type AS a, CAST(hour(ts) AS VARCHAR) AS b,
                   COUNT(*) AS o
            FROM events GROUP BY 1, 2
        ),
        ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM obs GROUP BY 1),
        cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM obs GROUP BY 1),
        nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
        j AS (
            SELECT MAX(nn.n) AS n,
                   -SUM((o / nn.n) * log2(o / nn.n)) AS h_ab,
                   SUM((o / nn.n)
                       * log2((o * nn.n) / (ra.ra * cb.cb))) AS mi
            FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn
        ),
        ha AS (
            SELECT -SUM((ra / nn.n) * log2(ra / nn.n)) AS h_a
            FROM ra CROSS JOIN nn
        ),
        hb AS (
            SELECT -SUM((cb / nn.n) * log2(cb / nn.n)) AS h_b
            FROM cb CROSS JOIN nn
        )
        SELECT n,
               floor(h_a * 10000.0) / 10000.0 AS h_a,
               floor(h_b * 10000.0) / 10000.0 AS h_b,
               floor(h_ab * 10000.0) / 10000.0 AS h_ab,
               floor(mi * 10000.0) / 10000.0 AS mi,
               floor(CASE WHEN least(h_a, h_b) > 0
                          THEN mi / least(h_a, h_b) ELSE 0.0 END
                     * 10000.0) / 10000.0 AS nmi
        FROM j CROSS JOIN ha CROSS JOIN hb
    """,
    # q113: q66's recursive closure, rolled to a size histogram
    "q113_dup_cluster_sizes": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL
            SELECT id_b AS u, id_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        ),
        comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
        sizes AS (SELECT comp, COUNT(*) AS size FROM comp GROUP BY 1)
        SELECT size, COUNT(*) AS n_clusters
        FROM sizes GROUP BY 1 ORDER BY 1
    """,
    # q114: distinct (source, bigram) sets; shared = EXISTS in any
    # other source (the left_semi twin)
    "q114_cross_source_novelty": f"""
        WITH bg AS (
            SELECT DISTINCT source, t[i] || ' ' || t[i+1] AS sh
            FROM (SELECT source, t, unnest(range(1, len(t) + 1)) AS i
                  FROM (SELECT source,
                               string_split({_NORMALIZED_TEXT}, ' ') AS t
                        FROM documents))
            WHERE i < len(t) AND t[i] <> ''
        ),
        per AS (SELECT source, COUNT(*) AS n_bigrams FROM bg GROUP BY 1),
        sh AS (
            SELECT x.source, COUNT(*) AS n_shared
            FROM bg x
            WHERE EXISTS (SELECT 1 FROM bg y
                          WHERE y.sh = x.sh AND y.source <> x.source)
            GROUP BY 1
        )
        SELECT p.source, p.n_bigrams,
               COALESCE(s.n_shared, 0) AS n_shared,
               floor((p.n_bigrams - COALESCE(s.n_shared, 0)) / p.n_bigrams
                     * 10000.0) / 10000.0 AS novelty
        FROM per p LEFT JOIN sh s USING (source)
        ORDER BY p.source
    """,
    # q110/q111: the linear_fit normal equations mirrored verbatim —
    # same five sums, same guarded divisions, floor-round 4
    "q110_zipf_fit": f"""
        WITH toks AS (
            SELECT unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
            FROM documents
        ),
        fr AS (
            SELECT tok, COUNT(*) AS c FROM toks WHERE tok <> ''
            GROUP BY 1
        ),
        pts AS (
            SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, tok ASC)
                           AS DOUBLE)) AS x,
                   ln(CAST(c AS DOUBLE)) AS y
            FROM fr
        ),
        s AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
            FROM pts
        )
        SELECT n,
               CASE WHEN (n*sxx - sx*sx) <> 0 THEN
                    floor((n*sxy - sx*sy) / (n*sxx - sx*sx) * 10000.0)
                      / 10000.0 END AS slope,
               CASE WHEN (n*sxx - sx*sx) <> 0 THEN
                    floor((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx)
                          / n * 10000.0) / 10000.0 END AS intercept,
               CASE WHEN (n*sxx - sx*sx) <> 0
                     AND (n*syy - sy*sy) <> 0 THEN
                    floor(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                          / ((n*sxx - sx*sx) * (n*syy - sy*sy))
                          * 10000.0) / 10000.0 END AS r2
        FROM s
    """,
    "q111_daily_event_trend": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ),
        pts AS (
            SELECT event_type,
                   CAST(date_diff('day',
                        MIN(d) OVER (PARTITION BY event_type), d)
                        AS DOUBLE) AS x,
                   CAST(c AS DOUBLE) AS y
            FROM daily
        ),
        s AS (
            SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
            FROM pts GROUP BY 1
        )
        SELECT event_type, n,
               CASE WHEN (n*sxx - sx*sx) <> 0 THEN
                    floor((n*sxy - sx*sy) / (n*sxx - sx*sx) * 10000.0)
                      / 10000.0 END AS slope,
               CASE WHEN (n*sxx - sx*sx) <> 0 THEN
                    floor((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx)
                          / n * 10000.0) / 10000.0 END AS intercept,
               CASE WHEN (n*sxx - sx*sx) <> 0
                     AND (n*syy - sy*sy) <> 0 THEN
                    floor(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                          / ((n*sxx - sx*sx) * (n*syy - sy*sy))
                          * 10000.0) / 10000.0 END AS r2
        FROM s ORDER BY event_type
    """,
    # q109: unnest-with-ordinality twin; per-vec distances floor-
    # rounded BEFORE the label rollup so both engines aggregate
    # identical 4-digit inputs (avg of doubles can drift in the last
    # ulp across engines — same mitigation as q85)
    "q109_label_scatter": """
        WITH expl AS (
            SELECT vec_id, label, i - 1 AS dim,
                   CAST(embedding[i] AS DOUBLE) AS x
            FROM (SELECT vec_id, label, embedding,
                         unnest(range(1, len(embedding) + 1)) AS i
                  FROM embeddings)
        ),
        cent AS (
            SELECT label, dim, AVG(x) AS c FROM expl GROUP BY 1, 2
        ),
        dist AS (
            SELECT e.vec_id, e.label,
                   floor(SUM((e.x - c.c) * (e.x - c.c)) * 10000.0)
                     / 10000.0 AS d2
            FROM expl e JOIN cent c USING (label, dim)
            GROUP BY 1, 2
        )
        SELECT label, COUNT(*) AS n_vecs,
               floor(AVG(d2) * 10000.0) / 10000.0 AS mean_scatter,
               floor(MAX(d2) * 10000.0) / 10000.0 AS max_scatter
        FROM dist GROUP BY label ORDER BY label
    """,
    # q107: identical md5-bucket assignment; counts integer-exact;
    # the z formula is the same IEEE expression on both sides
    "q107_ab_test_ztest": f"""
        WITH users AS (SELECT DISTINCT user_id FROM events),
        assigned AS (
            SELECT user_id,
                   CASE WHEN {_hash60("'ab:' || CAST(user_id AS VARCHAR)")}
                             % 10000 < 5000
                        THEN 'control' ELSE 'treatment' END AS split
            FROM users
        ),
        pu AS (
            SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS tv
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        med AS (SELECT quantile_cont(tv, 0.5) AS m FROM pu),
        conv AS (
            SELECT user_id FROM pu CROSS JOIN med WHERE tv > m
        ),
        arm AS (
            SELECT split, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN c.user_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM assigned a LEFT JOIN conv c USING (user_id)
            GROUP BY split
        ),
        one AS (
            SELECT MAX(CASE WHEN split = 'control' THEN n END) AS n_c,
                   MAX(CASE WHEN split = 'control' THEN k END) AS k_c,
                   MAX(CASE WHEN split = 'treatment' THEN n END) AS n_t,
                   MAX(CASE WHEN split = 'treatment' THEN k END) AS k_t
            FROM arm
        )
        SELECT n_c, k_c, n_t, k_t,
               floor(k_c / n_c * 1000000.0) / 1000000.0 AS rate_control,
               floor(k_t / n_t * 1000000.0) / 1000000.0 AS rate_treatment,
               floor(((k_t / n_t) - (k_c / n_c))
                     / sqrt(((k_c + k_t) / (n_c + n_t))
                            * (1 - (k_c + k_t) / (n_c + n_t))
                            * (1.0 / n_c + 1.0 / n_t))
                     * 10000.0) / 10000.0 AS z_score
        FROM one
    """,
    # q108: percent_rank = (rank-1)/(n-1) — one division of exact
    # integers in both engines
    "q108_value_percent_rank": """
        SELECT event_id, event_type, ROUND(value, 4) AS value,
               floor(pct * 1000000.0) / 1000000.0 AS pct
        FROM (
            SELECT event_id, event_type, value, user_id,
                   percent_rank() OVER (
                       PARTITION BY event_type ORDER BY value) AS pct
            FROM events
        )
        WHERE user_id < 5
        ORDER BY event_type, event_id
    """,
    # q106: PPR rounds unrolled — (1.0-0.85) as a subtraction, e from
    # the same seed rule; dangling omitted (symmetric graph, 0 mass)
    "q106_personalized_pagerank": """
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        uic AS (
            -- mirror of the Spark-side DEFAULT_MAX_ITEMS_PER_USER=200
            -- fan-out cap: each user keeps its 200 lowest item ids
            SELECT user_id, item_id FROM (
                SELECT user_id, item_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY item_id) AS rn
                FROM ui
            ) WHERE rn <= 200
        ),
        co AS (
            SELECT a.item_id AS item_a, b.item_id AS item_b
            FROM uic a JOIN uic b
              ON a.user_id = b.user_id AND a.item_id < b.item_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        ),
        edges AS (
            SELECT item_a AS u, item_b AS v FROM co
            UNION ALL
            SELECT item_b AS u, item_a AS v FROM co
        ),
        deg AS (SELECT u AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
        ns AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS ns
            FROM deg WHERE node % 10 = 0
        ),
        base AS (
            SELECT d.node, d.deg,
                   CASE WHEN d.node % 10 = 0 THEN 1.0 / ns.ns
                        ELSE 0.0 END AS e
            FROM deg d CROSS JOIN ns
        ),
        r0 AS (SELECT node, deg, e, e AS r FROM base),
        r1 AS (
            SELECT b.node, b.deg, b.e,
                   (1.0 - 0.85) * b.e + 0.85 * COALESCE(s.c, 0.0) AS r
            FROM base b LEFT JOIN (
                SELECT e2.v AS node, SUM(r0.r / r0.deg) AS c
                FROM edges e2 JOIN r0 ON e2.u = r0.node GROUP BY e2.v
            ) s ON b.node = s.node
        ),
        r2 AS (
            SELECT b.node, b.deg, b.e,
                   (1.0 - 0.85) * b.e + 0.85 * COALESCE(s.c, 0.0) AS r
            FROM base b LEFT JOIN (
                SELECT e2.v AS node, SUM(r1.r / r1.deg) AS c
                FROM edges e2 JOIN r1 ON e2.u = r1.node GROUP BY e2.v
            ) s ON b.node = s.node
        ),
        r3 AS (
            SELECT b.node,
                   (1.0 - 0.85) * b.e + 0.85 * COALESCE(s.c, 0.0) AS r
            FROM base b LEFT JOIN (
                SELECT e2.v AS node, SUM(r2.r / r2.deg) AS c
                FROM edges e2 JOIN r2 ON e2.u = r2.node GROUP BY e2.v
            ) s ON b.node = s.node
        )
        SELECT node AS item_id,
               floor(r * 1000000.0) / 1000000.0 AS rank
        FROM r3 ORDER BY item_id
    """,
    # q104: per-edge anti-join orphan counts
    "q104_referential_integrity": """
        SELECT 'lineitem->orders' AS fk_edge,
               (SELECT COUNT(*) FROM lineitem) AS n_child_rows,
               (SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                 AS n_orphans
        UNION ALL
        SELECT 'orders->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
        ORDER BY fk_edge
    """,
    # q105: q25's sessionization + lag transition, top-10 total order
    "q105_session_transitions": """
        WITH sess AS (
            SELECT user_id, event_id, ts, event_type,
                   SUM(CASE WHEN gap IS NULL OR gap > 1800.0
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
            FROM (
                SELECT *,
                       epoch(ts) - lag(epoch(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS gap
                FROM events WHERE user_id < 200
            )
        ),
        trans AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id, session_id
                           ORDER BY ts, event_id) AS prev_type
                FROM sess
            )
            WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n FROM trans
        ORDER BY n DESC, prev_type ASC, next_type ASC
        LIMIT 10
    """,
    # q103: containment over the shared shingle-set CTE; division of
    # two BIGINTs is double in both engines
    "q103_containment_pairs": f"""
        WITH sets AS ({_SHINGLE_SETS}),
        sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
            FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(c / least(na.n, nb.n), 6) AS containment,
               na.n AS n_a, nb.n AS n_b
        FROM inter
        JOIN sizes na ON id_a = na.doc_id
        JOIN sizes nb ON id_b = nb.doc_id
        WHERE c / least(na.n, nb.n) >= 0.5
        ORDER BY id_a, id_b
    """,
    # q101: ranked-window OHLC — (ts, event_id) tie-break makes
    # first/last deterministic; bucket via the q81 epoch-floor twin
    "q101_daily_value_ohlc": """
        WITH b AS (
            SELECT event_type, value, ts, event_id,
                   make_timestamp(CAST(floor(epoch(ts) / 86400) * 86400
                                       AS BIGINT) * 1000000) AS bucket
            FROM events
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER w AS rn,
                   COUNT(*) OVER (PARTITION BY event_type, bucket) AS cnt
            FROM b
            WINDOW w AS (PARTITION BY event_type, bucket
                         ORDER BY ts, event_id)
        )
        SELECT event_type, strftime(bucket, '%Y-%m-%d') AS day,
               ROUND(MIN(CASE WHEN rn = 1 THEN value END), 4) AS open,
               ROUND(MAX(value), 4) AS high,
               ROUND(MIN(value), 4) AS low,
               ROUND(MIN(CASE WHEN rn = cnt THEN value END), 4) AS close,
               COUNT(*) AS n
        FROM ranked GROUP BY event_type, bucket
        ORDER BY event_type, day
    """,
    # q102: same deterministic perturbation on both sides; null-safe
    # compares via IS NOT DISTINCT FROM
    "q102_snapshot_diff": """
        WITH surv AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 13 = 0
                        THEN floor(o_totalprice * 1.1 * 100.0) / 100.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % 97 <> 0
        ),
        added AS (
            SELECT -o_orderkey AS o_orderkey,
                   o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 89 = 0
        ),
        newt AS (SELECT * FROM surv UNION ALL SELECT * FROM added),
        d AS (
            SELECT (o.o_orderkey IS NULL) AS is_add,
                   (n.o_orderkey IS NULL) AS is_rem,
                   CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL
                        THEN 0
                        ELSE CAST(NOT (o.o_totalprice
                                  IS NOT DISTINCT FROM n.o_totalprice) AS INT)
                           + CAST(NOT (o.o_orderstatus
                                  IS NOT DISTINCT FROM n.o_orderstatus) AS INT)
                   END AS nc
            FROM orders o FULL OUTER JOIN newt n
              ON o.o_orderkey = n.o_orderkey
        )
        SELECT CASE WHEN is_add THEN 'added'
                    WHEN is_rem THEN 'removed'
                    WHEN nc > 0 THEN 'changed'
                    ELSE 'unchanged' END AS verdict,
               COUNT(*) AS n,
               CAST(SUM(nc) AS BIGINT) AS changed_cols
        FROM d GROUP BY 1 ORDER BY 1
    """,
    # q98: per-row float binning — order-independent, so the shared
    # IEEE expressions agree bit-for-bit; edges recomputed per bin
    "q98_price_histogram": """
        WITH stats AS (
            SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS lo,
                   MAX(CAST(o_totalprice AS DOUBLE)) AS hi
            FROM orders
        ),
        binned AS (
            SELECT CASE WHEN hi = lo THEN 0
                        ELSE CAST(least(9, floor(
                            (CAST(o_totalprice AS DOUBLE) - lo) * 10.0
                            / (hi - lo))) AS INT) END AS bin,
                   lo, hi
            FROM orders CROSS JOIN stats
        )
        SELECT bin,
               floor((lo + bin * ((hi - lo) / 10.0)) * 10000.0) / 10000.0
                 AS lo_edge,
               floor((lo + (bin + 1) * ((hi - lo) / 10.0)) * 10000.0)
                 / 10000.0 AS hi_edge,
               COUNT(*) AS n
        FROM binned GROUP BY bin, lo, hi ORDER BY bin
    """,
    # q99: rank-weighted sums as exact decimals; only the closed-form
    # division is float, written identically on both sides
    "q99_revenue_gini": """
        WITH pc AS (
            SELECT o_custkey,
                   ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(18,4))), 2) AS rev
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        ),
        ranked AS (
            SELECT CAST(rev AS DECIMAL(18,2)) AS x,
                   row_number() OVER (ORDER BY rev ASC, o_custkey ASC) AS i
            FROM pc
        ),
        agg AS (
            SELECT COUNT(*) AS n, SUM(x) AS s, SUM(i * x) AS w FROM ranked
        )
        SELECT n AS n_customers,
               ROUND(CAST(s AS DOUBLE), 2) AS total_revenue,
               floor(((2.0 * CAST(w AS DOUBLE)) / (n * CAST(s AS DOUBLE))
                      - (n + 1) / n) * 1000000.0) / 1000000.0 AS gini
        FROM agg
    """,
    # q100: naive 3-way self-join closure — exact same census the
    # degree-oriented Spark plan produces
    "q100_item_graph_triangles": """
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        uic AS (
            -- mirror of the Spark-side DEFAULT_MAX_ITEMS_PER_USER=200
            -- fan-out cap: each user keeps its 200 lowest item ids
            SELECT user_id, item_id FROM (
                SELECT user_id, item_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY item_id) AS rn
                FROM ui
            ) WHERE rn <= 200
        ),
        co AS (
            SELECT a.item_id AS u, b.item_id AS v
            FROM uic a JOIN uic b
              ON a.user_id = b.user_id AND a.item_id < b.item_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        ),
        deg AS (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT u AS node FROM co UNION ALL SELECT v FROM co
            ) GROUP BY 1
        ),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM co ab JOIN co bc ON ab.v = bc.u
            JOIN co ac ON ac.u = ab.u AND ac.v = bc.v
        )
        SELECT d.n_nodes, ec.n_edges, t.n_triangles, w.n_wedges,
               CASE WHEN w.n_wedges = 0 THEN 0.0
                    ELSE floor(3.0 * t.n_triangles / w.n_wedges
                               * 1000000.0) / 1000000.0
               END AS global_clustering
        FROM (SELECT COUNT(*) AS n_nodes FROM deg) d
        CROSS JOIN (SELECT COUNT(*) AS n_edges FROM co) ec
        CROSS JOIN tri t
        CROSS JOIN (SELECT CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT)
                      AS n_wedges FROM deg) w
    """,
    # q96: identical seeded md5 buckets decide the split in both
    # engines; DECIMAL sums exact; leaked_groups is the invariant
    "q96_leakage_free_split": f"""
        WITH tagged AS (
            SELECT user_id, value,
                   CASE WHEN {_hash60("'split:' || CAST(user_id AS VARCHAR)")}
                             % 10000 < 8000 THEN 'train'
                        WHEN {_hash60("'split:' || CAST(user_id AS VARCHAR)")}
                             % 10000 < 9000 THEN 'valid'
                        ELSE 'test' END AS split
            FROM events
        ),
        leaked AS (
            SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS leaked_groups
            FROM (SELECT user_id, COUNT(DISTINCT split) AS ns
                  FROM tagged GROUP BY 1)
        )
        SELECT split, COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS value_total,
               leaked.leaked_groups
        FROM tagged CROSS JOIN leaked
        GROUP BY split, leaked.leaked_groups
        ORDER BY split
    """,
    # q97: tokenizer/bigram CTEs as in q77; long/long division is
    # double in both engines
    "q97_lexical_diversity": f"""
        WITH toks AS (
            SELECT lang, unnest(string_split({_NORMALIZED_TEXT}, ' ')) AS tok
            FROM documents
        ),
        tok_agg AS (
            SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_types
            FROM toks WHERE tok <> '' GROUP BY 1
        ),
        big AS (
            SELECT lang, t[i] || ' ' || t[i+1] AS sh
            FROM (SELECT lang, t, unnest(range(1, len(t) + 1)) AS i
                  FROM (SELECT lang,
                               string_split({_NORMALIZED_TEXT}, ' ') AS t
                        FROM documents))
            WHERE i < len(t) AND t[i] <> ''
        ),
        big_agg AS (
            SELECT lang, COUNT(*) AS n_bigrams,
                   COUNT(DISTINCT sh) AS n_distinct_bigrams
            FROM big GROUP BY 1
        )
        SELECT lang, n_tokens, n_types,
               floor(n_types / n_tokens * 10000.0) / 10000.0 AS ttr,
               n_bigrams, n_distinct_bigrams,
               floor(n_distinct_bigrams / n_bigrams * 10000.0) / 10000.0
                 AS bigram_diversity
        FROM tok_agg JOIN big_agg USING (lang)
        ORDER BY lang
    """,
    # q93: integer window cumsum — exact in any engine
    "q93_sequence_packing": f"""
        WITH tok AS (
            SELECT lang, doc_id, {_TOKEN_COUNT} AS n_tokens FROM documents
        ),
        packed AS (
            SELECT lang, doc_id, n_tokens,
                   CAST(floor(COALESCE(SUM(n_tokens) OVER (
                            PARTITION BY lang ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0)
                        / 2048) AS BIGINT) AS pack_id
            FROM tok
        )
        SELECT lang, pack_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               MIN(doc_id) AS first_doc
        FROM packed GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # q94: q66's recursive closure + q22's quality twin; canonical =
    # argmax(quality, tie-break min id) per multi-member cluster
    "q94_canonical_selection": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS}),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL
            SELECT id_b AS u, id_a AS v FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON reach.node = e.v
        ),
        comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
        q AS ({_DOC_QUALITY}),
        member AS (
            SELECT q.doc_id, q.quality,
                   COALESCE(comp.comp, q.doc_id) AS cluster
            FROM q LEFT JOIN comp ON q.doc_id = comp.node
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY cluster
                       ORDER BY quality DESC, doc_id ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY cluster) AS n_members
            FROM member
        )
        SELECT cluster, CAST(MAX(n_members) AS BIGINT) AS n_members,
               MIN(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
               MIN(CASE WHEN rn = 1 THEN quality END) AS canonical_quality
        FROM ranked WHERE n_members >= 2
        GROUP BY cluster ORDER BY cluster
    """,
    # q95: store = distinct fingerprints of the 80% history; batch
    # verdicts: store hit > within-batch repeat > accept
    "q95_incremental_dedup": f"""
        WITH store AS (
            SELECT DISTINCT md5({_NORMALIZED_TEXT}) AS fp
            FROM documents WHERE doc_id % 5 <> 0
        ),
        b AS (
            SELECT doc_id, lang, md5({_NORMALIZED_TEXT}) AS fp
            FROM documents WHERE doc_id % 5 = 0
        ),
        v AS (
            SELECT b.lang,
                   CASE WHEN store.fp IS NOT NULL THEN 'dup_store'
                        WHEN row_number() OVER (
                            PARTITION BY b.fp ORDER BY b.doc_id) > 1
                            THEN 'dup_batch'
                        ELSE 'accept' END AS verdict
            FROM b LEFT JOIN store ON b.fp = store.fp
        )
        SELECT lang, verdict, COUNT(*) AS n
        FROM v GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # q92: chi-square twin — BIGINT/BIGINT is double division in both
    # engines; (o-e)*(o-e) multiplied out (no pow) for ulp parity;
    # empty cells ride the left join
    "q92_priority_status_chi2": """
        WITH obs AS (
            SELECT o_orderpriority AS a, o_orderstatus AS b,
                   COUNT(*) AS o
            FROM orders GROUP BY 1, 2
        ),
        ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM obs GROUP BY 1),
        cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM obs GROUP BY 1),
        nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
        cells AS (
            SELECT ra.a, cb.b, ra.ra, cb.cb,
                   COALESCE(obs.o, 0) AS o, nn.n
            FROM ra CROSS JOIN cb
            LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
            CROSS JOIN nn
        )
        SELECT MAX(n) AS n,
               COUNT(DISTINCT a) AS r,
               COUNT(DISTINCT b) AS c,
               (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS dof,
               floor(SUM((o - (ra * cb) / n) * (o - (ra * cb) / n)
                         / ((ra * cb) / n)) * 10000.0) / 10000.0 AS chi2
        FROM cells
    """,
    # q91: RANGE frame twin — both engines include epoch-second peers
    # in the frame; DECIMAL(12,2) summation is exact so order can't
    # perturb the total
    "q91_rolling_user_spend": """
        SELECT user_id, event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                 AS spend_3d,
               COUNT(*) OVER w AS n_3d
        FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events WHERE user_id < 10)
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """,
    # q90: skew diagnostic twin — integer '/' is double division in
    # both engines; (n * n_keys) multiplies exactly before dividing
    "q90_user_key_skew": """
        WITH counts AS (
            SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        stats AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys
            FROM counts
        )
        SELECT key, n,
               floor(n / total * 1000000.0) / 1000000.0 AS share,
               floor((n * n_keys) / total * 10000.0) / 10000.0
                 AS ratio_to_mean,
               row_number() OVER (ORDER BY n DESC, key ASC) AS rnk
        FROM counts CROSS JOIN stats
        ORDER BY n DESC, key ASC
        LIMIT 10
    """,
    # q89: A-ES weighted sample twin — identical seeded md5 keys, so
    # both engines draw the same sample; ln computed on the same
    # (hash+1)/2^60 double
    "q89_weighted_corpus_sample": f"""
        WITH w AS (
            SELECT lang, doc_id, {_TOKEN_COUNT} AS n_tokens FROM documents
        ),
        keyed AS (
            SELECT lang, doc_id, n_tokens,
                   ln(({_hash60("'es:' || CAST(doc_id AS VARCHAR)")} + 1)
                      / 1152921504606846976.0) / n_tokens AS k
            FROM w WHERE n_tokens > 0
        )
        SELECT lang, doc_id, n_tokens, rnk FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY lang ORDER BY k DESC, doc_id ASC) AS rnk
            FROM keyed
        ) WHERE rnk <= 10
        ORDER BY lang, rnk
    """,
    # q88: median/MAD twin — quantile_cont lerp matches Spark's exact
    # percentile; the threshold constant is written as the same IEEE
    # product (3.0*1.4826) both engines fold identically
    "q88_value_outliers": """
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1
        ),
        wm AS (
            SELECT e.event_type, e.value, m.med
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
            FROM wm GROUP BY 1
        )
        SELECT w.event_type, COUNT(*) AS n_events,
               floor(MAX(w.med) * 10000.0) / 10000.0 AS med,
               floor(MAX(d.mad) * 10000.0) / 10000.0 AS mad,
               CAST(SUM(CASE WHEN abs(w.value - w.med)
                                  > (3.0 * 1.4826) * d.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM wm w JOIN mad d USING (event_type)
        GROUP BY w.event_type ORDER BY w.event_type
    """,
    # q87: the 3 PageRank rounds unrolled as CTEs — identical
    # arithmetic to operators/graph.py: (1.0-0.85) written as the
    # subtraction so both engines fold it to the same IEEE double;
    # dangling term omitted (symmetric graph -> zero mass, and
    # c + 0.0 == c exactly); floor-round 6 at the end
    "q87_item_pagerank": """
        WITH ui AS (
            SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS item_id
            FROM events
            WHERE json_extract_string(props, '$.k') IS NOT NULL
        ),
        uic AS (
            -- mirror of the Spark-side DEFAULT_MAX_ITEMS_PER_USER=200
            -- fan-out cap: each user keeps its 200 lowest item ids
            SELECT user_id, item_id FROM (
                SELECT user_id, item_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY item_id) AS rn
                FROM ui
            ) WHERE rn <= 200
        ),
        co AS (
            SELECT a.item_id AS item_a, b.item_id AS item_b
            FROM uic a JOIN uic b
              ON a.user_id = b.user_id AND a.item_id < b.item_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        ),
        edges AS (
            SELECT item_a AS u, item_b AS v FROM co
            UNION ALL
            SELECT item_b AS u, item_a AS v FROM co
        ),
        deg AS (SELECT u AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
        nn AS (
            SELECT CAST(COUNT(DISTINCT u) AS DOUBLE) AS n FROM edges
        ),
        r0 AS (
            SELECT node, deg, 1.0 / nn.n AS r FROM deg CROSS JOIN nn
        ),
        r1 AS (
            SELECT s.node, d.deg, s.r FROM (
                SELECT e.v AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                         + 0.85 * SUM(r0.r / r0.deg) AS r
                FROM edges e JOIN r0 ON e.u = r0.node CROSS JOIN nn
                GROUP BY e.v
            ) s JOIN deg d USING (node)
        ),
        r2 AS (
            SELECT s.node, d.deg, s.r FROM (
                SELECT e.v AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                         + 0.85 * SUM(r1.r / r1.deg) AS r
                FROM edges e JOIN r1 ON e.u = r1.node CROSS JOIN nn
                GROUP BY e.v
            ) s JOIN deg d USING (node)
        ),
        r3 AS (
            SELECT e.v AS node,
                   (1.0 - 0.85) / MAX(nn.n)
                     + 0.85 * SUM(r2.r / r2.deg) AS r
            FROM edges e JOIN r2 ON e.u = r2.node CROSS JOIN nn
            GROUP BY e.v
        )
        SELECT node AS item_id,
               floor(r * 1000000.0) / 1000000.0 AS rank
        FROM r3 ORDER BY item_id
    """,
    # q86: per-column profile blocks UNION'd; quantile_cont matches
    # Spark percentile's (n-1)*p linear interpolation; timestamps are
    # formatted to seconds on both sides; floor-round on numerics
    "q86_events_profile": """
        SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(event_id) AS n_null,
               COUNT(DISTINCT event_id) AS n_distinct,
               floor(CAST(MIN(event_id) AS DOUBLE)*10000.0)/10000.0 AS min_num,
               floor(CAST(MAX(event_id) AS DOUBLE)*10000.0)/10000.0 AS max_num,
               floor(quantile_cont(CAST(event_id AS DOUBLE), 0.5)*10000.0)
                 /10000.0 AS median,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM events
        UNION ALL
        SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts), COUNT(DISTINCT ts),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S'),
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S')
        FROM events
        UNION ALL
        SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
               COUNT(DISTINCT user_id),
               floor(CAST(MIN(user_id) AS DOUBLE)*10000.0)/10000.0,
               floor(CAST(MAX(user_id) AS DOUBLE)*10000.0)/10000.0,
               floor(quantile_cont(CAST(user_id AS DOUBLE), 0.5)*10000.0)
                 /10000.0,
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
               COUNT(DISTINCT event_type),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               MIN(event_type), MAX(event_type)
        FROM events
        UNION ALL
        SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
               COUNT(DISTINCT value),
               floor(MIN(value)*10000.0)/10000.0,
               floor(MAX(value)*10000.0)/10000.0,
               floor(quantile_cont(value, 0.5)*10000.0)/10000.0,
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
               COUNT(DISTINCT props),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE),
               MIN(props), MAX(props)
        FROM events
        ORDER BY col_name
    """,
    # q122: RAG chunk windows — same tokenizer CTE, starts from
    # range(0, n, stride), content via 1-based inclusive list_slice
    # (clamped at n on both engines)
    "q122_doc_chunks": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split({_NORMALIZED_TEXT}, ' '),
                               x -> x <> '') AS t
            FROM documents WHERE doc_id < 40
        ),
        base AS (
            SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
        ),
        st AS (
            SELECT doc_id, t, n, unnest(range(0, n, 6)) AS s FROM base
        )
        SELECT doc_id,
               CAST(s / 6 AS INT) AS chunk_idx,
               len(list_slice(t, s + 1, least(s + 8, n))) AS n_tokens,
               md5(array_to_string(list_slice(t, s + 1, least(s + 8, n)),
                   ' ')) AS chunk_hash
        FROM st
        ORDER BY doc_id, chunk_idx
    """,
    # q123: int8 quantize→reconstruct mirrored element-wise — Spark's
    # (round((x-lo)/scale) - 128 + 128)·scale + lo collapses exactly to
    # round((x-lo)/scale)·scale + lo (integer arithmetic ≤255 is exact
    # in doubles); round() agrees (arg is non-negative, so HALF_UP ==
    # half-away); probes stay full-precision (asymmetric distance)
    "q123_quantized_recall": """
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q AS (
            SELECT vec_id, v, list_min(v) AS lo,
                   CASE WHEN list_max(v) > list_min(v)
                        THEN (list_max(v) - list_min(v)) / 255.0
                        ELSE 1.0 END AS scale
            FROM vecs
        ),
        hat AS (
            SELECT vec_id,
                   list_transform(v,
                       x -> round((x - lo) / scale) * scale + lo) AS hv
            FROM q
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        p.v, c.hv), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM vecs p JOIN hat c ON c.vec_id <> p.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY p.vec_id
                           ORDER BY ROUND(list_cosine_similarity(
                                        p.v, c.v), 6) DESC,
                                    c.vec_id ASC) AS rnk
                FROM vecs p JOIN vecs c ON c.vec_id <> p.vec_id
                WHERE p.vec_id < 8
            ) WHERE rnk <= 3
        )
        SELECT e.query_id, COUNT(a.neighbor_id) AS n_hits,
               floor(COUNT(a.neighbor_id) / 3.0 * 10000.0) / 10000.0
                 AS recall_at_3
        FROM exact e LEFT JOIN approx a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id ORDER BY e.query_id
    """,
    # q124: mixture selection — integer token sums, double only at the
    # scale/budget derivation (identical op order) and the final share
    "q124_corpus_mixture": f"""
        WITH t(lang, target_share) AS (VALUES
            ('en', CAST(0.5 AS DOUBLE)), ('fr', CAST(0.2 AS DOUBLE)),
            ('es', CAST(0.15 AS DOUBLE)), ('de', CAST(0.1 AS DOUBLE)),
            ('zh', CAST(0.05 AS DOUBLE))),
        d AS (
            SELECT doc_id, lang, {_TOKEN_COUNT} AS tok,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ),
        avail AS (SELECT lang, SUM(tok) AS avail FROM d GROUP BY 1),
        sc AS (
            SELECT MIN(avail / target_share) AS scale
            FROM avail JOIN t USING (lang)
        ),
        b AS (
            SELECT lang, avail, target_share,
                   CAST(FLOOR(target_share * scale) AS BIGINT) AS budget
            FROM avail JOIN t USING (lang) CROSS JOIN sc
        ),
        cum AS (
            SELECT doc_id, lang, tok,
                   SUM(tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
            FROM d
        ),
        sel AS (
            SELECT cum.lang, tok FROM cum JOIN b ON cum.lang = b.lang
            WHERE cum <= budget
        ),
        per AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(tok) AS BIGINT) AS sel_tokens
            FROM sel GROUP BY 1
        ),
        tot AS (SELECT SUM(sel_tokens) AS tot FROM per)
        SELECT per.lang, n_docs, sel_tokens,
               CAST(avail AS BIGINT) AS avail_tokens, budget, target_share,
               floor(CAST(sel_tokens AS DOUBLE) / CAST(tot AS DOUBLE)
                     * 10000.0) / 10000.0 AS achieved_share
        FROM per JOIN b ON per.lang = b.lang CROSS JOIN tot
        ORDER BY per.lang
    """,
    # q125: Spearman via average ranks — half-integer rank sums are
    # exact in doubles, so only the final division/sqrt touch floats
    "q125_spearman_spend_balance": """
        WITH pc AS (
            SELECT o_custkey,
                   ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(18,4))), 2) AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        ),
        t AS (
            SELECT c_acctbal AS a, b
            FROM pc JOIN customer ON o_custkey = c_custkey
        ),
        r AS (
            SELECT rank() OVER (ORDER BY a)
                     + (COUNT(*) OVER (PARTITION BY a) - 1) / 2.0 AS ra,
                   rank() OVER (ORDER BY b)
                     + (COUNT(*) OVER (PARTITION BY b) - 1) / 2.0 AS rb
            FROM t
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(ra) AS sa, SUM(rb) AS sb, SUM(ra * rb) AS sab,
                   SUM(ra * ra) AS saa, SUM(rb * rb) AS sbb
            FROM r
        )
        SELECT n,
               CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
                    THEN floor((n * sab - sa * sb)
                         / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
                         * 1000000.0) / 1000000.0
               END AS rho
        FROM s
    """,
    # q126: Mann-Whitney U from combined average ranks — U exact,
    # only the effect size divides
    "q126_mann_whitney": """
        WITH t AS (
            SELECT event_type, value FROM events
            WHERE event_type IN ('click', 'purchase')
        ),
        r AS (
            SELECT event_type,
                   rank() OVER (ORDER BY value)
                     + (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0 AS r
            FROM t
        ),
        g AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(r) AS rsum
            FROM r GROUP BY 1
        )
        SELECT a.n AS n_a, b.n AS n_b,
               a.rsum - a.n * (a.n + 1) / 2.0 AS u_a,
               floor((a.rsum - a.n * (a.n + 1) / 2.0)
                     / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE))
                     * 1000000.0) / 1000000.0 AS cles
        FROM (SELECT * FROM g WHERE event_type = 'click') a
        CROSS JOIN (SELECT * FROM g WHERE event_type = 'purchase') b
    """,
    # q127: grouped-percentile sketch gate — oracle recomputes the
    # exact interpolated median and expects the tolerance flag TRUE
    "q127_approx_percentile_gate": """
        SELECT event_type, COUNT(*) AS n_events,
               floor(quantile_cont(value, 0.5) * 10000.0) / 10000.0
                 AS p50_exact,
               TRUE AS within_band
        FROM events GROUP BY 1 ORDER BY 1
    """,
    # q128: the MERGE clause set as set algebra — updated = matched
    # minus deleted, inserted = source-only, kept = target-only;
    # repriced values round the SAME double on both engines
    "q128_orders_merge": """
        WITH src AS (
            SELECT o_orderkey, ROUND(o_totalprice * 1.1, 2) AS o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT -o_orderkey, o_totalprice
            FROM orders WHERE o_orderkey % 89 = 3
        ),
        result AS (
            SELECT 'updated' AS action, s.o_totalprice AS tp
            FROM orders t JOIN src s USING (o_orderkey)
            WHERE t.o_orderpriority <> '5-LOW'
            UNION ALL
            SELECT 'inserted', s.o_totalprice
            FROM src s ANTI JOIN orders t USING (o_orderkey)
            UNION ALL
            SELECT 'kept', t.o_totalprice
            FROM orders t ANTI JOIN src s USING (o_orderkey)
        )
        SELECT action, COUNT(*) AS n_rows,
               CAST(ROUND(SUM(CAST(tp AS DECIMAL(18,2))), 2) AS DOUBLE)
                 AS total_price
        FROM result GROUP BY 1 ORDER BY 1
    """,
    # q129: RFM quartiles — ntile over engine-exact metrics (int days
    # and counts, decimal monetary), custkey tie-break on all three
    "q129_rfm_segmentation": """
        WITH per AS (
            SELECT o_custkey,
                   date_diff('day', MAX(o_orderdate),
                             (SELECT MAX(o_orderdate) FROM orders)) AS r,
                   COUNT(*) AS f,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
            FROM orders GROUP BY 1
        ),
        q AS (
            SELECT m,
                   ntile(4) OVER (ORDER BY r, o_custkey) AS rq,
                   ntile(4) OVER (ORDER BY f, o_custkey) AS fq,
                   ntile(4) OVER (ORDER BY m, o_custkey) AS mq
            FROM per
        )
        SELECT rq * 100 + fq * 10 + mq AS rfm_code,
               COUNT(*) AS n_customers,
               CAST(ROUND(SUM(m), 2) AS DOUBLE) AS total_monetary
        FROM q GROUP BY 1 ORDER BY 1
    """,
    # q130: cohort LTV — integer month arithmetic, decimal sums; the
    # cumulative window runs on the cohort×month aggregate
    "q130_cohort_ltv": """
        WITH first AS (
            SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
            FROM orders GROUP BY 1
        ),
        cm AS (
            SELECT o.o_custkey, date_trunc('month', o_orderdate) AS m,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o GROUP BY 1, 2
        ),
        idx AS (
            SELECT f.cohort, cm.m, cm.rev,
                   (year(cm.m) - year(f.cohort)) * 12
                     + (month(cm.m) - month(f.cohort)) AS month_index
            FROM cm JOIN first f ON cm.o_custkey = f.o_custkey
            WHERE (year(cm.m) - year(f.cohort)) * 12
                    + (month(cm.m) - month(f.cohort)) <= 12
        ),
        cell AS (
            SELECT cohort, month_index, COUNT(*) AS n_active,
                   SUM(rev) AS rev
            FROM idx GROUP BY 1, 2
        )
        SELECT strftime(cohort, '%Y-%m') AS cohort, month_index, n_active,
               CAST(ROUND(SUM(rev) OVER (PARTITION BY cohort
                          ORDER BY month_index
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 2) AS DOUBLE)
                 AS cum_revenue
        FROM cell ORDER BY cohort, month_index
    """,
    # q86b: the approx-profile gate — oracle recomputes n_rows/n_null
    # exactly and expects every HLL tolerance flag TRUE; the sketch
    # values themselves are engine-specific and never compared
    "q86b_events_profile_approx": """
        SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(event_id) AS n_null, TRUE AS within_rsd
        FROM events
        UNION ALL
        SELECT 'ts', COUNT(*), COUNT(*) - COUNT(ts), TRUE FROM events
        UNION ALL
        SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id), TRUE
        FROM events
        UNION ALL
        SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type), TRUE
        FROM events
        UNION ALL
        SELECT 'value', COUNT(*), COUNT(*) - COUNT(value), TRUE FROM events
        UNION ALL
        SELECT 'props', COUNT(*), COUNT(*) - COUNT(props), TRUE FROM events
        ORDER BY col_name
    """,
    # q85: bigram LM twin — tokenizer CTE from q77, context counts are
    # bigram-initial sums, V = distinct successor words, stable_round
    # (floor) on the per-doc score BEFORE the lang rollup
    "q85_bigram_lm_quality": f"""
        WITH toks AS (
            SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
            FROM (SELECT doc_id,
                         string_split({_NORMALIZED_TEXT}, ' ') AS t
                  FROM documents)
        ),
        big AS (
            SELECT doc_id, t[i] || ' ' || t[i+1] AS sh
            FROM toks WHERE i < len(t) AND t[i] <> ''
        ),
        doc_bg AS (
            SELECT doc_id, sh, COUNT(*) AS n_occ FROM big GROUP BY 1, 2
        ),
        bg AS (
            SELECT sh, CAST(SUM(n_occ) AS BIGINT) AS c12
            FROM doc_bg GROUP BY 1
        ),
        ctx AS (
            SELECT split_part(sh, ' ', 1) AS w1,
                   CAST(SUM(c12) AS BIGINT) AS c1
            FROM bg GROUP BY 1
        ),
        voc AS (
            SELECT COUNT(DISTINCT split_part(sh, ' ', 2)) AS v FROM bg
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST(SUM(d.n_occ) AS BIGINT) AS n_bigrams,
                   floor(SUM(d.n_occ * log2((b.c12 + 0.5)
                                            / (c.c1 + 0.5 * voc.v)))
                         / SUM(d.n_occ) * 10000.0) / 10000.0 AS avg_logp
            FROM doc_bg d
            JOIN bg b USING (sh)
            JOIN ctx c ON split_part(d.sh, ' ', 1) = c.w1
            CROSS JOIN voc
            GROUP BY d.doc_id
        )
        SELECT docs.lang, COUNT(*) AS n_docs,
               floor(AVG(avg_logp) * 10000.0) / 10000.0 AS mean_logp,
               floor(MIN(avg_logp) * 10000.0) / 10000.0 AS min_logp,
               floor(MAX(avg_logp) * 10000.0) / 10000.0 AS max_logp
        FROM scored JOIN documents docs USING (doc_id)
        GROUP BY docs.lang ORDER BY docs.lang
    """,
    # q84: same tokenizer as q64/q77; row_number partitioned on the
    # chunk hash (md5 — hash60 is its 60-bit prefix, partitions agree)
    "q84_chunk_dedup": """
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(
                     regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS tf
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, lang, i AS chunk_idx,
                   array_to_string(tf[i*8+1 : i*8+8], ' ') AS chunk
            FROM toks,
                 unnest(range(0, CAST(ceil(len(tf)/8.0) AS INT))) AS u(i)
        ),
        keep AS (
            SELECT doc_id, lang,
                   CASE WHEN row_number() OVER (
                            PARTITION BY md5(chunk)
                            ORDER BY doc_id, chunk_idx) = 1
                        THEN 1 ELSE 0 END AS ret
            FROM chunks
        ),
        per_doc AS (
            SELECT doc_id, lang, COUNT(*) AS nc, SUM(ret) AS nr
            FROM keep GROUP BY 1, 2
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(nc) AS BIGINT) AS n_chunks,
               CAST(SUM(nr) AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN nr < nc THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_pruned_docs
        FROM per_doc GROUP BY lang ORDER BY lang
    """,
    "q83_cohort_retention": """
        WITH first AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY 1
        ),
        weeks AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS act_week
            FROM events
        )
        SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
               CAST((act_week - cohort_week) / 7 AS INTEGER) AS week_offset,
               COUNT(*) AS n_users
        FROM weeks JOIN first USING (user_id)
        GROUP BY first.cohort_week, week_offset
        ORDER BY 1, 2
    """,
    "q82_conversion_funnel": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > t1 GROUP BY 1
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > t2 GROUP BY 1
        ),
        c AS (
            SELECT (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3
        )
        SELECT * FROM (
            SELECT 1 AS stage, 'view' AS step, n1 AS n_users,
                   CAST(NULL AS DOUBLE) AS pct_of_prev FROM c
            UNION ALL
            SELECT 2, 'click', n2,
                   CASE WHEN n1 > 0
                        THEN floor(n2 * 10000.0 / n1) / 10000.0 END FROM c
            UNION ALL
            SELECT 3, 'purchase', n3,
                   CASE WHEN n2 > 0
                        THEN floor(n3 * 10000.0 / n2) / 10000.0 END FROM c
        )
        ORDER BY stage
    """,
    "q81_gap_filled_series": """
        WITH obs AS (
            SELECT user_id,
                   make_timestamp(CAST(floor(epoch(ts) / 86400) * 86400
                                       AS BIGINT) * 1000000) AS bucket,
                   ROUND(SUM(value), 2) AS v
            FROM events
            WHERE user_id < 20
            GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
            FROM obs GROUP BY 1
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL 86400 SECOND))
                       AS bucket
            FROM span
        ),
        j AS (
            SELECT g.user_id, g.bucket, o.v, (o.v IS NULL) AS is_gap
            FROM grid g
            LEFT JOIN obs o
              ON g.user_id = o.user_id AND g.bucket = o.bucket
        )
        SELECT user_id,
               strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               ROUND(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS value,
               is_gap
        FROM j
        ORDER BY user_id, bucket
    """,
    "q80_curation_pipeline": f"""
        WITH ratios AS (
            SELECT doc_id, lang, text,
                   {_TOKEN_COUNT} AS n_tokens,
                   CASE WHEN len(text) > 0 THEN
                       (len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')))
                       * 1.0 / len(text)
                   ELSE CAST(0.0 AS DOUBLE) END AS punct_ratio,
                   CASE WHEN {_TOKEN_COUNT} > 0 THEN
                       len(list_filter({_RAW_TOKENS_LOWER},
                           t -> list_contains({_STOPWORD_LISTS["en"]}, t)))
                       * 1.0 / ({_TOKEN_COUNT})
                   ELSE CAST(0.0 AS DOUBLE) END AS sw_ratio
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang, text,
                   floor((CAST(0.4 AS DOUBLE) *
                          CASE WHEN n_tokens >= 50 THEN CAST(1.0 AS DOUBLE)
                               ELSE n_tokens / CAST(50.0 AS DOUBLE) END
                        + CAST(0.3 AS DOUBLE) *
                          greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                              CAST(1.0 AS DOUBLE) - punct_ratio * 4))
                        + CAST(0.3 AS DOUBLE) *
                          greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
                              sw_ratio * 5))) * 10000.0) / 10000.0 AS quality
            FROM ratios
        ),
        kept AS (
            SELECT doc_id, lang, text FROM (
                SELECT doc_id, lang, text,
                       ROW_NUMBER() OVER (
                           PARTITION BY md5({_NORMALIZED_TEXT})
                           ORDER BY doc_id
                       ) AS rnk
                FROM scored WHERE quality >= 0.5
            ) WHERE rnk = 1
        ),
        sampled AS (
            SELECT * FROM kept
            WHERE {_MD5B("CAST(doc_id AS VARCHAR) || ':cur'")} % 10000
                  < CASE lang WHEN 'en' THEN 5000
                              WHEN 'zh' THEN 2500
                              WHEN 'de' THEN 1000
                              ELSE 500 END
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM({_TOKEN_COUNT}) AS BIGINT) AS ws_tokens,
               CAST(SUM(len(regexp_extract_all(text,
                   '''(?:[sdmt]|ll|ve|re)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^ \\t\\n\\f\\r\\p{{L}}\\p{{N}}]+|[ \\t\\n\\f\\r]+'
               ))) AS BIGINT) AS bpe_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM sampled
        GROUP BY lang
        ORDER BY lang
    """,
    "q79_scd2_history": """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER w AS prev
            FROM events
            WHERE user_id < 100
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), changed AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE prev IS NULL OR event_type IS DISTINCT FROM prev
        )
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S') AS valid_to,
               (lead(ts) OVER w2 IS NULL) AS is_current
        FROM changed
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, valid_from
    """,
}

# q180: the per-doc decontamination CARD — the q71 and q177 oracle
# texts VERBATIM as CTE subqueries (no drift possible), left-joined
# onto the training-corpus ids with coalesced n-gram counts, nullable
# semantic columns, and the folded verdict. Defined after the dict so
# it can reference the two entries it composes.
ORACLES["q180_decontamination_card"] = f"""
    WITH ng AS (SELECT * FROM ({ORACLES["q71_decontamination"]}) t),
         sem AS (SELECT * FROM ({ORACLES["q177_semantic_decontamination"]}) t)
    SELECT d.doc_id,
           COALESCE(ng.n_overlap, 0) AS n_overlap,
           COALESCE(ng.n_bench_docs, 0) AS n_bench_docs,
           ng.doc_id IS NOT NULL AS ngram_flagged,
           sem.bench_id AS sem_bench_id,
           sem.sim AS sem_sim,
           sem.vec_id IS NOT NULL AS sem_flagged,
           CASE WHEN ng.doc_id IS NOT NULL AND sem.vec_id IS NOT NULL
                THEN 'both'
                WHEN ng.doc_id IS NOT NULL THEN 'ngram'
                WHEN sem.vec_id IS NOT NULL THEN 'semantic'
                ELSE 'clean' END AS verdict
    FROM documents d
    LEFT JOIN ng ON ng.doc_id = d.doc_id
    LEFT JOIN sem ON sem.vec_id = d.doc_id
    WHERE d.doc_id % 20 <> 0
    ORDER BY d.doc_id
"""

# q181: deterministic mergeable heavy-hitter summaries — exact
# per-shard top-k + largest-dropped threshold per epoch (doc parity),
# full-outer merge with absent-side slack, both Misra-Gries gates
# replayed against the exact token counts.
_HH_K, _HH_SHARDS = 4, 4
def _hh_shard(col: str) -> str:
    return _hash60(f"'hh:' || {col}") + f" % {_HH_SHARDS}"
ORACLES["q181_heavy_hitters"] = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split({_NORMALIZED_TEXT}, ' '),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    exact AS (SELECT tok AS key, CAST(count(*) AS BIGINT) AS true_cnt
              FROM toks GROUP BY 1),
    ra AS (
        SELECT *, row_number() OVER (PARTITION BY shard
                                     ORDER BY cnt DESC, key ASC) AS rn
        FROM (SELECT {_hh_shard("tok")} AS shard, tok AS key,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM toks WHERE doc_id % 2 = 0 GROUP BY 1, 2)
    ),
    rb AS (
        SELECT *, row_number() OVER (PARTITION BY shard
                                     ORDER BY cnt DESC, key ASC) AS rn
        FROM (SELECT {_hh_shard("tok")} AS shard, tok AS key,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM toks WHERE doc_id % 2 = 1 GROUP BY 1, 2)
    ),
    sa AS (SELECT shard, key, cnt FROM ra WHERE rn <= {_HH_K}),
    sb AS (SELECT shard, key, cnt FROM rb WHERE rn <= {_HH_K}),
    ta AS (SELECT shard,
                  COALESCE(MAX(cnt) FILTER (WHERE rn > {_HH_K}),
                           CAST(0 AS BIGINT)) AS thr
           FROM ra GROUP BY shard),
    tb AS (SELECT shard,
                  COALESCE(MAX(cnt) FILTER (WHERE rn > {_HH_K}),
                           CAST(0 AS BIGINT)) AS thr
           FROM rb GROUP BY shard),
    mg AS (
        SELECT COALESCE(a.shard, b.shard) AS shard,
               COALESCE(a.key, b.key) AS key,
               COALESCE(a.cnt, 0) + COALESCE(b.cnt, 0) AS cnt,
               CAST(CASE WHEN a.key IS NULL THEN COALESCE(ta.thr, 0)
                         ELSE 0 END
                  + CASE WHEN b.key IS NULL THEN COALESCE(tb.thr, 0)
                         ELSE 0 END AS BIGINT) AS err,
               COALESCE(ta.thr, 0) + COALESCE(tb.thr, 0) AS thrsum
        FROM sa a FULL OUTER JOIN sb b
          ON a.shard = b.shard AND a.key = b.key
        LEFT JOIN ta ON ta.shard = COALESCE(a.shard, b.shard)
        LEFT JOIN tb ON tb.shard = COALESCE(a.shard, b.shard)
    ),
    rm AS (
        SELECT *, row_number() OVER (PARTITION BY shard
                                     ORDER BY cnt DESC, key ASC) AS rn
        FROM mg
    ),
    thrm AS (
        SELECT shard,
               GREATEST(MAX(thrsum),
                        COALESCE(MAX(cnt + err) FILTER (WHERE rn > {_HH_K}),
                                 CAST(0 AS BIGINT))) AS thr
        FROM rm GROUP BY shard
    ),
    rep AS (
        SELECT rm.shard, rm.key, rm.cnt, rm.err, thrm.thr
        FROM rm JOIN thrm USING (shard) WHERE rn <= {_HH_K}
    ),
    unrep AS (
        SELECT {_hh_shard("e.key")} AS shard, e.true_cnt
        FROM exact e LEFT JOIN rep r ON r.key = e.key
        WHERE r.key IS NULL
    ),
    comp AS (
        SELECT bool_and(ok) AS gate_complete FROM (
            SELECT t.shard,
                   COALESCE(MAX(u.true_cnt), 0) <= MAX(t.thr) AS ok
            FROM thrm t LEFT JOIN unrep u ON u.shard = t.shard
            GROUP BY t.shard
        )
    )
    SELECT r.shard, r.key, r.cnt, r.err, r.thr, e.true_cnt,
           (r.cnt <= e.true_cnt AND e.true_cnt <= r.cnt + r.err)
               AS gate_bounds,
           comp.gate_complete
    FROM rep r JOIN exact e ON e.key = r.key CROSS JOIN comp
    ORDER BY r.shard, r.key
"""

# q182: mergeable quantile summaries — equi-depth boundary-rank
# construction per epoch, weighted union, smallest-value-at-target
# estimate, and the additive rank-error gate vs exact counts.
_QS_K = 16
ORACLES["q182_quantile_sketch"] = f"""
    WITH pall AS (
        SELECT l_extendedprice AS v, l_orderkey FROM lineitem
        WHERE l_extendedprice IS NOT NULL
    ),
    ra AS (
        SELECT v, row_number() OVER (ORDER BY v) AS rn,
               (SELECT count(*) FROM pall WHERE l_orderkey % 2 = 0) AS n
        FROM pall WHERE l_orderkey % 2 = 0
    ),
    rb AS (
        SELECT v, row_number() OVER (ORDER BY v) AS rn,
               (SELECT count(*) FROM pall WHERE l_orderkey % 2 = 1) AS n
        FROM pall WHERE l_orderkey % 2 = 1
    ),
    sa AS (
        SELECT ((rn * {_QS_K} + n - 1) // n) AS q, v, rn AS r, n FROM ra
        WHERE ((rn + 1) * {_QS_K} + n - 1) // n
              > (rn * {_QS_K} + n - 1) // n
    ),
    sb AS (
        SELECT ((rn * {_QS_K} + n - 1) // n) AS q, v, rn AS r, n FROM rb
        WHERE ((rn + 1) * {_QS_K} + n - 1) // n
              > (rn * {_QS_K} + n - 1) // n
    ),
    pts AS (
        SELECT 0 AS side, q, v, r, n FROM sa
        UNION ALL SELECT 1, q, v, r, n FROM sb
    ),
    wtd AS (
        SELECT *, r - COALESCE(lag(r) OVER (PARTITION BY side
                                            ORDER BY r), 0) AS w
        FROM pts
    ),
    cum AS (
        SELECT *, SUM(w) OVER (ORDER BY v, side, r
                               ROWS UNBOUNDED PRECEDING) AS cw
        FROM wtd
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS N
        FROM (SELECT side, MAX(n) AS n FROM pts GROUP BY side)
    ),
    probes AS (
        SELECT pm, CAST((pm * N + 99) // 100 AS BIGINT) AS target, N
        FROM (VALUES (25), (50), (75), (90)) t(pm) CROSS JOIN tot
    ),
    est AS (
        SELECT pm, v AS est, target, N FROM (
            SELECT p.pm, c.v, p.target, p.N,
                   row_number() OVER (PARTITION BY p.pm
                                      ORDER BY c.v, c.side, c.r) AS rk
            FROM probes p JOIN cum c ON c.cw >= p.target
        ) WHERE rk = 1
    ),
    slk AS (
        SELECT CAST(((SELECT MAX(n) FROM sa) + {_QS_K} - 1) // {_QS_K}
             + ((SELECT MAX(n) FROM sb) + {_QS_K} - 1) // {_QS_K}
             AS BIGINT) AS slack
    ),
    truth AS (
        SELECT e.pm, e.est, e.target,
               CAST(count(*) FILTER (WHERE p.v <= e.est) AS BIGINT)
                   AS rank_le,
               CAST(count(*) FILTER (WHERE p.v < e.est) AS BIGINT)
                   AS rank_lt
        FROM est e CROSS JOIN pall p GROUP BY 1, 2, 3
    )
    SELECT t.pm, t.est, t.target, t.rank_le, t.rank_lt, s.slack,
           (t.rank_le >= t.target - s.slack
            AND t.rank_lt + 1 <= t.target + s.slack) AS gate_rank_error
    FROM truth t CROSS JOIN slk s ORDER BY t.pm
"""
