"""Text-analysis column expressions for the training-data pipeline:
token counting, quality scoring, language ID, fingerprinting.

All pure Catalyst expressions (regex + higher-order functions) so they
run vectorized JVM-side over 100 TB of documents — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the language-ID heuristic. Real
# deployments would swap in fastText/cld3 behind the same column API.
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "les", "des", "que", "pour"],
    "de": ["der", "die", "das", "und", "ein", "eine", "zu", "mit", "von", "ist"],
}

_WORD_SPLIT = "\\s+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _WORD_SPLIT)))


#: GPT-2-style pre-tokenizer pattern (contraction suffixes, space-glued
#: letter runs, digit runs, punctuation runs, whitespace runs). The
#: original's trailing-space lookahead arm is dropped so the pattern
#: stays engine-portable: RE2 (DuckDB) has no lookahead, and the arm
#: only re-shapes whitespace-run boundaries — token counts are
#: unaffected for all inputs. Whitespace is the explicit class
#: [ \t\n\f\r] rather than \s, because Java's \s includes \x0B and
#: RE2's does not — with the explicit class both engines classify
#: \x0B as a punctuation char and the counts stay bit-identical.
#: Residual engine-skew boundary: \p{L}/\p{N} membership of code
#: points assigned AFTER the JVM's Unicode table version (Java 17 =
#: Unicode 13) can differ from RE2's newer tables — counts are
#: bit-identical for all stably-assigned scripts (property-tested),
#: and converge for the rest as the JDK's tables update.
BPE_TOKEN_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+"
    r"| ?[^ \t\n\f\r\p{L}\p{N}]+|[ \t\n\f\r]+"
)


def bpe_token_count(col: Column | str) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the
    LLM-pipeline "token budget" estimator (whitespace counting
    under-counts CJK and over-counts contractions). Pure Catalyst
    (regexp_extract_all), property-tested bit-identical to DuckDB."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_PATTERN), 0))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def avg_token_length(col: Column | str) -> Column:
    n = token_count(col)
    return F.when(n > 0, F.length(F.regexp_replace(F.trim(_c(col)), _WORD_SPLIT, "")) / n)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 ] — a cheap
    boilerplate/noise signal for quality filtering."""
    c = _c(col)
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, "[^A-Za-z0-9 ]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang` — correlates with
    natural prose vs. keyword spam / garbled text."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n = token_count(col)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: prose-length sweet spot,
    low punctuation noise, some stopword mass. Mirrors the shape of
    Gopher/C4-style quality rules; weights are illustrative."""
    from .scalars import stable_round

    n_tok = token_count(col)
    len_score = F.when(n_tok >= 50, F.lit(1.0)).otherwise(n_tok / F.lit(50.0))
    punct_score = clamp01(F.lit(1.0) - punct_ratio(col) * 4)
    sw_score = clamp01(stopword_ratio(col) * 5)
    # stable_round, not F.round: weighted sums of small-denominator
    # ratios land on exact .5 decimal boundaries where engines'
    # ROUND disagrees.
    return stable_round(0.4 * len_score + 0.3 * punct_score + 0.3 * sw_score, 4)


def clamp01(col: Column) -> Column:
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), col))


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID over {en,es,fr,de}; 'und' if no vote.
    A real system would use character n-gram models — this keeps the
    same column signature with a pure-SQL-expressible heuristic."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))

    def _vote(sw: list[str]) -> Column:
        # NB: the lambda must take exactly one arg — Spark treats a
        # two-arg lambda as (element, index).
        arr = F.array(*[F.lit(w) for w in sw])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    votes = {lang: _vote(sw) for lang, sw in _STOPWORDS.items()}
    best_count = F.greatest(*votes.values())
    expr = F.when(best_count == 0, F.lit("und"))
    # deterministic tie-break: alphabetical language order
    for lang in sorted(votes):
        expr = expr.when(votes[lang] == best_count, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def tokens(col: Column | str) -> Column:
    """Tokenize in ONE regex pass: ``split(lower(text), "[^a-z0-9]+")``.

    Produces the exact token SEQUENCE of
    ``split(normalized_text(col), " ")`` (verified corpus-wide at
    sf0.1) except for possible EMPTY tokens at the array edges — a
    leading/trailing delimiter run splits into one "" entry that
    normalized_text's trim would have removed. Consumers MUST filter
    ``tok != ''`` BEFORE any neighbor-sensitive use (lead() shingles,
    bigrams) so empties never appear as neighbors, and must not treat
    the posexplode index as a token ORDINAL (it can be shifted by one
    leading empty) — re-derive ordinals with row_number when the
    position value itself is an output (winnowing's packed pos).

    Why: the two regexp_replace passes in normalized_text cost 2.2×
    the single split on the sf0.1 corpus explode (0.34 s → 0.15 s);
    every shingle/token pipeline pays that per scan."""
    return F.split(F.lower(_c(col)), "[^a-z0-9]+")


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9\\s]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of normalized text.
    The exact-dedup key (SURVEY.md build plan §7 item 5).

    Computed via the one-regex ``tokens`` path (filter empties, join
    with single spaces) — STRING-IDENTICAL to
    ``md5(normalized_text(col))`` (token-sequence equality is the
    tokens() contract, corpus-verified; joining with ' ' reinstates
    exactly the collapsed/trimmed form) at half the regex cost, which
    every exact-dedup scan pays once per row. Oracle twins keep using
    ``md5({_NORMALIZED_TEXT})`` — same bytes, so hashes agree."""
    toks = F.filter(tokens(col), lambda t: t != "")
    return F.md5(F.array_join(toks, " "))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """k-word shingles of normalized text → array<string> (array-valued
    form, e.g. for storing shingles as a column).

    WARNING: do NOT ``explode`` this — Catalyst collapses the array
    builder into Generate and re-evaluates it per output row (O(n²)
    per doc). For row-per-shingle output use
    ``operators.dedup.shingle_rows`` (posexplode + window lead)."""
    toks = F.split(normalized_text(col), " ")
    n = F.size(toks)
    # sequence(1, 0) would yield a DESCENDING [1, 0] — guard short docs
    # to an empty shingle set instead.
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-corpus hygiene). Patterns stay in the
# conservative regex subset (character classes + bounded repetition, no
# lookaround/backrefs) so they behave identically under Java regex
# (Spark) and RE2-family engines — the same portability discipline as
# the tokenizer regexes above.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def redact_pii(col: Column | str, *, replacement: str = "[REDACTED]") -> Column:
    """Replace email / IPv4 / phone-shaped spans with ``replacement``.

    Pure chained ``regexp_replace`` — stays in whole-stage codegen, no
    UDF. Order matters: emails first (an email's domain must not be
    half-eaten by the phone pattern), then IPs, then phones."""
    c = _c(col)
    for name in ("email", "ipv4", "phone"):
        c = F.regexp_replace(c, PII_PATTERNS[name], replacement)
    return c


def pii_counts(col: Column | str) -> Column:
    """Struct of per-category PII match counts (audit twin of
    :func:`redact_pii` — run BEFORE redaction)."""
    c = _c(col)
    return F.struct(
        *[
            F.regexp_count(c, F.lit(pat)).alias(name)
            for name, pat in PII_PATTERNS.items()
        ]
    )


# -- encoding repair (mojibake) ----------------------------------------------

#: single non-ASCII characters whose UTF-8-read-as-cp1252 forms this
#: table repairs: Latin-1 letters + the cp1252 punctuation block the
#: crawl actually contains. The mojibake forms are GENERATED (below),
#: never hand-typed — no lookup data to drift.
_MOJIBAKE_TARGETS = (
    "éèêëàâäåçîïíìôöóòñúùûüãõáßÉÈÀÂÄÇÖÜÑ"
    "‘’“”–—…•"
    "°€™©®«»¡¿½´"
)


def _cp1252_or_latin1(b: int) -> str:
    """How a byte shows up when a UTF-8 stream is misread: cp1252 for
    the 0x80-0x9F block where defined, raw Latin-1 codepoint where
    cp1252 leaves the byte undefined (the scraper passthrough)."""
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)


#: (mojibake_sequence, repaired_char), longest sequences first (3-byte
#: UTF-8 → 3-char mojibake must repair before any 2-char prefix of it)
MOJIBAKE_PAIRS: list[tuple[str, str]] = sorted(
    (
        ("".join(_cp1252_or_latin1(b) for b in c.encode("utf-8")), c)
        for c in _MOJIBAKE_TARGETS
    ),
    key=lambda p: (-len(p[0]), p[0]),
)


def repair_mojibake(col: Column | str) -> Column:
    """Repair UTF-8-misread-as-cp1252 mojibake (the ftfy-class
    curation stage, reduced to its dominant failure mode): one literal
    global replace per :data:`MOJIBAKE_PAIRS` entry, chained
    longest-first — a single map-only projection, whole-stage codegen,
    no Python, no external data. Spark's ``replace`` and any ANSI
    engine's ``replace`` scan left-to-right with the same semantics,
    so the chain is bit-reproducible cross-engine (the q170 oracle
    embeds the same generated pairs).

    Scope: ONE decode error deep (the overwhelmingly common case).
    Double-encoded text needs a second pass; genuinely mixed encodings
    need a real ftfy — this is the 100 TB-cheap first tier, and
    ``n_chars_fixed`` (every repair shortens the string) tells you
    which documents to send there."""
    c = F.col(col) if isinstance(col, str) else col
    for moji, fixed in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(moji), F.lit(fixed))
    return c
