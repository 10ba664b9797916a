"""Scalar function library (SURVEY.md §2.8, F1-F18).

Every reference row-wise Python lambda re-expressed as a native column
expression — zero UDFs, so everything stays inside whole-stage codegen
(§2.11 rule: "no UDF where an expression exists").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def int_array_lit(vals) -> Column:
    """Integer array literal in ONE py4j call AND O(1) expression
    nodes. ``F.lit(list)`` / ``F.array(*[F.lit(v) ...])`` cost a py4j
    round trip PER ELEMENT (measured round 11: ~0.67 s to stage 8x128
    ints per serving request). The round-11 fix — parsing one
    ``array(v1,...,vN)`` text — is a single py4j call but still builds
    a ``CreateArray`` with N literal CHILDREN, and the bench/serving
    protocol re-optimizes the plan per run, so every Catalyst rule
    walks all N nodes each time (round 12 profile: q47's two 1024-int
    stagings put its noop wall ~2x over its stage time; A/B on a
    1024-int fold: 0.72 -> 0.39 s/run). This form —
    ``split(lit("v1,...,vN"), ",").cast(array<bigint>)`` — is 4 nodes
    regardless of N; ConstantFolding still collapses it to the SAME
    single array literal (one O(N) fold per plan, microseconds)
    before codegen. Values are identical: canonical int strings cast
    exactly; element type is pinned bigint (call sites do int64
    micro-unit arithmetic, where the old form's int-vs-bigint
    inference promoted identically). Use for every staged model table
    (codebooks, centroids, classifier weights)."""
    vs = [str(int(v)) for v in vals]
    if not vs:
        return F.expr("array()")
    return F.split(F.lit(",".join(vs)), ",").cast("array<bigint>")


def double_array_lit(vals) -> Column:
    """:func:`int_array_lit` for doubles — one py4j call, O(1)
    expression nodes, ConstantFolding collapses it to the identical
    array literal. Values are exact: ``repr(float)`` emits the
    shortest round-trip decimal and Java ``Double.parseDouble``
    recovers the same IEEE-754 bits (both sides are the standard
    shortest-repr/parse pair). Used for percentile grids and any
    staged double table — ``F.array(*[F.lit(v) ...])`` costs a py4j
    round trip AND a plan node per element (the with_equi_depth_bucket
    256-bin grid was 255 of each, walked by every Catalyst rule on
    every re-optimization)."""
    vs = [repr(float(v)) for v in vals]
    if not vs:
        return F.expr("array()").cast("array<double>")
    return F.split(F.lit(",".join(vs)), ",").cast("array<double>")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- F1: lower+trim key normalization (src/data_processor.py:52-53,140-141)
def normalize_key(col: Column | str) -> Column:
    return F.lower(F.trim(_c(col)))


# -- F2: bidirectional containment (src/data_processor.py:154-156)
def contains_either(a: Column | str, b: Column | str) -> Column:
    a, b = _c(a), _c(b)
    return a.contains(b) | b.contains(a)


# -- F3: URL building (src/data_processor.py:198-200)
def spotify_url(track_id: Column | str) -> Column:
    return F.concat(F.lit("https://open.spotify.com/track/"), _c(track_id))


# -- F4: ms → "m:ss" (src/data_processor.py:203-205)
def format_duration(ms: Column | str) -> Column:
    ms = _c(ms).cast("long")
    return F.format_string(
        "%d:%02d", (ms / 60000).cast("long"), ((ms % 60000) / 1000).cast("long")
    )


# -- F5: md5 → deterministic bucket (src/app_optimized.py:259-277).
# The reference used int(md5(id)[:8], 16); conv(...,16,10) is the
# JVM-side equivalent and is stable across runs/engines (unlike
# Python's salted hash(), F6's pitfall).
def md5_bucket(col: Column | str, modulo: int | None = None) -> Column:
    h = F.conv(F.substring(F.md5(_c(col).cast("string")), 1, 8), 16, 10).cast("long")
    return h % modulo if modulo else h


def pick_deterministic(col: Column | str, options: Sequence[str]) -> Column:
    """Deterministic pseudo-attribute: hash-pick from a fixed pool
    (src/app_optimized.py:334-366 synthetic display attributes)."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (md5_bucket(col, len(options)) + 1).cast("int"))


# -- F6: stable user-id derivation (src/streamlit_app.py:95-97 used the
# salted Python hash(); md5 keeps it deterministic).
def stable_user_id(username: Column | str, n_users: int = 10000) -> Column:
    return md5_bucket(username, n_users)


# -- F7: rule-based emotion from audio features
# (src/data_processor.py:164-186 thresholds).
def emotion_from_features(
    valence: Column | str, energy: Column | str, danceability: Column | str
) -> Column:
    v, e, d = _c(valence), _c(energy), _c(danceability)
    return (
        F.when((v > 0.6) & (e > 0.6), F.lit("happy"))
        .when((v > 0.6) & (e <= 0.6), F.lit("calm"))
        .when((v <= 0.4) & (e > 0.6), F.lit("angry"))
        .when((v <= 0.4) & (e <= 0.4), F.lit("sad"))
        .when(d > 0.7, F.lit("energetic"))
        .otherwise(F.lit("neutral"))
    )


# -- F8/F9: popularity → rating bucket (src/spark/training.py:450-459;
# src/streaming_service.py:241-244). `noise=False` keeps it
# deterministic for oracle-checked queries.
def rating_from_popularity(popularity: Column | str, *, noise: bool = False) -> Column:
    p = _c(popularity)
    base = (
        F.when(p >= 80, F.lit(5.0))
        .when(p >= 60, F.lit(4.0))
        .when(p >= 40, F.lit(3.0))
        .when(p >= 20, F.lit(2.0))
        .otherwise(F.lit(1.0))
    )
    if noise:
        base = clamp(base + (F.rand() - F.lit(0.5)), 1.0, 5.0)
    return base


# -- F10: stringified Python list → array<string>
# (src/app_optimized.py:157-167 used ast.literal_eval per row).
def parse_stringified_list(col: Column | str) -> Column:
    return F.from_json(
        F.regexp_replace(_c(col), "'", '"'), T.ArrayType(T.StringType())
    )


def first_list_element(col: Column | str) -> Column:
    return F.element_at(parse_stringified_list(col), 1)


# -- F15: weighted choice via rand + cumulative thresholds
# (src/streaming_service.py:246-257). Pass `driver` to derive the
# uniform from a hash of that column instead of F.rand — rand(seed) is
# partition-layout dependent, so only the hash form is replay-stable
# across restarts/repartitioning (the determinism contract
# synthetic_interactions documents).
def weighted_choice(
    options: Sequence[tuple[str, float]],
    seed: int | None = None,
    driver: Column | str | None = None,
) -> Column:
    total = sum(w for _, w in options)
    if driver is not None:
        r = (md5_bucket(_c(driver), 1_000_000) / F.lit(1_000_000.0)) * total
    else:
        r = F.rand(seed) * total
    acc = 0.0
    expr = None
    for label, w in options:
        acc += w
        cond = r < acc
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(options[-1][0]))


# Cross-engine-stable decimal truncation. ROUND(x, d) is NOT portable
# when x sits exactly on a .5 boundary at digit d (engines disagree on
# whether to round the exact binary value or its shortest decimal
# repr — observed Spark 0.8687 vs DuckDB 0.8688 for 0.86875).
# floor(x·10^d)/10^d uses only IEEE ops, so identical inputs give
# identical outputs everywhere. Use for ratio-like per-row metrics.
def stable_round(col: Column | str, digits: int) -> Column:
    scale = F.lit(float(10**digits))
    return F.floor(_c(col) * scale) / scale


# -- F16: clamp (src/streaming_service.py:244)
def clamp(col: Column | str, lo: float, hi: float) -> Column:
    return F.greatest(F.lit(lo), F.least(F.lit(hi), _c(col)))


# -- F11-F13: timestamp helpers (thin, for discoverability)
def iso_format(ts: Column | str) -> Column:
    return F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss")


# Epoch seconds from ANY timestamp flavor. Parquet files written
# without isAdjustedToUTC read as TIMESTAMP_NTZ under Spark 4's NTZ
# inference, and NTZ -> double/long casts are AnalysisExceptions; the
# LTZ hop is legal from both flavors (NTZ interprets in the session
# zone — UTC here, matching the DuckDB oracle's epoch()) and is a
# no-op for plain TIMESTAMP. Keeps microseconds.
def epoch_seconds(ts: Column | str) -> Column:
    return _c(ts).cast("timestamp_ltz").cast("double")


def hour_of(ts: Column | str) -> Column:
    return F.hour(_c(ts))
