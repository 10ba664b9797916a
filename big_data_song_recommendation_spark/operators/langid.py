"""Model-based language identification (hashed char-trigram naive
Bayes) — the learned upgrade of the stopword-vote heuristic
``functions/text.lang_id`` (the reference's only language handling is
none at all; this is the fastText-lid-style stage every multilingual
curation pipeline runs, trained ON THE CORPUS ITSELF so no external
model download is ever needed).

Same discipline as the q161 quality classifier
(``operators/quality.quality_model_scores``): training happens once
offline (``ml/langid.train_langid``, committed to
``ml/langid_weights.py`` by ``scripts/gen_langid_weights.py``);
SCORING is a pure column expression — per-class integer log-prob
folds over an in-row hashed trigram stream against constant-folded
weight arrays.  Zero shuffles, zero Python, exact int64 cross-engine,
so the whole scorer is DuckDB-oracle-checkable (q163).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import int_array_lit

from ..functions import text as Ftext

LID_N_FEATURES = 256
LID_SEED = "lid"


def trigram_buckets(
    text_col: Column | str,
    *,
    n_features: int = LID_N_FEATURES,
    seed: str = LID_SEED,
) -> Column:
    """Hashed char-TRIGRAM bucket stream of a text column, IN-ROW:
    trigrams (spaces included — word-boundary context is the signal
    char-n-gram LID models rely on) slide over the normalized text via
    a ``transform`` over an index sequence; each hashes with the
    engine's replayable md5-60 discipline mod ``n_features``.

    The normalized text is PADDED with one boundary space on each side
    (the fastText word-boundary-marker convention): without it, a
    marker word at the very start or end of a document produces no
    boundary trigram (' a ' needs a space on both sides) and the model
    silently misses exactly the single-marker documents.

    Empty normalized texts yield an EMPTY array (the quality-
    classifier zero-fill discipline) — NOTE ``sequence(1, 0)`` in
    Spark counts DOWN, so the short-text case must be guarded
    explicitly, never left to the sequence bounds.

    PERFORMANCE: this single-expression form captures the padded
    normalized-text EXPRESSION inside the ``transform`` lambda, and
    Catalyst re-evaluates captured expressions PER ELEMENT — the
    two-regex normalization chain then runs once per character
    position, O(len²) regex work per document (measured: 54 s for the
    sf0.1 corpus vs 1.4 s staged). It exists for tests and one-off
    column use; bulk callers (``langid_model_scores``, training) stage
    the padded string as a REAL COLUMN first and use
    :func:`padded_text` + :func:`trigram_buckets_from_padded`."""
    staged = padded_text(text_col)
    return trigram_buckets_from_padded(
        staged, n_features=n_features, seed=seed
    )


def padded_text(text_col: Column | str) -> Column:
    """Boundary-padded normalized text (empty string for empty
    normalizations) — STAGE THIS AS A COLUMN (``withColumn``) before
    feeding :func:`trigram_buckets_from_padded`, so the per-element
    lambda reads a bound row value instead of re-running the regex
    normalization once per character position."""
    core = Ftext.normalized_text(text_col)
    return F.when(
        F.length(core) > 0, F.concat(F.lit(" "), core, F.lit(" "))
    ).otherwise(F.lit(""))


def trigrams_from_padded(padded: Column | str) -> Column:
    """Every trigram substring of an already-staged :func:`padded_text`
    column (positions 1..len-2; empty array below length 3). The ONE
    definition of trigram semantics — :func:`trigram_buckets_from_padded`
    (training/bucketing) and :func:`langid_model_scores` (the r12
    distinct-first scorer) both express their streams through it, so a
    change to the guard/window/padding cannot silently diverge the
    scorer from the trainer (ADVICE r12 #2)."""
    s = F.col(padded) if isinstance(padded, str) else padded
    n = F.length(s)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - F.lit(2))).otherwise(
        F.expr("array()").cast("array<int>")
    )
    return F.transform(idx, lambda i: s.substr(i, F.lit(3)))


def trigram_buckets_from_padded(
    padded: Column | str,
    *,
    n_features: int = LID_N_FEATURES,
    seed: str = LID_SEED,
) -> Column:
    """Trigram bucket stream over an already-staged
    :func:`padded_text` column (see the staging note there)."""
    from .dedup import hash60

    return F.coalesce(
        F.transform(
            trigrams_from_padded(padded),
            lambda t: hash60(t, seed) % F.lit(int(n_features)),
        ),
        F.expr("array()").cast("array<bigint>"),
    )


def langid_model_scores(
    df: DataFrame,
    weights_micro: dict[str, list[int]],
    biases_micro: dict[str, int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
    seed: str = LID_SEED,
) -> DataFrame:
    """Score every document with a TRAINED BERNOULLI naive-Bayes
    language model as pure column expressions: per class ``c``,

    ``score_c = bias_c + Σ_{distinct buckets b present} w_c[b]``

    where training folds the class log-prior AND the all-absent mass
    ``Σ_b log(1 − p_cb)`` into ``bias_c``, and ``w_c[b] =
    log p_cb − log(1 − p_cb)`` (integer micro-units) — the Bernoulli
    decision rule exactly. Bernoulli, not multinomial, because LID on
    this corpus hinges on the ABSENCE of marker n-grams ('und' = no
    stopword evidence): a multinomial NB only scores present grams
    and collapsed to the majority class (measured 0.89 agreement =
    majority rate); Bernoulli scores every absent bucket through the
    bias. Prediction = argmax with a deterministic alphabetical
    tie-break — the exact rule the DuckDB twin replays.

    100 TB shape: MAP-ONLY — the per-class weight arrays ride the plan
    as constant-folded literals (|classes| × n_features ints); each
    class adds one in-row fold over the SAME staged DISTINCT-bucket
    array. Output: one row per input row (short texts score bare
    biases): ``id_col``, ``carry_cols``, ``n_trigrams``,
    ``pred_lang``, ``score_micro`` (the winning class's score).
    """
    if not weights_micro or set(weights_micro) != set(biases_micro):
        raise ValueError(
            "langid_model_scores: weights_micro and biases_micro must "
            "share the same non-empty class set"
        )
    classes = sorted(weights_micro)
    n = len(weights_micro[classes[0]])
    if any(len(weights_micro[c]) != n for c in classes):
        raise ValueError("langid_model_scores: ragged weight arrays")
    carry = list(carry_cols or [])
    # two-step staging: the padded string MUST be a bound column
    # before the per-position lambda touches it (see padded_text).
    # Distinct the trigram STRINGS before hashing (r12, guide §1.2
    # per-task work): the scorer only consumes the distinct-bucket
    # SET, and md5+conv per position was the stage's CPU — hashing
    # each distinct trigram once (~143 vs ~299 per doc at bench
    # scale) yields the identical set (distinct-of-hashes ==
    # hashes-of-distinct ∘ distinct).
    from .dedup import hash60

    tris = F.array_distinct(trigrams_from_padded("__lid_s"))
    staged = (
        df.withColumn("__lid_s", padded_text(text_col))
        .withColumn("__lid_tris", tris)
        .withColumn(
            "__lid_set",
            F.array_distinct(
                F.transform(
                    "__lid_tris",
                    lambda t: hash60(t, seed) % F.lit(int(n)),
                )
            ),
        )
    )

    def _fold(w_arr: Column, bias: int) -> Column:
        # closure-bound weight array: a default-arg lambda would read
        # as a 3-parameter HOF to Spark's arity check
        return F.aggregate(
            F.col("__lid_set"),
            F.lit(int(bias)).cast("long"),
            lambda acc, x: acc
            + F.element_at(w_arr, (x + 1).cast("int")).cast("long"),
        )

    scores: dict[str, Column] = {}
    for cls in classes:
        scores[cls] = _fold(
            int_array_lit(weights_micro[cls]),
            biases_micro[cls],
        )
    best = (
        F.greatest(*scores.values())
        if len(classes) > 1
        else scores[classes[0]]
    )
    # first alphabetical class reaching the max wins (WHEN order)
    expr = None
    for cls in classes:
        cond = scores[cls] == best
        expr = F.when(cond, F.lit(cls)) if expr is None else expr.when(
            cond, F.lit(cls)
        )
    pred = expr
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.size("__lid_set").cast("long").alias("n_trigrams"),
        pred.alias("pred_lang"),
        best.alias("score_micro"),
    )
