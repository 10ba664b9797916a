"""Model-based document quality classifier — the learned curation
stage (CCNet, GPT-3, LLaMA pipelines) complementing the rule tiers
(q22 heuristics, q153 C4 line cleaning).

Training: hashed-bigram count features (the same md5-60 bucket stream
the scorer folds over — ``operators.quality.bigram_buckets``) into an
MLlib ``LogisticRegression``, with a leakage-free ``group_split`` by
document id for the holdout. The TEACHER label distills the engine's
rule tier (``quality_score >= threshold`` — curated-vs-raw), so the
learned model generalizes the rules onto n-gram evidence; swap any
curated reference corpus in via ``label`` for the CCNet setup proper.

Serving: the fitted weights are exported as integer MICRO-UNITS and
scored by ``operators.quality.quality_model_scores`` as a pure
column-expression fold — map-only, zero shuffles, oracle-checkable
(the q131 DSIR integer discipline). The committed production weights
live in ``ml.quality_weights`` (generated once by
``scripts/gen_quality_weights.py``; rerun only on a deliberate
retrain — the whole point of committing them is that the q161 oracle
pins scoring, not training).

The reference's only quality signal is the rule CASE at
``src/data_processor.py:164-186`` — this is its learned upgrade.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.quality import (
    QCLF_N_FEATURES,
    QCLF_SEED,
    bigram_buckets,
    group_split,
)

SCALE = 1_000_000
RULE_THRESHOLD = 0.75  # balanced on the documents corpus (~54% pos)


def rule_quality_label(text_col: Column | str) -> Column:
    """The curated-vs-raw TEACHER label: 1.0 when the rule-tier
    composite (``functions.text.quality_score``) clears
    ``RULE_THRESHOLD``. Distillation target, replaceable by any
    curated reference set."""
    return (quality_score(text_col) >= F.lit(RULE_THRESHOLD)).cast(
        "double"
    )


def hashed_count_features(
    text_col: Column | str,
    *,
    n_features: int = QCLF_N_FEATURES,
    seed: str = QCLF_SEED,
) -> Column:
    """Dense hashed-bigram count vector (``array<double>``, length
    ``n_features``) built IN-ROW from the same bucket stream the
    scorer folds — train/serve featurization CANNOT drift because
    both read :func:`operators.quality.bigram_buckets`. The O(F·n)
    per-row count is training-side only (training corpora are
    samples); serving never materializes a vector at all."""
    bk = bigram_buckets(text_col, n_features=n_features, seed=seed)
    return F.transform(
        F.sequence(F.lit(0), F.lit(int(n_features) - 1)),
        lambda i: F.size(
            F.filter(bk, lambda x: x == i.cast("long"))
        ).cast("double"),
    )


@dataclass
class QualityClassifier:
    """Fitted linear quality model in both float (MLlib) and integer
    micro-unit (serving/oracle) forms, plus holdout metrics."""

    weights: list[float]
    intercept: float
    n_features: int
    seed: str
    metrics: dict[str, float] = field(default_factory=dict)

    @property
    def weights_micro(self) -> list[int]:
        return [int(round(w * SCALE)) for w in self.weights]

    @property
    def bias_micro(self) -> int:
        return int(round(self.intercept * SCALE))


def train_quality_classifier(
    docs: DataFrame,
    label: Column | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = QCLF_N_FEATURES,
    seed: str = QCLF_SEED,
    max_iter: int = 60,
    reg_param: float = 0.01,
    split_seed: str = "qclf-split",
) -> QualityClassifier:
    """Fit the hashed-bigram logistic regression.

    ``label`` defaults to the rule-tier teacher
    (:func:`rule_quality_label`); pass a 0/1 column for a real
    curated-vs-raw corpus. The holdout is a leakage-free
    ``group_split`` on ``id_col`` (80/20) — the q96 discipline, not
    row-level ``randomSplit``. Metrics: holdout AUC + accuracy, and
    train accuracy (gap = overfit signal).

    Shape: featurization is map-only; LBFGS iterations are
    ``treeAggregate`` passes over the (sampled) training frame —
    the standard MLlib scale path. The fitted model is returned as
    plain weights (float + micro-int), NOT a PipelineModel: serving
    is a column expression, so nothing java-serialized needs to
    survive."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    lab = label if label is not None else rule_quality_label(text_col)
    feat = docs.select(
        F.col(id_col),
        lab.alias("label"),
        array_to_vector(
            hashed_count_features(
                text_col, n_features=n_features, seed=seed
            )
        ).alias("features"),
    )
    split = group_split(
        feat, id_col, fractions={"train": 0.8, "valid": 0.2},
        seed=split_seed,
    )
    train = split.filter(F.col("split") == "train").localCheckpoint()
    valid = split.filter(F.col("split") == "valid").localCheckpoint()
    lr = LogisticRegression(
        maxIter=int(max_iter), regParam=float(reg_param)
    )
    model = lr.fit(train)

    def _acc(df: DataFrame) -> float:
        pred = model.transform(df)
        r = pred.agg(
            F.avg(
                (F.col("prediction") == F.col("label")).cast("double")
            ).alias("a")
        ).collect()[0]
        return float(r["a"])

    auc = BinaryClassificationEvaluator(
        metricName="areaUnderROC"
    ).evaluate(model.transform(valid))
    return QualityClassifier(
        weights=[float(w) for w in model.coefficients],
        intercept=float(model.intercept),
        n_features=int(n_features),
        seed=seed,
        metrics={
            "train_accuracy": _acc(train),
            "valid_accuracy": _acc(valid),
            "valid_auc": float(auc),
            "n_train": train.count(),
            "n_valid": valid.count(),
        },
    )
