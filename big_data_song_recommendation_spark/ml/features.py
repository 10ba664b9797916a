"""Feature pipeline (SURVEY.md §2.9, M1-M4, M11-M12).

Mirrors the reference's assembler→scaler pipeline
(``src/spark/training.py:327-375``) and its sklearn TF-IDF twin
(``src/training_service.py:608-614``), as declared MLlib stages —
fit once, transform anywhere, save/load natively.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame


def feature_pipeline(
    numeric_cols: list[str],
    *,
    output_col: str = "scaled_features",
    with_mean: bool = True,
    with_std: bool = True,
) -> Pipeline:
    """M1+M2+M4: VectorAssembler(handleInvalid="skip") → StandardScaler.

    The reference's fallback pipeline on failure
    (``src/spark/training.py:341-375``) is unnecessary here: declared
    input schemas + the clean() operator guarantee assembler inputs.
    """
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(numeric_cols), outputCol="__raw_features", handleInvalid="skip"
    )
    scaler = StandardScaler(
        inputCol="__raw_features",
        outputCol=output_col,
        withMean=with_mean,
        withStd=with_std,
    )
    return Pipeline(stages=[assembler, scaler])


def string_indexer(col: str, out: str | None = None):
    """M3: StringIndexer with handleInvalid="skip"
    (``src/spark/training.py:468-469``)."""
    from pyspark.ml.feature import StringIndexer

    return StringIndexer(
        inputCol=col, outputCol=out or f"{col}_index", handleInvalid="skip"
    )


def tfidf_pipeline(
    text_col: str,
    *,
    vocab_size: int = 100,
    output_col: str = "tfidf_features",
) -> Pipeline:
    """M11: Tokenizer → StopWordsRemover → CountVectorizer(vocabSize)
    → IDF. CountVectorizer (not HashingTF) matches the reference's
    TfidfVectorizer(max_features=100): a real top-N vocabulary."""
    from pyspark.ml.feature import IDF, CountVectorizer, StopWordsRemover, Tokenizer

    return Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="__tokens"),
            StopWordsRemover(inputCol="__tokens", outputCol="__filtered"),
            CountVectorizer(
                inputCol="__filtered", outputCol="__tf", vocabSize=vocab_size
            ),
            IDF(inputCol="__tf", outputCol=output_col),
        ]
    )


def concat_features(vector_cols: list[str], output_col: str = "features"):
    """M12: hstack of feature blocks = VectorAssembler over vectors."""
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=list(vector_cols), outputCol=output_col)


def fit_transform(pipeline: Pipeline, df: DataFrame) -> tuple[PipelineModel, DataFrame]:
    model = pipeline.fit(df)
    return model, model.transform(df)
