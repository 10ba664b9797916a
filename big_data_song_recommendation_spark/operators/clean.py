"""Ingest hardening (SURVEY.md §2.2, P3-P9).

The reference hardens dirty CSV/JSON input with per-column Python
loops: cast-with-fallback (``src/spark/training.py:45-65``), then a
second pass replacing null/NaN/""/"NULL"/±inf with per-column defaults
(``src/spark/training.py:68-95``, repeated at ``:273-299``). Here the
whole pass is a single projection — one stage, no extra scans, fully
codegen'd — and reusable for any table.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: string sentinels the reference treats as missing (src/spark/training.py:85-95)
DEFAULT_SENTINELS: tuple[str, ...] = ("", "NULL", "null", "NaN")


def try_cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P3: cast columns with null-on-failure semantics (``try_cast``),
    the vectorized equivalent of the reference's per-column try/except
    cast loop. Columns absent from the frame are skipped (the
    reference's ``if col in df.columns`` defensive pattern)."""
    exprs = []
    for field in df.schema.fields:
        if field.name in casts:
            exprs.append(
                F.col(field.name).try_cast(casts[field.name]).alias(field.name)
            )
        else:
            exprs.append(F.col(field.name))
    return df.select(*exprs)


def _is_missing(col: Column, dtype: T.DataType, sentinels: tuple[str, ...]) -> Column:
    cond = col.isNull()
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        cond = (
            cond
            | F.isnan(col)
            | (col == float("inf"))
            | (col == float("-inf"))
        )
    if isinstance(dtype, T.StringType) and sentinels:
        cond = cond | F.trim(col).isin(*sentinels)
    return cond


def clean(
    df: DataFrame,
    defaults: dict[str, Any],
    *,
    sentinels: tuple[str, ...] = DEFAULT_SENTINELS,
) -> DataFrame:
    """P4: normalize missing values to per-column defaults in one
    projection.

    "Missing" means: NULL always; NaN/±inf for float columns; any of
    `sentinels` (trimmed) for string columns. ``defaults`` maps column
    name → replacement value; columns not listed pass through.
    """
    by_name = {f.name: f.dataType for f in df.schema.fields}
    exprs = []
    for name, dtype in by_name.items():
        col = F.col(name)
        if name in defaults:
            repl = F.lit(defaults[name]).cast(dtype)
            exprs.append(
                F.when(_is_missing(col, dtype, sentinels), repl)
                .otherwise(col)
                .alias(name)
            )
        else:
            exprs.append(col)
    return df.select(*exprs)


def drop_invalid(df: DataFrame, required: list[str]) -> DataFrame:
    """P5/P7: drop rows where any required column is missing (NULL, or
    NaN for floats) — the reference's conjunctive null-filter
    (``src/spark/training.py:301-316``) and key dropna
    (``src/data_processor.py:246``)."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    conds = []
    for name in required:
        col = F.col(name)
        c = col.isNotNull()
        if isinstance(by_name[name], (T.DoubleType, T.FloatType)):
            c = c & ~F.isnan(col)
        conds.append(c)
    return df.filter(reduce(lambda a, b: a & b, conds))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    *,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``) — the training-
    data rebalancing tool (downsample over-represented languages/
    sources before training). Seeded and executor-side; never
    collects."""
    return df.sampleBy(stratum_col, fractions, seed=seed)


def dedupe_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """P9: keep one row per key (``drop_duplicates(subset=keys)``).
    Spark's dropDuplicates keeps an arbitrary row; for deterministic
    results prefer :func:`keep_first_by`."""
    return df.dropDuplicates(keys)


def keep_first_by(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Deterministic P9: keep the first row per key under an explicit
    total order (window row_number == 1). This is what the driver-
    checked dedup queries use."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
