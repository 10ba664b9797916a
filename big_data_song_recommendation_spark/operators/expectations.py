"""Declarative data-quality expectations (the deequ/Great-Expectations
pattern), computed in ONE aggregate pass over the table.

The reference validates data imperatively and per-column
(`src/spark/training.py:61-95` re-checks column presence and casts
inside try/except); production pipelines instead declare expectations
and evaluate them all in a single scan. That single-scan property is
the whole design: every check below compiles to a conditional
aggregate expression, Catalyst fuses them into one partial/final
hash-aggregate pair over one table read, and the result is a handful
of rows regardless of input size. Adding a check adds an expression,
never a pass — the deequ insight, re-expressed in DataFrame algebra.

Supported check kinds (spec = ``(kind, column, params…)``):

- ``("not_null", col)`` — metric: null count; pass iff 0.
- ``("unique", col)`` — metric: rows minus distinct values (approx
  duplicate count); pass iff 0. Uses count_distinct: multiple
  distincts in one aggregate plan via Expand (same cost model as the
  q86 profile queries).
- ``("range", col, lo, hi)`` — metric: count outside [lo, hi]
  (NULLs not counted — pair with not_null); pass iff 0.
- ``("accepted", col, [v…])`` — metric: count of non-NULL values
  outside the accepted set; pass iff 0.
- ``("min_rows", None, n)`` — metric: total row count; pass iff ≥ n.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _metric(spec: Sequence[Any]) -> Column:
    kind, col = spec[0], spec[1]
    if kind == "not_null":
        return F.sum(F.col(col).isNull().cast("long"))
    if kind == "unique":
        return F.count(col) - F.count_distinct(F.col(col))
    if kind == "range":
        lo, hi = spec[2], spec[3]
        return F.sum(
            ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))).cast("long")
        )
    if kind == "accepted":
        return F.sum(
            (~F.col(col).isin(list(spec[2])) & F.col(col).isNotNull()).cast(
                "long"
            )
        )
    if kind == "min_rows":
        return F.count(F.lit(1))
    raise ValueError(f"unknown check kind {kind!r}")


def _passed(spec: Sequence[Any], metric: Column) -> Column:
    if spec[0] == "min_rows":
        return metric >= F.lit(int(spec[2]))
    return metric == F.lit(0)


def expectation_audit(df: DataFrame, checks: Sequence[Sequence[Any]]) -> DataFrame:
    """Evaluate ``checks`` over ``df`` in one aggregate; return one row
    per check: ``(check, column, metric, passed)``.

    ``metric`` is the violation count (or row count for min_rows) —
    kept as a number, not just the boolean, so a monitoring sink can
    trend it. The one-row aggregate is crossed with a broadcast-local
    VALUES relation of check labels; no second scan, no collect.
    """
    agg_cols = [
        F.coalesce(_metric(c), F.lit(0)).cast("long").alias(f"__m{i}")
        for i, c in enumerate(checks)
    ]
    one = df.agg(*agg_cols)
    pairs: list[Column] = []
    for i, c in enumerate(checks):
        m = F.col(f"__m{i}")
        pairs += [
            F.lit(c[0]),
            F.lit(c[1] if c[1] is not None else "*"),
            m,
            _passed(c, m),
        ]
    return one.select(
        F.stack(
            F.lit(len(checks)),
            *pairs,
        ).alias("check", "column", "metric", "passed")
    )
