"""Column profiling operator — the table-stats pass every lakehouse
ingestion runs (null counts, cardinalities, ranges, medians) to drive
layout decisions (Z-order column choice, bucketing keys, skew alerts)
and data-quality monitors.

Single-pass design: ALL per-column statistics are expressions in ONE
``agg`` over one scan; the per-column rows are then unfolded from the
1-row aggregate with an ``explode`` of literal-keyed structs (pure
projection — no second scan, no shuffle beyond the aggregate's own).

Scale note: exact ``countDistinct`` over N columns makes Catalyst plan
an Expand (N× the scan rows into the partial aggregate). That is the
price of exactness the DuckDB oracle checks; at 100 TB you flip
``approximate=True`` and the same single pass uses HLL sketches
(``approx_count_distinct``) with no Expand. No reference twin — the
reference never profiles its CSVs (it trusts pandas dtypes,
ref src/train_models.py:21-38); first-class addition per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import stable_round

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approximate: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: every non-complex column) in one
    scan. Output one row per column: (col_name, n_rows, n_null,
    n_distinct, min_num, max_num, median, min_str, max_str) — numeric
    stats populated for numeric columns, string min/max for strings,
    formatted min/max for timestamps; inapplicable slots are NULL.
    ``approximate=True`` swaps exact distinct counts for HLL
    ``approx_count_distinct`` (the Expand-free 100 TB mode).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            n for n, t in fields.items()
            if not isinstance(t, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
        ]

    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        t = fields[c]
        col = F.col(c)
        nd = (
            F.approx_count_distinct(col) if approximate else F.countDistinct(col)
        )
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        aggs.append(nd.alias(f"__nd_{c}"))
        if isinstance(t, _NUMERIC):
            d = col.cast("double")
            aggs.append(F.min(d).alias(f"__min_{c}"))
            aggs.append(F.max(d).alias(f"__max_{c}"))
            aggs.append(F.percentile(d, F.lit(0.5)).alias(f"__med_{c}"))
        elif isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            aggs.append(F.date_format(F.min(col), _TS_FMT).alias(f"__smin_{c}"))
            aggs.append(F.date_format(F.max(col), _TS_FMT).alias(f"__smax_{c}"))
        elif isinstance(t, T.StringType):
            aggs.append(F.min(col).alias(f"__smin_{c}"))
            aggs.append(F.max(col).alias(f"__smax_{c}"))

    one = df.agg(*aggs)

    def _num(name: str) -> F.Column:
        return (
            stable_round(F.col(name), 4)
            if name in one.columns
            else F.lit(None).cast("double")
        )

    def _str(name: str) -> F.Column:
        return (
            F.col(name) if name in one.columns else F.lit(None).cast("string")
        )

    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            _num(f"__min_{c}").alias("min_num"),
            _num(f"__max_{c}").alias("max_num"),
            _num(f"__med_{c}").alias("median"),
            _str(f"__smin_{c}").alias("min_str"),
            _str(f"__smax_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
