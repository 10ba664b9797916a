"""Column profiling operator — the table-stats pass every lakehouse
ingestion runs (null counts, cardinalities, ranges, medians) to drive
layout decisions (Z-order column choice, bucketing keys, skew alerts)
and data-quality monitors.

Plan shape: the order-statistics/null profile is ONE aggregate over
one scan (per-column expressions in a single ``agg``, unfolded into
per-column rows with an ``explode`` of literal-keyed structs). EXACT
distinct counts deliberately do NOT ride that aggregate: N
``countDistinct`` columns in one agg make Catalyst plan an Expand —
N+1× the scan rows pushed through every OTHER aggregate's update path
(measured at sf0.1: 3.3 s vs 0.5 s for the 6-column events profile).
They ride a second, PURE multi-distinct aggregate instead (2 scans
total): there the Expand is harmless — each expanded row feeds only
its own column's distinct partial, which collapses map-side to one
row per (column, value), so at 100 TB the shuffled state is one count
per distinct value, never an expanded fact row through the stats
path. (Round 5 shipped N per-column branch scans here; the split
two-aggregate form keeps the same shuffle volume at 2 scans.)

``approximate=True`` folds HLL ``approx_count_distinct`` back into the
single-pass aggregate (sketches don't need Expand) and swaps the exact
median for a ``percentile_approx`` sketch — the 100 TB mode: every
aggregate in that pass holds bounded state. (Exact mode's
``F.percentile`` buffers the column's values per aggregate — correct
and oracle-matched, but the buffering is why it is NOT the mode to
point at a 100 TB fact table.)

Measured at sf0.1 (bench protocol, noop write, warm): the exact
6-column events profile is ~0.7 s and the split buys scan COUNT
(7 scans → 2), not toy-scale wall — the cost is the distinct/sketch
aggregates themselves (multi-distinct ~0.4 s, HLL pass ~0.4 s), which
scans-share can't reduce. At 100 TB the scan count is what matters.
No reference twin — the reference never profiles its CSVs (it trusts
pandas dtypes, ref src/train_models.py:21-38); first-class addition
per the brief.
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
    """Profile ``cols`` (default: every non-complex column). Output
    one row per column: (col_name, n_rows, n_null, n_distinct,
    min_num, max_num, median, min_str, max_str) — numeric stats for
    numeric columns, string min/max for strings, formatted min/max
    for timestamps; inapplicable slots are NULL. ``approximate=True``
    swaps the exact per-column distinct branches for in-pass HLL
    sketches.
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
        aggs.append(F.count(col).alias(f"__nn_{c}"))
        if approximate:
            aggs.append(F.approx_count_distinct(col).alias(f"__nd_{c}"))
        if isinstance(t, _NUMERIC):
            d = col.cast("double")
            aggs.append(F.min(d).alias(f"__min_{c}"))
            aggs.append(F.max(d).alias(f"__max_{c}"))
            med = (
                # sketch median in approximate mode: percentile_approx
                # holds a bounded GK summary per column where exact
                # F.percentile buffers every value — the difference
                # between a profile you can run on a 100 TB fact table
                # and one you can't
                F.percentile_approx(d, F.lit(0.5), F.lit(10000))
                if approximate
                else F.percentile(d, F.lit(0.5))
            )
            aggs.append(med.alias(f"__med_{c}"))
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
            *(
                [F.col(f"__nd_{c}").alias("n_distinct")]
                if approximate
                else []
            ),
            _num(f"__min_{c}").alias("min_num"),
            _num(f"__max_{c}").alias("max_num"),
            _num(f"__med_{c}").alias("median"),
            _str(f"__smin_{c}").alias("min_str"),
            _str(f"__smax_{c}").alias("max_str"),
        )
        for c in cols
    ]
    stats = one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    if approximate:
        return stats.select(
            "col_name", "n_rows", "n_null", "n_distinct",
            "min_num", "max_num", "median", "min_str", "max_str",
        )

    # exact mode: ONE pure multi-countDistinct aggregate (its own
    # scan, separate from the stats agg). Catalyst's multi-distinct
    # rewrite Expands this scan N×, but with no other aggregate riding
    # along the expanded rows feed only the distinct partials, which
    # collapse map-side to one row per (column, value) — the same
    # shuffled state as N per-column branches, minus N-1 scans (the
    # 3.3 s Expand number in the module docstring was the COMBINED agg,
    # where min/max/percentile paid the expansion too; split like
    # this the Expand costs what the N branches cost — ~0.4 s at
    # sf0.1 — on ONE scan instead of N).
    dist = (
        df.agg(
            *[F.countDistinct(F.col(c)).alias(f"__nd_{c}") for c in cols]
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col_name"),
                            F.col(f"__nd_{c}").alias("n_distinct"),
                        )
                        for c in cols
                    ]
                )
            ).alias("__d")
        )
        .select("__d.col_name", "__d.n_distinct")
    )
    return stats.join(F.broadcast(dist), "col_name").select(
        "col_name", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "median", "min_str", "max_str",
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value_col: str = "value",
    tiebreak: str = "event_id",
    bins: int = 10,
    checkpoint: bool = True,
) -> DataFrame:
    """Population Stability Index drift report between a reference and
    a current population of ``value_col`` — the standard
    model-monitoring drift gate (PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted).

    Canonical PSI buckets: equi-depth edges from the REFERENCE
    population, computed as exact discrete percentiles (actual data
    values — engine-portable, the q28 two-phase-rank method; never an
    interpolated quantile). Every row of both populations is then
    binned by ``#(edges < v)`` against the broadcast 9-edge array, and
    shares are Laplace-smoothed ((c+1)/(n+bins)) so an empty current
    bin stays finite. The per-bin PSI term is also emitted as exact
    floor-scaled integer micro-units whose SUM is order-independent —
    ``psi_total`` is that integer sum rescaled, so the headline number
    is bit-stable even though ln() runs in doubles (the q118 ln-parity
    precedent).

    100 TB shape: one two-phase rank over the reference (the edges),
    one map-side bin + one 2×bins-cell aggregate over everything else.

    NULL ``value_col`` rows are excluded from BOTH populations: PSI is
    defined over the value distribution (a NULL landing on an edge
    rank would poison every bin via the ``e < v`` fold, and engines
    disagree on where NULL bins). Monitor NULL-rate drift as its own
    ratio check (e.g. :func:`null_profile`), not through PSI.

    ``checkpoint=True`` (default) cuts the REFERENCE population's
    lineage once (projected to the two columns PSI reads, lazy
    localCheckpoint): it has THREE consumers (the rank chain for the
    edges, the population count, the binning pass) that would
    otherwise each recompute the full upstream — for q141 that was
    most of the wall (the events scan + midpoint cross-join ran per
    consumer). Callers that already checkpointed their populations
    (the q141 shape: one tagged-population checkpoint feeds ref AND
    cur) pass ``checkpoint=False`` — everything downstream is then a
    cheap re-read of their blocks, and no second copy materializes.
    """
    from .ranks import bucketed_rank, with_equi_width_bucket

    v = F.col(value_col)
    ref = ref.filter(v.isNotNull()).select(tiebreak, value_col)
    cur = cur.filter(v.isNotNull())
    if checkpoint:
        ref = ref.localCheckpoint(eager=False)
    # the rank chain's own lineage-cut is redundant either way: ref is
    # a checkpoint (above) or the caller's — recomputing a filter over
    # those blocks is cheaper than materializing a second copy
    ranked = bucketed_rank(
        with_equi_width_bucket(ref, value_col),
        [v.asc(), F.col(tiebreak).asc()],
        ["__vb"],
        out="__rn",
        checkpoint=False,
    )
    n_ref_agg = ref.agg(F.count("*").alias("__n"))
    # edge rank = ceil(i·n/bins) in INTEGER arithmetic (i·n+bins-1 div
    # bins): float q·n puts 0.1·n a few ulps ABOVE the exact product,
    # so ceil() skips a rank whenever i·n divides evenly — the same
    # class of bug the ranks.py ntile `div` fix closed
    edge_picks = [
        F.min(
            F.when(
                F.col("__rn")
                == F.call_function(
                    "div",
                    F.lit(i) * F.col("__n") + F.lit(bins - 1),
                    F.lit(bins),
                ),
                v,
            )
        ).alias(f"__e{i}")
        for i in range(1, bins)
    ]
    edges = (
        ranked.crossJoin(F.broadcast(n_ref_agg))
        .agg(*edge_picks)
        .select(
            F.array(*[F.col(f"__e{i}") for i in range(1, bins)]).alias(
                "__edges"
            )
        )
    )

    def binned(df: DataFrame, tag: str) -> DataFrame:
        b = F.aggregate(
            F.col("__edges"),
            F.lit(0),
            lambda acc, e: acc + (e < v).cast("int"),
        )
        return df.crossJoin(F.broadcast(edges)).select(
            b.alias("bin"), F.lit(tag).alias("__p")
        )

    counts = (
        binned(ref, "ref")
        .unionByName(binned(cur, "cur"))
        .groupBy("bin")
        .agg(
            F.sum((F.col("__p") == "ref").cast("long")).alias("n_ref"),
            F.sum((F.col("__p") == "cur").cast("long")).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    rs = (F.col("n_ref") + 1) / (F.col("__tr") + bins)
    cs = (F.col("n_cur") + 1) / (F.col("__tc") + bins)
    term = (cs - rs) * F.log(cs / rs)
    micro = F.floor(term * F.lit(1_000_000.0)).cast("long")
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            stable_round(rs, 6).alias("ref_share"),
            stable_round(cs, 6).alias("cur_share"),
            stable_round(term, 6).alias("psi_term"),
            micro.alias("__micro"),
        )
        .withColumn(
            "psi_total",
            (F.sum("__micro").over(w_all).cast("double") / 1_000_000.0),
        )
        .drop("__micro")
    )


def embedding_centroid_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    vec_col: str = "embedding",
    group: list[str] | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Embedding-space drift between two corpus snapshots: per-group
    cosine between the ref and cur CENTROIDS, plus the mean-norm
    ratio — the vector-column counterpart of :func:`psi_report`
    (PSI bins scalars; an embedding drifts by direction and scale).

    Bit-parity discipline: raw double sums are order-dependent, so
    each component is floored to int64 micro-units
    (``floor(v·scale)``) and summed EXACTLY; dot products and squared
    norms of those sums are decimal(38,0) (hugeint in the DuckDB
    twin). Cosine is scale- and count-invariant (the micro-unit and
    1/n factors cancel), so it is computed directly on the exact sum
    vectors; only the final sqrt/divide touch doubles. Quantization
    shifts each centroid by < 1/scale per dimension — at
    scale=10⁶ the cosine error is < 10⁻⁴ for unit-normalized
    embeddings (document for your own scale).

    100 TB shape: one posexplode + one (group, dim)-grain aggregate
    per side — TWO scans total; the sums table is ``groups × dims``
    rows however large the corpora are, and everything after is
    arithmetic on that table. Row counts ride the same aggregate
    (every (group, dim) cell of a fixed-dimension embedding column
    counts exactly the group's rows) rather than paying two more
    scans; for RAGGED arrays the count is "rows carrying the
    most-populated dimension" — clean your arrays first (the decode
    operators in multimodal.py emit fixed dims).

    Returns per group: ``n_ref``, ``n_cur``, ``centroid_cos``
    (6-dec floored), ``mean_norm_ratio`` (cur/ref, 6-dec floored).
    """
    g = list(group or [])

    def _sums(df: DataFrame, tag: str) -> DataFrame:
        e = df.select(
            *g, F.posexplode(F.col(vec_col)).alias("dim", "__v")
        )
        q = F.floor(F.col("__v").cast("double") * F.lit(float(scale))).cast(
            "long"
        )
        # the per-cell row count IS the group size for fixed-dim
        # arrays — carrying it here saves two whole-table scans
        return e.groupBy(*g, "dim").agg(
            F.sum(q).alias(f"s_{tag}"), F.count("*").alias(f"c_{tag}")
        )

    sa, sb = _sums(ref, "ref"), _sums(cur, "cur")
    dec = "decimal(38,0)"
    # FULL outer + zero-fill: a group present in only one snapshot is
    # exactly the drift event a monitor must surface (a label fully
    # appeared or vanished) — an inner join would silently drop it.
    # Such groups emit n=0 on the missing side and NULL cos/ratio
    # (guarded below), mirroring the DuckDB oracle's handling.
    joined = sa.join(sb, [*g, "dim"], "full").na.fill(
        {"s_ref": 0, "c_ref": 0, "s_cur": 0, "c_cur": 0}
    )
    stats = joined.groupBy(*g).agg(
        F.sum(
            F.col("s_ref").cast(dec) * F.col("s_cur").cast(dec)
        ).alias("__dot"),
        F.sum(F.col("s_ref").cast(dec) * F.col("s_ref").cast(dec)).alias(
            "__na"
        ),
        F.sum(F.col("s_cur").cast(dec) * F.col("s_cur").cast(dec)).alias(
            "__nb"
        ),
        F.max("c_ref").alias("n_ref"),
        F.max("c_cur").alias("n_cur"),
    )
    cos = F.col("__dot").cast("double") / (
        F.sqrt(F.col("__na").cast("double"))
        * F.sqrt(F.col("__nb").cast("double"))
    )
    # mean-norm ratio: (‖Σcur‖/n_cur) / (‖Σref‖/n_ref) — the scale
    # factors cancel; counts re-enter because the ratio compares MEAN
    # vectors, which cosine never needed
    ratio = (
        F.sqrt(F.col("__nb").cast("double")) * F.col("n_ref")
    ) / (F.sqrt(F.col("__na").cast("double")) * F.col("n_cur"))
    # zero-denominator guards, identical in the DuckDB twin: cosine is
    # undefined when either centroid is the zero vector (a side absent
    # or all-zero); the ratio when the REF norm is zero or cur empty.
    # Explicit NULL on both engines beats the divergent div-by-zero
    # conventions (Spark NULL vs IEEE inf/NaN).
    cos_ok = (F.col("__na") > 0) & (F.col("__nb") > 0)
    ratio_ok = (F.col("__na") > 0) & (F.col("n_cur") > 0)
    return stats.select(
        *g,
        "n_ref",
        "n_cur",
        F.when(cos_ok, stable_round(cos, 6)).alias("centroid_cos"),
        F.when(ratio_ok, stable_round(ratio, 6)).alias("mean_norm_ratio"),
    )
