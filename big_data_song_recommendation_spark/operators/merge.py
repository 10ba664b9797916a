"""MERGE-family operators: keyed upsert, conditional MERGE INTO, and
SCD2 change-history compaction.

Spark core has no MERGE statement (that's a table-format feature —
Delta/Iceberg implement it over their transaction logs); the RELATIONAL
semantics, though, are a join composition, and that is what a 100 TB
pipeline actually shuffles. These operators produce the post-merge
SNAPSHOT as a DataFrame; pair with ``sources/sinks.py`` writers (or a
table format) for persistence.

Scale shape: one shuffle on the merge keys for both sides (the same
cost MERGE pays in any engine). The source side of a CDC batch is
normally tiny relative to the target — Catalyst/AQE broadcasts it from
stats; nothing here forces a broadcast. Deterministic: within-batch
duplicate keys are resolved by an explicit ordering column, never by
arrival order.

The reference's closest analogue is the "reload and overwrite the
whole CSV" cycle (ref ``src/train_models.py:21-38``) — no keyed
updates at all; this is the engine-level superset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dedup_source(source: DataFrame, keys: list[str], order_by: str | None) -> DataFrame:
    """Collapse within-batch duplicates per key (last-writer-wins by
    ``order_by`` desc, ties broken by all-column struct for
    determinism). A CDC batch can carry several changes for one key;
    exactly one may win."""
    if order_by is None:
        return source.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_by).desc(),
        F.struct(*[c for c in source.columns if c != order_by]).desc(),
    )
    return (
        source.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    order_by: str | None = None,
) -> DataFrame:
    """Last-writer-wins keyed upsert: source rows replace matched
    target rows; unmatched source rows are inserted. Schemas must
    match. One outer join on the keys."""
    src = _dedup_source(source, keys, order_by)
    cols = target.columns
    # presence markers, NOT key-null checks: the join is null-SAFE, so
    # a legitimately-NULL key row must still read as present; and row
    # presence (not per-column coalesce) decides the value — a source
    # row that sets a column to NULL must really set it to NULL.
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = src.withColumn("__s", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    in_s = F.col("s.__s").isNotNull()
    picked = [
        (
            F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            if c not in keys
            else F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c)
        )
        for c in cols
    ]
    return joined.select(*picked)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    insert_not_matched: bool = True,
    order_by: str | None = None,
) -> DataFrame:
    """Conditional MERGE: the ANSI MERGE clauses as a join composition.

    - matched + ``when_matched_delete`` condition true → row dropped;
    - matched otherwise → ``when_matched_update`` expressions applied
      (columns not listed keep the target value); expressions may
      reference ``t.<col>`` and ``s.<col>``;
    - source-only rows → inserted when ``insert_not_matched``;
    - target-only rows → kept verbatim.

    Returns the post-merge snapshot with a ``__merge_action`` column
    (kept/updated/inserted) so callers can audit row provenance — drop
    it before writing."""
    src = _dedup_source(source, keys, order_by)
    cols = target.columns
    # presence markers, not key-null checks (see upsert): NULL keys are
    # matchable under the null-safe join and must read as present
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = src.withColumn("__s", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    in_t = F.col("t.__t").isNotNull()
    in_s = F.col("s.__s").isNotNull()

    upd = when_matched_update or {}
    action = (
        F.when(in_t & in_s, F.lit("updated"))
        .when(in_s, F.lit("inserted"))
        .otherwise(F.lit("kept"))
    )
    out_cols = []
    for c in cols:
        matched_val = upd[c] if c in upd else F.col(f"t.{c}")
        val = (
            F.when(in_t & in_s, matched_val)
            .when(in_s, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
        )
        out_cols.append(val.alias(c))
    out = joined.select(*out_cols, action.alias("__merge_action"))
    if when_matched_delete is not None:
        # delete predicate evaluates in the joined scope; re-apply it
        # before projection so t./s. refs resolve
        keep = ~(in_t & in_s & when_matched_delete)
        out = joined.filter(keep).select(*out_cols, action.alias("__merge_action"))
    if not insert_not_matched:
        out = out.filter(F.col("__merge_action") != "inserted")
    return out


def scd2_compact(
    changes: DataFrame,
    keys: list[str],
    tracked: str,
    ts_col: str = "ts",
    tie_breaks: list[str] | None = None,
) -> DataFrame:
    """Batch change-capture → SCD2 validity intervals: order each key's
    change stream by time, keep rows where ``tracked`` actually changed
    (run-length compaction), and emit
    ``(keys…, tracked, valid_from, valid_to, is_current)`` with
    half-open intervals (``valid_to`` = next change's ``valid_from``,
    NULL while current).

    One window shuffle on the keys; both the change-detect lag and the
    interval lead share the same (keys, ts) sort, so Catalyst plans a
    single Exchange+Sort for the whole history build. This is the
    standard dimension-history table a warehouse maintains; the same
    plan applied per micro-batch (with the current snapshot unioned in)
    is incremental SCD2.

    ``tie_breaks``: extra ordering columns for non-unique timestamps —
    without a total order per key the compaction is nondeterministic.

    Delegates to :func:`operators.scd.collapse_runs` — the single
    gaps-and-islands implementation in the repo (q133 exposes the
    versioned superset view). The delegation also fixes a NULL-run
    defect of the original filter form here: ``lag(tracked) IS NULL``
    conflated "first row of the key" with "previous state was NULL",
    so a run of NULL states emitted one interval per observation;
    collapse_runs detects the first row with a lagged constant and
    keeps a NULL run as ONE interval. Payload columns other than
    ``keys``/``tracked`` are not carried through (select them off the
    interval table by joining back on (keys, valid_from) if needed)."""
    from .scd import collapse_runs

    runs = collapse_runs(
        changes,
        keys=keys,
        state_col=tracked,
        ts_col=ts_col,
        tiebreak=tie_breaks,
    )
    return runs.select(
        *keys,
        F.col("state").alias(tracked),
        "valid_from",
        "valid_to",
        "is_current",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Table reconciliation between two snapshots of the same entity —
    the data-diff a lakehouse runs after every load to audit what a
    batch actually did (and the MERGE-family's verification twin:
    upsert writes, snapshot_diff proves).

    One full-outer join on the key; per-row verdict:
    ``added`` (key only in new), ``removed`` (only in old),
    ``changed`` (present in both, any compare column differs under
    null-safe equality), ``unchanged``. Output: key cols + verdict +
    n_changed_cols. The join shuffles both sides once on the key —
    at 100 TB this is the same exchange profile as the MERGE that
    produced the snapshot; bucketed layouts (sources/bucketing.py)
    elide it entirely.
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    n_diff = None
    for c in compare_cols:
        d = (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).cast("int")
        n_diff = d if n_diff is None else n_diff + d
    verdict = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(n_diff > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in key_cols
        ],
        verdict.alias("verdict"),
        F.when(
            F.col("__in_old").isNull() | F.col("__in_new").isNull(), F.lit(0)
        )
        .otherwise(n_diff)
        .alias("n_changed_cols"),
    )
