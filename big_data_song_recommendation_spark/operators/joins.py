"""Join operators (SURVEY.md §2.3, J1-J6).

Every dimension join broadcasts the small side explicitly — at 100 TB
the fact table never shuffles for a dim lookup. The fuzzy tiers of J4
are confined to broadcast-size dimensions by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import normalize_key


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    how: str = "left",
) -> DataFrame:
    """J1/J2: fact ⋈ broadcast(dim). The reference pre-renamed
    conflicting columns (``src/spark/training.py:173-188``); callers
    here pass pre-projected dims for the same reason."""
    return fact.join(F.broadcast(dim), on, how)


def normalized_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "left",
) -> DataFrame:
    """J3: equi-join on lower(trim(key)) — the tracks⋈emotions
    name join (``src/spark/training.py:211-228``) without its
    case-sensitivity bug."""
    return left.join(
        F.broadcast(right),
        normalize_key(left[left_key]) == normalize_key(right[right_key]),
        how,
    )


def fuzzy_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    payload: str,
    fallback: Column | None = None,
) -> DataFrame:
    """J4: tiered lookup — exact normalized match, then bidirectional
    substring containment, then an optional computed fallback
    (``src/data_processor.py:137-162``).

    The dim side must be broadcast-small (the reference's emotion map
    is); the containment tier is a broadcast nested-loop theta-join,
    which is acceptable only because dim is tiny — this mirrors the
    reference's O(n·m) scan but distributes the fact side.

    DICTIONARY RESOLUTION: the lookup is a pure function of the
    normalized fact key, so tiers are resolved once per DISTINCT key
    (an aggregate — map-side combinable, tiny output for the
    categorical keys this operator serves) and mapped back with one
    broadcast join. The previous shape threaded a per-row
    monotonically_increasing_id through the containment tier and
    re-joined the resolution on it — a full-fact-table shuffle that the
    distinct-key rewrite deletes. For genuinely high-cardinality keys
    the key dictionary stops being broadcastable and the resolution
    join falls back to a shuffle on the key — still strictly no worse
    than per-row resolution.

    Adds column ``payload`` (from dim) filled by the first tier that
    matches; ``{payload}_match_tier`` records which tier fired
    (exact/contains/fallback/none).

    ``fallback`` must be a KEY-INDEPENDENT expression (a literal, or
    built only from functions of literals): the dictionary rewrite
    evaluates it inside the per-distinct-key resolution, where fact
    columns are out of scope. A fallback referencing fact columns is
    rejected up front with a ``ValueError`` (instead of the opaque
    AnalysisException Catalyst would raise mid-plan), because the
    NULL-key path evaluates the fallback in a second scope and the two
    would silently diverge for non-literal expressions.
    """
    keys = fact.select(
        normalize_key(F.col(fact_key)).alias("__nk")
    ).distinct()
    if fallback is not None:
        try:  # resolvable against the key dictionary <=> key-independent
            keys.select(fallback)
        except Exception as exc:
            raise ValueError(
                "fuzzy_lookup_join: fallback must be a key-independent "
                "(literal) expression; it failed to resolve outside the "
                f"fact scope: {exc}"
            ) from None

    # tiers 1+2 in ONE broadcast pass: a single nested-loop join with
    # the union predicate (exact OR containment) against the tiny dim,
    # then one aggregate that separates the tiers per key. Exact-equal
    # rows are containment rows too, so tier 2's value is the min over
    # the non-exact matches — identical to the old two-join shape for
    # every key where tier 2's value is actually consulted (tier-1
    # misses have no exact row by definition). One dim broadcast and
    # one per-key aggregate replace two broadcasts + a join, a visible
    # job-count cut for a lookup whose cost is pure scheduling floor.
    d = dim.select(
        normalize_key(F.col(dim_key)).alias("__dk"),
        F.col(payload).alias("__p"),
    ).dropDuplicates(["__dk"])
    res = (
        keys.join(
            F.broadcast(d),
            (F.col("__nk") == F.col("__dk"))
            | F.col("__nk").contains(F.col("__dk"))
            | F.col("__dk").contains(F.col("__nk")),
            "left",
        )
        .groupBy("__nk")
        .agg(
            F.min(
                F.when(F.col("__nk") == F.col("__dk"), F.col("__p"))
            ).alias("__exact_payload"),
            F.min(
                F.when(F.col("__nk") != F.col("__dk"), F.col("__p"))
            ).alias("__contains_payload"),
        )
    )

    value = F.coalesce(
        F.col("__exact_payload"),
        F.col("__contains_payload"),
        *([fallback] if fallback is not None else []),
    )
    tier = (
        F.when(F.col("__exact_payload").isNotNull(), "exact")
        .when(F.col("__contains_payload").isNotNull(), "contains")
        .when(F.lit(fallback is not None) & value.isNotNull(), "fallback")
        .otherwise("none")
    )
    res = res.select(
        "__nk",
        value.alias("__val"),
        tier.alias("__tier"),
    )
    out = fact.join(
        F.broadcast(res), normalize_key(F.col(fact_key)) == F.col("__nk"), "left"
    )
    # a NULL fact key never joins the dictionary; apply the same
    # fallback/tier rule inline for those rows
    null_val = F.coalesce(*([fallback] if fallback is not None else [F.lit(None)]))
    return (
        out.withColumn(payload, F.coalesce(F.col("__val"), null_val))
        .withColumn(
            f"{payload}_match_tier",
            F.coalesce(
                F.col("__tier"),
                F.when(
                    F.lit(fallback is not None) & null_val.isNotNull(), "fallback"
                ).otherwise("none"),
            ),
        )
        .drop("__nk", "__val", "__tier")
    )


def _with_position(df: DataFrame) -> DataFrame:
    """Assign a global 1-based row position WITHOUT a global sort.

    zipWithIndex-style partition-offset arithmetic, kept declarative:
    (a) row_number within each input partition (distributed per-
    partition sorts over monotonically_increasing_id, which is
    order-preserving within a partition), (b) per-partition row counts
    — an aggregate of #partitions rows, (c) each partition's offset =
    sum of counts of earlier partitions via a broadcast triangle join
    on the tiny counts table. No single-partition Exchange anywhere:
    the old form's Window.orderBy(mid) pulled the FULL dataset onto
    one task, which dies at scale; here only the #partitions-row
    offsets table is ever centralized (broadcast).

    Positions follow partition order, matching the old global-sort
    semantics for any deterministically-ordered source (file scans).

    CONTRACT (pinned by tests/test_operators.py property test):

    - ALWAYS: positions are a bijection onto ``1..count()`` and every
      input row keeps its values — for ANY partition layout.
    - Row→position mapping is REPRODUCIBLE exactly when the input's
      partition layout and intra-partition order are deterministic:
      leaf file scans (split planning is a pure function of file
      sizes/config) and narrow transformations over them qualify;
      so does ``repartition(n)`` (Spark sorts round-robin batches for
      retry-determinism) — but the mapping then follows the NEW
      layout, not file order.
    - After a SHUFFLE whose reduce-side order is nondeterministic
      (joins/aggregations racing upstream tasks), two evaluations may
      assign different positions to tied rows. ``positional_join``
      callers pairing two such frames must materialize them first
      (cache/write) — the same rule ``zipWithIndex`` has always had.
    """
    from pyspark.sql import Window

    base = df.withColumn("__part", F.spark_partition_id())
    w = Window.partitionBy("__part").orderBy(F.monotonically_increasing_id())
    idx = base.withColumn("__idx", F.row_number().over(w))
    sizes = base.groupBy("__part").agg(F.count(F.lit(1)).alias("__n"))
    offsets = (
        sizes.alias("a")
        .join(
            F.broadcast(sizes.alias("b")),
            F.col("b.__part") < F.col("a.__part"),
            "left",
        )
        .groupBy(F.col("a.__part").alias("__part"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off"))
    )
    return (
        idx.join(F.broadcast(offsets), "__part")
        .withColumn("__pos", (F.col("__off") + F.col("__idx")).cast("long"))
        .drop("__part", "__idx", "__off")
    )


def positional_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """J6 done right: join by row position (the reference used a
    modulo into a collected list, ``src/app.py:233-245``), with
    scale-safe position assignment — see :func:`_with_position`.
    Note each side's plan is evaluated twice (index + counts
    branches); cache the inputs if they are expensive to recompute.
    """
    lw = _with_position(left)
    rw = _with_position(right)
    return lw.join(rw, "__pos", "inner").drop("__pos")
