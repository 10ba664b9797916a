"""Corpus-curation operators for the LLM training-data pipeline:
Gopher-style repetition metrics, benchmark decontamination, and
deterministic stratified sampling.

Everything is DataFrame-native — explode/groupBy/window/join — so the
plans are plain shuffle-on-key aggregations that scale with executor
count. No Python in any hot path.

These have no reference twin (the reference's corpus is 10k songs,
ref src/train_models.py:21-38 loads it whole); they are the round-2
first-class additions the build brief mandates for 100 TB curation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as Ftext
from ..functions.scalars import int_array_lit, md5_bucket, stable_round
from .dedup import shingle_rows


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_bigram_max: float = 0.20,
    distinct_ratio_min: float = 0.30,
) -> DataFrame:
    """Per-document repetition signals (the Gopher quality-rule family,
    Rae et al. 2021 §A1.1): fraction of tokens covered by the most
    frequent word bigram, distinct-token ratio, and a boolean
    ``repetitive`` verdict from the caller's thresholds.

    Shape: one tokens explode + two aggregates keyed on the doc id —
    the window and both groupBys share the ``sid`` hash partitioning,
    so Catalyst plans a single exchange for the whole metric chain.
    Output: (doc_id, n_tokens, distinct_ratio, top_bigram,
    top_bigram_frac, repetitive).
    """
    bigrams = shingle_rows(df, id_col, text_col, 2)

    per_bigram = bigrams.groupBy("sid", "sh").agg(F.count("*").alias("c"))
    # argmax with deterministic tie-break on the bigram string
    w = Window.partitionBy("sid").orderBy(F.col("c").desc(), F.col("sh").asc())
    top = (
        per_bigram.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("sid", F.col("sh").alias("top_bigram"), F.col("c").alias("top_c"))
    )

    toks = df.select(
        F.col(id_col).alias("sid"),
        F.explode(Ftext.tokens(text_col)).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("sid").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )

    out = counts.join(top, "sid", "left")
    top_frac = F.when(
        F.col("n_tokens") >= 2,
        # a bigram covers 2 tokens; cap at 1.0 for the degenerate
        # all-same-token case where occurrences overlap. coalesce(top_c)
        # because least() skips NULLs: if the toks and shingle branches
        # ever tokenize differently, a missing top row must read as 0
        # coverage, not silently collapse to 1.0 (ADVICE r2).
        F.least(
            F.lit(1.0),
            F.coalesce(F.col("top_c"), F.lit(0)) * 2.0 / F.col("n_tokens"),
        ),
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.col("n_distinct") / F.col("n_tokens")
    return out.select(
        F.col("sid").alias(id_col),
        "n_tokens",
        stable_round(distinct_ratio, 4).alias("distinct_ratio"),
        "top_bigram",
        stable_round(top_frac, 4).alias("top_bigram_frac"),
        (
            (top_frac > F.lit(top_bigram_max))
            | (distinct_ratio < F.lit(distinct_ratio_min))
        ).alias("repetitive"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag corpus documents sharing >= ``min_overlap`` distinct k-word
    shingles with any benchmark document — the standard n-gram
    decontamination pass (GPT-3 appendix C / PaLM §7) run before
    training on scraped data.

    Shape: distinct shingle sets on both sides, one equi-join on the
    shingle string, two map-side-combinable counts. The join key is the
    shingle itself, so hot boilerplate shingles are the skew risk —
    bounded upstream because benchmark sets are small and deduped; AQE
    skew-join covers the rest. Output: (doc_id, n_overlap,
    n_bench_docs) for contaminated docs only.
    """
    corpus_sh = shingle_rows(corpus, id_col, text_col, k).distinct()
    bench_sh = (
        shingle_rows(benchmark, id_col, text_col, k)
        .withColumnRenamed("sid", "bench_id")
        .distinct()
    )
    hits = corpus_sh.join(bench_sh, "sh", "inner")
    return (
        hits.groupBy("sid")
        .agg(
            F.countDistinct("sh").alias("n_overlap"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_overlap") >= min_overlap)
        .withColumnRenamed("sid", id_col)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(key || ':' || seed) % 10000 < fraction * 10000`` for its
    stratum. Unlike ``df.sampleBy`` (Bernoulli on a partition-order
    RNG), this is replayable across runs, engines, and repartitioning —
    the property a training-data pipeline needs so a re-run selects the
    SAME corpus subset.

    The fraction lookup compiles to a CASE chain (strata counts are
    small by definition); the filter rides the scan, so at 100 TB this
    is a pushdown-friendly single pass with no shuffle at all.

    Thresholds are integerized at plan-build time (``round(f*10000)``
    in Python) so no engine-side double->int cast is involved — Spark
    truncates that cast while DuckDB rounds, a silent parity trap.
    """
    bucket = md5_bucket(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + seed))
    ) % 10000

    thr = F.lit(int(round(default_fraction * 10000)))
    for stratum, f in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(f * 10000)))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-doc average bigram log2-probability under a corpus-trained
    add-k-smoothed bigram LM — the self-supervised perplexity proxy
    for quality-ranking a corpus when no external LM is available
    (the CCNet filtering idea, Wenzek et al. 2020, with the corpus
    itself as the model). Low scores = improbable token transitions:
    gibberish, boilerplate soup, wrong-language fragments.

    ``P(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V)``, with context
    counts c(w1 ·) = bigram-initial occurrences (so the smoothed
    conditional sums to 1 over the V distinct successor words).

    Shape: ONE shingle pass feeds a doc-grain bigram aggregate, from
    which the corpus bigram table, the context table and the 1-row V
    aggregate all derive (strictly smaller inputs each step — no
    second corpus scan). Scoring joins key on the bigram string / the
    context word: hot function-word bigrams are the skew risk, AQE
    skew-join splits them; both model tables are dims a cluster would
    broadcast when they fit. Output: (id, n_bigrams, avg_logp
    [stable_round 4]).
    """
    big = shingle_rows(df, id_col, text_col, 2)
    # two consumers (the model-table derivation chain and the scoring
    # join) — cut the doc-grain bigram counts once (r12: the stage
    # profile showed the full shingle explode+count pass duplicated)
    doc_bg = (
        big.groupBy("sid", "sh")
        .agg(F.count("*").alias("n_occ"))
        .localCheckpoint(eager=False)
    )
    bg = doc_bg.groupBy("sh").agg(F.sum("n_occ").alias("c12"))
    ctx = (
        bg.groupBy(F.substring_index("sh", " ", 1).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    vocab = (
        bg.select(F.substring_index("sh", " ", -1).alias("w2"))
        .distinct()
        .agg(F.count("*").alias("v"))
    )
    k = float(add_k)
    logp = F.log2(
        (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        doc_bg.join(bg, "sh")
        .withColumn("w1", F.substring_index("sh", " ", 1))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("logp", logp)
        .groupBy("sid")
        .agg(
            F.sum("n_occ").alias("n_bigrams"),
            stable_round(
                F.sum(F.col("n_occ") * F.col("logp")) / F.sum("n_occ"), 4
            ).alias("avg_logp"),
        )
        .select(F.col("sid").alias(id_col), "n_bigrams", "avg_logp")
    )


def lm_perplexity_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-grade perplexity filter (Wenzek et al. 2020) under the
    committed-artifact discipline: per-doc average trigram
    stupid-backoff score against the COMMITTED reference LM
    (ml/lm_counts.py — counts trained once offline;
    ml/lm.score_maps() derives each n-gram's integer micro score, and
    the q174 twin derives them from the SAME function, so the engines
    cannot drift), bucketed head/middle/tail by the committed
    training-corpus tertiles — the CCNet split that keeps head+middle
    and drops the tail. Upgrades :func:`bigram_lm_scores` (the
    self-supervised fallback trained on the corpus being scored) to a
    true reference-model filter with a longer context and backoff.

    Shape: tokens vocabulary-map to <unk> BEFORE n-grams form (staged
    projections — no captured expressions in the transform lambdas,
    the q163 discipline), trigram strings explode (explode_outer, so
    token-poor docs keep their zero-fill row without a second join),
    and the three backoff tiers resolve as LEFT broadcast-hash joins
    against the committed score tables (O(1) lookups — a literal-map
    CASE would linear-scan thousands of entries per row). One
    doc-keyed aggregate is the single exchange. Output: (id,
    n_trigrams, lm_score_micro, ppl_bucket); docs with < 3 tokens
    score 0 → 'tail' (explicit verdict, never a dropped row)."""
    from ..functions.text import normalized_text
    from ..ml import lm
    from ..ml import lm_counts as LMC

    from ..sources.readers import local_frame

    spark = df.sparkSession
    tri, bi23, uni = lm.score_maps()
    tri_df = local_frame(
        spark, list(tri.items()), "__kt string, __st long"
    )
    bi_df = local_frame(
        spark, list(bi23.items()), "__kb string, __sb long"
    )
    uni_df = local_frame(
        spark, list(uni.items()), "__ku string, __su long"
    )
    vocab = lm.vocab()

    staged = df.select(
        F.col(id_col),
        F.filter(
            F.split(normalized_text(text_col), " "), lambda t: t != ""
        ).alias("__tk"),
    ).withColumn(
        "__m",
        F.transform(
            F.col("__tk"),
            lambda t: F.when(t.isin(*vocab), t).otherwise(F.lit("<unk>")),
        ),
    )
    n = F.size("__m")
    tri_strs = F.transform(
        F.sequence(F.lit(1), n - F.lit(2)),
        lambda i: F.concat_ws(
            " ",
            F.element_at("__m", i),
            F.element_at("__m", i + 1),
            F.element_at("__m", i + 2),
        ),
    )
    rows = staged.withColumn(
        "__tris",
        F.when(n >= 3, tri_strs).otherwise(
            F.array().cast("array<string>")
        ),
    ).select(id_col, F.explode_outer("__tris").alias("__sh"))
    scored = (
        rows.join(
            F.broadcast(tri_df), rows["__sh"] == tri_df["__kt"], "left"
        )
        .join(
            F.broadcast(bi_df),
            F.substring_index("__sh", " ", -2) == bi_df["__kb"],
            "left",
        )
        .join(
            F.broadcast(uni_df),
            F.substring_index("__sh", " ", -1) == uni_df["__ku"],
            "left",
        )
        .withColumn(
            "__s", F.coalesce("__st", "__sb", "__su", F.lit(0).cast("long"))
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("__sh").alias("n_trigrams"),
        F.sum(F.when(F.col("__sh").isNotNull(), F.col("__s"))).alias("__ss"),
    )
    score = F.expr(
        "CASE WHEN n_trigrams > 0 THEN __ss DIV n_trigrams "
        "ELSE CAST(0 AS BIGINT) END"
    )
    bucket = (
        F.when(
            F.col("lm_score_micro") >= LMC.LM_HEAD_MIN_MICRO, F.lit("head")
        )
        .when(
            F.col("lm_score_micro") >= LMC.LM_MID_MIN_MICRO, F.lit("middle")
        )
        .otherwise(F.lit("tail"))
    )
    return (
        agg.withColumn("lm_score_micro", score)
        .withColumn("ppl_bucket", bucket)
        .select(id_col, "n_trigrams", "lm_score_micro", "ppl_bucket")
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    *,
    k: int = 10,
    seed: str = "es",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, per
    stratum — the Efraimidis–Spirakis A-ES scheme (Inf. Proc. Letters
    2006): draw u_i ~ U(0,1], rank by key u_i^(1/w_i), keep the top
    k. Computed in log space (``ln(u)/w`` — same order, no pow
    underflow). The corpus-mixing use: sample documents proportional
    to token count so a fixed-doc-count sample is unbiased in TOKENS.

    Deterministic + engine-portable: u derives from the seeded 60-bit
    md5 hash of the id (``(hash60+1)/2^60`` ∈ (0,1]), so reruns,
    partitionings and the DuckDB oracle all draw the same sample —
    the same replayability rule as ``stratified_sample`` (F6/F15:
    never Python ``random`` or ``F.rand`` in a checked pipeline).

    Shape: one hash + one per-stratum top-k window — rank-k selection
    shuffles only the stratum key; no global sort. Weights must be
    > 0 (caller filters); rows with larger weight get keys nearer 0
    and win more often. Output: input rows + ``rnk`` (1..k).
    """
    from .dedup import hash60

    u = (hash60(F.col(id_col).cast("string"), seed) + 1) / F.lit(2.0**60)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__es_key").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__es_key", F.log(u) / F.col(weight_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .drop("__es_key")
    )


def pack_sequences(
    df: DataFrame,
    strata_col: str,
    order_col: str,
    token_col: str,
    *,
    budget: int,
) -> DataFrame:
    """Greedy sequence packing: documents taken in a deterministic
    order are laid head-to-tail per stratum and cut into fixed
    ``budget``-token training sequences; each doc is assigned to the
    pack its FIRST token lands in — the concat-and-chunk packing an
    LLM data loader performs when it fills fixed-length contexts from
    variable-length documents.

    One window cumsum per stratum, integer arithmetic end to end (no
    float drift); the window's stratum partitioning is the only
    exchange, so packing 100 TB shards by (stratum) scales with
    executor count. Docs longer than ``budget`` still get one pack id
    (their START pack) — chunk oversized docs upstream
    (:func:`~..operators.dedup.chunk_dedup` grain) if per-pack token
    counts must be bounded. Output: input rows + ``pack_id``.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(cum_excl / F.lit(int(budget))).cast("long")
    )


def sequence_manifest(
    df: DataFrame,
    strata_col: str,
    order_col: str,
    token_col: str,
    *,
    budget: int,
) -> DataFrame:
    """Concat-then-chunk packing MANIFEST: documents laid head-to-tail
    per stratum (deterministic ``order_col`` order) and cut into fixed
    ``budget``-token sequences, emitting one row per (sequence,
    document) overlap with the exact token span — the loader map GPT-
    style pretraining uses to fill fixed-length contexts ACROSS
    document boundaries (:func:`pack_sequences` assigns whole docs to
    their start pack; this splits the boundary docs).

    Pure integer arithmetic: the stratum window's exclusive cumsum
    gives each doc its [start, end) interval in the global token
    stream; the doc overlaps sequences ``start div budget`` through
    ``(end−1) div budget`` (fan-out ≤ len/budget + 1, bounded), and
    each overlap's span is a greatest/least clamp. Zero-token docs are
    excluded (they occupy no stream positions). One stratum-keyed
    exchange — at petabyte scale swap the window for
    ranks.bucketed_cumsum (same contract, no whole-stratum task).

    Output: input columns + ``seq_id`` (0-based per stratum),
    ``doc_from``/``doc_to`` (token offsets WITHIN the doc, [from, to)),
    ``n_tokens_in_seq``."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    d = df.filter(F.col(token_col) > 0).select(
        "*", start.alias("__start")
    )
    end = F.col("__start") + F.col(token_col).cast("long")
    first = F.call_function("div", F.col("__start"), F.lit(budget))
    last = F.call_function("div", end - 1, F.lit(budget))
    spans = d.select(
        "*", F.explode(F.sequence(first, last)).alias("seq_id")
    )
    frm = F.greatest(F.col("__start"), F.col("seq_id") * budget)
    to = F.least(end, (F.col("seq_id") + 1) * budget)
    return spans.select(
        *df.columns,
        "seq_id",
        (frm - F.col("__start")).alias("doc_from"),
        (to - F.col("__start")).alias("doc_to"),
        (to - frm).alias("n_tokens_in_seq"),
    )


def group_split(
    df: DataFrame,
    group_col: str,
    *,
    fractions: dict[str, float] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Leakage-free train/valid/test assignment: every row of a GROUP
    (user, document, session) lands in the same split, decided by the
    seeded md5 bucket of the group key — the split discipline that
    row-level ``randomSplit`` (M5) violates for grouped data (a user's
    events scattered across train and test leak target information).

    Deterministic, replayable, partition-invariant, and engine-
    portable (same F6/F15 hashing rule as :func:`stratified_sample`/
    :func:`weighted_sample`): reruns and the DuckDB oracle assign
    identical splits, and new data joins the same split its group
    already lives in — no stored assignment table needed. Pure
    projection: zero shuffles. Output: input rows + ``split``.
    """
    from .dedup import hash60

    fr = fractions or {"train": 0.8, "valid": 0.1, "test": 0.1}
    if abs(sum(fr.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    bucket = hash60(F.col(group_col).cast("string"), seed) % 10000
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(fr.items())
    for name, f in head:
        acc += f
        cond = bucket < int(round(acc * 10000))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(last_name) if expr is None else expr.otherwise(F.lit(last_name))
    return df.withColumn("split", expr)


def dsir_scores(
    docs: DataFrame,
    target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
    n_buckets: int = 512,
    scale: int = 1_000_000,
    seed: str = "dsir",
    checkpoint: bool = True,
) -> DataFrame:
    """DSIR-style data selection scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much its hashed-n-gram profile looks like a
    TARGET distribution relative to the raw corpus, so a training
    pipeline can resample general crawl data toward a domain.

    Per DSIR: features are hashed bigrams (here ``md5``-derived 60-bit
    hash mod ``n_buckets`` — the engine's cross-engine-replayable hash
    discipline, F6/F15), and a document's weight aggregates per-bucket
    target-vs-raw evidence with add-one smoothing.  Deliberate
    deviation, documented: DSIR sums per-bucket LOG likelihood ratios;
    summing doubles is ORDER-DEPENDENT and would break bit-parity
    against any oracle, so the per-bucket score here is the integer
    ``((t_b+1)·scale) div (r_b+1)`` — a scaled linear likelihood-ratio
    surrogate, monotone in the same per-bucket ratio, exact in int64
    on BOTH engines (the global ``(T+B)/(R+B)`` normalizer is constant
    across buckets and cannot change any ranking, so it is dropped).
    The doc weight is the per-gram average ``div(Σ score, n_grams)``
    (long division both sides), length-normalized like DSIR's
    per-token logratio.

    Shape at 100 TB: one tokenize pass, bigrams built IN-ROW
    (``zip_with`` on the token array — no per-token explode before the
    grain is needed, no doc-keyed window), one (bucket) aggregate
    computing raw and target counts TOGETHER (conditional sum — one
    scan, map-side combinable), the ≤``n_buckets``-row score table
    broadcast back, one (doc) aggregate.  The only data-grain shuffles
    are the two aggregates.  int64 bound: per-bucket score ≤
    (t_b+1)·scale — at ~10¹² target grams per bucket drop ``scale`` or
    lift the product to decimal(38,0).

    The gram stream has two consumers (bucket counts, doc-grain
    join); ``checkpoint=True`` (default) cuts its lineage with a lazy
    ``localCheckpoint`` so tokenization runs ONCE — same tradeoffs as
    ``bucketed_rank``'s flag (blocks pinned until release, lineage
    can't recompute on executor loss).

    Returns one row per document with ≥1 bigram: ``id_col``,
    ``carry_cols``, ``n_bigrams``, ``weight_pt``.
    """
    carry = list(carry_cols or [])
    from .dedup import hash60

    toks = F.filter(Ftext.tokens(text_col), lambda t: t != F.lit(""))
    bigs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),  # NULL-propagating
        ),
        lambda x: x.isNotNull(),
    )
    grams = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        target.alias("__is_target"),
        F.explode(bigs).alias("__gram"),
    ).withColumn(
        "__b", hash60(F.col("__gram"), seed) % F.lit(int(n_buckets))
    )
    if checkpoint:
        # two consumers (the bucket counts and the doc-grain join)
        # would otherwise BOTH re-run the corpus-grain tokenize +
        # bigram explode — cut the lineage once, lazily (the
        # bucketed_rank discipline; same tradeoffs, see ranks.py)
        grams = grams.localCheckpoint(eager=False)
    counts = grams.groupBy("__b").agg(
        F.count("*").alias("__r"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__t"),
    )
    scores = counts.select(
        "__b",
        F.call_function(
            "div", (F.col("__t") + 1) * F.lit(int(scale)), F.col("__r") + 1
        ).alias("__score"),
    )
    return (
        grams.join(F.broadcast(scores), "__b")
        .groupBy(id_col, *carry)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("__score").alias("__w"),
        )
        .select(
            id_col,
            *carry,
            "n_bigrams",
            F.call_function("div", F.col("__w"), F.col("n_bigrams")).alias(
                "weight_pt"
            ),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    planes: int = 6,
    multiprobe: bool = True,
) -> DataFrame:
    """EMBEDDING-space decontamination — the semantic complement of
    the n-gram pass (:func:`decontaminate`, q71): flag corpus vectors
    whose cosine against ANY benchmark vector reaches ``threshold``.
    N-gram overlap misses paraphrases and translations; an embedding
    match catches them (the reason modern data cards report both).

    Shape (the srp_knn/q165 discipline, sides swapped to the
    decontamination asymmetry): benchmark sets are SMALL and bounded
    (eval suites — 10³–10⁵ rows), so the benchmark side carries the
    Hamming-1 multi-probe expansion (×(planes+1), still bounded) and
    BROADCASTS into the bucket equi-join against the corpus
    signatures; the corpus pays one signature pass and one
    bucket-join — never |corpus|·|benchmark| pairs. Exact cosine
    (6 dp, the q16 idiom) verifies every candidate, so a flagged row
    is court-grade; LSH only bounds RECALL, gated in q177 against the
    exhaustive blocked-GEMM truth (``dedup.embedding_dup_pairs``'s
    shape) on the test corpus. Everything derives from the
    deterministic md5 hyperplanes, so the whole path is
    cross-engine replayable (q75's oracle discipline).

    Returns ONE row per contaminated corpus vector: (``id_col``,
    ``bench_id`` — the argmax-sim benchmark match, ties to the
    smaller id — , ``sim``). Anti-join the output against the corpus
    for the clean training set."""
    from .similarity import _hamming1_buckets, srp_signatures
    from ..functions import vectors

    dim = vectors.infer_dim(corpus, vec_col)
    c_sig = srp_signatures(
        corpus, id_col=id_col, vec_col=vec_col, planes=planes
    )
    b_sig = srp_signatures(
        benchmark, id_col=id_col, vec_col=vec_col, planes=planes
    )
    c = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
        .withColumn("cn", F.sqrt(vectors.sq_norm_expanded("cv", dim)))
        .join(c_sig, id_col)
    )
    b = (
        benchmark.select(
            F.col(id_col).alias("bench_id"), F.col(vec_col).alias("bv")
        )
        .withColumn("bn", F.sqrt(vectors.sq_norm_expanded("bv", dim)))
        .join(
            b_sig.select(F.col(id_col).alias("bench_id"), "bucket"),
            "bench_id",
        )
    )
    if multiprobe:
        b = b.withColumn("bucket", F.explode(_hamming1_buckets(planes)))
    sim = vectors.dot_expanded("cv", "bv", dim) / (
        F.col("cn") * F.col("bn")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("sim"), F.asc("bench_id")
    )
    return (
        c.join(F.broadcast(b), "bucket")
        .withColumn("sim", F.round(sim, 6))
        .filter(F.col("sim") >= float(threshold))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "bench_id", "sim")
    )


def srp_balanced_sample(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 5,
    per_bucket: int = 8,
    seed: str = "smp",
) -> DataFrame:
    """Semantically balanced corpus sampling (the SemDeDup / cluster-
    balanced-selection pattern): partition the embedding space into
    2^planes SRP hyperplane buckets (deterministic — the same
    hash-derived hyperplanes as operators/similarity.srp_signatures,
    reproducible in any engine), then keep at most ``per_bucket`` rows
    per bucket by a deterministic md5-uniform order. Uniform sampling
    over-represents dense regions of embedding space; capping per
    semantic bucket flattens that, which is the point of
    cluster-balanced data selection for training corpora.

    Returns ``(id_col, bucket, smp_rank)`` for the kept rows only.

    100 TB shape: signatures are a bucketed GEMM keyed on the vector
    id (see srp_signatures); the per-bucket top-``per_bucket`` is one
    window over the bucket key — 2^planes partitions, each processed
    independently. Bucket sizes follow data density; if one bucket
    dominates, raise ``planes`` (finer cells) rather than salting —
    the cap bounds the *output*, and rank-only windows stream in one
    pass over each sorted partition.
    """
    from .dedup import hash60
    from .similarity import srp_signatures

    sigs = srp_signatures(df, id_col=id_col, vec_col=vec_col, planes=planes)
    w = Window.partitionBy("bucket").orderBy(
        hash60(F.col(id_col).cast("string"), seed), F.col(id_col)
    )
    return (
        sigs.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= int(per_bucket))
        .select(id_col, "bucket", "smp_rank")
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words_per_line: int = 3,
    min_lines_kept: int = 2,
    require_terminal_punct: bool = True,
    blacklist: tuple[str, ...] = (
        "javascript",
        "lorem ipsum",
        "cookie policy",
        "terms of use",
        "{",
    ),
    out_text: str = "clean_text",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) — the
    rule tier that runs BETWEEN extraction (functions/html.py) and the
    statistical gates (Gopher repetition q70, perplexity q85): keep a
    line only if it has ≥ ``min_words_per_line`` words, ends in
    terminal punctuation (``. ! ? "``), and contains no blacklist
    phrase (the classic javascript / lorem-ipsum / policy-page
    markers, matched case-insensitively); keep the DOCUMENT only if
    ≥ ``min_lines_kept`` lines survive.

    The operator is a map-only projection chain: the line split, the
    per-line predicate, the reassembly, and the counts are array
    lambdas (``F.filter`` / ``F.size`` / ``array_join``) — no explode,
    no shuffle, no re-keying join to rebuild documents, so at 100 TB
    it rides the scan like any other map (and whole-stage codegen
    keeps it JVM-side). Returns the input plus ``n_lines``,
    ``n_kept``, ``kept_doc`` and ``out_text`` (kept lines re-joined in
    order); callers filter on ``kept_doc`` — emitting the verdict
    instead of dropping rows keeps the operator auditable (the q78
    PII pattern).

    Plan note: the split array and the filtered array are materialized
    as STAGED projections, not inlined into each output column —
    codegen's common-subexpression elimination skips lambda-bearing
    expressions, so a single-projection form re-evaluates the entire
    upstream of ``text_col`` (e.g. q158's 20-regex extraction chain)
    once per derived column; the staging keeps each non-cheap alias
    multi-referenced, which also stops CollapseProject from undoing
    it (measured on q158: 2.35 s → single evaluation per row).
    """

    def keep(line: Column) -> Column:
        t = F.trim(line)
        cond = F.size(F.split(t, " +")) >= int(min_words_per_line)
        if require_terminal_punct:
            cond = cond & t.rlike('[.!?"]$')
        low = F.lower(t)
        for term in blacklist:
            cond = cond & ~low.contains(F.lit(term))
        return cond

    staged = df.select(
        "*", F.split(F.col(text_col), "\n").alias("__c4_lines")
    ).select("*", F.filter("__c4_lines", keep).alias("__c4_kept"))
    return staged.select(
        "*",
        F.size("__c4_lines").cast("long").alias("n_lines"),
        F.size("__c4_kept").cast("long").alias("n_kept"),
        (F.size("__c4_kept") >= int(min_lines_kept)).alias("kept_doc"),
        F.array_join("__c4_kept", "\n").alias(out_text),
    ).drop("__c4_lines", "__c4_kept")


def dedup_lines_within_doc(
    df: DataFrame,
    text_col: str = "text",
    *,
    normalize: bool = True,
    out_text: str = "dedup_text",
    audit_prefix: str = "",
) -> DataFrame:
    """Intra-document repeated-line removal (keep-FIRST occurrence) —
    the curation stage between C4's per-line rules
    (:func:`c4_line_filter`) and cross-document span dedup
    (``operators/dedup.duplicated_spans``): boilerplate that repeats
    WITHIN one page (nav bars top and bottom, duplicated footers,
    scraper stutter) never reaches the cross-doc stages, which key on
    content that repeats ACROSS documents.

    Keep-first on the line's comparison key — ``lower(trim(line))``
    when ``normalize`` (mirror headers differing only in case/padding
    collapse; repeated blank lines collapse to the first), the raw
    line otherwise. Survivors are re-joined in original order.

    Map-only, like the C4 stage it follows: the split, the normalized
    twin array, the keep-first filter, and the reassembly are all
    array lambdas — no explode, no shuffle, no re-keying join, so at
    100 TB it rides the scan. The keep-first test is
    ``array_position(norm, norm[i]) == i+1`` — O(lines²) per document
    in the worst case, fine at page grain (tens-to-hundreds of lines);
    a document with ≥10⁵ lines should be chunked upstream first
    (``operators/quality.pack_sequences`` note applies).

    Emits, never drops (the q78/q153 audit pattern): input columns
    plus ``n_lines``, ``n_kept_lines``, ``n_removed``, ``out_text``
    (audit names prefixed with ``audit_prefix`` so composers whose
    input already carries C4's ``n_lines`` can avoid the collision).

    No reference twin (ref's corpus is curated song metadata,
    src/data_processor.py:58-79 cleans fields, not pages); this is a
    §2.13 pipeline mandate op.
    """
    key = (lambda c: F.lower(F.trim(c))) if normalize else (lambda c: c)
    # staged projections (not inlined) — codegen skips CSE for
    # lambda-bearing expressions, the c4_line_filter plan note
    staged = df.select(
        "*", F.split(F.col(text_col), "\n").alias("__dl_lines")
    ).select("*", F.transform("__dl_lines", key).alias("__dl_norm"))
    kept = F.filter(
        "__dl_lines",
        lambda x, i: F.array_position(
            F.col("__dl_norm"), F.get("__dl_norm", i)
        )
        == (i + F.lit(1)).cast("long"),
    )
    staged = staged.select("*", kept.alias("__dl_kept"))
    return staged.select(
        "*",
        F.size("__dl_lines").cast("long").alias(f"{audit_prefix}n_lines"),
        F.size("__dl_kept")
        .cast("long")
        .alias(f"{audit_prefix}n_kept_lines"),
        (F.size("__dl_lines") - F.size("__dl_kept"))
        .cast("long")
        .alias(f"{audit_prefix}n_removed"),
        F.array_join("__dl_kept", "\n").alias(out_text),
    ).drop("__dl_lines", "__dl_norm", "__dl_kept")


def dedup_lines_across_corpus(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1,
    out_text: str = "clean_text",
    audit_prefix: str = "",
) -> DataFrame:
    """C4's GLOBAL line rule (Raffel et al. 2020 §2.2: lines that
    appear more than once IN THE DATA SET are discarded — every copy):
    count each normalized line (``lower(trim(line))``, the
    :func:`dedup_lines_within_doc` key) across the WHOLE corpus and
    remove all copies of any line whose count exceeds
    ``max_occurrences`` — the cookie banners, footers, and license
    blurbs shared by mirrors that the intra-doc pass cannot see.
    Empty lines are exempt (never counted, never removed): they carry
    no boilerplate signal and would otherwise all vanish together.

    Shape: one posexplode for the global counts (line-keyed shuffle),
    the hot set derives as ``count > max_occurrences`` — a tiny
    fraction of distinct lines by construction (only REPEATED
    boilerplate crosses the cap), so the anti-join back onto the line
    stream broadcasts under AQE; the doc rebuild is one id-keyed
    aggregate (order restored by the carried ``pos``). Hot lines are
    exactly the join's heavy keys and they sit on the SMALL side —
    the corpus side streams. A 100 TB corpus pays two exchanges
    (line counts, doc rebuild), both on spreadable keys.

    Emits, never drops (the q78/q153 audit pattern): ``id_col``, all
    carried input columns, ``n_lines``, ``n_kept_lines``,
    ``n_removed``, ``out_text`` (docs whose every line was hot keep a
    zero-fill row with ``out_text = ''``)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "__line"),
    ).withColumn("__key", F.lower(F.trim("__line")))
    hot = (
        lines.filter(F.col("__key") != "")
        .groupBy("__key")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > int(max_occurrences))
        .select("__key")
    )
    kept = lines.join(hot, "__key", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias(f"{audit_prefix}n_kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias(out_text),
    )
    return (
        df.withColumn(
            f"{audit_prefix}n_lines",
            F.size(F.split(F.col(text_col), "\n")).cast("long"),
        )
        .join(rebuilt, id_col, "left")
        .withColumn(
            f"{audit_prefix}n_kept_lines",
            F.coalesce(f"{audit_prefix}n_kept_lines", F.lit(0)),
        )
        .withColumn(out_text, F.coalesce(out_text, F.lit("")))
        .withColumn(
            f"{audit_prefix}n_removed",
            F.col(f"{audit_prefix}n_lines")
            - F.col(f"{audit_prefix}n_kept_lines"),
        )
    )


@dataclass(frozen=True)
class FrontDoorConfig:
    """Declarative stage list for the crawl front door (VERDICT r10
    #5): the nine CCNet-ordered stages as data — order FROZEN here,
    per-stage on/off and thresholds as fields — so new stages extend
    this object instead of widening ``crawl_front_door``'s signature,
    and a deployment can diff two configs the way it diffs any other
    artifact.

    Stage order (the q176 capstone order; ``stage_list()`` names the
    enabled subset): ``blocklist`` → ``mojibake_repair`` →
    ``extract`` → ``c4`` → ``line_dedup`` → ``url_dedup`` →
    ``quality`` → ``langid`` → ``lm_gate``. Gating stages (the ones
    that DROP documents) are blocklist, c4, url_dedup, and — when
    their thresholds are set — quality, langid, lm_gate;
    :func:`front_door_audit` accounts every input row to exactly one
    of them or to ``kept``."""

    id_col: str = "doc_id"
    html_col: str = "html"
    url_col: str | None = None
    blocked_domains: object = None  # list/tuple of domains or a 1-col DF
    blocked_url_patterns: tuple = ()
    fix_encoding: bool = False
    min_lines_kept: int = 2
    dedup_lines: bool = False
    #: CCNet's per-shard paragraph dedup: when set, every copy of a
    #: line repeated more than this many times WITHIN the batch is
    #: removed (:func:`dedup_lines_across_corpus` over the
    #: batch/shard — Wenzek et al. 2020 dedup paragraphs per shard
    #: BEFORE the LM scores). Non-gating: documents keep their rows
    #: (a doc reduced to nothing scores as empty downstream).
    batch_line_cap: int | None = None
    quality_weights: tuple | None = None
    min_score_micro: int | None = None
    langid_weights: tuple | None = None
    allowed_langs: tuple | None = None
    lm_buckets: tuple | None = None
    #: cut the extraction lineage with a lazy localCheckpoint (the
    #: measured 4x win for batch plans with four extraction
    #: consumers). Streaming callers pass False — a forever-process
    #: must not pin blocks per micro-batch (the near_dup_probe
    #: cut_lineage discipline; the round-11 soak caught the leak)
    cut_lineage: bool = True

    def stage_list(self) -> list[str]:
        """The enabled stages, in execution order — the declarative
        contract tests and audits pin against."""
        stages = []
        if self.blocked_domains is not None or self.blocked_url_patterns:
            stages.append("blocklist")
        if self.fix_encoding:
            stages.append("mojibake_repair")
        stages += ["extract", "c4"]
        if self.dedup_lines:
            stages.append("line_dedup")
        if self.batch_line_cap is not None:
            stages.append("batch_line_dedup")
        if self.url_col:
            stages.append("url_dedup")
        if self.quality_weights is not None:
            stages.append("quality")
        if self.langid_weights is not None:
            stages.append("langid")
        if self.lm_buckets is not None:
            stages.append("lm_gate")
        return stages

    def gate_list(self) -> list[str]:
        """The subset of stage_list() that can DROP a document."""
        gates = [
            s for s in self.stage_list() if s in ("blocklist", "c4", "url_dedup")
        ]
        if self.quality_weights is not None and self.min_score_micro is not None:
            gates.append("quality")
        if self.langid_weights is not None and self.allowed_langs:
            gates.append("langid")
        if self.lm_buckets is not None:
            gates.append("lm_gate")
        # re-sort into execution order
        order = [
            "blocklist", "c4", "url_dedup", "quality", "langid", "lm_gate"
        ]
        return [s for s in order if s in gates]


def crawl_front_door(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    url_col: str | None = None,
    min_lines_kept: int = 2,
    quality_weights: tuple[list[int], int] | None = None,
    min_score_micro: int | None = None,
    langid_weights: tuple[dict[str, list[int]], dict[str, int]] | None = None,
    allowed_langs: list[str] | None = None,
    blocked_domains=None,
    blocked_url_patterns: tuple[str, ...] = (),
    fix_encoding: bool = False,
    dedup_lines: bool = False,
    lm_buckets: tuple[str, ...] | None = None,
) -> DataFrame:
    """Keyword-argument shim over :func:`crawl_front_door_configured`
    — kept for call-site compatibility; the configuration IS the
    :class:`FrontDoorConfig`, and round-12+ stages land there, not
    here. See the configured form for the stage semantics."""
    return crawl_front_door_configured(
        df,
        FrontDoorConfig(
            id_col=id_col,
            html_col=html_col,
            url_col=url_col,
            blocked_domains=blocked_domains,
            blocked_url_patterns=tuple(blocked_url_patterns),
            fix_encoding=fix_encoding,
            min_lines_kept=min_lines_kept,
            dedup_lines=dedup_lines,
            quality_weights=quality_weights,
            min_score_micro=min_score_micro,
            langid_weights=langid_weights,
            allowed_langs=tuple(allowed_langs) if allowed_langs else None,
            lm_buckets=tuple(lm_buckets) if lm_buckets is not None else None,
        ),
    )


def crawl_front_door_configured(
    df: DataFrame, cfg: FrontDoorConfig
) -> DataFrame:
    """The crawl preprocessing stage, composed from a declarative
    :class:`FrontDoorConfig` (stage ORDER frozen in the class, on/off
    and thresholds in the instance): HTML → text extraction
    (functions/html.extract_text), C4 line cleaning
    (:func:`c4_line_filter` — documents failing the kept-lines gate
    drop here), and, when ``url_col`` is given, URL canonicalization
    plus within-batch canonical-URL dedup (smallest ``id_col`` wins —
    deterministic). The output carries ``text`` (the cleaned
    extraction — replacing any existing text column), ``n_lines``/
    ``n_kept`` audit counts, and ``canonical_url``.

    Map-only + (with url dedup) one window: every stage is column
    expressions, so the same callable preprocesses a batch table or a
    streaming micro-batch (plug it into streaming.jobs.CurationSink's
    ``preprocess`` hook — the content fingerprint store then
    deduplicates the CLEANED text, which is the right key: chrome
    differences between mirrors are gone by the time fingerprints are
    taken). With ``quality_weights=(weights_micro, bias_micro)`` the
    committed learned classifier (``ml.quality_clf``) scores the
    cleaned text as a final map-only stage — appending ``n_bigrams``/
    ``score_micro``/``is_quality`` and, when ``min_score_micro`` is
    set, dropping below-threshold documents. With ``blocked_domains``/
    ``blocked_url_patterns`` the URL blocklist stage
    (:func:`url_blocklist_filter`) runs FIRST — the cheapest
    reject, before the regex-heavy extraction ever sees the page.
    ``fix_encoding`` repairs cp1252 mojibake in the RAW html before
    extraction (functions/text.repair_mojibake); ``dedup_lines``
    collapses intra-doc repeated lines after the C4 stage
    (:func:`dedup_lines_within_doc`, appending ``n_dup_lines``) —
    both map-only, so the micro-batch plan stays shuffle-free.
    ``lm_buckets=('head', 'middle')`` appends the committed trigram
    LM's perplexity verdict LAST (the CCNet stage order) and keeps
    only those buckets — the one stage that aggregates (see the
    inline note).

    The extraction output is cut with a lazy localCheckpoint before
    the C4 stage: the ~20-regex extraction chain is the dominant cost
    and has FOUR downstream consumers (the kept-gate filter predicate
    after pushdown, plus the three C4 audit columns — lambda-bearing
    expressions, which codegen's subexpression elimination skips), so
    without the cut it re-runs per consumer (measured 4.5 s → ~1 s on
    q158 at sf0.1). The materialized slice is the doc batch itself —
    exactly the multi-consumer pattern the roster checkpoints
    everywhere else."""
    from pyspark.sql import Window

    from ..functions.html import extract_text

    id_col, html_col, url_col = cfg.id_col, cfg.html_col, cfg.url_col
    if cfg.blocked_domains is not None or cfg.blocked_url_patterns:
        if url_col is None:
            raise ValueError(
                "crawl_front_door: URL blocking needs url_col"
            )
        # the cheapest reject, BEFORE the regex-heavy extraction runs
        df = (
            url_blocklist_filter(
                df,
                cfg.blocked_domains if cfg.blocked_domains is not None else [],
                url_col=url_col,
                blocked_url_patterns=cfg.blocked_url_patterns,
            )
            .filter(F.col("kept_url"))
            .drop("url_domain", "blocked_domain", "blocked_pattern", "kept_url")
        )

    if cfg.fix_encoding:
        # encoding errors live in the raw bytes: repair the HTML before
        # the extraction regexes see it (map-only, q170's chain)
        from ..functions.text import repair_mojibake

        df = df.withColumn(html_col, repair_mojibake(html_col))
    ext = df.withColumn("__x", extract_text(F.col(html_col)))
    if cfg.cut_lineage:
        ext = ext.localCheckpoint(eager=False)
    cleaned = c4_line_filter(
        ext,
        id_col,
        "__x",
        min_lines_kept=cfg.min_lines_kept,
        out_text="__clean",
    )
    out = (
        cleaned.filter(F.col("kept_doc"))
        .withColumn("text", F.col("__clean"))
        .drop("__x", "__clean", "kept_doc")
    )
    if cfg.dedup_lines:
        # intra-doc boilerplate (nav top+bottom, duplicated footers)
        # collapses here, BEFORE the canonical-dedup/quality/langid
        # stages key on the text — still map-only (q166's operator)
        out = (
            dedup_lines_within_doc(
                out, "text", out_text="__ddl", audit_prefix="__dl_"
            )
            .withColumn("text", F.col("__ddl"))
            .withColumnRenamed("__dl_n_removed", "n_dup_lines")
            .drop("__ddl", "__dl_n_lines", "__dl_n_kept_lines")
        )
    if cfg.batch_line_cap is not None:
        # CCNet's per-shard paragraph dedup: boilerplate repeated
        # ACROSS the batch's documents drops before the canonical-url
        # / learned gates key on the text. One count shuffle + one
        # rebuild — the front door's only exchanges besides the LM
        # stage when enabled.
        out = (
            dedup_lines_across_corpus(
                out,
                id_col=id_col,
                text_col="text",
                max_occurrences=int(cfg.batch_line_cap),
                out_text="__blc",
                audit_prefix="__blc_",
            )
            .withColumn("text", F.col("__blc"))
            .withColumnRenamed("__blc_n_removed", "n_batch_dup_lines")
            .drop("__blc", "__blc_n_lines", "__blc_n_kept_lines")
        )
    if url_col:
        from ..functions.url import canonical_url

        out = out.withColumn("canonical_url", canonical_url(F.col(url_col)))
        w = Window.partitionBy("canonical_url").orderBy(id_col)
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if cfg.quality_weights is not None:
        # learned curation stage (CCNet/GPT-3/LLaMA): score the CLEANED
        # text with the committed linear model — still map-only; when
        # min_score_micro is set, below-threshold docs drop here
        weights_micro, bias_micro = cfg.quality_weights
        scored = quality_model_scores(
            out,
            weights_micro,
            bias_micro,
            id_col=id_col,
            text_col="text",
            carry_cols=[c for c in out.columns if c != id_col],
        )
        out = scored
        if cfg.min_score_micro is not None:
            out = out.filter(
                F.col("score_micro") >= int(cfg.min_score_micro)
            )
    if cfg.langid_weights is not None:
        # learned language gate (the fastText-lid stage of CCNet-style
        # pipelines): label the CLEANED text with the committed
        # Bernoulli NB — another map-only fold appending ``pred_lang``;
        # when allowed_langs is set, off-language documents drop here.
        # The quality stage's score_micro is renamed around the scorer
        # (whose own score_micro/n_trigrams are discarded) so both
        # stages stay map-only — no collision join.
        from .langid import langid_model_scores

        w_micro, b_micro = cfg.langid_weights
        staged = out.withColumnsRenamed(
            {"score_micro": "__q_score", "n_bigrams": "__q_nb"}
        )
        out = (
            langid_model_scores(
                staged,
                w_micro,
                b_micro,
                id_col=id_col,
                text_col="text",
                carry_cols=[c for c in staged.columns if c != id_col],
            )
            .drop("n_trigrams", "score_micro")
            .withColumnsRenamed(
                {"__q_score": "score_micro", "__q_nb": "n_bigrams"}
            )
        )
        if cfg.allowed_langs:
            out = out.filter(
                F.col("pred_lang").isin(list(cfg.allowed_langs))
            )
    if cfg.lm_buckets is not None:
        # CCNet's final stage: perplexity against the committed
        # reference trigram LM (:func:`lm_perplexity_scores`), keep
        # only the requested buckets — canonically ('head', 'middle').
        # NOTE: unlike every stage above, this one aggregates (one
        # doc-keyed exchange for the trigram average + the id join
        # back), so enabling it makes the front-door micro-batch plan
        # carry its only shuffle — the documented cost of a
        # context-sensitive score no map-only fold can express.
        lm = lm_perplexity_scores(
            out.select(id_col, "text"), id_col=id_col, text_col="text"
        ).withColumnsRenamed(
            {"n_trigrams": "lm_n_trigrams"}
        )
        out = out.join(lm, id_col).filter(
            F.col("ppl_bucket").isin(list(cfg.lm_buckets))
        )
    return out


def front_door_verdicts(df: DataFrame, cfg: FrontDoorConfig) -> DataFrame:
    """Per-document stage accounting for the configured front door:
    every input row labeled with the FIRST gating stage that rejects
    it (``verdict`` ∈ :meth:`FrontDoorConfig.gate_list`) or NULL for
    kept — the no-drop twin of :func:`crawl_front_door_configured`
    (the url_blocklist_filter emits-never-drops pattern applied to
    the whole pipeline). One doc-grain pass: the text transformations
    run exactly once in the pipeline order, gates become flag
    expressions, and the only cross-document stage (canonical-URL
    dedup) conditions its winner on documents still alive at that
    point (min-alive-id per canonical_url — identical survivors to
    the dropping form, test-pinned). Returns (id_col, verdict)."""
    from pyspark.sql import Window

    from ..functions.html import extract_text

    id_col, html_col, url_col = cfg.id_col, cfg.html_col, cfg.url_col
    out = df
    verdict = F.lit(None).cast("string")
    if cfg.blocked_domains is not None or cfg.blocked_url_patterns:
        if url_col is None:
            raise ValueError("front_door_verdicts: URL blocking needs url_col")
        out = url_blocklist_filter(
            out,
            cfg.blocked_domains if cfg.blocked_domains is not None else [],
            url_col=url_col,
            blocked_url_patterns=cfg.blocked_url_patterns,
        )
        out = out.withColumn(
            "__verdict", F.when(~F.col("kept_url"), F.lit("blocklist"))
        ).drop("url_domain", "blocked_domain", "blocked_pattern", "kept_url")
    else:
        out = out.withColumn("__verdict", verdict)
    if cfg.fix_encoding:
        from ..functions.text import repair_mojibake

        out = out.withColumn(html_col, repair_mojibake(html_col))
    ext = out.withColumn("__x", extract_text(F.col(html_col)))
    if cfg.cut_lineage:
        ext = ext.localCheckpoint(eager=False)
    out = c4_line_filter(
        ext, id_col, "__x", min_lines_kept=cfg.min_lines_kept,
        out_text="__clean",
    ).withColumn(
        "__verdict",
        F.coalesce(
            F.col("__verdict"), F.when(~F.col("kept_doc"), F.lit("c4"))
        ),
    ).withColumn("text", F.col("__clean")).drop("__x", "__clean", "kept_doc")
    if cfg.dedup_lines:
        out = (
            dedup_lines_within_doc(
                out, "text", out_text="__ddl", audit_prefix="__dl_"
            )
            .withColumn("text", F.col("__ddl"))
            .drop("__ddl", "__dl_n_lines", "__dl_n_kept_lines", "__dl_n_removed")
        )
    if cfg.batch_line_cap is not None:
        # the dropping pipeline counts lines over SURVIVORS only, so
        # the no-drop twin must too: already-rejected docs' lines must
        # not push a survivor's line over the cap (the url_dedup
        # alive-conditioning rule applied to the batch counts)
        alive = out.filter(F.col("__verdict").isNull())
        gone = out.filter(F.col("__verdict").isNotNull())
        alive = (
            dedup_lines_across_corpus(
                alive,
                id_col=id_col,
                text_col="text",
                max_occurrences=int(cfg.batch_line_cap),
                out_text="__blc",
                audit_prefix="__blc_",
            )
            .withColumn("text", F.col("__blc"))
            .drop(
                "__blc", "__blc_n_lines", "__blc_n_kept_lines",
                "__blc_n_removed",
            )
        )
        out = alive.unionByName(gone.select(*alive.columns))
    if url_col:
        from ..functions.url import canonical_url

        w = Window.partitionBy("canonical_url")
        out = out.withColumn(
            "canonical_url", canonical_url(F.col(url_col))
        ).withColumn(
            "__min_alive",
            F.min(
                F.when(F.col("__verdict").isNull(), F.col(id_col))
            ).over(w),
        ).withColumn(
            "__verdict",
            F.coalesce(
                F.col("__verdict"),
                F.when(F.col("__min_alive") != F.col(id_col), F.lit("url_dedup")),
            ),
        ).drop("__min_alive")
    if cfg.quality_weights is not None:
        weights_micro, bias_micro = cfg.quality_weights
        out = quality_model_scores(
            out,
            weights_micro,
            bias_micro,
            id_col=id_col,
            text_col="text",
            carry_cols=[c for c in out.columns if c != id_col],
        )
        if cfg.min_score_micro is not None:
            out = out.withColumn(
                "__verdict",
                F.coalesce(
                    F.col("__verdict"),
                    F.when(
                        F.col("score_micro") < int(cfg.min_score_micro),
                        F.lit("quality"),
                    ),
                ),
            )
        out = out.drop("n_bigrams", "score_micro", "is_quality")
    if cfg.langid_weights is not None:
        from .langid import langid_model_scores

        w_micro, b_micro = cfg.langid_weights
        out = langid_model_scores(
            out,
            w_micro,
            b_micro,
            id_col=id_col,
            text_col="text",
            carry_cols=[c for c in out.columns if c != id_col],
        )
        if cfg.allowed_langs:
            out = out.withColumn(
                "__verdict",
                F.coalesce(
                    F.col("__verdict"),
                    F.when(
                        ~F.col("pred_lang").isin(list(cfg.allowed_langs)),
                        F.lit("langid"),
                    ),
                ),
            )
        out = out.drop("n_trigrams", "score_micro", "pred_lang")
    if cfg.lm_buckets is not None:
        lm = lm_perplexity_scores(
            out.select(id_col, "text"), id_col=id_col, text_col="text"
        ).select(id_col, "ppl_bucket")
        out = out.join(lm, id_col).withColumn(
            "__verdict",
            F.coalesce(
                F.col("__verdict"),
                F.when(
                    ~F.col("ppl_bucket").isin(list(cfg.lm_buckets)),
                    F.lit("lm_gate"),
                ),
            ),
        )
    return out.select(F.col(id_col), F.col("__verdict").alias("verdict"))


def front_door_audit(df: DataFrame, cfg: FrontDoorConfig) -> list[dict]:
    """Per-stage accounting rows for the configured front door —
    ``[{stage, n_in, n_rejected, n_kept}, ...]`` in gate order, where
    ``n_in`` of each gate equals ``n_kept`` of the previous one, the
    first ``n_in`` equals the input row count, and the last ``n_kept``
    equals :func:`crawl_front_door_configured`'s output count — every
    input row accounted to exactly one stage or to the survivors
    (the SOAK/observability contract, VERDICT r10 #7). Driver cost:
    one verdict pass + a ≤|gates|+1-row collect."""
    counts = {
        (r["verdict"] or "__kept"): r["n"]
        for r in front_door_verdicts(df, cfg)
        .groupBy("verdict")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    n_in = sum(counts.values())
    rows = []
    for stage in cfg.gate_list():
        rejected = counts.get(stage, 0)
        rows.append(
            {
                "stage": stage,
                "n_in": n_in,
                "n_rejected": rejected,
                "n_kept": n_in - rejected,
            }
        )
        n_in -= rejected
    return rows


# ---------------------------------------------------------------------------
# Model-based quality classifier (CCNet / GPT-3 / LLaMA curation stage)
# ---------------------------------------------------------------------------

QCLF_N_FEATURES = 256
QCLF_SEED = "qclf"


def bigram_buckets(
    text_col: Column | str,
    *,
    n_features: int = QCLF_N_FEATURES,
    seed: str = QCLF_SEED,
) -> Column:
    """Hashed-bigram bucket stream of a text column, IN-ROW: the
    token array's adjacent pairs (``zip_with`` against its own
    1-shifted slice — no explode, no window), each hashed with the
    engine's replayable md5-60 discipline (F6/F15, same as
    :func:`dsir_scores`) mod ``n_features``. NULL text yields an
    empty array (zero-fill discipline), so downstream ``aggregate``
    folds see a well-typed empty stream, never NULL."""
    from .dedup import hash60

    toks = F.filter(Ftext.tokens(text_col), lambda t: t != F.lit(""))
    bigs = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    return F.coalesce(
        F.transform(
            bigs, lambda g: hash60(g, seed) % F.lit(int(n_features))
        ),
        F.expr("array()").cast("array<bigint>"),
    )


def quality_model_scores(
    df: DataFrame,
    weights_micro: list[int],
    bias_micro: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: list[str] | None = None,
    seed: str = QCLF_SEED,
) -> DataFrame:
    """Score every document with a TRAINED linear quality classifier
    (``ml.quality_clf.train_quality_classifier``) as a pure column
    expression — the learned complement to the rule tiers (q22
    heuristics, q153 C4): CCNet / GPT-3 / LLaMA-style model-based
    curation, the standard stage between rule filters and dedup.

    The linear model's decision function over hashed-bigram COUNT
    features factorizes per occurrence:
    ``margin = b + Σ_buckets w[k]·count[k] = b + Σ_grams w[bucket(g)]``
    — so scoring needs NO feature vector at all, just one in-row fold
    over the gram stream adding the (broadcast-literal, integer
    micro-unit) weight of each gram's bucket. ``score_micro`` is an
    exact int64 both engines (the q131 DSIR integer-surrogate
    discipline: never hash raw double sums), ``is_quality`` is the
    sign of the margin.

    100 TB shape: MAP-ONLY — zero shuffles, zero Python; the weight
    table rides the plan as a constant-folded literal array (256
    ints), not even a broadcast join. Output: one row per input row
    (zero-bigram docs score the bare bias — never dropped):
    ``id_col``, ``carry_cols``, ``n_bigrams``, ``score_micro``,
    ``is_quality``.
    """
    carry = list(carry_cols or [])
    n = len(weights_micro)
    w_arr = int_array_lit(weights_micro)
    # staged projection: the bucket array has two consumers (size +
    # fold) and lambda-bearing exprs are skipped by codegen CSE —
    # multi-referenced alias keeps the tokenize chain single-run
    staged = df.withColumn(
        "__qclf_bk", bigram_buckets(text_col, n_features=n, seed=seed)
    )
    score = F.aggregate(
        F.col("__qclf_bk"),
        F.lit(int(bias_micro)).cast("long"),
        lambda acc, x: acc
        + F.element_at(w_arr, (x + 1).cast("int")).cast("long"),
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.size("__qclf_bk").cast("long").alias("n_bigrams"),
        score.alias("score_micro"),
        (score > 0).alias("is_quality"),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocked,
    *,
    url_col: str = "url",
    blocked_url_patterns: tuple[str, ...] = (),
) -> DataFrame:
    """URL-level filtering — the FIRST stage of the RefinedWeb/C4-class
    crawl pipelines (before extraction even runs, the cheapest reject):
    a document is flagged when its registrable domain
    (functions/url.registrable_domain over the parsed host) appears in
    the blocklist, or when the raw URL matches any blocked pattern
    (one alternation regex — keep patterns in the Java∩RE2 subset, the
    functions/url discipline).

    ``blocked``: a one-column ``domain`` DataFrame or a plain list of
    registrable domains. The join is a plain equi-join on the domain —
    real blocklists (UT1-class, ~10⁶–10⁷ domains) sit under the
    AQE auto-broadcast threshold as a dictionary-encoded single
    column, and when one doesn't, the same join degrades gracefully
    to a shuffle keyed on the domain (bounded by the blocklist, not
    the corpus). Emits, never drops (the q78 audit pattern):
    ``url_domain``, ``blocked_domain``, ``blocked_pattern``,
    ``kept_url``.

    Ref parity: the reference has no crawl layer (its corpus arrives
    curated); §2.13 front-door mandate — compose BEFORE
    :func:`crawl_front_door`."""
    from ..functions import url as Furl

    spark = df.sparkSession
    if isinstance(blocked, (list, tuple)):
        from ..sources.readers import local_frame

        bdf = local_frame(
            spark, [(d,) for d in blocked], "domain string"
        )
    else:
        bdf = blocked
    staged = df.withColumn(
        "url_domain", Furl.registrable_domain(Furl.host(F.col(url_col)))
    )
    hits = bdf.select(
        F.col("domain").alias("url_domain"),
        F.lit(True).alias("__blk"),
    ).distinct()
    out = staged.join(hits, "url_domain", "left").withColumn(
        "blocked_domain", F.coalesce(F.col("__blk"), F.lit(False))
    )
    if blocked_url_patterns:
        pat = "(" + "|".join(blocked_url_patterns) + ")"
        # coalesce: rlike(NULL) is NULL, and a NULL blocked_pattern
        # would make kept_url NULL → crawl_front_door's filter(kept_url)
        # silently drops the row, contradicting the emits-never-drops
        # audit contract. A NULL/unparseable URL carries no block
        # evidence, so the explicit verdict is kept (url_domain stays
        # NULL as the audit signal for downstream policy).
        out = out.withColumn(
            "blocked_pattern",
            F.coalesce(F.col(url_col).rlike(pat), F.lit(False)),
        )
    else:
        out = out.withColumn("blocked_pattern", F.lit(False))
    return out.withColumn(
        "kept_url",
        F.coalesce(
            ~F.col("blocked_domain") & ~F.col("blocked_pattern"), F.lit(False)
        ),
    ).drop("__blk")
