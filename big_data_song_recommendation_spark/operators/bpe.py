"""Distributed BPE tokenizer training (Sennrich et al. 2016) — learn
subword merge rules ON the cluster, over the corpus the tokenizer will
serve.

The classic trainer is a driver-side loop over a word-frequency dict;
the distributed re-expression keeps the SAME algorithm but makes each
step a DataFrame aggregate:

1. ``word_frequency_table`` — one pass over the corpus: normalized
   words → ``(syms: array<string>, freq)``. This is the only
   corpus-grain scan; everything after runs on the VOCABULARY grain
   (distinct words), which is orders of magnitude smaller and bounded
   (Heaps' law), so per-merge cost does not grow with corpus size.
2. ``bpe_train`` — rounds of: weighted adjacent-pair count (in-row
   ``arrays_zip`` of the symbol array against its own shift — no
   per-symbol explode-then-window), then a BATCH of merges per round:
   the top-``batch_cap`` pairs come back in one small collect and the
   maximal provably-safe prefix (symbol-disjoint, strictly above the
   first rejected count — see ``_safe_batch``) is merged in a single
   chained greedy left-to-right in-row fold (``F.aggregate``) applied
   to every word. Driver actions scale with ROUNDS, not merges (a
   30k-merge vocabulary is a few hundred jobs, not 30k), and the
   batched sequence is pinned EQUAL to the one-at-a-time sequence by
   construction and by test; the data never leaves the executors.

The merge fold replicates the reference regex semantics (leftmost,
non-overlapping): folding left keeps ``[a,a,a]`` → ``[aa, a]`` under
the ``(a,a)`` merge because the freshly merged symbol no longer
equals the pair's left element.

Verified against a pure-Python reference trainer on the corpus
(tests/test_bpe.py) — the oracle-SQL route would need ``n_merges``
unrolled recursive list-rebuild CTEs, so this operator is
golden-pinned instead (the q40-q43 precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as Ftext

END_MARK = "</w>"


def word_frequency_table(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """``(word, syms, freq)`` over the normalized corpus: ``syms`` is
    the word split into single characters with the ``</w>`` end marker
    appended (so merges can learn word-final units)."""
    words = docs.select(
        F.explode(Ftext.tokens(text_col)).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "syms",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_MARK))),
        )
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the vocabulary table: the
    pair list is built IN-ROW (zip of the array against its own
    shift), so the only shuffle is the (left, right) aggregate."""
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("l"),
        F.slice("syms", 2, n - 1).alias("r"),
    )
    return (
        wf.filter(n >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def _newmax_table(wf: DataFrame) -> DataFrame:
    """Per-pair bound on any pair a merge could CREATE: ``newmax(a,b)
    = max(max_x triple(x,a,b), max_y triple(a,b,y))`` over weighted
    adjacent-triple counts. Built in-row like :func:`_pair_counts`
    (3-ary zip of the symbol array against its own shifts), one
    vocabulary-grain aggregate."""
    n = F.size("syms")
    triples = F.arrays_zip(
        F.slice("syms", 1, n - 2).alias("a"),
        F.slice("syms", 2, n - 2).alias("b"),
        F.slice("syms", 3, n - 2).alias("c"),
    )
    tc = (
        wf.filter(n >= 3)
        .select(F.col("freq"), F.explode(triples).alias("t"))
        .groupBy(
            F.col("t.a").alias("a"),
            F.col("t.b").alias("b"),
            F.col("t.c").alias("c"),
        )
        .agg(F.sum("freq").alias("tc"))
    )
    pre = tc.groupBy(
        F.col("b").alias("left"), F.col("c").alias("right")
    ).agg(F.max("tc").alias("__pre"))
    post = tc.groupBy(
        F.col("a").alias("left"), F.col("b").alias("right")
    ).agg(F.max("tc").alias("__post"))
    return pre.join(post, ["left", "right"], "full").select(
        "left",
        "right",
        F.greatest(
            F.coalesce("__pre", F.lit(0)), F.coalesce("__post", F.lit(0))
        ).alias("newmax"),
    )


def _pair_page(wf: DataFrame, cap: int) -> list:
    """The top-``cap`` pairs by (count desc, left, right) with their
    ``newmax`` bounds attached — ONE driver action per round."""
    page = (
        _pair_counts(wf)
        .orderBy(
            F.col("pair_count").desc(),
            F.col("left").asc(),
            F.col("right").asc(),
        )
        .limit(int(cap))
    )
    return (
        page.join(_newmax_table(wf), ["left", "right"], "left")
        .na.fill({"newmax": 0})
        .orderBy(
            F.col("pair_count").desc(),
            F.col("left").asc(),
            F.col("right").asc(),
        )
        .collect()
    )


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping merge of (left,right) in a
    symbol array — the in-row fold both the trainer and
    :func:`bpe_apply` use."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _sql_str(s: str) -> str:
    """Spark-SQL single-quoted string literal (default parser:
    backslash is the escape character)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_pair_sql(inner: str, left: str, right: str) -> str:
    """SQL text of :func:`merge_pair_expr` applied to the expression
    text ``inner`` — same fold, same CASE arms."""
    l, r, m = _sql_str(left), _sql_str(right), _sql_str(left + right)
    return (
        f"aggregate({inner}, cast(array() as array<string>), "
        f"(acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {l} "
        f"AND x = {r} THEN concat(slice(acc, 1, size(acc) - 1), array({m})) "
        f"ELSE concat(acc, array(x)) END)"
    )


def merge_rules_expr(col_name: str, rules) -> Column:
    """The WHOLE ordered rule chain as ONE parsed SQL expression.

    Semantically identical to folding :func:`merge_pair_expr` over the
    rules (each ``aggregate`` nests the previous one), but built in a
    single py4j ``expr`` parse instead of ~5 Column/lambda round trips
    per rule — PySpark's ``_create_lambda`` alone costs ~40 ms of py4j
    per higher-order call (r13 build profile: 0.89 s of q164's plan
    build was 16 merge folds), and the trainer + encoder build 16-24
    of these per query. Rules may be ``(left, right)`` or
    ``(left, right, count)`` tuples."""
    inner = f"`{col_name}`"
    for rule in rules:
        inner = _merge_pair_sql(inner, rule[0], rule[1])
    return F.expr(inner)


def _safe_batch(
    page: list, *, exact_sequence: bool = True
) -> list[tuple[str, str, int]]:
    """Maximal prefix of a count-sorted pair page that sequential BPE
    is GUARANTEED to pick in exactly this order, so a whole batch can
    be merged in one pass without changing the learned sequence.

    The exact interaction algebra of a merge ``(a,b) → ab``:

    - EXISTING pairs never gain occurrences; the only pairs that can
      LOSE any are those ending in ``a`` (an ``x a b`` run absorbs
      the ``a``) or starting with ``b`` (an ``a b y`` run absorbs the
      ``b``). A pair merely *starting with* ``a`` or *ending in*
      ``b`` is count-INVARIANT — its ``a`` is never followed by
      ``b``, its ``b`` never preceded by ``a``, so neither endpoint
      is ever absorbed.
    - every NEW pair contains a merged symbol, as ``(x, ab)`` with
      count ≤ max_x triple(x,a,b) or ``(ab, y)`` with count ≤
      max_y triple(a,b,y) — so ``newmax = max(both)`` (precomputed
      per candidate from the same vocabulary scan) bounds everything
      a merge can create, including later-round new-new pairs whose
      defining n-gram embeds the same triple.

    Scan rules (stop = end of batch; selection order == sequential
    pick order):

    1. STOP at the first candidate ending in a selected left or
       starting with a selected right — its count may have decreased
       by an unknown amount, so everything below it is unordered.
    2. STOP when a candidate's count is not STRICTLY above every
       selected pair's ``newmax`` — a created pair could tie it, and
       the tie-break against an unknown symbol is undecidable.
    2b. STOP at a candidate whose left or right STRING equals a
       symbol an earlier selection creates (``left+right``): pair
       counts are keyed by string and the same string can arise via
       two merge paths, so an EXISTING pair keyed on a just-created
       string can GAIN count — the one case the absorb/create algebra
       above doesn't cover.
    3. Otherwise select; counts of selected pairs are invariant under
       all earlier selected merges, so sequential picks them in
       exactly this (count desc, left, right) order.

    Pairs beyond a full page need no cutoff: the page is the global
    top-``cap`` under the total sort order, so an out-of-page pair
    ties a selected count only with a LOSING tie-break, and existing
    pairs never gain. Falls back to the plain argmax (first pair)
    when rule 2 rejects immediately — sequential semantics are then
    trivially preserved.

    ``exact_sequence=False`` is standard batched-BPE: rule 2 is
    dropped, and a pair at risk from an earlier selection is SKIPPED
    rather than ending the batch. Every selected pair still merges at
    its TRUE pre-batch count (each is count-invariant under all
    earlier-applied selections — the skip preserves that), but a
    skipped-or-created pair may have out-prioritized a later
    selection, so the learned sequence can deviate from one-at-a-time
    order (the vocabulary stays near-identical; pinned by test).
    Exact-sequence batching saturates near 2× on natural language
    (sequential picks a just-created pair within 2-3 steps —
    e → er → er</w> chains), so this is the mode that buys the
    30k-merge scale-out.
    """
    lefts: set[str] = set()
    rights: set[str] = set()
    created: set[str] = set()
    selected: list[tuple[str, str, int]] = []
    bound = -1
    for row in page:
        left, right, cnt = row["left"], row["right"], int(row["pair_count"])
        if right in lefts or left in rights:
            if exact_sequence:
                break
            continue
        # Aliasing guard: pair counts are keyed by symbol STRING, and
        # the same string can arise via two merge paths ('aba' from
        # (ab,a) and from (a,ba)). A candidate whose endpoint equals a
        # symbol an earlier selection CREATES is therefore not
        # count-invariant — an EXISTING pair keyed on that string can
        # gain occurrences from the newly minted symbol, a case rules
        # 1/2 don't model. Treat it like rule 1: end the exact batch,
        # skip in standard mode.
        if left in created or right in created:
            if exact_sequence:
                break
            continue
        if exact_sequence and selected and cnt <= bound:
            break
        selected.append((left, right, cnt))
        lefts.add(left)
        rights.add(right)
        created.add(left + right)
        bound = max(bound, int(row["newmax"]))
    if not selected and page:
        r = page[0]
        selected = [(r["left"], r["right"], int(r["pair_count"]))]
    return selected


def _merge_symbols(syms: list, left: str, right: str) -> list:
    """Driver-side twin of :func:`merge_pair_expr`'s fold (greedy
    leftmost non-overlapping) — kept next to it so they cannot
    drift."""
    out: list = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _train_collected(
    rows: list, n_merges: int
) -> list[tuple[str, str, int]]:
    """Classic one-at-a-time BPE over a COLLECTED vocabulary — the
    same count/tie-break/merge semantics as the distributed pager
    (count desc, then (left, right) lexicographic; UTF-8 byte order ==
    code-point order, so Python string comparison matches Spark's),
    pinned equal by test_bpe."""
    merges: list[tuple[str, str, int]] = []
    cur = [(list(s), int(f)) for s, f in rows]
    for _ in range(int(n_merges)):
        pc: dict = {}
        for syms, freq in cur:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + freq
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, cnt))
        cur = [(_merge_symbols(s, left, right), f) for s, f in cur]
    return merges


def bpe_train(
    wf: DataFrame,
    *,
    n_merges: int = 8,
    batch_cap: int = 64,
    exact_sequence: bool = True,
    driver_vocab_cap: int = 4096,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` merge rules from a word-frequency table.

    Returns ``(merges, final_wf)`` where ``merges`` is the ordered
    list of ``(left, right, pair_count)`` and ``final_wf`` the
    vocabulary table with all merges applied.

    Small-vocabulary fast path (r13; guide §8 "decide with small
    rows"): the pager below already ships a 64-row page to the driver
    PER ROUND — when the whole vocabulary is at most
    ``driver_vocab_cap`` rows (checked with one bounded
    ``limit(cap+1)`` collect, which short-circuits on big tables), one
    collect replaces every round's job and the classic loop runs
    driver-side in microseconds. The learned sequence is IDENTICAL
    (same count/tie-break/merge semantics; pinned vs the distributed
    pager by test_bpe), ``final_wf`` is the same lazy
    :func:`bpe_apply` plan, and nothing is memoized — the collect
    recomputes from the input per call. At sf0.1 this turned 4
    sequential ~0.6 s page jobs into one ~0.1 s collect per training.
    ``driver_vocab_cap=0`` forces the distributed pager; the fast path
    only serves ``exact_sequence=True`` (the relaxed mode's sequence
    is defined by the batch algebra, not by one-at-a-time order).

    Batched selection (the at-scale path): each round collects the
    top-``batch_cap`` pairs ONCE and merges the maximal provably-safe
    prefix (:func:`_safe_batch` — symbol-disjoint, strictly above the
    first rejected count) in a single chained fold, so the number of
    sequential Spark jobs is the number of ROUNDS, not the number of
    merges — the scale lever for real vocabularies (30k merges would
    otherwise be 30k sequential jobs; tests pin the batched sequence
    == the one-at-a-time sequence). The vocabulary table is
    checkpointed per round (localCheckpoint) so the merge-fold
    lineage stays flat instead of nesting ``n_merges`` deep."""
    if exact_sequence and int(driver_vocab_cap) > 0:
        head = (
            wf.select("syms", "freq")
            .limit(int(driver_vocab_cap) + 1)
            .collect()
        )
        if len(head) <= int(driver_vocab_cap):
            merges = _train_collected(
                [(r["syms"], r["freq"]) for r in head], n_merges
            )
            return merges, (bpe_apply(wf, merges) if merges else wf)
    merges: list[tuple[str, str, int]] = []
    cur = wf.localCheckpoint(eager=False)
    while len(merges) < int(n_merges):
        page = _pair_page(cur, int(batch_cap))
        if not page:
            break
        batch = _safe_batch(page, exact_sequence=exact_sequence)[
            : int(n_merges) - len(merges)
        ]
        merges.extend(batch)
        cur = cur.withColumn(
            "syms", merge_rules_expr("syms", batch)
        ).localCheckpoint(eager=False)
    return merges, cur


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    syms_col: str = "syms",
) -> DataFrame:
    """Apply a learned merge list, in order, to a symbol-array column.
    Chains one fold per rule (one parsed expression for the whole
    chain — :func:`merge_rules_expr`) — fine for the tens of rules
    this trainer targets; production-size vocabularies (~50k rules)
    should bake the rules into an Arrow-batched Pandas UDF instead."""
    return df.withColumn(syms_col, merge_rules_expr(syms_col, merges))
