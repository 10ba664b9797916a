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
2. ``bpe_train`` — ``n_merges`` iterations of: weighted adjacent-pair
   count (in-row ``arrays_zip`` of the symbol array against its own
   shift — no per-symbol explode-then-window), argmax pair
   (deterministic tie-break: count desc, then lexicographic), then a
   greedy left-to-right in-row merge fold (``F.aggregate``) applied to
   every word. One tiny ``.limit(1).collect()`` per merge — the same
   per-round driver action budget as PageRank's fixed rounds
   (operators/graph.py); the data never leaves the executors.

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


def bpe_train(
    wf: DataFrame, *, n_merges: int = 8
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` merge rules from a word-frequency table.

    Returns ``(merges, final_wf)`` where ``merges`` is the ordered
    list of ``(left, right, pair_count)`` and ``final_wf`` the
    vocabulary table with all merges applied. The vocabulary table is
    checkpointed per round (localCheckpoint) so the merge-fold lineage
    stays flat instead of nesting ``n_merges`` deep."""
    merges: list[tuple[str, str, int]] = []
    cur = wf.localCheckpoint(eager=False)
    for _ in range(int(n_merges)):
        best = (
            _pair_counts(cur)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append((left, right, int(cnt)))
        cur = cur.withColumn(
            "syms", merge_pair_expr(F.col("syms"), left, right)
        ).localCheckpoint(eager=False)
    return merges, cur


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    syms_col: str = "syms",
) -> DataFrame:
    """Apply a learned merge list, in order, to a symbol-array column.
    Chains one fold per rule — fine for the tens of rules this
    trainer targets; production-size vocabularies (~50k rules) should
    bake the rules into an Arrow-batched Pandas UDF instead."""
    out = F.col(syms_col)
    for rule in merges:
        out = merge_pair_expr(out, rule[0], rule[1])
    return df.withColumn(syms_col, out)
