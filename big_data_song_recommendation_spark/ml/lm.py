"""Stupid-backoff score maps derived from the committed trigram LM
count tables (ml/lm_counts.py, written once by
scripts/gen_lm_counts.py) — the CCNet perplexity-filter stage
(Wenzek et al. 2020) as pure integer arithmetic.

ONE function derives the per-n-gram scores from the counts, and BOTH
consumers — the Spark scorer (operators/quality.lm_perplexity_scores)
and the q174 DuckDB twin (plans/oracles._lm_buckets_sql) — call it,
so the engines cannot drift: the score of a trigram is a committed
integer, not a runtime float.

Backoff (Brants et al. 2007, α = 0.4, micro units M = 10⁶):

- trigram tier:  s(w₁w₂w₃) = (c(w₁w₂w₃)·M) // c(w₁w₂)
  (the generator guarantees every kept trigram's context bigram is
  kept, so the divisor always exists);
- bigram tier:   s = (4·((c(w₂w₃)·M) // c(w₂))) // 10;
- unigram tier:  s = (16·((c(w₃)·M) // N)) // 100 — total, because
  every token maps into vocabulary ∪ {<unk>} before n-grams form.
"""

from __future__ import annotations

from functools import lru_cache

from . import lm_counts as C


@lru_cache(maxsize=1)
def score_maps() -> tuple[dict[str, int], dict[str, int], dict[str, int]]:
    """(tri_scores, bi23_scores, uni_scores): n-gram string → integer
    micro score for each backoff tier. Lookup order is tri → bi
    (keyed on 'w2 w3') → uni (keyed on 'w3', total)."""
    tri = {
        k: (c * C.LM_MICRO) // C.LM_BI[" ".join(k.split(" ")[:2])]
        for k, c in C.LM_TRI.items()
    }
    bi23 = {
        k: (4 * ((c * C.LM_MICRO) // C.LM_UNI[k.split(" ")[0]])) // 10
        for k, c in C.LM_BI.items()
    }
    uni = {
        k: (16 * ((c * C.LM_MICRO) // C.LM_N)) // 100
        for k, c in C.LM_UNI.items()
    }
    return tri, bi23, uni


def vocab() -> list[str]:
    """The committed vocabulary (without '<unk>'), sorted."""
    return sorted(k for k in C.LM_UNI if k != "<unk>")
