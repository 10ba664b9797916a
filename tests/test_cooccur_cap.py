"""Cap-binding co-occurrence parity (ADVICE r6).

The production fan-out cap (``max_items_per_user``) is mirrored in the
roster oracles, but test-data users never exceed ~67 items, so no gate
ever exercised the cap-BINDING regime.  This test builds a synthetic
bot user with more items than the cap — plus duplicate rows and NULL
items, the two inputs where Spark's ``sort_array(collect_set)[1..cap]``
and a window ``row_number() <= cap`` could silently diverge — and
asserts exact pair-set parity against a DuckDB window reference with
the same cap.

Pinned semantics: dedup (user, item) first, ignore NULL items, then
keep each user's ``cap`` LOWEST item ids.
"""

from __future__ import annotations

import pandas as pd

from big_data_song_recommendation_spark.operators.cooccur import (
    cooccurrence_pairs,
)

CAP = 200


def _synthetic() -> pd.DataFrame:
    rows: list[tuple[str, float | None]] = []
    # bot user: 250 distinct items (cap binds at 200), every row
    # duplicated, plus NULL items that must not consume cap slots
    for i in range(250):
        rows += [("bot", float(i)), ("bot", float(i))]
    rows += [("bot", None)] * 30
    # organic users sharing low-id items → pairs with support ≥ 2
    for u in ("u2", "u3"):
        for i in (1, 2, 3, 210):  # 210 survives for organics, capped for bot
            rows.append((u, float(i)))
    return pd.DataFrame(rows, columns=["user_id", "item_id"])


def test_cap_binding_matches_window_reference(spark, duck):
    pdf = _synthetic()
    df = spark.createDataFrame(pdf)
    got = (
        cooccurrence_pairs(
            df, min_support=1, max_items_per_user=CAP
        )
        .toPandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    duck.register("cooc_cap_t", pdf)
    want = duck.execute(
        f"""
        WITH d AS (
          SELECT DISTINCT user_id, item_id
          FROM cooc_cap_t WHERE item_id IS NOT NULL
        ),
        c AS (
          SELECT user_id, item_id FROM (
            SELECT user_id, item_id,
                   row_number() OVER (
                     PARTITION BY user_id ORDER BY item_id
                   ) AS rn
            FROM d
          ) WHERE rn <= {CAP}
        )
        SELECT a.item_id AS item_a, b.item_id AS item_b,
               count(*) AS n_co
        FROM c a JOIN c b
          ON a.user_id = b.user_id AND a.item_id < b.item_id
        GROUP BY 1, 2
        ORDER BY 1, 2
        """
    ).df()
    duck.unregister("cooc_cap_t")

    # the cap actually bound: bot contributes C(200,2), not C(250,2)
    bot_pairs = CAP * (CAP - 1) // 2
    organic_only = {(1.0, 210.0), (2.0, 210.0), (3.0, 210.0)}
    assert len(want) == bot_pairs + len(organic_only)

    got["n_co"] = got["n_co"].astype(int)
    want["n_co"] = want["n_co"].astype(int)
    assert got.values.tolist() == want.values.tolist()

    # bot's items 200+ were dropped; organics kept theirs (210 pairs
    # exist with support 2 from u2+u3 only)
    high = got[(got.item_b == 210.0)]
    assert set(map(tuple, high[["item_a", "item_b"]].values.tolist())) == (
        organic_only
    )
    assert (high.n_co == 2).all()


def test_uncapped_equals_capped_when_slack(spark, duck):
    """Below the cap the capped and uncapped operators are identical
    (the regime every other gate already covers — pinned here so the
    two code paths can't drift)."""
    pdf = _synthetic()
    pdf = pdf[pdf.item_id < 50]  # every user now under the cap
    df = spark.createDataFrame(pdf)
    capped = cooccurrence_pairs(df, min_support=1, max_items_per_user=CAP)
    uncapped = cooccurrence_pairs(df, min_support=1, max_items_per_user=None)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
