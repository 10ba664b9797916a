"""Full oracle sweep at an arbitrary scale factor — the same
normalize/compare discipline as the driver's sf0.01 gate, runnable at
sf0.1 (or any generated SF) as a scale-stress: more rows expose
rounding-boundary and ordering divergences the small gates cannot
(this is how the q117 double-summation cent-divergence was found in
round 5).

Usage: python scripts/sf_sweep.py [/root/testdata/sf0.1] [name_prefix ...]
(extra args restrict the sweep to queries whose name starts with any
given prefix — fast re-checks of just-touched queries)

Runs in a vanilla 1g-driver session at sf0.1: per-query state release
(session.release_query_state) keeps the block manager flat — without
it, the localCheckpoint/cache blocks the roster's multi-consumer
queries pin accumulate across ~90 queries until the heap OOMs (the
r5 sweep needed a 16g driver exactly because it skipped the release).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from big_data_song_recommendation_spark.session import (  # noqa: E402
    get_spark,
    release_query_state,
)
from big_data_song_recommendation_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.dt.tz_localize(None).astype(str)
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.map(lambda v: repr(float(v)))
        else:
            df[c] = col.map(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sf-sweep", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    prefixes = tuple(sys.argv[2:])
    fails, n_checked = [], 0
    for name, fn in sorted(qs.items()):
        if name not in oracles:
            continue
        if prefixes and not name.startswith(prefixes):
            continue
        n_checked += 1
        try:
            got = _norm(fn(spark, sf_dir).toPandas())
            want = _norm(con.execute(oracles[name]).df())
            ok = list(got.columns) == list(want.columns) and got.equals(want)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            fails.append(f"{name}:ERR:{type(ex).__name__}")
            continue
        if not ok:
            fails.append(name)
        print(f"{name}: {'ok' if ok else 'FAIL'}", flush=True)
        # free this query's pinned blocks (cache + localCheckpoint):
        # a ~130-query session otherwise accumulates block-manager
        # storage until a small heap OOMs (see module docstring)
        release_query_state(spark)
    print(f"\nchecked={n_checked} sf_dir={sf_dir}")
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
