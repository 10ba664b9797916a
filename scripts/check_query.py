"""Check a subset of queries against their oracles (fast iteration).

Usage: python scripts/check_query.py q84 [q85 ...]
Names are prefix-matched against ``__spark_entry__.queries()`` keys.
Same normalize/hash discipline as correctness_sweep.py (imported).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from correctness_sweep import SF_DIR, _normalize, _value_hash  # noqa: E402

from big_data_song_recommendation_spark.session import get_spark  # noqa: E402
from big_data_song_recommendation_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
)


def main() -> None:
    prefixes = sys.argv[1:]
    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in queries if any(n.startswith(p) for p in prefixes)]
    if not names:
        print(f"no queries match {prefixes}")
        sys.exit(2)

    spark = get_spark("check-query")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    failed = False
    for name in names:
        sdf = queries[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).df()
        got, want = _normalize(sdf), _normalize(odf)
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        ok_hash = ok_rows and ok_schema and _value_hash(got) == _value_hash(want)
        print(
            f"{name}: rows={ok_rows} ({len(got)}/{len(want)}) "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if not ok_hash:
            failed = True
            if not ok_schema:
                print(f"  spark cols:  {list(got.columns)}")
                print(f"  oracle cols: {list(want.columns)}")
            if ok_schema and len(got) < 50:
                import pandas as pd

                cmp = got.compare(want) if len(got) == len(want) else None
                print("  spark:")
                print(got.head(20).to_string())
                print("  oracle:")
                print(want.head(20).to_string())
                if cmp is not None and not cmp.empty:
                    print("  diff:")
                    print(cmp.to_string())
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
