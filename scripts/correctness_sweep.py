"""Regenerate the driver-style CORRECTNESS artifact locally.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 beside its
``oracle_sql()`` DuckDB twin and emits the same per-query record shape
the driver writes (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err).  Queries with no oracle get the rows-only record
(``err: "no_oracle"``) the driver also records.

Usage: python scripts/correctness_sweep.py [out.json]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from big_data_song_recommendation_spark.session import get_spark  # noqa: E402
from big_data_song_recommendation_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_CORRECTNESS_SF_DIR", "/root/testdata/sf0.01")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.dt.tz_localize(None).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif col.dtype == object:
            df[c] = col.map(lambda v: str(v))
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.map(
                lambda v: "NaN" if v is None or math.isnan(v) else repr(float(v))
            )
        else:
            df[c] = col.map(lambda v: str(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("\x1f".join(map(str, row)).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_LOCAL.json"
    spark = get_spark("correctness-sweep")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results: dict[str, dict] = {}
    for name in sorted(queries):
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(sdf)
            if name not in oracles:
                rec["err"] = "no_oracle"
            else:
                odf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(odf)
                got, want = _normalize(sdf), _normalize(odf)
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(want.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _value_hash(got) == _value_hash(want)
                )
        except Exception as exc:  # record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = rec
        flag = (
            "ok"
            if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name}: {flag}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_ok - n_rows_only
    print(f"\n{n_ok} hash-green, {n_rows_only} rows-only, {n_fail} FAIL -> {out_path}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
