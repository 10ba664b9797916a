"""Pre-commit / end-of-round gate: verify every query whose plan or
oracle changed since the last round snapshot, on the CURRENT tree.

The round-6 lesson: a plan rewrite that lands after the last full sweep
ships unverified.  This script makes "the final tree was verified"
mechanical:

1. ``scripts/registry_head.py`` attribution — diff vs the base ref
   (default: the most recent ``round N:`` driver commit), map changed
   lines to query names, regenerate ``plans/registry_head.txt`` so the
   changed queries lead the registry.
2. Oracle-compare exactly those queries at sf0.01 (same normalize/hash
   discipline as the driver).  If the diff is unmappable (module-level
   change) or other package source files changed, sweep the FULL
   roster instead — correctness over speed.
3. ``pytest tests/test_oracle_parity.py tests/test_dtype_contract.py``
   (value parity at sf0.001 + roster-wide output-type classes).

Exit 0 = safe to commit/snapshot.  Anything else = do not ship.

Usage: python scripts/preflight.py [base_ref] [--full] [--skip-pytest]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import registry_head as rh  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PREFLIGHT_SF_DIR", "/root/testdata/sf0.01")


def _sweep(names: list[str] | None) -> list[str]:
    """Oracle-compare the named queries (None = all); return failures."""
    import duckdb

    import __spark_entry__ as entry
    from correctness_sweep import _normalize, _value_hash

    from big_data_song_recommendation_spark.session import get_spark
    from big_data_song_recommendation_spark.sources.readers import TESTDATA_TABLES

    spark = get_spark("preflight")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    targets = sorted(queries) if names is None else sorted(names)
    fails: list[str] = []
    for name in targets:
        if name not in queries:
            fails.append(f"{name}:NOT_IN_REGISTRY")
            continue
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only ({len(sdf)} rows)", flush=True)
                continue
            odf = con.execute(oracles[name]).df()
            got, want = _normalize(sdf), _normalize(odf)
            ok = (
                len(got) == len(want)
                and list(got.columns) == list(want.columns)
                and _value_hash(got) == _value_hash(want)
            )
            print(f"{name}: {'ok' if ok else 'FAIL'}", flush=True)
            if not ok:
                fails.append(name)
        except Exception as exc:
            print(f"{name}: ERR {type(exc).__name__}: {exc}"[:200], flush=True)
            fails.append(f"{name}:ERR")
    return fails


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    skip_pytest = "--skip-pytest" in sys.argv
    base = argv[0] if argv else rh.default_base_ref()

    names, fully_mapped, other = rh.changed_queries(base)
    rh.write_head(names)
    print(f"base={base[:12]}: {len(names)} changed queries: {sorted(names)}")
    if not fully_mapped:
        print("unattributable changes present -> FULL sweep")
        full = True
    if other:
        print(f"{len(other)} other package files changed -> FULL sweep: {other}")
        full = True

    targets = None if full else sorted(names)
    if targets == []:
        print("no changed queries; skipping sweep")
        fails = []
    else:
        fails = _sweep(targets)
    if fails:
        print(f"\nPREFLIGHT FAIL (sweep): {fails}")
        sys.exit(1)

    if not skip_pytest:
        rc = subprocess.run(
            [
                sys.executable,
                "-m",
                "pytest",
                "tests/test_oracle_parity.py",
                "tests/test_dtype_contract.py",
                "-q",
                "-x",
            ],
            cwd=rh.REPO,
        ).returncode
        if rc != 0:
            print("\nPREFLIGHT FAIL (pytest)")
            sys.exit(1)

    print("\nPREFLIGHT OK — final tree verified")


if __name__ == "__main__":
    main()
