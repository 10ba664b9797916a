"""PSI drift report (operators/profile.psi_report): null-drift floor,
shift sensitivity, smoothing on empty bins, exact integer edge ranks."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_song_recommendation_spark.operators.profile import psi_report


def _pop(spark, values, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, float(v)) for i, v in enumerate(values)],
        "event_id long, value double",
    )


def test_identical_populations_near_zero(spark):
    vals = [i * 0.5 for i in range(200)]
    out = psi_report(_pop(spark, vals), _pop(spark, vals, 1000)).collect()
    assert len(out) == 10
    total = out[0]["psi_total"]
    # smoothing keeps it nonzero but far below the 0.1 stability gate
    assert 0.0 <= total < 0.01
    assert all(r["psi_total"] == total for r in out)


def test_shifted_population_flags_drift(spark):
    ref = [i * 0.5 for i in range(200)]
    cur = [100.0 + i * 0.5 for i in range(200)]  # everything in top bin
    out = psi_report(_pop(spark, ref), _pop(spark, cur, 1000)).collect()
    assert out[0]["psi_total"] > 0.25  # "significant shift" band


def test_empty_current_bins_stay_finite(spark):
    ref = [float(i) for i in range(100)]
    cur = [50.0] * 30  # one bin only
    out = {r["bin"]: r for r in psi_report(_pop(spark, ref), _pop(spark, cur, 1000)).collect()}
    assert all(abs(r["psi_term"]) < 1e6 for r in out.values())
    # Laplace floor: an empty current bin still has share (0+1)/(30+10)
    empty = [r for r in out.values() if r["n_cur"] == 0]
    assert empty and all(r["cur_share"] == 0.025 for r in empty)


def test_reference_bins_are_equi_depth(spark):
    # distinct values, n divisible by bins: every bin gets exactly n/10
    ref = [float(i) for i in range(100)]
    out = psi_report(_pop(spark, ref), _pop(spark, ref, 1000)).collect()
    assert sorted(r["n_ref"] for r in out) == [10] * 10


def test_null_values_excluded_from_both_populations(spark):
    """Regression: NULL values used to poison the bin fold (a NULL on
    an edge rank NULLed every row's bin) and diverged from the oracle
    (Spark NULL bin vs DuckDB bin 0). Contract: PSI is computed over
    non-NULL values only — NULL-heavy refs must bin identically to
    the same population with the NULLs removed."""
    clean = [float(i) for i in range(100)]
    withnulls = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(clean)]
        + [(1000 + i, None) for i in range(40)],  # ≥n/10 NULLs
        "event_id long, value double",
    )
    want = {
        (r["bin"], r["n_ref"], r["n_cur"])
        for r in psi_report(_pop(spark, clean), _pop(spark, clean, 5000)).collect()
    }
    got = {
        (r["bin"], r["n_ref"], r["n_cur"])
        for r in psi_report(withnulls, withnulls).collect()
    }
    assert got == want
