"""Anomaly operator tests: cross-validate Spark window math against direct
numpy ports of the reference algorithms (algorithms.py semantics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_spark.operators.anomalies import (
    detect_anomalies,
    iqr_anomalies,
    moving_average_anomalies,
    severity,
    zscore_anomalies,
)

SERIES = [100.0, 102.0, 98.0, 101.0, 99.0, 103.0, 97.0, 100.0, 500.0, 101.0,
          99.0, 102.0, 98.0, 100.0, 101.0]


@pytest.fixture(scope="module")
def series_df(spark):
    rows = [("m", i, float(v)) for i, v in enumerate(SERIES)]
    return spark.createDataFrame(rows, "metric_name string, ts int, value double")


def collect_scores(df):
    return {r["ts"]: (r["score"], r["is_anomaly"]) for r in df.collect()}


def test_zscore_global_matches_numpy(series_df):
    got = collect_scores(zscore_anomalies(series_df, ["metric_name"], order_col="ts"))
    mean, std = np.mean(SERIES), np.std(SERIES)  # population
    for i, v in enumerate(SERIES):
        expect = abs((v - mean) / std)
        assert got[i][0] == pytest.approx(expect, abs=1e-9)
        assert got[i][1] == (expect > 3.0)
    assert got[8][1]  # the 500 spike is anomalous


def test_zscore_rolling_excludes_current_point(series_df):
    w = 5
    got = collect_scores(
        zscore_anomalies(series_df, ["metric_name"], order_col="ts", window=w))
    assert set(got) == set(range(w, len(SERIES)))  # only i >= window emitted
    for i in range(w, len(SERIES)):
        wv = SERIES[i - w:i]
        mean, std = np.mean(wv), np.std(wv)
        expect = 0.0 if std == 0 else abs((SERIES[i] - mean) / std)
        assert got[i][0] == pytest.approx(expect, abs=1e-9), i


def test_zscore_constant_series_scores_zero(spark):
    df = spark.createDataFrame(
        [("m", i, 5.0) for i in range(10)], "metric_name string, ts int, value double")
    res = zscore_anomalies(df, ["metric_name"], order_col="ts").collect()
    assert all(r["score"] == 0.0 and not r["is_anomaly"] for r in res)


def test_iqr_global_matches_numpy(series_df):
    got = collect_scores(iqr_anomalies(series_df, ["metric_name"], order_col="ts"))
    q1, q3 = np.percentile(SERIES, 25), np.percentile(SERIES, 75)
    iqr = q3 - q1
    lower, upper = q1 - iqr * 1.5, q3 + iqr * 1.5
    for i, v in enumerate(SERIES):
        if v < lower:
            expect, anom = abs((lower - v) / iqr), True
        elif v > upper:
            expect, anom = abs((v - upper) / iqr), True
        else:
            expect, anom = 0.0, False
        assert got[i][0] == pytest.approx(expect, abs=1e-9)
        assert got[i][1] == anom


def test_iqr_zero_iqr_gives_infinite_score(spark):
    vals = [5.0] * 9 + [6.0]
    df = spark.createDataFrame(
        [("m", i, v) for i, v in enumerate(vals)], "metric_name string, ts int, value double")
    got = collect_scores(iqr_anomalies(df, ["metric_name"], order_col="ts"))
    assert got[9][0] == float("inf") and got[9][1]


def test_moving_average_matches_numpy_port(series_df):
    w = 5
    got = collect_scores(
        moving_average_anomalies(series_df, ["metric_name"], order_col="ts", window=w))
    # direct port of algorithms.py:135-198
    values = SERIES
    mas = [np.mean(values[i - w:i]) for i in range(w, len(values))]
    if len(mas) < w:
        stds = [np.std(mas)] * len(mas)
    else:
        stds = [np.std(mas[i - w:i]) for i in range(w, len(mas) + 1)]
    for i, ma in enumerate(mas):
        idx = i + w
        std = stds[i] if i < len(stds) else stds[-1]
        expect = 0.0 if std == 0 else abs((values[idx] - ma) / std)
        assert got[idx][0] == pytest.approx(expect, abs=1e-9), idx


def test_severity_thresholds(spark):
    df = spark.createDataFrame([(0.5,), (3.6,), (6.0,)], "score double")
    z = [r[0] for r in df.select(severity(F.col("score"), "zscore")).collect()]
    assert z == ["low", "medium", "high"]
    i = [r[0] for r in df.select(severity(F.col("score"), "iqr")).collect()]
    assert i == ["low", "high", "high"]


def test_detect_min_data_points_guard(spark):
    df = spark.createDataFrame(
        [("m", i, float(i)) for i in range(6)], "metric_name string, ts int, value double")
    out = detect_anomalies(df, ["metric_name"])  # default min_data_points=7
    assert out.count() == 0


def test_detect_dispatch_formats_anomalies(series_df):
    out = detect_anomalies(series_df, ["metric_name"], {"detection_method": "iqr"},
                           order_col="ts")
    rows = out.collect()
    assert rows and all(r["is_anomaly"] for r in rows)
    assert {"method", "severity", "threshold", "score"} <= set(out.columns)
    assert all(r["method"] == "iqr" for r in rows)


def test_zscore_rolling_short_series_falls_back_to_global(spark):
    """Reference algorithms.py:30: window >= len(values) -> global stats,
    EVERY point scored (a rolling-only port silently emits zero rows)."""
    vals = [10.0, 12.0, 11.0, 50.0]
    df = spark.createDataFrame(
        [("m", i, v) for i, v in enumerate(vals)],
        "metric_name string, ts int, value double")
    got = collect_scores(
        zscore_anomalies(df, ["metric_name"], order_col="ts", window=7))
    assert set(got) == set(range(len(vals)))  # all points, not none
    mean, std = np.mean(vals), np.std(vals)
    for i, v in enumerate(vals):
        assert got[i][0] == pytest.approx(abs((v - mean) / std), abs=1e-9)


def test_zscore_rolling_mixed_series_lengths(spark):
    """Short and long series in one frame: short -> global branch, long ->
    rolling branch, in a single job."""
    w = 5
    short = [("s", i, float(v)) for i, v in enumerate([1.0, 2.0, 3.0])]
    long_ = [("l", i, float(v)) for i, v in enumerate(SERIES)]
    df = spark.createDataFrame(short + long_,
                               "metric_name string, ts int, value double")
    out = zscore_anomalies(df, ["metric_name"], order_col="ts", window=w)
    by_key = {(r["metric_name"], r["ts"]): r["score"] for r in out.collect()}
    # short series: all 3 points scored with global stats
    sv = [1.0, 2.0, 3.0]
    m, s = np.mean(sv), np.std(sv)
    for i, v in enumerate(sv):
        assert by_key[("s", i)] == pytest.approx(abs((v - m) / s), abs=1e-9)
    # long series: rolling, only i >= w emitted
    assert {t for (k, t) in by_key if k == "l"} == set(range(w, len(SERIES)))


def test_iqr_rolling_short_series_falls_back_to_global(spark):
    """Reference algorithms.py:84: window >= len(values) -> global
    percentiles over the whole series (needs >= 4 points)."""
    vals = [10.0, 12.0, 11.0, 13.0, 100.0]
    df = spark.createDataFrame(
        [("m", i, v) for i, v in enumerate(vals)],
        "metric_name string, ts int, value double")
    got = collect_scores(
        iqr_anomalies(df, ["metric_name"], order_col="ts", window=7))
    assert set(got) == set(range(len(vals)))
    q1, q3 = np.percentile(vals, 25), np.percentile(vals, 75)
    iqr = q3 - q1
    hi = q3 + 1.5 * iqr
    assert got[4][1]  # 100 beyond upper bound
    assert got[4][0] == pytest.approx(abs((vals[4] - hi) / iqr), abs=1e-9)
    # 3-point series still yields nothing (reference len<4 guard)
    tiny = spark.createDataFrame(
        [("m", i, float(i)) for i in range(3)],
        "metric_name string, ts int, value double")
    assert iqr_anomalies(tiny, ["metric_name"], order_col="ts", window=7).count() == 0


def test_cusum_matches_recursion_and_detects_drift(spark):
    """The window closed form (prefix sum minus running min) must equal the
    textbook CUSUM recursion point-for-point, and a sustained mean shift
    must cross the threshold even though each point is unremarkable."""
    import statistics

    from pyspark.sql import functions as F

    from sparvi_spark.operators.anomalies import cusum_anomalies

    vals = [10.0, 10.2, 9.9, 10.1, 9.8, 10.0, 10.1, 9.9] + [11.0] * 12
    rows = [(f"2024-01-{i+1:02d}", v) for i, v in enumerate(vals)]
    df = (spark.createDataFrame(rows, "ts string, value double")
          .withColumn("metric_name", F.lit("m")))
    res = {r["ts"]: r for r in
           cusum_anomalies(df, ["metric_name"], order_col="ts",
                           sensitivity=2.0).collect()}

    mean = statistics.fmean(vals)
    std = statistics.pstdev(vals)
    k = 0.5 * std
    sp = sn = 0.0
    for i, x in enumerate(vals):
        sp = max(0.0, sp + (x - mean - k))
        sn = max(0.0, sn + (mean - x - k))
        got = res[f"2024-01-{i+1:02d}"]
        assert abs(got["score"] - max(sp, sn) / std) < 1e-9
    # the drift accumulates past the 2.5-sigma threshold by the tail
    assert res["2024-01-20"]["is_anomaly"]
    # nothing has accumulated at the first point
    assert not res["2024-01-01"]["is_anomaly"]
