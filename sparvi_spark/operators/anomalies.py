"""Anomaly-detection operators A1-A7 (SURVEY.md §2.C), Spark-first.

The reference pulls each metric series to the driver and runs numpy
(backend/core/anomalies/algorithms.py); we express the same math as window
functions over a long metrics DataFrame partitioned by series key — one
shuffle fans out every configured series at once (scheduler.py's ThreadPool
becomes a single Spark job, SURVEY §3.4).

Exact semantic ports (SURVEY §7 hard parts):
- np.std is POPULATION stddev -> stddev_pop (not stddev_samp).
- Rolling windows are values[i-w:i] — trailing, EXCLUDING the current point,
  emitted only for i >= w -> rowsBetween(-w, -1) + row_number guard.
- np.percentile uses linear interpolation -> exact ``percentile`` /
  sorted-array interpolation for rolling IQR (never percentile_approx).
- Guards: zscore needs >=2 points, IQR >=4, moving-average >= window+1;
  std == 0 -> score 0 (not anomaly); iqr == 0 -> score = +inf (anomaly).
- Moving-average: std is computed over the MOVING AVERAGES, not raw values
  (algorithms.py:165-173), with a forward-looking std window and
  last-window fill for the tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ZSCORE_BASE_THRESHOLD = 3.0
IQR_BASE_THRESHOLD = 1.5
MA_BASE_THRESHOLD = 2.0
CUSUM_BASE_THRESHOLD = 5.0

def _inf() -> Column:
    # built lazily — Column construction needs an active SparkContext
    return F.expr("cast('Infinity' as double)")


def _w(keys: list[str]):
    return Window.partitionBy(*keys)


def _w_ord(keys: list[str], order_col: str):
    return Window.partitionBy(*keys).orderBy(order_col)


def zscore_anomalies(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
    sensitivity: float = 1.0,
    window: int | None = None,
) -> DataFrame:
    """A1 global / A2 rolling z-score (algorithms.py:10-61)."""
    # Plan-build cost note (applies to every detector here): each
    # ``withColumn`` is its own py4j round trip projecting the whole plan
    # (~6 ms measured); chained 10+ deep they dominated the suite's
    # GIL-serialized build floor. Columns are therefore added in LAYERED
    # ``withColumns`` batches — one round trip per dependency layer —
    # reusing Column EXPRESSION objects (free) where a batch member would
    # otherwise need a column materialized in the same batch.
    threshold = ZSCORE_BASE_THRESHOLD / sensitivity
    v = F.col(value_col)
    if window is None:
        w = _w(keys)
        out = df.withColumns({
            "__mean": F.avg(v).over(w),
            "__std": F.stddev_pop(v).over(w),
            "__cnt": F.count(v).over(w),
        }).where(F.col("__cnt") >= 2)
        score = F.when(F.col("__std") == 0, F.lit(0.0)).otherwise(
            F.abs((v - F.col("__mean")) / F.col("__std"))
        )
        return out.withColumns({
            "score": score,
            "is_anomaly": score > threshold,
            "threshold": F.lit(float(threshold)),
        }).drop("__mean", "__std", "__cnt")
    else:
        # Reference fallback (algorithms.py:30): window >= len(values) ->
        # GLOBAL stats over the whole series (all points scored); rolling
        # frames only when the series is strictly longer than the window.
        # Both stat sets share the same partition keys -> one shuffle; the
        # rolling stats are computed over the trailing frame BEFORE the
        # row_number filter (filtering first would shrink early windows).
        wf = _w_ord(keys, order_col).rowsBetween(-window, -1)
        wg = _w(keys)
        npts = F.count(v).over(wg)
        out = df.withColumns({
            "__rn": F.row_number().over(_w_ord(keys, order_col)),
            "__npts": npts,
            "__mean": F.when(npts <= window, F.avg(v).over(wg))
            .otherwise(F.avg(v).over(wf)),
            "__std": F.when(npts <= window, F.stddev_pop(v).over(wg))
            .otherwise(F.stddev_pop(v).over(wf)),
        }).where(
            ((F.col("__npts") <= window) & (F.col("__npts") >= 2))
            | ((F.col("__npts") > window) & (F.col("__rn") > window))
        )
        score = F.when(F.col("__std") == 0, F.lit(0.0)).otherwise(
            F.abs((v - F.col("__mean")) / F.col("__std"))
        )
        return out.withColumns({
            "score": score,
            "is_anomaly": score > threshold,
            "threshold": F.lit(float(threshold)),
        }).drop("__rn", "__npts", "__mean", "__std")


def _interp_sorted(arr: Column, p: float) -> Column:
    """np.percentile linear interpolation over a sorted array, positions
    from the array's RUNTIME size: collect_list drops NULL values, so a
    trailing window with nulls yields a shorter array than the window
    width — indexing by the static width would read past the end (wrong
    quartiles, or INVALID_ARRAY_INDEX under ANSI). For null-free windows
    the arithmetic is value-identical to the static form ((n-1)*p is the
    same double either way, and frac=0 makes lo + 0*(hi-lo) == lo).
    An all-null window returns NULL."""
    n = F.size(arr)
    q = (n - F.lit(1)).cast("double") * F.lit(p)
    lo = F.floor(q)
    frac = q - lo.cast("double")
    lo_val = F.element_at(arr, (lo + 1).cast("int"))
    hi_val = F.element_at(arr, F.least(lo + 2, n.cast("bigint")).cast("int"))
    return F.when(n > 0, lo_val + frac * (hi_val - lo_val))


def iqr_anomalies(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
    sensitivity: float = 1.0,
    window: int | None = None,
) -> DataFrame:
    """A3 IQR (algorithms.py:64-132): global via exact percentile, rolling
    via sorted-array interpolation (JVM-side, no UDF)."""
    threshold = IQR_BASE_THRESHOLD / sensitivity
    v = F.col(value_col)
    if window is None:
        qs = (
            df.groupBy(*keys).agg(
                F.expr(f"percentile({value_col}, 0.25)").alias("__q1"),
                F.expr(f"percentile({value_col}, 0.75)").alias("__q3"),
                F.count(value_col).alias("__cnt"),
            ).where(F.col("__cnt") >= 4)
        )
        out = df.join(F.broadcast(qs), keys)
    else:
        # Reference fallback (algorithms.py:84): window >= len(values) ->
        # GLOBAL percentiles over the whole series (>= 4 points); rolling
        # frames only when the series is strictly longer than the window.
        wf = _w_ord(keys, order_col).rowsBetween(-window, -1)
        wg = _w(keys)
        arr = F.sort_array(F.collect_list(v).over(wf))
        npts = F.count(v).over(wg)
        short = npts <= window
        out = df.withColumns({
            "__rn": F.row_number().over(_w_ord(keys, order_col)),
            "__npts": npts,
            "__q1": F.when(short, F.expr(f"percentile({value_col}, 0.25)")
                           .over(wg)).otherwise(_interp_sorted(arr, 0.25)),
            "__q3": F.when(short, F.expr(f"percentile({value_col}, 0.75)")
                           .over(wg)).otherwise(_interp_sorted(arr, 0.75)),
        }).where(
            ((F.col("__npts") <= window) & (F.col("__npts") >= 4))
            | ((F.col("__npts") > window) & (F.col("__rn") > window))
        ).drop("__rn", "__npts")
    iqr = F.col("__q3") - F.col("__q1")
    lower = F.col("__q1") - iqr * threshold
    upper = F.col("__q3") + iqr * threshold
    past_low = F.when(iqr > 0, F.abs((lower - v) / iqr)).otherwise(_inf())
    past_high = F.when(iqr > 0, F.abs((v - upper) / iqr)).otherwise(_inf())
    score = F.when(v < lower, past_low).when(v > upper, past_high).otherwise(F.lit(0.0))
    return out.withColumns({
        "score": score,
        "is_anomaly": (v < lower) | (v > upper),
        "threshold": F.lit(float(threshold)),
    }).drop("__q1", "__q3", "__cnt")


def moving_average_anomalies(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
    sensitivity: float = 1.0,
    window: int = 7,
    std_window: int | None = None,
) -> DataFrame:
    """A4 moving average (algorithms.py:135-198).

    MA over trailing ``window`` raw values (excluding current); std over the
    MAs themselves: global when fewer MAs than ``std_window``, else a
    forward-looking rolling std (stds[k] covers MAs[k..k+sw-1]) whose last
    full value fills the tail.
    """
    sw = std_window or window
    threshold = MA_BASE_THRESHOLD / sensitivity
    v = F.col(value_col)
    ma = F.avg(v).over(_w_ord(keys, order_col).rowsBetween(-window, -1))
    base = df.withColumns({
        "__rn": F.row_number().over(_w_ord(keys, order_col)),
        "__ma": ma,
    }).where(F.col("__rn") > window)
    w_ma = _w_ord(keys, order_col)
    base = base.withColumns({
        "__n_ma": F.count(F.lit(1)).over(_w(keys)),
        "__mi": F.row_number().over(w_ma),
        "__fwd_std": F.stddev_pop(F.col("__ma")).over(w_ma.rowsBetween(0, sw - 1)),
        "__global_std": F.stddev_pop(F.col("__ma")).over(_w(keys)),
    })
    # last full forward window std (covers MAs[n-sw+1..n], 1-based)
    tail_std = F.max(
        F.when(F.col("__mi") == F.col("__n_ma") - sw + 1, F.col("__fwd_std"))
    ).over(_w(keys))
    std = F.when(F.col("__n_ma") < sw, F.col("__global_std")).otherwise(
        F.when(F.col("__mi") <= F.col("__n_ma") - sw + 1, F.col("__fwd_std"))
        .otherwise(tail_std)
    )
    base = base.withColumn("__std", std)
    score = F.when(F.col("__std") == 0, F.lit(0.0)).otherwise(
        F.abs((v - F.col("__ma")) / F.col("__std"))
    )
    return base.withColumns({
        "score": score,
        "is_anomaly": F.when(F.col("__std") == 0, F.lit(False))
        .otherwise(score > threshold),
        "threshold": F.lit(float(threshold)),
        "moving_avg": F.col("__ma"),
    }).drop("__rn", "__ma", "__n_ma", "__mi", "__fwd_std", "__global_std", "__std")


def cusum_anomalies(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
    sensitivity: float = 1.0,
    slack: float = 0.5,
) -> DataFrame:
    """CUSUM drift detector (Page 1954, public) — an extension beyond the
    reference's point detectors: accumulates small sustained shifts of the
    mean that no single point's z-score would flag.

    Textbook recursion: ``s+_i = max(0, s+_{i-1} + (x_i − mean − k))`` and
    mirrored ``s-``, with slack ``k = slack·std``. The recursion has a
    window-expressible closed form — with ``y_i = x_i − mean − k`` and
    prefix sum ``S_i``: ``s+_i = S_i − min(0, min_{j≤i} S_j)`` — so the
    whole detector is ONE shuffle on the series key plus ordered running
    sums/mins: no UDF, no fold, no driver loop, and both engines evaluate
    the sums in the same ts order (``order_col`` must be unique per key).
    Score = max(s+, s−)/std (0 when std = 0); threshold 5.0/sensitivity.
    """
    threshold = CUSUM_BASE_THRESHOLD / sensitivity
    v = F.col(value_col)
    wg = _w(keys)
    run = _w_ord(keys, order_col).rowsBetween(Window.unboundedPreceding, 0)
    # NULL values: the other detectors score them NULL (never anomalous);
    # here the prefix sums would SKIP the null and the row would inherit
    # the previous drift score — drop such rows up front instead (stats
    # are unchanged: avg/stddev/count already ignore nulls)
    df = df.where(v.isNotNull())
    out = df.withColumns({
        "__mean": F.avg(v).over(wg),
        "__std": F.stddev_pop(v).over(wg),
        "__cnt": F.count(v).over(wg),
    }).where(F.col("__cnt") >= 2)
    k = F.lit(float(slack)) * F.col("__std")
    out = out.withColumns({
        "__Sp": F.sum(v - F.col("__mean") - k).over(run),
        "__Sn": F.sum(F.col("__mean") - v - k).over(run),
    })
    out = out.withColumns({
        "__sp": F.col("__Sp") - F.least(F.lit(0.0), F.min("__Sp").over(run)),
        "__sn": F.col("__Sn") - F.least(F.lit(0.0), F.min("__Sn").over(run)),
    })
    score = F.when(F.col("__std") == 0, F.lit(0.0)).otherwise(
        F.greatest(F.col("__sp"), F.col("__sn")) / F.col("__std"))
    return out.withColumns({
        "score": score,
        "is_anomaly": score > threshold,
        "threshold": F.lit(float(threshold)),
    }).drop("__mean", "__std", "__cnt", "__Sp", "__Sn", "__sp", "__sn")


def severity(score_col: Column, method: str) -> Column:
    """A5 severity mapping (algorithms.py:201-240)."""
    if method == "zscore":
        hi, med = 5.0, 3.5
    elif method == "iqr":
        hi, med = 3.0, 1.5
    elif method == "moving_average":
        hi, med = 4.0, 2.5
    else:
        hi, med = 5.0, 2.5
    return (
        F.when(score_col > hi, "high").when(score_col > med, "medium").otherwise("low")
    )


def format_anomalies(
    df: DataFrame,
    method: str,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """A6: keep anomalies only, attach severity + method (algorithms.py:243-279)."""
    return (
        df.where(F.col("is_anomaly"))
        .select(*keys, order_col, F.col(value_col).alias("value"),
                "score", "is_anomaly", "threshold",
                F.lit(method).alias("method"),
                severity(F.col("score"), method).alias("severity"))
    )


def detect_anomalies(
    df: DataFrame,
    keys: list[str],
    config: dict | None = None,
    order_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """A7 dispatcher mirroring detector.py:92-126 defaults: method zscore,
    sensitivity 1.0, min_data_points 7. Series below min_data_points are
    dropped wholesale."""
    cfg = {"detection_method": "zscore", "sensitivity": 1.0, "min_data_points": 7,
           "config_params": {}, **(config or {})}
    method = cfg["detection_method"]
    sens = float(cfg["sensitivity"])
    params = cfg.get("config_params") or {}

    eligible = df.withColumn("__npts", F.count(value_col).over(_w(keys))).where(
        F.col("__npts") >= int(cfg["min_data_points"])
    ).drop("__npts")

    if method == "zscore":
        res = zscore_anomalies(eligible, keys, order_col, value_col, sens,
                               params.get("window"))
    elif method == "iqr":
        res = iqr_anomalies(eligible, keys, order_col, value_col, sens,
                            params.get("window"))
    elif method == "moving_average":
        res = moving_average_anomalies(eligible, keys, order_col, value_col, sens,
                                       params.get("window", 7), params.get("std_window"))
    elif method == "cusum":
        res = cusum_anomalies(eligible, keys, order_col, value_col, sens,
                              params.get("slack", 0.5))
    else:
        raise ValueError(f"unknown detection method: {method}")
    return format_anomalies(res, method, keys, order_col, value_col)
