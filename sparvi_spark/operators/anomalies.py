"""Anomaly-detection operators A1-A7 (SURVEY.md §2.C), Spark-first.

The reference pulls each metric series to the driver and runs numpy
(backend/core/anomalies/algorithms.py); we express the same math as window
functions over a long metrics DataFrame partitioned by series key — one
shuffle fans out every configured series at once (scheduler.py's ThreadPool
becomes a single Spark job, SURVEY §3.4).

Exact semantic ports (SURVEY §7 hard parts):
- np.std is POPULATION stddev -> stddev_pop (not stddev_samp).
- Rolling windows are values[i-w:i] — trailing, EXCLUDING the current point,
  emitted only for i >= w -> ROWS BETWEEN w PRECEDING AND 1 PRECEDING +
  row_number guard.
- np.percentile uses linear interpolation -> exact ``percentile`` /
  sorted-array interpolation for rolling IQR (never percentile_approx).
- Guards: zscore needs >=2 points, IQR >=4, moving-average >= window+1;
  std == 0 -> score 0 (not anomaly); iqr == 0 -> score = +inf (anomaly).
- Moving-average: std is computed over the MOVING AVERAGES, not raw values
  (algorithms.py:165-173), with a forward-looking std window and
  last-window fill for the tail.

Plan-build cost note: every ``F.col``/``F.when``/``withColumn`` is its own
py4j round trip (~0.5 ms each); the original Column-object builders spent
830+ round trips (≈0.45 s, GIL-serialized) constructing one detection-run
plan. Each detector therefore assembles its expressions as SQL TEXT
(f-strings) and ships them through a few ``selectExpr`` calls — the whole
layer parses JVM-side in ONE round trip, and Catalyst sees exactly the
same resolved plan (identical window specs, identical operation order, so
scores stay bit-for-bit equal to the Column form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZSCORE_BASE_THRESHOLD = 3.0
IQR_BASE_THRESHOLD = 1.5
MA_BASE_THRESHOLD = 2.0
CUSUM_BASE_THRESHOLD = 5.0
MAD_BASE_THRESHOLD = 3.5  # Iglewicz-Hoban modified-z-score convention
MAD_K = 1.4826022185056018  # 1 / Phi^-1(3/4): MAD -> sigma for normals

_INF = "cast('Infinity' as double)"


def _d(x: float) -> str:
    """Double literal — bare ``3.0`` parses as DECIMAL in Spark SQL."""
    return f"cast({float(x)!r} as double)"


def _pk(keys: list[str]) -> str:
    return ", ".join(f"`{k}`" for k in keys)


def zscore_anomalies(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
    sensitivity: float = 1.0,
    window: int | None = None,
) -> DataFrame:
    """A1 global / A2 rolling z-score (algorithms.py:10-61)."""
    threshold = ZSCORE_BASE_THRESHOLD / sensitivity
    v = f"`{value_col}`"
    wg = f"(PARTITION BY {_pk(keys)})"
    if window is None:
        # window exprs inlined into the score text — identical window
        # specs dedup into ONE Window operator and codegen CSE evaluates
        # each once per row, so this differs from the staged form only
        # in driver-side analysis rounds (each DataFrame op costs one)
        mean = f"avg({v}) OVER {wg}"
        std = f"stddev_pop({v}) OVER {wg}"
        g_score = (f"case when {std} = {_d(0)} then {_d(0)} "
                   f"else abs(({v} - ({mean})) / ({std})) end")
        return df.selectExpr(
            "*",
            f"{g_score} AS score",
            f"{g_score} > {_d(threshold)} AS is_anomaly",
            f"{_d(threshold)} AS threshold",
            f"count({v}) OVER {wg} AS __cnt",
        ).where("__cnt >= 2").drop("__cnt")
    # Reference fallback (algorithms.py:30): window >= len(values) ->
    # GLOBAL stats over the whole series (all points scored); rolling
    # frames only when the series is strictly longer than the window.
    # Both stat sets share the same partition keys -> one shuffle; the
    # rolling stats are computed over the trailing frame BEFORE the
    # row_number filter (filtering first would shrink early windows).
    wf = (f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}` "
          f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)")
    wo = f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}`)"
    mean = (f"case when count({v}) OVER {wg} <= {window} "
            f"then avg({v}) OVER {wg} else avg({v}) OVER {wf} end")
    std = (f"case when count({v}) OVER {wg} <= {window} "
           f"then stddev_pop({v}) OVER {wg} "
           f"else stddev_pop({v}) OVER {wf} end")
    r_score = (f"case when ({std}) = {_d(0)} then {_d(0)} "
               f"else abs(({v} - ({mean})) / ({std})) end")
    # same fused shape as the global branch: repeated window texts dedup
    # into one Window operator, the projection CSEs at codegen
    return df.selectExpr(
        "*",
        f"{r_score} AS score",
        f"{r_score} > {_d(threshold)} AS is_anomaly",
        f"{_d(threshold)} AS threshold",
        f"row_number() OVER {wo} AS __rn",
        f"count({v}) OVER {wg} AS __npts",
    ).where(
        f"(__npts <= {window} and __npts >= 2) "
        f"or (__npts > {window} and __rn > {window})"
    ).drop("__rn", "__npts")


def _interp_sorted(arr: str, p: float) -> str:
    """np.percentile linear interpolation over a sorted array (SQL text),
    positions from the array's RUNTIME size: collect_list drops NULL
    values, so a trailing window with nulls yields a shorter array than
    the window width — indexing by the static width would read past the
    end (wrong quartiles, or INVALID_ARRAY_INDEX under ANSI). For
    null-free windows the arithmetic is value-identical to the static form
    ((n-1)*p is the same double either way, and frac=0 makes
    lo + 0*(hi-lo) == lo). An all-null window returns NULL."""
    n = f"size({arr})"
    q = f"(cast({n} - 1 as double) * {_d(p)})"
    lo = f"floor({q})"
    lo_val = f"element_at({arr}, cast({lo} + 1 as int))"
    hi_val = f"element_at({arr}, cast(least({lo} + 2, cast({n} as bigint)) as int))"
    return (f"case when {n} > 0 then "
            f"{lo_val} + ({q} - cast({lo} as double)) * ({hi_val} - {lo_val}) end")


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
    v = f"`{value_col}`"
    if window is None:
        # whole-partition window, not agg + broadcast join back: one job
        # and half the stages. A metric series partition is bounded (one
        # point per collection interval), so the window buffer is small
        # at any data scale.
        wg = f"(PARTITION BY {_pk(keys)})"
        out = df.selectExpr(
            "*",
            f"percentile({v}, {_d(0.25)}) OVER {wg} AS __q1",
            f"percentile({v}, {_d(0.75)}) OVER {wg} AS __q3",
            f"count({v}) OVER {wg} AS __cnt",
        ).where("__cnt >= 4")
    else:
        # Reference fallback (algorithms.py:84): window >= len(values) ->
        # GLOBAL percentiles over the whole series (>= 4 points); rolling
        # frames only when the series is strictly longer than the window.
        wg = f"(PARTITION BY {_pk(keys)})"
        wf = (f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}` "
              f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)")
        wo = f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}`)"
        arr = f"sort_array(collect_list({v}) OVER {wf})"
        out = df.selectExpr(
            "*",
            f"row_number() OVER {wo} AS __rn",
            f"count({v}) OVER {wg} AS __npts",
            f"case when count({v}) OVER {wg} <= {window} "
            f"then percentile({v}, 0.25) OVER {wg} "
            f"else {_interp_sorted(arr, 0.25)} end AS __q1",
            f"case when count({v}) OVER {wg} <= {window} "
            f"then percentile({v}, 0.75) OVER {wg} "
            f"else {_interp_sorted(arr, 0.75)} end AS __q3",
        ).where(
            f"(__npts <= {window} and __npts >= 4) "
            f"or (__npts > {window} and __rn > {window})"
        ).drop("__rn", "__npts")
    iqr = "(__q3 - __q1)"
    lower = f"(__q1 - {iqr} * {_d(threshold)})"
    upper = f"(__q3 + {iqr} * {_d(threshold)})"
    past_low = (f"case when {iqr} > {_d(0)} "
                f"then abs(({lower} - {v}) / {iqr}) else {_INF} end")
    past_high = (f"case when {iqr} > {_d(0)} "
                 f"then abs(({v} - {upper}) / {iqr}) else {_INF} end")
    score = (f"case when {v} < {lower} then {past_low} "
             f"when {v} > {upper} then {past_high} else {_d(0)} end")
    return out.selectExpr(
        "*",
        f"{score} AS score",
        f"({v} < {lower}) or ({v} > {upper}) AS is_anomaly",
        f"{_d(threshold)} AS threshold",
    ).drop("__q1", "__q3", "__cnt")


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
    v = f"`{value_col}`"
    wg = f"(PARTITION BY {_pk(keys)})"
    wo = f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}`)"
    wf = (f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}` "
          f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)")
    wfwd = (f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}` "
            f"ROWS BETWEEN CURRENT ROW AND {sw - 1} FOLLOWING)")
    base = df.selectExpr(
        "*",
        f"row_number() OVER {wo} AS __rn",
        f"avg({v}) OVER {wf} AS __ma",
    ).where(f"__rn > {window}")
    base = base.selectExpr(
        "*",
        f"count(1) OVER {wg} AS __n_ma",
        f"row_number() OVER {wo} AS __mi",
        f"stddev_pop(__ma) OVER {wfwd} AS __fwd_std",
        f"stddev_pop(__ma) OVER {wg} AS __global_std",
    )
    # last full forward window std (covers MAs[n-sw+1..n], 1-based)
    tail_std = (f"max(case when __mi = __n_ma - {sw} + 1 "
                f"then __fwd_std end) OVER {wg}")
    std = (f"case when __n_ma < {sw} then __global_std "
           f"when __mi <= __n_ma - {sw} + 1 then __fwd_std "
           f"else {tail_std} end")
    base = base.selectExpr("*", f"{std} AS __std")
    score = (f"case when __std = {_d(0)} then {_d(0)} "
             f"else abs(({v} - __ma) / __std) end")
    return base.selectExpr(
        "*",
        f"{score} AS score",
        f"case when __std = {_d(0)} then false "
        f"else {score} > {_d(threshold)} end AS is_anomaly",
        f"{_d(threshold)} AS threshold",
        "__ma AS moving_avg",
    ).drop("__rn", "__ma", "__n_ma", "__mi", "__fwd_std", "__global_std",
           "__std")


def mad_anomalies(
    df: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    value_col: str = "value",
    sensitivity: float = 1.0,
) -> DataFrame:
    """Robust median/MAD detector (Iglewicz-Hoban modified z-score,
    public convention) — an extension beyond the reference's mean/std
    detectors: a single extreme spike inflates mean AND std enough to
    mask a second spike from the z-score, while median and MAD barely
    move. score = |v - med| / (MAD_K * mad), threshold 3.5/sensitivity.

    Whole-partition windows like the global z-score/IQR (a metric series
    partition is bounded at any scale); the second window reuses the
    first's exchange+sort — one shuffle total. Degenerate mad = 0 (over
    half the points identical) scores 0, matching the std = 0 rule; the
    guard needs >= 4 points like IQR. Transcendental-free: every op is
    IEEE basic arithmetic, so scores replay bit-for-bit in the oracle.
    """
    threshold = MAD_BASE_THRESHOLD / sensitivity
    v = f"`{value_col}`"
    wg = f"(PARTITION BY {_pk(keys)})"
    out = df.selectExpr(
        "*",
        f"percentile({v}, {_d(0.5)}) OVER {wg} AS __med",
        f"count({v}) OVER {wg} AS __cnt",
    ).where("__cnt >= 4").selectExpr(
        "*",
        f"percentile(abs({v} - __med), {_d(0.5)}) OVER {wg} AS __mad",
    )
    score = (f"case when __mad = {_d(0)} then {_d(0)} "
             f"else abs({v} - __med) / ({_d(MAD_K)} * __mad) end")
    return out.selectExpr(
        "*",
        f"{score} AS score",
        f"{score} > {_d(threshold)} AS is_anomaly",
        f"{_d(threshold)} AS threshold",
    ).drop("__med", "__cnt", "__mad")


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
    v = f"`{value_col}`"
    wg = f"(PARTITION BY {_pk(keys)})"
    run = (f"(PARTITION BY {_pk(keys)} ORDER BY `{order_col}` "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    # NULL values: the other detectors score them NULL (never anomalous);
    # here the prefix sums would SKIP the null and the row would inherit
    # the previous drift score — drop such rows up front instead (stats
    # are unchanged: avg/stddev/count already ignore nulls)
    out = df.where(f"{v} is not null").selectExpr(
        "*",
        f"avg({v}) OVER {wg} AS __mean",
        f"stddev_pop({v}) OVER {wg} AS __std",
        f"count({v}) OVER {wg} AS __cnt",
    ).where("__cnt >= 2")
    k = f"{_d(slack)} * __std"
    # note: names stay case-DISTINCT (__psum vs __sp) — Spark SQL resolves
    # identifiers case-insensitively, so __Sp/__sp would be ambiguous
    out = out.selectExpr(
        "*",
        f"sum({v} - __mean - {k}) OVER {run} AS __psum",
        f"sum(__mean - {v} - {k}) OVER {run} AS __nsum",
    )
    out = out.selectExpr(
        "*",
        f"__psum - least({_d(0)}, min(__psum) OVER {run}) AS __sp",
        f"__nsum - least({_d(0)}, min(__nsum) OVER {run}) AS __sn",
    )
    score = (f"case when __std = {_d(0)} then {_d(0)} "
             f"else greatest(__sp, __sn) / __std end")
    return out.selectExpr(
        "*",
        f"{score} AS score",
        f"{score} > {_d(threshold)} AS is_anomaly",
        f"{_d(threshold)} AS threshold",
    ).drop("__mean", "__std", "__cnt", "__psum", "__nsum", "__sp", "__sn")


_SEVERITY_CUTS = {
    "zscore": (5.0, 3.5),
    "iqr": (3.0, 1.5),
    "moving_average": (4.0, 2.5),
}


def severity(score_col: Column, method: str) -> Column:
    """A5 severity mapping (algorithms.py:201-240)."""
    hi, med = _SEVERITY_CUTS.get(method, (5.0, 2.5))
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
    hi, med = _SEVERITY_CUTS.get(method, (5.0, 2.5))
    return df.where("is_anomaly").selectExpr(
        *(f"`{k}`" for k in keys),
        f"`{order_col}`",
        f"`{value_col}` AS value",
        "score", "is_anomaly", "threshold",
        f"'{method}' AS method",
        f"case when score > {_d(hi)} then 'high' "
        f"when score > {_d(med)} then 'medium' else 'low' end AS severity",
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

    eligible = df.selectExpr(
        "*",
        f"count(`{value_col}`) OVER (PARTITION BY {_pk(keys)}) AS __npts",
    ).where(f"__npts >= {int(cfg['min_data_points'])}").drop("__npts")

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
