"""Visualization result sets (V1–V6) + per-window downsampling.

The reference's plots are out of engine scope, but each consumes a
well-defined relational slice (SURVEY.md §2.8) that the engine must
produce; a plotly/matplotlib front-end renders the returned DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.flags import strict_clean
from qctimeseries_spark.schema import (
    DEFAULT_SUFFIX,
    FLAG_APPROVED,
    FLAG_MANUAL,
    validate_flag_exists,
)
from qctimeseries_spark.windows import ROWID_COL, WIN_COL, window_slice


def main_trace(
    df: DataFrame,
    var: str,
    time_col: str,
    window: int,
    *,
    hide_flagged: bool = False,
    suffix: str = DEFAULT_SUFFIX,
    id_col: str = ROWID_COL,
    win_col: str = WIN_COL,
) -> DataFrame:
    """V1: current-window rows, optional P6 (flag >= 0 when hiding
    flagged), P7 non-null filter; columns (t, y, rowid)
    (``build_plot`` ``R/qc_window_app.R:251-297``)."""
    f = validate_flag_exists(df, var, suffix)
    out = window_slice(df, window, win_col)
    if hide_flagged:
        out = out.filter(F.col(f) >= 0)  # P6
    out = out.filter(F.col(var).isNotNull() & F.col(time_col).isNotNull())  # P7
    return out.select(time_col, var, id_col)


def approved_overlay(
    df: DataFrame,
    var: str,
    time_col: str,
    window: int,
    *,
    suffix: str = DEFAULT_SUFFIX,
    id_col: str = ROWID_COL,
    win_col: str = WIN_COL,
) -> DataFrame:
    """V2: window rows with flag == 1 (P8, ``R/qc_window_app.R:293``)."""
    f = validate_flag_exists(df, var, suffix)
    return (
        window_slice(df, window, win_col)
        .filter((F.col(f) == FLAG_APPROVED) & F.col(var).isNotNull())
        .select(time_col, var, id_col)
    )


def flagged_overlay(
    df: DataFrame,
    var: str,
    time_col: str,
    window: int,
    *,
    suffix: str = DEFAULT_SUFFIX,
    id_col: str = ROWID_COL,
    win_col: str = WIN_COL,
) -> DataFrame:
    """V3: window rows with flag < -1 (manual-flagged overlay,
    ``R/qc_window_app.R:294-295``)."""
    f = validate_flag_exists(df, var, suffix)
    return (
        window_slice(df, window, win_col)
        .filter((F.col(f) <= FLAG_MANUAL) & F.col(var).isNotNull())
        .select(time_col, var, id_col)
    )


def secondary_trace(
    df: DataFrame,
    sec_var: str,
    time_col: str,
    window: int,
    *,
    suffix: str = DEFAULT_SUFFIX,
    win_col: str = WIN_COL,
) -> DataFrame:
    """V4/P9: secondary-series slice — rows with non-NULL value AND, if
    the secondary variable has its own flag column, flag >= 0
    (``R/qc_window_app.R:307-312``).  Schema-dependent predicate."""
    out = window_slice(df, window, win_col).filter(F.col(sec_var).isNotNull())
    f = f"{sec_var}{suffix}"
    if f in df.columns:
        out = out.filter(F.col(f) >= 0)
    return out.select(time_col, sec_var)


def check_panel(
    df: DataFrame,
    var: str,
    time_col: str,
    *,
    suffix: str = DEFAULT_SUFFIX,
) -> DataFrame:
    """V5 raw∪clean two-panel table (``qc_check_plot``
    ``R/qc_plots.R:45-56``): raw rows tagged 'raw' unioned with the
    strict-clean (P5: flag<1 masked) rows tagged 'clean'."""
    validate_flag_exists(df, var, suffix)
    f = f"{var}{suffix}"
    raw = df.select(
        F.lit("raw").alias("panel"), F.col(time_col), F.col(var), F.col(f)
    )
    clean = strict_clean(df, var, suffix).select(
        F.lit("clean").alias("panel"), F.col(time_col), F.col(var), F.col(f)
    )
    return raw.unionByName(clean)


def display_tz(
    df: DataFrame, time_col: str, tz: str, *, col: str | None = None
) -> DataFrame:
    """``tz_user`` display conversion at the edge
    (``R/qc_window_app.R:47``; reference README notes tz handling as a
    weak spot — the engine's rule is: STORE UTC, convert only in
    display slices, SURVEY.md §7.4).  Renders wall-clock values for the
    given IANA zone; invert with :func:`utc_from_display`."""
    return df.withColumn(
        col or time_col, F.from_utc_timestamp(F.col(time_col), tz)
    )


def utc_from_display(
    df: DataFrame, time_col: str, tz: str, *, col: str | None = None
) -> DataFrame:
    """Inverse of :func:`display_tz`: wall-clock values in ``tz`` back
    to UTC (for ingesting user-entered local times)."""
    return df.withColumn(
        col or time_col, F.to_utc_timestamp(F.col(time_col), tz)
    )


def clamp(x: float, lo: float, hi: float, default: float) -> float:
    """F10: clamp numeric UI input to [lo, hi], falling back to
    ``default`` on None/NaN (``R/qc_window_app.R:239-243``).  Pure
    driver math for the interactive shell."""
    if x is None or x != x:
        return default
    return min(max(float(x), lo), hi)


def epoch_to_timestamp(x, *, col_name: str | None = None):
    """F6: zoom-event epoch coords back to timestamps — values are
    milliseconds iff any magnitude exceeds 1e12, else seconds
    (``R/qc_window_app.R:349-352``).  The reference applies the
    heuristic per event batch; as a Column expression we apply it
    per value, which is identical for post-1971 data."""
    c = F.col(x) if isinstance(x, str) else x
    secs = F.when(F.abs(c) > 1e12, c / 1000.0).otherwise(c)
    out = F.timestamp_seconds(secs)
    return out.alias(col_name) if col_name else out


def downsample_minmax(
    df: DataFrame,
    var: str,
    time_col: str,
    *,
    n_buckets: int = 2000,
    t0: float | None = None,
    t1: float | None = None,
) -> DataFrame:
    """Per-pixel-bucket min/max/open/close downsampling (SURVEY.md §4,
    engine assist for large-window rendering).  One aggregation; the
    result has ≤ n_buckets rows regardless of input size."""
    if t0 is None or t1 is None:
        lo, hi = df.agg(
            F.min(F.col(time_col).cast("double")),
            F.max(F.col(time_col).cast("double")),
        ).collect()[0]
        t0 = t0 if t0 is not None else lo
        t1 = t1 if t1 is not None else hi
    span = max(t1 - t0, 1e-9)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(time_col).cast("double") - F.lit(t0)) / F.lit(span) * n_buckets),
    ).cast("int")
    return (
        df.filter(F.col(var).isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.min(var).alias("y_min"),
            F.max(var).alias("y_max"),
            F.min_by(var, time_col).alias("y_open"),
            F.max_by(var, time_col).alias("y_close"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("bucket")
    )


def flag_levels() -> dict:
    """Per-flag display mapping for front-ends rendering the V1–V5
    slices: level → (label, color), mirroring the reference's
    ``qc_flag_levels`` (``R/qc_plots.R:181-192``) literal-for-literal —
    so a plotly/notebook front-end colors traces identically to the
    reference's Shiny app.

    Keys are the integer flag values of ``schema.FLAG_DOMAIN``; the
    reference keys its list by the string forms ("1","0","-1","-2"),
    returned here under ``levels``/``labels``/``colors`` for drop-in
    parity alongside the typed ``by_flag`` view.
    """
    ordered = [
        (1, "approved", "forestgreen"),
        (0, "unchecked", "steelblue"),
        (-1, "auto flag", "orange"),
        (-2, "manual flag", "red"),
    ]
    return {
        "levels": [str(v) for v, _, _ in ordered],
        "labels": [lab for _, lab, _ in ordered],
        "colors": {str(v): c for v, _, c in ordered},
        "by_flag": {v: {"label": lab, "color": c} for v, lab, c in ordered},
    }
