"""qctimeseries_spark — a PySpark-native time-series QC + analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference R package ``qctimeseries`` (window-by-window QC of flagged
numeric time series), re-expressed as lazy, immutable, distributed Spark
DataFrame transforms, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Everything in the QC core compiles to native Catalyst expressions — no
Python UDFs on the hot path. See SURVEY.md for the operator inventory.
"""

from qctimeseries_spark.schema import (
    FLAG_APPROVED,
    FLAG_UNCHECKED,
    FLAG_MISSING,
    FLAG_MANUAL,
    FLAG_DOMAIN,
    DEFAULT_SUFFIX,
    flag_col,
    base_var,
    qc_vars,
    is_flagged,
)
from qctimeseries_spark.flags import (
    add_flags,
    remove_flags,
    transfer_flags,
    apply_flags,
    strict_clean,
)
from qctimeseries_spark.summary import progress, consistency_check, flag_domain_check
from qctimeseries_spark.windows import (
    with_rowid,
    window_anchor,
    assign_windows,
    admitted_windows,
    window_slice,
    window_range,
    window_extent,
    sessionize,
    sessionize_salted,
    time_weighted_resample,
    hot_keys,
    regularize,
    regularize_by_key,
    resample,
    fill_forward,
    fill_backward,
    interpolate_linear,
    cusum,
    rolling_stats,
    seasonal_baseline,
    flag_outlier_candidates,
    shift_global,
    change_intervals,
)
from qctimeseries_spark.updates import (
    set_flag,
    flag_window,
    approve_window,
    reset_window,
    reset_all,
    flag_and_approve_window,
)
from qctimeseries_spark.viz import (
    flag_levels,
    main_trace,
    approved_overlay,
    flagged_overlay,
    secondary_trace,
    check_panel,
    downsample_minmax,
    display_tz,
    utc_from_display,
)
from qctimeseries_spark.app import QcSession
from qctimeseries_spark.plans import plan_summary
from qctimeseries_spark.rules import apply_qc_rules
from qctimeseries_spark.joins import asof_join, interval_join, nearest_join, skew_join
from qctimeseries_spark.events import funnel, funnel_lags, retention_cohorts
from qctimeseries_spark.exports import write_exports, smart_stem
from qctimeseries_spark.report import save_all_check_plots, panel_downsample
from qctimeseries_spark.pipeline import qc_pipeline
from qctimeseries_spark.state import (
    save_state,
    load_state,
    slice_state,
    commit_state,
    checkpoint_state,
)

__all__ = [
    "flag_levels",
    "FLAG_APPROVED",
    "FLAG_UNCHECKED",
    "FLAG_MISSING",
    "FLAG_MANUAL",
    "FLAG_DOMAIN",
    "DEFAULT_SUFFIX",
    "flag_col",
    "base_var",
    "qc_vars",
    "is_flagged",
    "add_flags",
    "remove_flags",
    "transfer_flags",
    "apply_flags",
    "strict_clean",
    "progress",
    "consistency_check",
    "flag_domain_check",
    "with_rowid",
    "window_anchor",
    "assign_windows",
    "change_intervals",
    "admitted_windows",
    "window_slice",
    "window_range",
    "window_extent",
    "sessionize",
    "time_weighted_resample",
    "sessionize_salted",
    "hot_keys",
    "set_flag",
    "flag_window",
    "approve_window",
    "reset_window",
    "reset_all",
    "flag_and_approve_window",
    "main_trace",
    "approved_overlay",
    "flagged_overlay",
    "secondary_trace",
    "check_panel",
    "downsample_minmax",
    "display_tz",
    "utc_from_display",
    "QcSession",
    "asof_join",
    "funnel",
    "funnel_lags",
    "retention_cohorts",
    "interval_join",
    "nearest_join",
    "skew_join",
    "write_exports",
    "smart_stem",
    "save_all_check_plots",
    "panel_downsample",
    "qc_pipeline",
    "save_state",
    "load_state",
    "slice_state",
    "commit_state",
    "checkpoint_state",
    "plan_summary",
    "apply_qc_rules",
    "regularize",
    "regularize_by_key",
    "resample",
    "fill_forward",
    "fill_backward",
    "interpolate_linear",
    "cusum",
    "rolling_stats",
    "seasonal_baseline",
    "flag_outlier_candidates",
    "shift_global",
]

__version__ = "0.1.0"
