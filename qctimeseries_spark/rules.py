"""Automated QC screening rules: range, spike, flatline.

The reference relies on a reviewer's eye to spot bad stretches
(`R/qc_window_app.R:251-297` renders them; nothing detects them).
These rules produce per-row violation columns that compose with the
existing update vocabulary — ``set_flag(df, var, -2,
selection=F.col("any_rule") == 1)`` turns detections into guarded
manual flags, and :meth:`QcSession.suggest_outliers` covers the
statistical tier.

Scale shape: the only non-trivial input is the previous-row value,
computed by :func:`~qctimeseries_spark.windows.shift_global` (block
windows + boundary carry) — never a single-task global window.  All
rule predicates are narrow codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.windows import shift_global


def apply_qc_rules(
    df: DataFrame,
    var: str,
    time_col: str,
    *,
    lo: float | None = None,
    hi: float | None = None,
    max_step: float | None = None,
    flatline_n: int | None = None,
    block_hours: float = 24.0,
) -> DataFrame:
    """Add integer violation columns for the requested rules:

    - ``rule_range`` — value outside ``[lo, hi]`` (either bound
      optional);
    - ``rule_spike`` — jump from the previous observation larger than
      ``max_step``;
    - ``rule_flatline`` — value equal to each of the previous
      ``flatline_n - 1`` observations (flags the tail rows of a
      constant run — a stuck sensor);
    - ``any_rule`` — any of the above.

    Runs on a single time-ordered series with unique timestamps
    (regularize/pre-aggregate first).  Lagged values come from
    ``flatline_n - 1`` (or 1) chained :func:`shift_global` passes.
    """
    out = df
    n_lags = 0
    if max_step is not None:
        n_lags = 1
    if flatline_n is not None:
        if flatline_n < 2:
            raise ValueError("flatline_n must be >= 2")
        n_lags = max(n_lags, flatline_n - 1)
    prev_cols: list[str] = []
    cur = var
    for i in range(1, n_lags + 1):
        out = shift_global(
            out, time_col, [cur], block_hours=block_hours, suffix="_lag"
        )
        name = f"{var}_prev{i}"
        out = out.withColumnRenamed(f"{cur}_lag", name)
        prev_cols.append(name)
        cur = name

    v = F.col(var)
    checks: dict[str, F.Column] = {}
    if lo is not None or hi is not None:
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (v < F.lit(lo))
        if hi is not None:
            cond = cond | (v > F.lit(hi))
        checks["rule_range"] = v.isNotNull() & cond
    if max_step is not None:
        p = F.col(f"{var}_prev1")
        checks["rule_spike"] = (
            v.isNotNull() & p.isNotNull() & (F.abs(v - p) > F.lit(max_step))
        )
    if flatline_n is not None:
        cond = v.isNotNull()
        for i in range(1, flatline_n):
            p = F.col(f"{var}_prev{i}")
            cond = cond & p.isNotNull() & (p == v)
        checks["rule_flatline"] = cond

    any_rule = F.lit(False)
    for name, cond in checks.items():
        out = out.withColumn(name, cond.cast("int"))
        any_rule = any_rule | (F.col(name) == 1)
    out = out.withColumn("any_rule", any_rule.cast("int"))
    return out.drop(*prev_cols)
