"""The canonical end-to-end batch QC pipeline.

Reference workflow (``vignettes/overall_workflow.Rmd:329-350``,
SURVEY.md §3.1): read → add flags → (flag rows) → progress → apply
flags → write clean + qc.  Expressed as one lazy DataFrame chain:
Catalyst fuses the flag init, update overlays, and masking into a
single projection stage; only ``progress`` and the writes trigger jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from qctimeseries_spark.flags import add_flags, apply_flags
from qctimeseries_spark.schema import (
    DEFAULT_SUFFIX,
    FLAG_MANUAL,
    validate_time_col,
)
from qctimeseries_spark.summary import progress
from qctimeseries_spark.updates import set_flag


def qc_pipeline(
    df: DataFrame,
    vars: list[str] | str,
    *,
    time_col: str,
    flag_predicates: dict[str, Column] | None = None,
    rules: dict[str, dict] | None = None,
    suffix: str = DEFAULT_SUFFIX,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run the §3.1 pipeline; returns (qc_df, clean_df, progress_df).

    ``flag_predicates`` maps variable → predicate marking rows to flag
    -2 (the batch generalization of interactive brushing, U1).
    ``rules`` maps variable → kwargs for
    :func:`~qctimeseries_spark.rules.apply_qc_rules` (``lo``/``hi``/
    ``max_step``/``flatline_n``): violations are flagged -2 the same
    way, and the helper columns are stripped afterwards — automated
    screening as a first-class pipeline stage.
    """
    # the same POSIXct-style front-door validation the window/app
    # paths run (R/qc_window_app.R:52-57) — a non-timestamp time_col
    # otherwise sails through flag init and only misbehaves downstream
    validate_time_col(df, time_col)
    flagged = add_flags(df, vars, suffix, time_col=time_col)
    if flag_predicates:
        for var, pred in flag_predicates.items():
            flagged = set_flag(flagged, var, FLAG_MANUAL, selection=pred, suffix=suffix)
    if rules:
        from qctimeseries_spark.rules import apply_qc_rules

        for var, kw in rules.items():
            before = set(flagged.columns)
            screened = apply_qc_rules(flagged, var, time_col, **kw)
            screened = set_flag(
                screened, var, FLAG_MANUAL,
                selection=F.col("any_rule") == 1, suffix=suffix,
            )
            flagged = screened.drop(
                *(set(screened.columns) - before)
            )
    prog = progress(flagged, vars if isinstance(vars, list) else [vars], suffix)
    clean = apply_flags(flagged, suffix=suffix, drop_flags=True)
    return flagged, clean, prog
