"""Flag-column conventions, metadata, and validation.

The reference's data model (SURVEY.md §1) is one flat time-series table
with, per QC'd variable ``v``, an integer flag column named
``v + suffix`` (suffix default ``"_qcflag"``; reference
``R/qc_flags.R:58``).  Flag domain (``R/qc_flags.R:3-4``):

    1 = approved, 0 = unchecked, -1 = original NA (auto), -2 = manual.

The reference stores the QC'd-variable list in R attributes
(``qc_vars``/``qc_suffix``, ``R/qc_flags.R:87-90``).  Attributes don't
survive arbitrary DataFrame transforms or Parquet round-trips reliably,
so the durable source of truth here is the *naming convention* —
``qc_vars`` discovers flagged variables by suffix scan, the same
fallback the reference itself uses (``R/qc_flags.R:112``,
``R/qc_plots.R:139-146``).  StructField metadata is additionally written
by ``add_flags`` for tooling, but never required.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FLAG_APPROVED = 1
FLAG_UNCHECKED = 0
FLAG_MISSING = -1  # original NA, set automatically at flag init
FLAG_MANUAL = -2  # manually flagged bad
FLAG_DOMAIN = (FLAG_MANUAL, FLAG_MISSING, FLAG_UNCHECKED, FLAG_APPROVED)

DEFAULT_SUFFIX = "_qcflag"
DEFAULT_TIME_COL = "DateTime"

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def flag_col(var: str, suffix: str = DEFAULT_SUFFIX) -> str:
    """Flag-column name for a variable (reference ``R/qc_flags.R:58``)."""
    return f"{var}{suffix}"


def base_var(flag_name: str, suffix: str = DEFAULT_SUFFIX) -> str:
    """Inverse of :func:`flag_col` (reference ``R/qc_plots.R:144``)."""
    return re.sub(re.escape(suffix) + "$", "", flag_name)


def qc_vars(df: DataFrame, suffix: str = DEFAULT_SUFFIX) -> list[str]:
    """Variables with a flag column, by suffix convention.

    Mirrors ``qc_is_flagged_df`` discovery (``R/qc_flags.R:223-234``):
    a variable counts only if both ``v`` and ``v+suffix`` exist.
    """
    cols = set(df.columns)
    return [
        base_var(c, suffix)
        for c in df.columns
        if c.endswith(suffix) and base_var(c, suffix) in cols
    ]


def is_flagged(df: DataFrame, suffix: str = DEFAULT_SUFFIX) -> bool:
    """True if the table carries at least one QC flag column."""
    return len(qc_vars(df, suffix)) > 0


def is_numeric_col(df: DataFrame, name: str) -> bool:
    return isinstance(df.schema[name].dataType, _NUMERIC_TYPES)


def numeric_cols(df: DataFrame, exclude: tuple[str, ...] = ()) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC_TYPES) and f.name not in exclude
    ]


def validate_time_col(df: DataFrame, time_col: str) -> None:
    """Hard-error unless ``time_col`` exists and is a timestamp.

    Mirrors the reference's POSIXct validation
    (``R/qc_window_app.R:52-57``, ``R/ts_viewer.R:46-52``).
    """
    if time_col not in df.columns:
        raise ValueError(f"time column {time_col!r} not found in {df.columns}")
    dt = df.schema[time_col].dataType
    if not isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        raise TypeError(
            f"time column {time_col!r} must be a timestamp, got {dt.simpleString()}; "
            "cast it with to_timestamp() first"
        )


def validate_flag_exists(df: DataFrame, var: str, suffix: str = DEFAULT_SUFFIX) -> str:
    """Hard-error unless ``var``'s flag column exists
    (``R/qc_window_app.R:59-62``). Returns the flag column name."""
    f = flag_col(var, suffix)
    if f not in df.columns:
        raise ValueError(
            f"flag column {f!r} not found — run add_flags({var!r}) first"
        )
    return f


def flag_metadata(suffix: str = DEFAULT_SUFFIX) -> dict:
    """StructField metadata stamped on flag columns by ``add_flags``."""
    return {"qc_flag": True, "qc_suffix": suffix}
