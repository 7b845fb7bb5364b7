"""The update vocabulary: conditional set-based flag assignment.

Reference: ``set_flag`` + button handlers, ``R/qc_window_app.R:359-419``
(U1–U6 in SURVEY.md §2.6).  Every update is scoped by
(selection ∩ window ∩ guard); the universal guard never touches
``flag == -1`` (original-NA markers).

The reference mutates in place; here each op is an immutable
``withColumn(flag, when(scope, value).otherwise(flag))`` overlay — a
narrow projection with no shuffle.  Interactive sessions chain overlays
lazily and periodically checkpoint/compact to Parquet (SURVEY.md §4);
only the flag column is ever rewritten, never the value columns.

Selections (``R/qc_window_app.R:211-213`` brushed row-ids) are either a
Column predicate, or an id collection: small collections compile to
``isin`` (a broadcast literal set); large ones should be joined — use
:func:`selection_from_ids` with a DataFrame for a broadcast semi-join
marker that scales to millions of selected ids.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.schema import (
    DEFAULT_SUFFIX,
    FLAG_APPROVED,
    FLAG_MANUAL,
    FLAG_MISSING,
    FLAG_UNCHECKED,
    validate_flag_exists,
)
from qctimeseries_spark.windows import ROWID_COL, WIN_COL

_ISIN_MAX = 10_000  # above this, prefer selection_from_ids(df)


def selection_from_ids(
    df: DataFrame,
    ids: Iterable | DataFrame,
    id_col: str = ROWID_COL,
) -> tuple[DataFrame, Column]:
    """Resolve an id selection (P10) into (possibly-augmented df, predicate).

    Lists compile to ``isin``; an ids DataFrame becomes a broadcast
    left join adding a boolean marker — the scalable path for large
    brushed selections.
    """
    if isinstance(ids, DataFrame):
        marker = "_qc_sel"
        ids_df = ids.select(F.col(ids.columns[0]).alias(id_col)).withColumn(
            marker, F.lit(True)
        )
        joined = df.join(F.broadcast(ids_df), on=id_col, how="left")
        return joined, F.coalesce(F.col(marker), F.lit(False))
    ids = list(ids)
    if len(ids) > _ISIN_MAX:
        raise ValueError(
            f"{len(ids)} ids is too many for an isin literal; pass a DataFrame"
        )
    return df, F.col(id_col).isin(ids)


def _scope(
    df: DataFrame,
    *,
    selection: Column | Iterable | None,
    window: int | None,
    id_col: str,
    win_col: str,
) -> tuple[DataFrame, Column]:
    pred = F.lit(True)
    if selection is not None:
        if isinstance(selection, Column):
            pred = pred & selection
        else:
            df, sel = selection_from_ids(df, selection, id_col)
            pred = pred & sel
    if window is not None:
        pred = pred & (F.col(win_col) == window)
    return df, pred


def _overlay(df: DataFrame, flag: str, pred: Column, value: int) -> DataFrame:
    out = df.withColumn(
        flag, F.when(pred, F.lit(value)).otherwise(F.col(flag)).cast("int")
    )
    return out.drop("_qc_sel") if "_qc_sel" in out.columns else out


def set_flag(
    df: DataFrame,
    var: str,
    value: int,
    *,
    selection: Column | Iterable | None = None,
    window: int | None = None,
    suffix: str = DEFAULT_SUFFIX,
    guard: bool = True,
    id_col: str = ROWID_COL,
    win_col: str = WIN_COL,
) -> DataFrame:
    """U1 generalized: set flag on (selection ∩ window), guarding -1
    (``set_flag`` ``R/qc_window_app.R:359-363``)."""
    f = validate_flag_exists(df, var, suffix)
    df, pred = _scope(
        df, selection=selection, window=window, id_col=id_col, win_col=win_col
    )
    if guard:
        pred = pred & (F.col(f) != FLAG_MISSING)
    return _overlay(df, f, pred, value)


def flag_window(
    df: DataFrame, var: str, window: int, suffix: str = DEFAULT_SUFFIX, **kw
) -> DataFrame:
    """U2: whole window → -2, guard -1 (``R/qc_window_app.R:389-393``)."""
    return set_flag(df, var, FLAG_MANUAL, window=window, suffix=suffix, **kw)


def approve_window(
    df: DataFrame,
    var: str,
    window: int,
    suffix: str = DEFAULT_SUFFIX,
    *,
    win_col: str = WIN_COL,
) -> DataFrame:
    """U3: window rows with flag==0 and non-NULL value → 1
    (``R/qc_window_app.R:394-398``)."""
    f = validate_flag_exists(df, var, suffix)
    pred = (
        (F.col(win_col) == window)
        & (F.col(f) == FLAG_UNCHECKED)
        & F.col(var).isNotNull()
    )
    return _overlay(df, f, pred, FLAG_APPROVED)


def reset_window(
    df: DataFrame, var: str, window: int, suffix: str = DEFAULT_SUFFIX, **kw
) -> DataFrame:
    """U4: window → 0, guard -1 (``R/qc_window_app.R:399-403``)."""
    return set_flag(df, var, FLAG_UNCHECKED, window=window, suffix=suffix, **kw)


def reset_all(df: DataFrame, var: str, suffix: str = DEFAULT_SUFFIX) -> DataFrame:
    """U5: whole table → 0, guard -1 (``R/qc_window_app.R:417-419``)."""
    return set_flag(df, var, FLAG_UNCHECKED, suffix=suffix)


def flag_and_approve_window(
    df: DataFrame,
    var: str,
    window: int,
    selection: Column | Iterable,
    suffix: str = DEFAULT_SUFFIX,
    *,
    id_col: str = ROWID_COL,
    win_col: str = WIN_COL,
) -> DataFrame:
    """U6 compound (``R/qc_window_app.R:406-413``): selected rows → -2,
    then the window's remaining rows with flag==0 and non-NULL value
    → 1.  Two sequential passes to match reference left-to-right
    semantics (SURVEY.md §4 note 3); the -1 guard on the first pass is
    vacuous in the reference (NA rows are never plotted/selectable) but
    we keep it for safety."""
    f = validate_flag_exists(df, var, suffix)
    df, sel = _scope(
        df, selection=selection, window=None, id_col=id_col, win_col=win_col
    )
    step1 = _overlay(df, f, sel & (F.col(f) != FLAG_MISSING), FLAG_MANUAL)
    pred2 = (
        (F.col(win_col) == window)
        & (F.col(f) == FLAG_UNCHECKED)
        & F.col(var).isNotNull()
    )
    return _overlay(step1, f, pred2, FLAG_APPROVED)
