"""Interactive QC session driver — the engine-side replica of the
reference's window-by-window review loop.

The reference's core deliverable is a Shiny app (``qc_window_app``,
``R/qc_window_app.R:42-448``) holding mutable session state (the
flagged data.table, the admitted-window index, the current-window
pointer, remembered x/y zoom ranges) and dispatching button/hotkey
events onto flag updates (U1–U6), plot re-slices (V1–V4), and window
index rebuilds (W6).  :class:`QcSession` is that controller without the
UI: every event handler becomes a method over the existing batch
operators, so a front-end (notebook widget, plotly app, REST shim) only
renders the DataFrames the session hands back.

Execution model mapping (SURVEY.md §3.2/§4):

- the reference mutates ``dt`` in place; here each update stacks an
  immutable ``when()`` overlay on ``self.df`` — :meth:`checkpoint`
  compacts the stack to partitioned Parquet and restarts lineage (the
  durable equivalent of the reference's in-memory table).
- ``win_rows`` (a driver-side list of row indices per window,
  ``R/qc_window_app.R:67-79``) becomes the *admitted-window index*: one
  tiny row per admitted window, collected to the driver.  Only window
  ids live on the driver, never data rows — the 100 TB-safe version of
  the same idea.
- the index is rebuilt only on width/filter change
  (``R/qc_window_app.R:426-439``), never after flag updates — matching
  the reference, where a fully-approved window stays in the index until
  the next rebuild.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.schema import (
    DEFAULT_SUFFIX,
    FLAG_MANUAL,
    FLAG_APPROVED,
    FLAG_UNCHECKED,
    flag_col,
    validate_flag_exists,
    validate_time_col,
)
from qctimeseries_spark.state import checkpoint_state
from qctimeseries_spark.updates import (
    approve_window,
    flag_and_approve_window,
    set_flag,
)
from qctimeseries_spark.viz import (
    approved_overlay,
    display_tz,
    flagged_overlay,
    main_trace,
    secondary_trace,
)
from qctimeseries_spark.windows import (
    ROWID_COL,
    WIN_COL,
    admitted_windows,
    assign_windows,
    window_anchor,
    window_extent,
    with_rowid,
)


class QcSession:
    """One interactive QC pass over one variable of a flagged table.

    Replays the event vocabulary of ``qc_window_app``
    (``R/qc_window_app.R:194-448``): navigation (prev/next/jump/home),
    brushed-point updates (flag/approve/unflag selection), window
    updates (flag window / approve unflagged / reset window / reset
    all), the compound flag-selected-and-advance, zoom memory, window
    re-indexing on width or filter change, and the final
    "return the mutated table" exit (``R/qc_window_app.R:442-447``).

    ``current_win`` is the dense index into the admitted-window list
    (what the reference's Window N / M label shows), not the raw
    ``win_id``.
    """

    def __init__(
        self,
        df: DataFrame,
        var: str,
        *,
        time_col: str,
        win_hours: float = 168.0,
        suffix: str = DEFAULT_SUFFIX,
        include: tuple[int, ...] = (-2, 0, 1),
        tz_user: str | None = None,
        id_col: str = ROWID_COL,
    ) -> None:
        validate_time_col(df, time_col)
        validate_flag_exists(df, var, suffix)  # R/qc_window_app.R:60-63
        self.var = var
        self.time_col = time_col
        self.suffix = suffix
        self.tz_user = tz_user
        self.id_col = id_col
        self.win_hours = float(win_hours)
        self.include = tuple(include)
        if id_col not in df.columns:  # .rowid := .I, R/qc_window_app.R:66
            df = with_rowid(df, time_col, id_col)
        self._anchor = window_anchor(df, time_col)
        self.df = df.drop(WIN_COL) if WIN_COL in df.columns else df
        self.current_win = 0
        self.x_range: tuple | None = None
        self.y_range: tuple[float, float] | None = None
        # time ranges touched since the last checkpoint; None = whole
        # table dirty (forces a full commit)
        self._dirty: list[tuple[_dt.datetime, _dt.datetime]] | None = []
        # overlay-depth budget: each U-op stacks one more when() layer
        # on self.df, and the DRIVER-side cost of re-analyzing that
        # lineage grows superlinearly — measured at sf0.1: 0.43 s per
        # flag+redraw event at depth 1 → 185 s at depth 16
        # (tools/qcsession_latency.py).  Every `compact_every` overlay
        # events the session cuts lineage with an eager
        # localCheckpoint (~1 s at sf0.1), which keeps EVERY event
        # sub-second; the durable checkpoint() and its dirty-range
        # bookkeeping are unaffected (localCheckpoint is volatile and
        # orthogonal).  0 disables.
        self.compact_every = 6
        self._overlay_depth = 0
        # optimistic-concurrency anchor (attach_state): the manifest
        # version this session's view of `path` is based on — None
        # until attached, which keeps the single-writer reference
        # semantics (no detection) unless a workflow opts in
        self._state_path: str | None = None
        self._base_version: int | None = None
        self._reindex()

    def _bump_overlay(self) -> None:
        self._overlay_depth += 1
        if self.compact_every and self._overlay_depth >= self.compact_every:
            self.df = self.df.localCheckpoint(eager=True)
            self._overlay_depth = 0

    # -- window index (make_windows, R/qc_window_app.R:67-79) ---------------

    def _windowed(self) -> DataFrame:
        return assign_windows(
            self.df, self.time_col, self.win_hours, anchor=self._anchor
        )

    def _reindex(self) -> None:
        idx = (
            admitted_windows(
                self._windowed(), self.var, self.suffix, include=self.include
            )
            .orderBy("win_index")
            .collect()
        )
        self._win_ids = [r[WIN_COL] for r in idx]
        self.current_win = min(self.current_win, max(self.n_windows - 1, 0))

    @property
    def n_windows(self) -> int:
        return len(self._win_ids)

    @property
    def current_win_id(self) -> int:
        """Raw win_id of the current admitted window."""
        if not self._win_ids:
            raise ValueError("no admitted windows")
        return self._win_ids[self.current_win]

    def rewindow(
        self,
        win_hours: float | None = None,
        include: tuple[int, ...] | None = None,
    ) -> None:
        """W6: rebuild the index on width or filter change, clamping the
        pointer (``R/qc_window_app.R:426-439``)."""
        if win_hours is not None:
            if not win_hours > 0:
                raise ValueError(f"win_hours must be > 0, got {win_hours}")
            self.win_hours = float(win_hours)
        if include is not None:
            self.include = tuple(include)
        self._reindex()

    # -- navigation (R/qc_window_app.R:369-381) ------------------------------

    def prev(self) -> int:
        if self.current_win > 0:
            self.current_win -= 1
            self._reset_zoom()
        return self.current_win

    def next(self) -> int:
        if self.current_win < self.n_windows - 1:
            self.current_win += 1
            self._reset_zoom()
        return self.current_win

    def jump(self, win_index: int) -> int:
        if 0 <= win_index < self.n_windows and win_index != self.current_win:
            self.current_win = int(win_index)
            self._reset_zoom()
        return self.current_win

    # -- zoom memory (R/qc_window_app.R:344-356, 382-387) --------------------

    def brush_zoom(
        self,
        x_range: tuple | None = None,
        y_range: tuple[float, float] | None = None,
    ) -> None:
        """Remember a plotly relayout: either axis may update alone."""
        if x_range is not None:
            self.x_range = tuple(x_range)
        if y_range is not None:
            self.y_range = (float(y_range[0]), float(y_range[1]))

    def home_zoom(self) -> None:
        self._reset_zoom()

    def _reset_zoom(self) -> None:
        self.x_range = None
        self.y_range = None

    # -- dirty-range tracking (feeds incremental checkpoints) ----------------

    def _mark_window_dirty(self, wid: int) -> None:
        if self._dirty is not None:
            self._dirty.append(
                window_extent(self._anchor, wid, self.win_hours, pad=0.0)
            )

    def _mark_selection_dirty(self, ids) -> None:
        """Touched extent of an id selection — one tiny narrow agg (no
        shuffle) buys partition-pruned checkpoints for the common
        brush-and-flag workflow."""
        if self._dirty is None:
            return
        from qctimeseries_spark.updates import selection_from_ids

        d, pred = selection_from_ids(self.df, ids, self.id_col)
        row = (
            d.filter(pred)
            .agg(F.min(self.time_col), F.max(self.time_col))
            .collect()[0]
        )
        if row[0] is not None:
            self._dirty.append((row[0], row[1]))

    # -- point events (set_flag + buttons, R/qc_window_app.R:359-367) -------

    def _set_selection(self, ids, value: int) -> None:
        self._mark_selection_dirty(ids)
        self.df = set_flag(
            self.df, self.var, value,
            selection=ids, suffix=self.suffix, id_col=self.id_col,
        )
        self._bump_overlay()

    def flag_selection(self, ids) -> None:
        """Brushed points → -2 (``input$flag_sel``).  ``ids`` is a list
        of rowids or an ids DataFrame (broadcast-semi-join path)."""
        self._set_selection(ids, FLAG_MANUAL)

    def approve_selection(self, ids) -> None:
        self._set_selection(ids, FLAG_APPROVED)

    def unflag_selection(self, ids) -> None:
        self._set_selection(ids, FLAG_UNCHECKED)

    # -- window events (R/qc_window_app.R:389-403, 406-419) ------------------

    def _update_window(self, fn) -> None:
        # updates need win_id in scope; assign, apply, drop — the window
        # column never persists into session state, matching the
        # reference's exit-time column drop.
        out = fn(self._windowed())
        self.df = out.drop(WIN_COL)
        self._bump_overlay()

    def flag_window(self) -> None:
        """U2: everything in the current window → -2 (guard -1)."""
        wid = self.current_win_id
        self._mark_window_dirty(wid)
        self._update_window(
            lambda d: set_flag(d, self.var, FLAG_MANUAL,
                               window=wid, suffix=self.suffix)
        )

    def approve_unflagged(self) -> None:
        """U3: unchecked non-null rows in the current window → 1."""
        wid = self.current_win_id
        self._mark_window_dirty(wid)
        self._update_window(
            lambda d: approve_window(d, self.var, wid, self.suffix)
        )

    def reset_window(self) -> None:
        """U4: current window → 0 (guard -1)."""
        wid = self.current_win_id
        self._mark_window_dirty(wid)
        self._update_window(
            lambda d: set_flag(d, self.var, FLAG_UNCHECKED,
                               window=wid, suffix=self.suffix)
        )

    def reset_all(self) -> None:
        """U5: whole table → 0 (guard -1)."""
        self._dirty = None  # table-wide: next checkpoint is full
        self.df = set_flag(self.df, self.var, FLAG_UNCHECKED, suffix=self.suffix)
        self._bump_overlay()

    def flag_selection_and_advance(self, ids) -> int:
        """U6 compound (``input$flag_sel_next``): selection → -2, rest
        of the window's unchecked non-null rows → 1, advance."""
        wid = self.current_win_id
        self._mark_selection_dirty(ids)  # selection may reach outside
        self._mark_window_dirty(wid)
        self._update_window(
            lambda d: flag_and_approve_window(
                d, self.var, wid, ids, self.suffix, id_col=self.id_col
            )
        )
        return self.next()

    # -- display slices (build_plot, R/qc_window_app.R:251-312) --------------

    def _edge_tz(self, sl: DataFrame) -> DataFrame:
        return (
            display_tz(sl, self.time_col, self.tz_user) if self.tz_user else sl
        )

    def main_trace(self, *, hide_flagged: bool = False) -> DataFrame:
        """V1 slice of the current window (P6 optional, P7 always)."""
        return self._edge_tz(
            main_trace(
                self._windowed(), self.var, self.time_col, self.current_win_id,
                hide_flagged=hide_flagged, suffix=self.suffix,
                id_col=self.id_col,
            )
        )

    def approved_overlay(self) -> DataFrame:
        return self._edge_tz(
            approved_overlay(
                self._windowed(), self.var, self.time_col, self.current_win_id,
                suffix=self.suffix, id_col=self.id_col,
            )
        )

    def flagged_overlay(self) -> DataFrame:
        return self._edge_tz(
            flagged_overlay(
                self._windowed(), self.var, self.time_col, self.current_win_id,
                suffix=self.suffix, id_col=self.id_col,
            )
        )

    def secondary_trace(self, sec_var: str) -> DataFrame:
        return self._edge_tz(
            secondary_trace(
                self._windowed(), sec_var, self.time_col, self.current_win_id,
                suffix=self.suffix,
            )
        )

    def suggest_outliers(
        self,
        *,
        window_seconds: float | None = None,
        z: float = 4.0,
        min_n: int = 5,
    ) -> list[int]:
        """Rolling z-score outlier CANDIDATES in the current window:
        rowids of unchecked (flag 0) values sitting more than ``z``
        trailing-window deviations from the rolling mean.  Automation
        proposes, the reviewer disposes — pass the ids straight to
        :meth:`flag_selection` / :meth:`approve_selection` after
        eyeballing the trace.

        Runs over the PRUNED current-window slice only (the one-window-
        at-a-time discipline), so the trailing context restarts at the
        window's left edge.  Default rolling width = 1/8 of the QC
        window.
        """
        from qctimeseries_spark.windows import flag_outlier_candidates

        window_seconds = window_seconds or self.win_hours * 3600.0 / 8
        f = flag_col(self.var, self.suffix)
        sl = self._windowed().filter(F.col(WIN_COL) == self.current_win_id)
        cands = flag_outlier_candidates(
            sl, self.time_col, self.var,
            window_seconds=window_seconds, z=z, min_n=min_n,
        ).filter((F.col("is_outlier") == 1) & (F.col(f) == 0))
        return [r[self.id_col] for r in cands.select(self.id_col).collect()]

    def suggest_drift(
        self,
        *,
        target: float | None = None,
        slack: float | None = None,
        threshold: float | None = None,
    ) -> list[int]:
        """CUSUM drift CANDIDATES in the current window: rowids of
        unchecked (flag 0) rows while either one-sided CUSUM statistic
        exceeds ``threshold`` — the slow-creep complement to
        :meth:`suggest_outliers`, which only sees per-point deviation.
        Same contract: automation proposes, the reviewer disposes.

        Defaults derive from the window's own slice: ``target`` = its
        mean, ``slack`` = 0.5 σ, ``threshold`` = 4 σ (tuning knobs, not
        statistics — pass explicit values for a calibrated screen).
        Runs over the pruned current-window slice only.
        """
        from qctimeseries_spark.windows import cusum

        f = flag_col(self.var, self.suffix)
        sl = self._windowed().filter(
            (F.col(WIN_COL) == self.current_win_id)
            & F.col(self.var).isNotNull()
        )
        if target is None or slack is None or threshold is None:
            stats = sl.agg(
                F.avg(self.var).alias("m"), F.stddev(self.var).alias("s")
            ).collect()[0]
            if stats["m"] is None or not stats["s"]:
                return []
            target = target if target is not None else float(stats["m"])
            slack = slack if slack is not None else 0.5 * float(stats["s"])
            threshold = (
                threshold if threshold is not None else 4.0 * float(stats["s"])
            )
        cands = cusum(
            sl,
            self.var,
            self.time_col,
            target=target,
            slack=slack,
            threshold=threshold,
            ties=[self.id_col],
        ).filter(F.col("cusum_alarm") & (F.col(f) == 0))
        return [r[self.id_col] for r in cands.select(self.id_col).collect()]

    def window_progress(self, *, hide_complete: bool = False):
        """Per-window review dashboard: A1's progress columns for every
        window of the current index (``hide_complete`` keeps only the
        windows still needing eyes) — the batch answer to "where do I
        navigate next"."""
        from qctimeseries_spark.summary import progress_by_window

        return progress_by_window(
            self._windowed(), self.var, self.suffix,
            hide_complete=hide_complete,
        ).orderBy(WIN_COL)

    def window_label(self) -> str:
        """"Window N / M   t0 - t1" over the window's actual rows
        (``R/qc_window_app.R:338-341``)."""
        rng = (
            self._windowed()
            .filter(F.col(WIN_COL) == self.current_win_id)
            .agg(F.min(self.time_col), F.max(self.time_col))
            .collect()[0]
        )
        return (
            f"Window {self.current_win + 1} / {self.n_windows}   "
            f"{rng[0]:%Y-%m-%d %H:%M} - {rng[1]:%Y-%m-%d %H:%M}"
        )

    def secondary_choices(self) -> list[str]:
        """Columns offerable as the secondary series — everything except
        flag columns, the time column, the main variable, and helper
        columns (``sec_choices``, ``R/qc_window_app.R:205-210``)."""
        hidden = {self.time_col, self.var, self.id_col, WIN_COL}
        return [
            c
            for c in self.df.columns
            if not c.endswith(self.suffix) and c not in hidden
        ]

    def window_xr(self, pad: float = 0.02) -> tuple[_dt.datetime, _dt.datetime]:
        """W7 nominal x-extent of the current window ±pad
        (``window_xr0``, ``R/qc_window_app.R:215-226``)."""
        return window_extent(self._anchor, self.current_win_id, self.win_hours, pad)

    # -- persistence / exit --------------------------------------------------

    def attach_state(self, path: str) -> None:
        """Opt this session into optimistic concurrent-writer detection
        against the state table at ``path`` (r9 verdict task 6: the
        manifest protocol existed but no session passed its base
        version, so two QcSessions editing the SAME window silently
        clobbered each other).  Records the manifest version the
        session's current view is based on; every later
        :meth:`checkpoint` to the same path passes it as
        ``base_version``, so a commit whose partitions another writer
        has since rewritten fails with
        :class:`~qctimeseries_spark.state.StaleCommitError` instead of
        landing.  Call right after loading the session's frame from
        ``path`` (the version must be observed BEFORE the edits it
        covers); on StaleCommitError, reload the table, re-apply the
        edits, re-attach, and retry.  Unattached sessions keep the
        reference's single-writer semantics (no detection)."""
        from qctimeseries_spark.state import state_version

        self._state_path = path
        self._base_version = state_version(path)

    def checkpoint(self, path: str, *, part_hours: int = 720) -> None:
        """Compact the stacked update overlays to partitioned Parquet
        and restart lineage (SURVEY.md §4; the durable version of the
        reference's in-place table).  Commits incrementally: only the
        partitions overlapping the session's dirty time ranges are
        rewritten (dynamic partition overwrite); a clean first commit
        or a table-wide op (reset_all) falls back to a full write.
        When :meth:`attach_state` was called for this ``path``, the
        commit carries the session's base version — concurrent writers
        to the same partitions raise
        :class:`~qctimeseries_spark.state.StaleCommitError` (the
        session state is untouched then: reload, re-apply, retry);
        after a successful commit the base advances to the committed
        version."""
        base = (
            self._base_version if path == self._state_path else None
        )
        self.df = checkpoint_state(
            self.df, path, time_col=self.time_col, part_hours=part_hours,
            changed=self._dirty, base_version=base,
        )
        self._dirty = []
        if path == self._state_path:
            from qctimeseries_spark.state import state_version

            self._base_version = state_version(path)

    def finish(self) -> DataFrame:
        """Exit: the flagged table, helper columns dropped
        (``R/qc_window_app.R:442-447``)."""
        drop = [c for c in (WIN_COL,) if c in self.df.columns]
        return self.df.drop(*drop) if drop else self.df
