"""Persisted-state tests: partitioned layout, pruned slices, checkpoint."""

import datetime as dt

from pyspark.sql import functions as F

from qctimeseries_spark import add_flags, set_flag
from qctimeseries_spark.sources import read_table
from qctimeseries_spark.state import (
    PART_COL,
    checkpoint_state,
    commit_state,
    load_state,
    save_state,
    slice_state,
)


def _file_stats(root):
    """{relpath: (size, mtime_ns)} for every data file under root."""
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out

SF_DIR = "/root/testdata/sf0.001"


def test_state_roundtrip_and_pruned_slice(spark, tmp_path):
    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    path = str(tmp_path / "state")
    save_state(df, path, time_col="ts", part_hours=48)
    back = load_state(spark, path)
    assert back.count() == df.count()
    assert PART_COL in back.columns

    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)
    sl = slice_state(back, "ts", lo, hi, part_hours=48)
    expected = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert sl.count() == expected.count()

    # the physical plan must prune on the partition column
    plan = sl._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert PART_COL in plan.split("PartitionFilters:")[1][:200]


def test_pre_epoch_slice_not_pruned_away(spark, tmp_path):
    # save buckets with floor division; slice derives its partition
    # range with Python // (also floor).  Pre-1970 timestamps land in
    # negative buckets — a truncate/floor mismatch would prune them out.
    t0 = dt.datetime(1969, 12, 30)
    df = add_flags(
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(hours=6 * i), float(i)) for i in range(20)],
            "event_id int, ts timestamp, value double",
        ),
        "value",
    )
    path = str(tmp_path / "pre_epoch")
    save_state(df, path, time_col="ts", part_hours=48)
    back = load_state(spark, path)
    lo, hi = dt.datetime(1969, 12, 31), dt.datetime(1970, 1, 2)
    sl = slice_state(back, "ts", lo, hi, part_hours=48)
    expected = df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    assert sl.count() == expected.count() > 0


def test_incremental_commit_touches_only_changed_partitions(spark, tmp_path):
    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    path = str(tmp_path / "inc")
    save_state(df, path, time_col="ts", part_hours=48)
    before = _file_stats(path)

    # flag one 48 h slice, commit only that range
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 7)
    updated = set_flag(
        df, "value", -2,
        selection=(F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)),
    )
    commit_state(
        updated, path, time_col="ts", part_hours=48, changed=[(lo, hi)]
    )
    after = _file_stats(path)

    touched_parts = {f"{PART_COL}={p}" for p in (
        int(lo.timestamp() * 1e6) // (48 * 3600 * 1_000_000),
        int(hi.timestamp() * 1e6) // (48 * 3600 * 1_000_000),
    )}
    untouched_before = {
        k: v for k, v in before.items()
        if not any(k.startswith(t) for t in touched_parts)
    }
    untouched_after = {
        k: v for k, v in after.items()
        if not any(k.startswith(t) for t in touched_parts)
    }
    assert untouched_before == untouched_after  # bytes AND mtimes intact
    assert any(k not in before for k in after)  # changed partition rewritten

    # reloaded state equals the overlay table
    back = load_state(spark, path).drop(PART_COL)
    assert (
        back.filter(F.col("value_qcflag") == -2).count()
        == updated.filter(F.col("value_qcflag") == -2).count()
    )
    assert back.count() == df.count()


def test_session_checkpoint_is_incremental(spark, tmp_path):
    from qctimeseries_spark import QcSession

    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    sess = QcSession(df, "value", time_col="ts", win_hours=48)
    path = str(tmp_path / "sess")
    sess.checkpoint(path, part_hours=48)  # first commit: full
    before = _file_stats(path)
    sess.jump(3)
    sess.flag_window()
    sess.checkpoint(path, part_hours=48)  # second: only window 3's range
    after = _file_stats(path)
    untouched = [k for k in before if k in after and before[k] == after[k]]
    assert len(untouched) >= len(before) - 3  # most partitions untouched
    assert len(untouched) < len(before)  # but not all
    # the committed table still reflects the update
    flagged = sess.finish().filter(F.col("value_qcflag") == -2).count()
    assert flagged > 0


def test_checkpoint_compacts_overlays(spark, tmp_path):
    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    for k in range(5):  # stack a few U-op overlays
        df = set_flag(df, "value", -2, selection=F.col("event_id") % 50 == k)
    compacted = checkpoint_state(df, str(tmp_path / "ckpt"), time_col="ts")
    assert (
        compacted.filter(F.col("value_qcflag") == -2).count()
        == df.filter(F.col("value_qcflag") == -2).count()
    )
    # lineage is one scan deep after the checkpoint
    plan = compacted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_concurrent_commits_disjoint_land_stale_overlap_raises(spark, tmp_path):
    """Optimistic concurrency via the commit manifest: two writers from
    the same base version both land when they touch disjoint
    partitions; a writer whose base predates another commit to the SAME
    partition fails with StaleCommitError instead of silently
    clobbering it."""
    import pytest

    from qctimeseries_spark.state import StaleCommitError, state_version

    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    )
    path = str(tmp_path / "cc")
    save_state(df, path, time_col="ts", part_hours=48)
    base = state_version(path)

    r1 = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2, 23))
    r2 = (dt.datetime(2024, 1, 9), dt.datetime(2024, 1, 10, 23))

    # session A commits range 1 from `base`
    a = set_flag(
        df, "value", -2,
        selection=(F.col("ts") >= F.lit(r1[0])) & (F.col("ts") < F.lit(r1[1])),
    )
    commit_state(a, path, time_col="ts", part_hours=48,
                 changed=[r1], base_version=base)

    # session B, ALSO from `base`, commits a disjoint range — lands
    b = set_flag(
        df, "value", 1,
        selection=(F.col("ts") >= F.lit(r2[0])) & (F.col("ts") < F.lit(r2[1])),
    )
    commit_state(b, path, time_col="ts", part_hours=48,
                 changed=[r2], base_version=base)

    # both edits survive in the reloaded table
    back = load_state(spark, path)
    assert back.filter(F.col("value_qcflag") == -2).count() > 0
    assert back.filter(F.col("value_qcflag") == 1).count() > 0

    # session C from the same stale base touches range 1 again — raises
    c = set_flag(
        df, "value", 0,
        selection=(F.col("ts") >= F.lit(r1[0])) & (F.col("ts") < F.lit(r1[1])),
    )
    with pytest.raises(StaleCommitError, match="reload"):
        commit_state(c, path, time_col="ts", part_hours=48,
                     changed=[r1], base_version=base)

    # after reloading the current version the same commit goes through
    commit_state(c, path, time_col="ts", part_hours=48,
                 changed=[r1], base_version=state_version(path))
    assert state_version(path) == base + 3


def test_qcsession_contended_commit_retry_converges(spark, tmp_path):
    """r9 verdict task 6, session level: two QcSessions loaded from the
    same state version edit OVERLAPPING ranges; the first checkpoint
    lands, the loser gets StaleCommitError (attach_state wires the
    manifest protocol into the session — before r10 no session passed
    its base version, so the second writer silently clobbered the
    first), and the reload + re-apply retry converges to the
    serialized A-then-B result."""
    import pytest

    from qctimeseries_spark.app import QcSession
    from qctimeseries_spark.state import StaleCommitError
    from qctimeseries_spark.windows import with_rowid

    flagged = with_rowid(
        add_flags(
            read_table(spark, SF_DIR, "events")
            .filter(F.col("user_id") == 7)
            .select("event_id", "ts", "value"),
            "value",
        ),
        "ts",
    )
    path = str(tmp_path / "sess")
    save_state(flagged, path, time_col="ts", part_hours=48)

    def load_sess():
        s = QcSession(
            load_state(spark, path).drop(PART_COL),
            "value", time_col="ts", win_hours=48.0,
        )
        s.attach_state(path)
        return s

    # five still-unflagged rowids inside window 0 — B's edit targets
    a = load_sess()
    b = load_sess()
    w0 = a.main_trace()  # current window = 0
    ids = [r.rowid for r in w0.limit(5).collect()]
    assert len(ids) == 5
    n_unflagged_w0 = (
        a._windowed()
        .filter((F.col("win_id") == a.current_win_id)
                & (F.col("value_qcflag") == 0))
        .count()
    )

    a.approve_unflagged()  # window 0: flag 0 -> 1
    b.flag_selection(ids)  # same window: 5 rows -> -2

    # a commit staged at a DIFFERENT bucket width is refused outright —
    # it would write a parallel partition layout, duplicating rows
    with pytest.raises(ValueError, match="part_hours"):
        a.checkpoint(path)  # QcSession default 720 vs the table's 48

    a.checkpoint(path, part_hours=48)  # first writer lands
    with pytest.raises(StaleCommitError, match="reload"):
        b.checkpoint(path, part_hours=48)  # overlapping parts, stale base

    # the loser's retry protocol: reload (sees A's approvals),
    # re-apply the edit, commit from the fresh base
    b2 = load_sess()
    b2.flag_selection(ids)
    b2.checkpoint(path, part_hours=48)

    # serialized A-then-B result: every window-0 unflagged row was
    # approved by A, then B's five moved to -2
    final = load_state(spark, path)
    assert final.filter(F.col("value_qcflag") == -2).count() == 5
    assert (
        final.filter(F.col("value_qcflag") == 1).count()
        == n_unflagged_w0 - 5
    )
    assert set(
        r.rowid for r in final.filter(F.col("value_qcflag") == -2).collect()
    ) == set(ids)


def test_bucketed_state_join_has_no_exchange(spark, tmp_path):
    """Base series and flag sidecar bucketed on rowid join as a
    zero-Exchange sort-merge join — the layout that lets a 100 TB base
    table apply a flag overlay without being shuffled."""
    from qctimeseries_spark.state import read_bucketed, save_bucketed

    base = spark.range(0, 2000).select(
        F.col("id").alias("rowid"), (F.col("id") * 2.0).alias("value")
    )
    flags = spark.range(0, 2000, 7).select(
        F.col("id").alias("rowid"), F.lit(-2).alias("value_qcflag")
    )
    save_bucketed(base, "t_base", buckets=4, path=str(tmp_path / "b"))
    save_bucketed(flags, "t_flags", buckets=4, path=str(tmp_path / "f"))
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_ord = spark.conf.get(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_bucketed(spark, "t_base").join(
                read_bucketed(spark, "t_flags"), "rowid"
            )
            assert j.count() == flags.count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            # with the scan-ordering conf on (and one file per bucket,
            # which save_bucketed guarantees), even the join-side Sort
            # is elided
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
            )
            j2 = read_bucketed(spark, "t_base").join(
                read_bucketed(spark, "t_flags"), "rowid"
            )
            plan2 = j2._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan2
            assert "Sort [rowid" not in plan2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.set(
                "spark.sql.legacy.bucketedTableScan.outputOrdering", prev_ord
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_base")
        spark.sql("DROP TABLE IF EXISTS t_flags")


def test_compact_state_preserves_rows_and_reduces_files(spark, tmp_path):
    """Compaction rewrites fragmented partitions into one file each,
    preserves row content exactly, bumps the version, and respects
    concurrent-writer detection."""
    import os

    from qctimeseries_spark.state import (
        StaleCommitError,
        compact_state,
        state_version,
    )

    df = add_flags(
        read_table(spark, SF_DIR, "events").select("event_id", "ts", "value"),
        "value",
    ).repartition(8)  # fragment: up to 8 files per partition dir
    path = str(tmp_path / "frag")
    save_state(df, path, time_col="ts", part_hours=48)

    def data_files():
        return [
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]

    before_files = len(data_files())
    before_rows = sorted(
        tuple(r) for r in load_state(spark, path).drop(PART_COL).collect()
    )
    v0 = state_version(path)

    compact_state(spark, path, files_per_partition=1)
    after_files = len(data_files())
    after_rows = sorted(
        tuple(r) for r in load_state(spark, path).drop(PART_COL).collect()
    )
    assert after_rows == before_rows
    assert after_files < before_files
    assert state_version(path) == v0 + 1

    # a compaction based on the pre-compaction version must refuse
    import pytest as _pytest

    with _pytest.raises(StaleCommitError):
        compact_state(spark, path, base_version=v0)
