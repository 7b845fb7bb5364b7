"""QcSession interactive latency budget (VERDICT r8 task 7 /
SURVEY §7.4 risk 6).

Measures the per-EVENT cost of the reference's review loop — brush →
flag_selection → redraw slices → next window — on the sf events
table, with Spark job counts per event (``job_audit``), as the
overlay stack deepens, and across a :meth:`QcSession.checkpoint`
compaction.  The output is the BENCHNOTES "event → jobs → wall" table
plus the measured checkpoint cadence that keeps events sub-second.

Usage: python tools/qcsession_latency.py [sf_dir] [events_per_cycle]
(defaults /root/testdata/sf0.1, 10)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycle = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    import qctimeseries_spark as qc
    from qctimeseries_spark.app import QcSession
    from qctimeseries_spark.plans import job_audit
    from qctimeseries_spark.session import get_spark
    from qctimeseries_spark.sources import read_table

    spark = get_spark("qcsession_latency")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value"
    )
    qc_df = qc.add_flags(ev, "value")
    sess = QcSession(qc_df, "value", time_col="ts", win_hours=24.0,
                     id_col="event_id")
    n_rows = ev.count()
    print(f"# sf_dir={sf_dir} rows={n_rows:,} windows={sess.n_windows}")

    def event(tag, fn):
        t0 = time.time()
        audit = job_audit(spark, fn)
        dt = time.time() - t0
        print(f"{tag}: jobs={audit['jobs']} wall={dt:.2f}s")
        return audit["jobs"], dt

    def redraw():
        # the three slices a front-end pulls after any update
        sess.main_trace().write.format("noop").mode("overwrite").save()
        sess.approved_overlay().write.format("noop").mode(
            "overwrite"
        ).save()
        sess.flagged_overlay().write.format("noop").mode(
            "overwrite"
        ).save()

    ids = [int(r[0]) for r in
           ev.select("event_id").limit(50).collect()]

    rows = []
    # one full interactive cycle, cold
    rows.append(("flag_selection(50 ids)",
                 *event("flag_selection", lambda: sess.flag_selection(ids))))
    rows.append(("redraw x3 slices",
                 *event("redraw", redraw)))
    rows.append(("approve_selection(50)",
                 *event("approve_selection",
                        lambda: sess.approve_selection(ids))))
    rows.append(("flag_window (U2)",
                 *event("flag_window", sess.flag_window)))
    rows.append(("approve_unflagged (U3)",
                 *event("approve_unflagged", sess.approve_unflagged)))
    rows.append(("next + redraw",
                 *event("next+redraw",
                        lambda: (sess.next(), redraw()))))

    # overlay-stack growth: run `cycle` more flag+redraw events, then
    # checkpoint and measure the same event again
    print(f"# stacking {cycle} more flag_selection+redraw events ...")
    walls = []
    for i in range(cycle):
        t0 = time.time()
        sess.flag_selection(ids[: 10 + i])
        redraw()
        walls.append(time.time() - t0)
    print("# per-event wall while stacking:",
          [round(w, 2) for w in walls])
    deep_jobs, deep_wall = event(
        f"flag+redraw @ depth {cycle + 6}",
        lambda: (sess.flag_selection(ids), redraw()),
    )
    ckpt = tempfile.mkdtemp() + "/ckpt"
    t0 = time.time()
    sess.checkpoint(ckpt)
    ck_wall = time.time() - t0
    print(f"checkpoint: wall={ck_wall:.2f}s")
    shallow_jobs, shallow_wall = event(
        "flag+redraw after checkpoint",
        lambda: (sess.flag_selection(ids), redraw()),
    )
    print("\n=== BENCHNOTES table ===")
    print("| event | jobs | wall (s) |")
    print("|---|---|---|")
    for tag, j, w in rows:
        print(f"| {tag} | {j} | {w:.2f} |")
    print(f"| flag+redraw @ overlay depth {cycle + 6} | {deep_jobs} "
          f"| {deep_wall:.2f} |")
    print(f"| checkpoint() compaction | — | {ck_wall:.2f} |")
    print(f"| flag+redraw after checkpoint | {shallow_jobs} "
          f"| {shallow_wall:.2f} |")
    stack_growth = (walls[-1] / walls[0]) if walls[0] else float("nan")
    print(f"# stack growth over {cycle} events: {stack_growth:.2f}x; "
          f"post-checkpoint event {shallow_wall:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
