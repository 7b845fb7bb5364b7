"""Runnable end-to-end EVENT-ANALYTICS workflow — the time-series
analysis layer the round-10 operators added, as a script (no reference
equivalent; the reference is a single-table QC tool, SURVEY.md §2.7):

    the events table → per-user trend (exact OLS slope + r²) and
    lag-1 autocorrelation → each event joined to its NEAREST
    calibration record (bidirectional as-of, single window pass) →
    click→purchase attribution as a watermarked STREAM-STREAM join,
    drained and reconciled against the batch range join.

Every number here is computed with the engine's exact-arithmetic
discipline (integer-cent sums, cross-multiplied comparisons, double
only at the final division), so the same pipeline hash-matches the
DuckDB oracles in the registry.

Usage:
    python examples/event_analytics.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001.  Everything here is the public
API; swap paths/horizons for your own event stream.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from qctimeseries_spark.joins import nearest_join  # noqa: E402
from qctimeseries_spark.queries import (  # noqa: E402
    q_a18_trend,
    q_a19_autocorr,
)
from qctimeseries_spark.session import get_spark  # noqa: E402
from qctimeseries_spark.sources import read_table  # noqa: E402
from qctimeseries_spark.streaming import (  # noqa: E402
    run_available_now,
    stream_events,
    stream_stream_join,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event_analytics")

    # 1. per-user trend: exact OLS slope (value units / second) + r²
    trend = q_a18_trend(spark, sf_dir)
    drifting = trend.filter(F.abs(F.col("slope_per_sec")) > 0).count()
    steepest = trend.orderBy(F.abs(F.col("slope_per_sec")).desc()).first()
    print(
        f"trend: {drifting} users with a nonzero drift; steepest ="
        f" user {steepest.user_id} at {steepest.slope_per_sec:.3e}/s"
        f" (r2={steepest.r2:.4f} over n={steepest.n})"
    )

    # 2. lag-1 autocorrelation — is the series bursty or memoryless?
    acf = q_a19_autocorr(spark, sf_dir)
    pos = acf.filter(F.col("acf1") > 0.1).count()
    print(f"autocorrelation: {pos} of {acf.count()} users with acf1 > 0.1")

    # 3. nearest calibration per event (either direction, tie=earlier)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    cal = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("cal_value"))
    )
    near = nearest_join(ev, cal, on="ts", by="user_id")
    matched = near.filter(F.col("r_ts").isNotNull()).count()
    print(f"nearest calibration: {matched}/{near.count()} events matched")

    # 4. click->purchase attribution as a stream-stream join, drained
    #    and reconciled against the batch range join
    def side(kind):
        return stream_events(spark, sf_dir).filter(
            F.col("event_type") == kind
        ).select("event_id", "user_id", "ts")

    streamed = run_available_now(
        stream_stream_join(
            side("purchase"), side("click"),
            by="user_id", lookback_seconds=4 * 3600.0,
        ),
        output_mode="append",
    )
    allb = read_table(spark, sf_dir, "events")
    batch = stream_stream_join(
        allb.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts"),
        allb.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts"),
        by="user_id", lookback_seconds=4 * 3600.0,
    )
    n_stream, n_batch = streamed.count(), batch.count()
    print(
        f"attribution: {n_stream} click->purchase pairs streamed"
        f" (batch twin: {n_batch};"
        f" {'reconciled' if n_stream == n_batch else 'DIVERGED'})"
    )

    # 5. ordered funnel + weekly cohort retention (round-11 operators:
    #    stage k counts only events strictly after stage k-1)
    from qctimeseries_spark.events import funnel, retention_cohorts

    fu = funnel(
        allb, ["signup", "click", "purchase"],
        horizon_seconds=7 * 86400.0,
    ).orderBy("stage_idx").collect()
    steps = " -> ".join(f"{r.stage} {r.n_users}" for r in fu)
    print(f"funnel: {steps}")
    ret = retention_cohorts(allb, period_days=7.0, max_periods=4)
    held = ret.filter(F.col("period_k") == 1).agg(
        F.round(F.avg("retention"), 4).alias("w1")
    ).first()
    print(f"retention: week-1 average {held.w1}")

    # 6. time-weighted downsample — the level actually held per 6 h,
    #    not the chatty-regime-biased row mean
    from qctimeseries_spark.windows import time_weighted_resample

    twa = time_weighted_resample(
        allb, "ts", "value", step_minutes=360.0,
        key_cols=["user_id"], ties=["event_id"],
    )
    print(f"time-weighted resample: {twa.count()} (user, 6h) levels")

    # 7. which touch gets credit — last-touch election over one
    #    user-key exchange (no self-join), NULL row = unattributed
    from qctimeseries_spark.events import attribution

    att = attribution(
        allb, conversion_type="purchase",
        touch_types=["signup", "click"], mode="last",
        lookback_seconds=7 * 86400.0, ties=["event_id"],
    ).cache()
    per_touch = {
        r.touch_type: r.n
        for r in att.groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(
        "last-touch credit: "
        + ", ".join(
            f"{k or 'unattributed'} {v}"
            for k, v in sorted(per_touch.items(), key=lambda kv: str(kv[0]))
        )
    )

    # 8. which paths users actually follow — the streaming transition
    #    pair stream, aggregated to the batch twin's Markov counts
    from qctimeseries_spark.events import event_transitions
    from qctimeseries_spark.streaming import stream_transitions

    pairs = run_available_now(
        stream_transitions(
            stream_events(spark, sf_dir).select(
                "user_id", "ts", "event_type", "event_id"
            )
        ),
        output_mode="append",
    )
    top = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "from_type", "to_type")
        .first()
    )
    n_batch_pairs = event_transitions(allb, ties=["event_id"]).agg(
        F.sum("n_pairs").alias("s")
    ).first().s
    n_stream_pairs = pairs.count()
    print(
        f"transitions: hottest path {top.from_type}->{top.to_type}"
        f" ({top.n} pairs); streamed {n_stream_pairs} ="
        f" batch {n_batch_pairs}:"
        f" {'reconciled' if n_stream_pairs == n_batch_pairs else 'DIVERGED'}"
    )


if __name__ == "__main__":
    main()
