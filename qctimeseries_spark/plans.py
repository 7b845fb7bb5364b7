"""Plan-quality introspection for user pipelines.

The engine's own plan discipline is audited by ``tools/explain_audit.py``;
this module exposes the same counters as a library call so USER code can
assert its pipelines stay scale-shaped (no surprise shuffles, no
nested-loop joins, filters reaching the scan) — e.g. as a CI check next
to result assertions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def plan_summary(df: DataFrame, *, executed: bool = False) -> dict:
    """Condensed physical-plan counters for a DataFrame.

    ``executed=False`` (default) reads the pre-execution plan — cheap,
    no job runs, but with AQE the counts are the static skeleton.
    ``executed=True`` runs the plan (``count()``-free noop collect is
    not possible, so this COLLECTS — use on bounded frames only) and
    reads the final adaptive plan, where AQE's runtime choices
    (broadcast conversions, coalesced partitions) are visible; note the
    adaptive plan string repeats the original skeleton, so compare
    executed counts against other executed counts, not absolutes.

    Returns keys: ``shuffles`` (hash/range/single-partition exchanges),
    ``broadcasts``, ``sort_merge_joins``, ``nested_loop_joins``,
    ``codegen_stages``, ``global_windows`` (window operators with NO
    partition spec — every row through one task; acceptable only on
    bounded frames like per-bucket offset tables), and ``scans`` — a
    list of per-scan dicts with ``columns`` (read-schema width) and
    ``pushed_filters``.
    """
    if executed:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        {
            "columns": 0 if not cols.strip() else cols.count(",") + 1,
            "pushed_filters": pushed,
        }
        for cols, pushed in re.findall(
            r"FileScan parquet \[([^\]]*)\].*?PushedFilters: (\[[^\]]*\])",
            plan,
        )
    ]
    # a physical Window line prints [funcs], [partSpec], [orderSpec];
    # the unpartitioned-but-ordered form drops the MIDDLE group and the
    # partitioned-but-unordered form drops the LAST one — both leave
    # ONE "], [", so the trailing group disambiguates: an order spec
    # carries ASC/DESC sort markers, a partition spec never does (a
    # partition-only window stays parallel per key and must not count
    # as global — h15/h21's per-part aggregates hit this)
    global_windows = sum(
        1
        for line in plan.splitlines()
        if re.match(r"\s*[+\-:|* ]*Window \[", line)
        and line.count("], [") == 1
        and re.search(r"(ASC|DESC)[^\]]*\]\s*$", line.rstrip())
    )
    return {
        "global_windows": global_windows,
        "cartesian_products": plan.count("CartesianProduct"),
        "shuffles": len(
            re.findall(
                r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
                plan,
            )
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("NestedLoopJoin"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "scans": scans,
    }


def job_audit(spark: SparkSession, fn, *, group: str | None = None):
    """Execution-level counters for the Spark JOBS a callable triggers —
    the audit view :func:`plan_summary` cannot give for EAGER pipelines.

    Operators that materialize at construction time (the incremental
    stores d6/d7/d8, ``dup_clusters``' label-propagation rounds) return
    a checkpointed stub whose physical plan is empty — a shuffle
    regression inside the pipeline is invisible to a plan-string audit.
    This helper runs ``fn()`` tagged with a job group (thread-local, so
    only the calling thread's jobs are counted) and reads the driver's
    AppStatusStore for everything that actually ran:

    ``jobs``, ``stages``, ``tasks`` (completed), ``shuffle_write_bytes``
    / ``shuffle_read_bytes``, ``input_bytes`` — plus ``result`` (the
    callable's return value).  A super-linear regression (e.g. a
    quadratic candidate join losing its band pruning) shows up as a
    job/stage/shuffle-byte jump even when the returned stub's plan
    stays empty; CI pins those counters.

    Caveat: streaming queries execute on their own threads, so a
    ``foreachBatch`` drain inside ``fn`` contributes nothing to the
    group — audit those through their batch twins.
    """
    import uuid

    # a FRESH group per call: getJobIdsForGroup returns every job ever
    # tagged with the group id, so reuse would accumulate across audits
    group = group or f"qcts_job_audit_{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", group)
    try:
        result = fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    tracker = sc.statusTracker()
    job_ids = sorted(tracker.getJobIdsForGroup(group))
    stage_ids = sorted(
        {
            s
            for j in job_ids
            for s in (getattr(tracker.getJobInfo(j), "stageIds", None) or [])
        }
    )
    out = {
        "jobs": len(job_ids),
        "stages": len(stage_ids),
        "tasks": 0,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "input_bytes": 0,
        "result": result,
    }
    store = sc._jsc.sc().statusStore()
    for sid in stage_ids:
        try:
            sd = store.lastStageAttempt(sid)
        except Exception:  # noqa: BLE001 — skipped stage: no attempt data
            continue
        out["tasks"] += sd.numCompleteTasks()
        out["shuffle_write_bytes"] += sd.shuffleWriteBytes()
        out["shuffle_read_bytes"] += sd.shuffleReadBytes()
        out["input_bytes"] += sd.inputBytes()
    return out
