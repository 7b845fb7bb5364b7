"""Plan-quality introspection for user pipelines.

The engine's own plan discipline is audited by ``tools/explain_audit.py``;
this module exposes the same counters as a library call so USER code can
assert its pipelines stay scale-shaped (no surprise shuffles, no
nested-loop joins, filters reaching the scan) — e.g. as a CI check next
to result assertions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


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
    # the unpartitioned form drops the middle group, leaving ONE "], ["
    global_windows = sum(
        1
        for line in plan.splitlines()
        if re.match(r"\s*[+\-:|* ]*Window \[", line)
        and line.count("], [") == 1
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
