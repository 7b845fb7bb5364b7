"""Plan-quality audit: for each query, print a condensed physical-plan
summary — #exchanges (shuffles), #broadcasts, parquet scans with pushed
filters + read schema width, and codegen coverage.

Counts read the POST-EXECUTION adaptive plan, whose string includes
both the original skeleton and the final stages — so scan/shuffle
counts run ~2x the logical number; compare queries against each other,
not against an absolute budget.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def audit(name: str, df, construction=None) -> None:
    # execute first: with AQE the pre-execution plan is a skeleton
    # (isFinalPlan=false, no codegen markers); the final stages — and
    # their WholeStageCodegen "*(n)" prefixes — exist only after a run
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))
    n_bcast = plan.count("BroadcastExchange")
    # codegen stages appear as "*(n)" operator prefixes in the plan string
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    scans = re.findall(r"FileScan parquet \[([^\]]*)\].*?PushedFilters: (\[[^\]]*\])", plan)
    sort_merge = plan.count("SortMergeJoin")
    nested = plan.count("NestedLoopJoin")
    cartesian = plan.count("CartesianProduct")
    # unpartitioned Window operators (every row through one task): both
    # the global-but-ordered and the partitioned-but-UNORDERED forms
    # print one "], [" (whichever bracket group is empty is dropped),
    # so the trailing group's ASC/DESC markers disambiguate — same rule
    # as plans.plan_summary (h15/h21's per-part aggregates were the
    # false positives)
    global_win = sum(
        1
        for line in plan.splitlines()
        if re.match(r"\s*[+\-:|* ]*Window \[", line)
        and line.count("], [") == 1
        and re.search(r"(ASC|DESC)[^\]]*\]\s*$", line.rstrip())
    )
    print(f"== {name}: shuffles={n_exchange} bcast={n_bcast} wsc={n_wsc} "
          f"smj={sort_merge} nlj={nested} cart={cartesian} gwin={global_win}")
    if construction is not None:
        # eager pipelines (d6/d7/d8/c1) do their work at construction
        # and return a checkpointed stub — the plan counters above see
        # nothing, so report what actually RAN (qctimeseries_spark.
        # plans.job_audit over the construction-time jobs)
        print(
            f"   construction: jobs={construction['jobs']}"
            f" stages={construction['stages']} tasks={construction['tasks']}"
            f" shuffleW={construction['shuffle_write_bytes']}"
            f" shuffleR={construction['shuffle_read_bytes']}"
            f" input={construction['input_bytes']}"
        )
    for cols, pushed in scans:
        ncols = 0 if not cols.strip() else cols.count(",") + 1
        print(f"   scan cols={ncols} pushed={pushed[:90]}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from qctimeseries_spark.plans import job_audit
    from qctimeseries_spark.queries import QUERIES
    from qctimeseries_spark.session import get_spark

    spark = get_spark("audit", master="local[8]", shuffle_partitions=8)
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name.startswith("s1") or name.startswith("s4") or name.startswith("st1"):
            continue  # sink roundtrips / streaming — not a single plan
        try:
            ja = job_audit(spark, lambda: fn(spark, sf_dir))
            audit(name, ja["result"], construction=ja if ja["jobs"] else None)
        except Exception as exc:  # noqa: BLE001
            print(f"== {name}: ERROR {exc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
