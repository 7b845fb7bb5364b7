"""Deterministic hash primitives shared by dedup / fingerprint ops.

Two tiers:

- :func:`hash60` — first 60 bits of MD5 as a non-negative BIGINT.
  Portable across engines (the DuckDB oracle mirrors it as
  ``CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)``), used
  wherever correctness is cross-checked.
- :func:`fast_hash64` — Spark's native xxhash64 (whole-stage codegen,
  several× faster than MD5): the default for production-scale runs
  where cross-engine reproducibility isn't required.

Seeded family: ``H_i(s) = H(concat(i, ':', s))`` gives independent
hash functions for MinHash from a single primitive.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """First 60 bits of MD5(s) as non-negative bigint (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash60` over a SQL expression."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_hash60(col: Column, seed: int) -> Column:
    return hash60(F.concat(F.lit(f"{seed}:"), col))


def seeded_hash60_sql(expr: str, seed: int) -> str:
    return hash60_sql(f"concat('{seed}:', {expr})")


def fast_hash64(col: Column, seed: int = 0) -> Column:
    """xxhash64 — JVM-native, for scale paths (not oracle-portable)."""
    return F.xxhash64(col, F.lit(seed))


def bind(arr: Column, fn) -> Column:
    """Let-binding for an array expression: evaluate ``arr`` ONCE and
    pass it to ``fn`` as a bound lambda variable.

    Catalyst does not common-subexpression-eliminate inside
    higher-order-function lambdas, so an expression like
    ``transform(seq, i -> slice(tokens(text), i, n))`` re-tokenizes the
    whole document per element — O(len²) interpreted work.  Wrapping
    the array in a singleton and transforming over it turns every inner
    reference into a bound-variable lookup (benchmarked ~20× on the
    shingle pipeline at sf0.01).
    """
    return F.transform(F.array(arr), fn)[0]


#: logical nodes that imply a shuffle upstream.  Their RUNTIME width is
#: not knowable from the plan alone: AQE partition coalescing (default
#: on, no surviving min-partition-num pin in Spark 4) shrinks small
#: shuffle outputs well below parallelism (measured: a 100k-row
#: aggregate lands on ONE partition), and a broadcast-hash join never
#: shuffles its probe side at all — so these route to the size-estimate
#: tier below, never to a blind "already wide" skip.
_WIDE_NODE_RE = re.compile(
    r"(?m)^[\s+:!*'-]*(?:Join|Aggregate|Window|Sort|Deduplicate"
    r"|RepartitionByExpression)\b"
)
#: repartition(n) prints as `Repartition n, true`; coalesce(n) as
#: `Repartition n, false`.  Only the SHUFFLE form carries its true
#: runtime width (AQE never coalesces an explicit user repartition);
#: coalesce cannot exceed its child's width, so its count proves
#: nothing and it falls through to the probe tiers.
_REPARTITION_RE = re.compile(r"(?m)^[\s+:!*'-]*Repartition (\d+), true")


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the input arrives narrower — a small parquet scan (one or two
    row-groups) otherwise runs the per-row signature projections
    (tokenize → shingle → MD5 → MinHash fold) on a couple of cores
    while the rest idle (measured: the whole d7 signature stage on 2 of
    32 cores at sf1).  A no-op when the input is already at least that
    wide, so a production scan with thousands of partitions is never
    down-partitioned and pays no extra shuffle.

    The width probe is tiered by cost:

    - ``repartition(n)`` roots carry their exact runtime width in the
      plan (AQE never coalesces an explicit repartition) — decided
      from the logical string alone.
    - shuffle-rooted plans (join / aggregate / window / sort / keyed
      repartition / coalesce upstream) have NO statically knowable
      width — AQE coalescing shrinks small shuffles below parallelism
      and broadcast joins never shuffle the probe side — and the
      physical probe is no help either: under AQE,
      ``df.rdd.getNumPartitions()`` EXECUTES the upstream stages.
      Decide on the optimizer's size estimate instead: a frame small
      enough to possibly be narrow (≤ parallelism ×
      ``files.maxPartitionBytes``) costs at most one scan-partition
      per core to round-robin — cheap insurance before expensive
      per-row work — while a bigger frame is never AQE-coalesced
      below parallelism (the 1 MB-per-partition floor) and skips.
    - genuinely shallow plans (scan + narrow ops) pay the physical
      probe, which is cheap and exact there.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().logical().toString()
    except Exception:  # non-classic DataFrame (e.g. connect) — probe
        plan = None
    if plan is not None:
        m = _REPARTITION_RE.search(plan)
        if m:
            return df if int(m.group(1)) >= par else df.repartition(par)
        if _WIDE_NODE_RE.search(plan):
            try:
                opt = df._jdf.queryExecution().optimizedPlan()
                est = int(str(opt.stats().sizeInBytes()))
                # without CBO, Catalyst sizes an inner JOIN as the
                # PRODUCT of its sides (an 8 MB corpus × broadcast dim
                # estimated at 4+ GB, measured) — junk that silently
                # skips the widen on exactly the post-broadcast-join
                # frames this tier exists for (VERDICT r8 task 5).
                # Bound a join-bearing plan's estimate by the sum of
                # its leaf sizes: right for the 1:1-ish joins that
                # feed the Arrow stages; a genuinely exploding join
                # may widen unnecessarily, which costs one shuffle —
                # the conservative direction for pre-UDF insurance.
                if "Join" in plan:
                    leaves = opt.collectLeaves()
                    leaf_sum = sum(
                        int(str(leaves.apply(i).stats().sizeInBytes()))
                        for i in range(leaves.size())
                    )
                    est = min(est, leaf_sum)
            except Exception:
                est = None
            if est is None:  # no estimate — keep the old skip behavior
                return df
            max_part = int(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
                .rstrip("b")
            )
            return df.repartition(par) if est <= par * max_part else df
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
