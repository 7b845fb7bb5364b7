"""Deterministic sketch primitives: Bloom-filter pruning, count-min
frequency estimation, HyperLogLog-style distinct counting.

The bounded-state tier of a 100 TB pipeline: each operator replaces a
vocabulary- or benchmark-sized shuffle with a FIXED-size summary
(an m-slot bit set, a d×w counter grid, m max-registers) that
broadcasts or map-side-combines, so cost stops scaling with the
distinct-key count.  Where dedup/ANN bound *pairs*, these bound
*state*.

Every sketch here is deterministic and engine-portable: hash positions
derive from the MD5-based :func:`~.hashing.hash60` family (seeded
prefixes for independent functions), so the DuckDB oracle reproduces
the exact bits — including the false positives.  Approximation error
is part of the DEFINED semantics (a Bloom hit set, a count-min
over-estimate, an HLL register state), not nondeterminism.

Reference parity note: the reference engine (R data.table QC tooling)
has no sketch tier; these extend the LLM-data-pipeline surface the
same way the dedup/similarity modules do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.datapipe.hashing import (
    fan_out,
    fast_hash64,
    hash60,
    seeded_hash60,
)
from qctimeseries_spark.datapipe.text import tokens

# ---------------------------------------------------------------------------
# Bloom-filter benchmark pruning
# ---------------------------------------------------------------------------

#: default Bloom slot count (2^18).  With k=2 positions per gram and a
#: benchmark of B distinct grams, the false-positive rate is
#: ~(1 - e^(-2B/m))^2 — ~1.4% at B = 16k grams, m = 2^18.
BLOOM_M = 1 << 18


def _pow2_exp(m: int, what: str) -> int:
    if m <= 0 or m & (m - 1):
        raise ValueError(f"{what} must be a power of two, got {m}")
    return m.bit_length() - 1


def _bloom_positions(h: Column, m: int) -> tuple[Column, Column]:
    """Two Bloom slot positions from one 60-bit hash: the low and the
    next-higher ``log2(m)`` bit groups.  ``m`` must be a power of two
    so both extractions are exact bit ops (mask and shift — float
    division would round above 2^53 and desync from the oracle's
    integer division)."""
    b = _pow2_exp(m, "bloom m")
    return (
        h.bitwiseAND(F.lit(m - 1)).cast("long"),
        F.shiftright(h, b).bitwiseAND(F.lit(m - 1)).cast("long"),
    )


def bloom_prune(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    m: int = BLOOM_M,
    fast: bool = False,
) -> DataFrame:
    """Benchmark-contamination pruning through a Bloom filter: per
    corpus document, how many of its distinct word ``ngram``-grams are
    *possibly* in the benchmark (both Bloom positions set).

    The scale story vs :func:`~.text.contamination_check` (t7, which
    broadcasts the benchmark's exact gram hashes): the broadcast there
    is proportional to the benchmark's DISTINCT GRAM COUNT — fine for
    one eval set, unbounded when screening against a consortium of
    benchmarks or another corpus shard.  A Bloom filter caps it at
    ``m`` slots regardless of benchmark size, trading a measured,
    tunable false-positive rate (over-flagging only — safe for
    hygiene filters, which quarantine rather than delete).  The flag
    decision is map-side: the slot set broadcasts once and every
    corpus gram probes it with two hash-mod lookups; the corpus text
    itself NEVER shuffles — the only aggregation ships
    ``(doc_id, two longs)``.

    Determinism: positions come from the engine-portable
    :func:`hash60` (low/next bit groups), so the DuckDB oracle
    reproduces the exact hit set INCLUDING the false positives — the
    approximation is defined semantics, not noise.  ``fast=True``
    swaps in xxhash64 for the production path (same plan, different
    bits).

    The slot set is rendered as a distinct-BIGINT frame rather than a
    packed bitmap so both engines share one representation; a packed
    production variant would ship ``m/8`` bytes (32 KiB at the
    default) instead of ~8 B per occupied slot — same semantics,
    same plan shape.

    Returns ``(id, n_grams, n_hits, hit_frac)`` for documents with at
    least one possible hit (callers anti-join the benchmark's own ids
    when corpus ⊇ benchmark, the t7 convention).
    """
    from qctimeseries_spark.datapipe.dedup import hashed_shingles

    h = fast_hash64 if fast else hash60

    def slots(text: Column) -> Column:
        return hashed_shingles(text, ngram, fast=fast)

    bh = benchmark.select(
        F.explode(slots(F.col(text_col))).alias("_h")
    )
    p1, p2 = _bloom_positions(F.col("_h"), m)
    bloom_set = (
        bh.select(F.explode(F.array(p1, p2)).alias("slot")).distinct()
    )

    # corpus side: materialize the gram array once, then carry the
    # per-doc gram count through the explode so ONE aggregation yields
    # hits and totals (CollapseProject won't re-inline the non-cheap
    # array into both uses; the heavy MD5 stage fans out)
    base = fan_out(corpus).select(
        F.col(id_col), slots(F.col(text_col)).alias("_arr")
    )
    grams = base.select(
        id_col,
        F.size("_arr").alias("n_grams"),
        F.explode("_arr").alias("_h"),
    )
    g1, g2 = _bloom_positions(F.col("_h"), m)
    grams = grams.select(id_col, "n_grams", g1.alias("_p1"), g2.alias("_p2"))
    hits = (
        grams.join(
            F.broadcast(bloom_set.withColumnRenamed("slot", "_p1")),
            "_p1",
            "left_semi",
        )
        .join(
            F.broadcast(bloom_set.withColumnRenamed("slot", "_p2")),
            "_p2",
            "left_semi",
        )
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.max("n_grams").cast("int").alias("n_grams"),
            F.count(F.lit(1)).cast("int").alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            F.round(
                F.col("n_hits") / F.col("n_grams").cast("double"), 6
            ).alias("hit_frac"),
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

#: count-min defaults: depth 4 rows × width 1024 buckets — error
#: ≤ 2·total/w per estimate with probability 1 - (1/2)^d under the
#: standard analysis; 4096 cells of map-side state total.
CMS_DEPTH = 4
CMS_WIDTH = 1024
#: seed base for the row hash functions (seeded_hash60 family)
_CMS_SEED = 9100


def _cms_buckets(col: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` bucket ids for a term — one seeded hash60
    per row, reduced mod ``width``."""
    return F.array(
        *[
            (seeded_hash60(col, _CMS_SEED + r) % width).cast("int")
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    *,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of the corpus token-frequency multiset:
    ``depth × width`` counters, counter ``(r, b)`` = number of token
    occurrences whose row-``r`` hash lands in bucket ``b``.

    Token-frequency questions (heavy hitters, stopword discovery,
    tokenizer-coverage audits) normally need ``groupBy(token)`` — a
    shuffle whose key space is the CORPUS VOCABULARY, unbounded and
    Zipf-skewed at 100 TB.  The sketch bounds the shuffle key space at
    ``depth·width`` cells: the per-partition partial aggregation
    collapses everything to ≤ 4096 rows per task regardless of input
    size, so the exchange ships kilobytes.  Estimates are upper
    bounds (collisions only ever ADD), within ``2·N/width`` of truth
    with prob. ``1 - 2^-depth`` per the standard bound.

    Returns the sketch as ``(row, bucket, cnt)`` — ``depth×width``
    rows, broadcastable to wherever estimates are needed.
    """
    toks = fan_out(df).select(
        F.explode(tokens(F.col(text_col))).alias("term")
    )
    cells = toks.select(
        F.posexplode(_cms_buckets(F.col("term"), depth, width)).alias(
            "row", "bucket"
        )
    )
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    *,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate candidate term frequencies from a count-min
    sketch: ``est(t) = min over rows r of sketch[r][h_r(t)]``.

    The sketch (≤ depth·width rows) broadcasts; each candidate probes
    ``depth`` cells via one posexplode + broadcast equi-join, then a
    ``min`` per term — cost scales with |candidates|, never the
    corpus.  Estimates never under-count (count-min guarantee).
    """
    probes = candidates.select(
        F.col(term_col).alias("term"),
        F.posexplode(
            _cms_buckets(F.col(term_col), depth, width)
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog-style distinct counting
# ---------------------------------------------------------------------------

#: register count (2^10).  Standard error ≈ 1.04/√m ≈ 3.3%.
HLL_M = 1 << 10
#: usable suffix bits of hash60 after the 10 bucket bits; rho is
#: capped here so the scaled register sum stays an exact BIGINT.
HLL_SUFFIX_BITS = 50
_HLL_SUFFIX_BITS = HLL_SUFFIX_BITS


def hll_alpha_scaled(m: int) -> float:
    """The harmonic-estimate numerator ``alpha_m · m² · 2^suffix`` as
    ONE Python double — computed here so the Spark literal and the
    oracle SQL interpolate the identical bits (the BM25 constant
    precedent)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << HLL_SUFFIX_BITS)


def _hll_register_cols(col: Column, m: int) -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = low bits of hash60, rho =
    1 + trailing-zero count of the remaining bits (the trailing-zero
    HLL variant — identical geometric distribution, and the lowest
    set bit ``w & -w`` is portable integer arithmetic in any engine;
    ``round(log2())`` of an exact power of two is safe).  A zero
    suffix saturates at the cap."""
    b = _pow2_exp(m, "hll m")
    h = hash60(col)
    bucket = h.bitwiseAND(F.lit(m - 1)).cast("int")
    w = F.shiftright(h, b).cast("long")
    lowbit = w.bitwiseAND(-w)
    rho = F.when(w == 0, F.lit(_HLL_SUFFIX_BITS)).otherwise(
        F.least(
            (F.round(F.log2(lowbit)) + 1).cast("int"),
            F.lit(_HLL_SUFFIX_BITS),
        )
    )
    return bucket, rho.cast("int")


def hll_distinct(
    df: DataFrame,
    value_col,
    *,
    group_cols: tuple = (),
    m: int = HLL_M,
) -> DataFrame:
    """HyperLogLog-style distinct-count estimate of ``value_col``
    (optionally per group): ``m`` max-rho registers + the standard
    bias-corrected harmonic estimate with the linear-counting
    small-range correction.

    ``count_distinct`` over 100 TB shuffles the full distinct key set;
    the HLL register state is ``m`` ints per group NO MATTER WHAT —
    the groupBy here carries ≤ ``m·|groups|`` rows after map-side max
    combining, and register states from disjoint shards merge by
    element-wise max (how a 1000-executor rollup or a streaming
    accumulator would compose this).

    Cross-engine exactness: registers are exact integers; the
    harmonic denominator ``sum(2^-M_j)`` is computed SCALED by
    ``2^50`` so it is an exact BIGINT sum (every term ``2^(50-M)`` is
    an integer; 1024 registers × 2^50 < 2^63), and the final
    estimate is one double expression over exact integer inputs,
    rounded to 4 dp — far above any last-ulp ``ln``/division drift.

    Returns ``(group_cols..., n_registers, n_zero, reg_sum_scaled,
    est_distinct)``.
    """
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols=group_cols, m=m),
        group_cols=group_cols,
        m=m,
    )


def hll_registers(
    df: DataFrame,
    value_col,
    *,
    group_cols: tuple = (),
    m: int = HLL_M,
) -> DataFrame:
    """The HLL register state alone: ``(group_cols..., _bucket, _M)``
    with ``_M`` the max rho seen per bucket.  Register states from
    disjoint shards / batches / days merge by element-wise ``max`` —
    expose the state so streaming accumulators and multi-corpus
    rollups can persist partials and merge later
    (:func:`hll_estimate_from_registers` turns any merged state back
    into the estimate)."""
    vcol = F.col(value_col) if isinstance(value_col, str) else value_col
    bucket, rho = _hll_register_cols(vcol, m)
    gcols = [F.col(c) for c in group_cols]
    return (
        df.select(*gcols, bucket.alias("_bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_M"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    *,
    group_cols: tuple = (),
    m: int = HLL_M,
) -> DataFrame:
    """Bias-corrected harmonic estimate over a ``(group_cols...,
    _bucket, _M)`` register frame (see :func:`hll_registers`) — the
    :func:`hll_distinct` tail, shared with merged/streamed register
    states so batch and stream are bit-identical by construction."""
    # scaled harmonic sum over NON-EMPTY registers; empty registers
    # (rho 0) contribute 2^50 each, added arithmetically
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {_HLL_SUFFIX_BITS} - _M)"
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("_nonzero"),
        F.sum(term).cast("bigint").alias("_sum_nonzero"),
    )
    n_zero = (F.lit(m) - F.col("_nonzero")).cast("int")
    reg_sum = (
        F.col("_sum_nonzero")
        + n_zero.cast("bigint")
        * F.lit(1 << _HLL_SUFFIX_BITS).cast("bigint")
    ).cast("bigint")
    e_raw = F.lit(hll_alpha_scaled(m)) / reg_sum.cast("double")
    # linear counting when the raw estimate is small and empty
    # registers remain (the standard HLL small-range correction)
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.lit(m).cast("int").alias("n_registers"),
        n_zero.alias("n_zero"),
        reg_sum.alias("reg_sum_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )
