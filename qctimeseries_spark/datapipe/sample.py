"""Deterministic hash-based sampling for corpus curation.

``DataFrame.sample`` draws per-partition pseudo-random rows: membership
changes across runs, retries, and engines, which poisons reproducible
dataset builds.  Hash sampling makes membership a PURE FUNCTION of the
row key — ``keep iff hash(seed:key) mod M < fraction·M`` — so the same
key is in or out everywhere, forever: reruns are stable, engines agree
(the DuckDB oracle replays it bit-for-bit), and upstream/downstream
tables sampled on the same key stay aligned (a joinable sample).

Stratified rates (e.g. downsample dominant languages, keep the tail)
compile to one CASE expression over the strata column — no shuffle,
no per-stratum pass; the filter is a narrow codegen projection that
pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qctimeseries_spark.datapipe.hashing import hash60

#: hash-space modulus; fractions quantize to 1/M (one millionth)
SAMPLE_MOD = 1_000_000


def sample_bucket(key, seed: str = "qcts"):
    """The row's sampling bucket in [0, SAMPLE_MOD): hash60 of the
    seed-prefixed key string.  Exposed so callers can bucket once and
    reuse (e.g. train/val/test splits from disjoint bucket ranges)."""
    k = key if not isinstance(key, str) else F.col(key)
    return hash60(F.concat(F.lit(f"{seed}:"), k.cast("string"))) % SAMPLE_MOD


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | None = None,
    *,
    seed: str = "qcts",
    strata_col: str | None = None,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash.

    Either a flat ``fraction``, or per-stratum ``fractions`` over
    ``strata_col`` with ``default_fraction`` for unlisted strata.
    """
    if (fraction is None) == (fractions is None):
        raise ValueError("pass exactly one of fraction / fractions")
    # NULL keys are excluded EXPLICITLY: Spark's concat returns NULL for
    # a NULL key (filter drops it) but DuckDB's concat skips NULL args —
    # the explicit filter pins one portable semantic for both engines.
    df = df.filter(F.col(key_col).isNotNull())
    bucket = sample_bucket(key_col, seed)
    if fraction is not None:
        return df.filter(bucket < int(round(fraction * SAMPLE_MOD)))
    if strata_col is None:
        raise ValueError("fractions requires strata_col")
    thresh = F.lit(int(round(default_fraction * SAMPLE_MOD)))
    for value, frac in sorted(fractions.items()):
        thresh = (
            F.when(
                F.col(strata_col) == value,
                F.lit(int(round(frac * SAMPLE_MOD))),
            ).otherwise(thresh)
        )
    return df.filter(bucket < thresh)
