"""Close the LAST sf1 oracle exclusion: d3_simhash_pairs, verified at
sf1 by an ENGINE-SIDE aggregate hash instead of row materialization.

The standard harness (tools/check_correctness.py) OOMs on d3 at sf1
because its compare pulls the full result — ~108.8M pairs — into
pandas on BOTH engines.  The result schema is all-integer
(id_a, id_b, hamming), so an order-insensitive compare needs no rows
at all: each engine renders every row to the same canonical string
(name-sorted columns joined by '|', integers rendering identically by
construction), hashes it with the portable hash60 (first 60 bits of
MD5 — the same primitive every oracle mirror uses), and aggregates to

    (COUNT(*), SUM(hash60 AS DECIMAL(38,0)))

Sum-of-hashes over 1e8 60-bit values needs ~87 bits, so the sum rides
DECIMAL(38,0) in Spark and HUGEINT in DuckDB — both exact integer
arithmetic.  Equal (count, sum) pairs over 60-bit per-row hashes make
an undetected multiset difference vanishingly unlikely (a collision
would need differing rowsets whose hash SUMS collide), and the pair
is exactly as order-insensitive as the harness's sorted-rows sha256.

Usage: python tools/validate_d3_sf1_hash.py [sf_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from qctimeseries_spark.session import get_spark

    spark = get_spark("d3_sf1_hash")
    t0 = time.time()
    df = entrymod.queries()["d3_simhash_pairs"](spark, sf_dir)
    cols = sorted(df.columns)  # the harness's name-sorted order
    canon = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    row = df.select(
        F.count(F.lit(1)).alias("n"), F.sum(h).alias("s")
    ).collect()[0]
    spark_n, spark_s = int(row["n"]), int(row["s"])
    t_spark = time.time() - t0
    print(f"spark : n={spark_n:,} sum={spark_s} [{t_spark:.0f}s]")
    spark.stop()

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    oracle = entrymod.oracle_sql()["d3_simhash_pairs"]
    canon_sql = "concat_ws('|', " + ", ".join(
        f"CAST({c} AS VARCHAR)" for c in cols
    ) + ")"
    t0 = time.time()
    on, os_ = con.execute(
        # hex literals cast to BIGINT only (60 bits fit); widen to
        # HUGEINT for the exact ~87-bit sum
        f"SELECT COUNT(*),"
        f" SUM(CAST(CAST(concat('0x', substr(md5({canon_sql}), 1, 15))"
        f" AS BIGINT) AS HUGEINT))"
        f" FROM ({oracle}) t"
    ).fetchone()
    t_oracle = time.time() - t0
    print(f"oracle: n={int(on):,} sum={int(os_)} [{t_oracle:.0f}s]")
    ok = spark_n == int(on) and spark_s == int(os_)
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
