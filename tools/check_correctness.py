"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, name-sorted
schema, and an order-insensitive value hash.  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
    python tools/check_correctness.py [sf_dir] --window   # first 50
                                        # (the driver's hash window)
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # shortest round-trip repr — bit-exact compare
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(df) -> tuple[int, list[tuple[str, str]], str]:
    """(row_count, name-sorted dtypes, order-insensitive value hash)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = [
        "|".join(_canon(v) for v in rec)
        for rec in df.itertuples(index=False, name=None)
    ]
    digest = hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()[:16]
    dtypes = [(c, str(df[c].dtype)) for c in cols]
    return len(df), dtypes, digest


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]

    import __spark_entry__ as entrymod
    from qctimeseries_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args == ["--window"]:
        only = set(list(queries)[:50])  # the driver's hash window
    else:
        only = set(args)
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(sdf)} (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures.append(name)
            continue
        sn, st, sh = frame_fingerprint(sdf)
        on, ot, oh = frame_fingerprint(odf)
        dt = time.time() - t0
        if sn != on:
            print(f"FAIL {name}: rows spark={sn} oracle={on}")
            failures.append(name)
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch (rows={sn})")
            _diff(sdf, odf, name)
            failures.append(name)
        else:
            schema_note = "" if [c for c, _ in st] == [c for c, _ in ot] else " (COLS!)"
            print(f"PASS {name}: rows={sn} hash={sh}{schema_note} [{dt:.1f}s]")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


def _diff(sdf, odf, name, n=3):
    cols = sorted(sdf.columns)
    srows = sorted(
        "|".join(_canon(v) for v in rec)
        for rec in sdf[cols].itertuples(index=False, name=None)
    )
    orows = sorted(
        "|".join(_canon(v) for v in rec)
        for rec in odf[sorted(odf.columns)].itertuples(index=False, name=None)
    )
    s_only = [r for r in srows if r not in set(orows)][:n]
    o_only = [r for r in orows if r not in set(srows)][:n]
    print(f"  cols={cols}")
    for r in s_only:
        print(f"  spark-only : {r}")
    for r in o_only:
        print(f"  oracle-only: {r}")


if __name__ == "__main__":
    raise SystemExit(main())
