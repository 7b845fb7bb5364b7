"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, name-sorted
schema, and an order-insensitive value hash.  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
    python tools/check_correctness.py [sf_dir] --window   # first 50
                                        # (the driver's hash window)
    python tools/check_correctness.py [sf_dir] --record OUT.json
                                        # full registry, write a
                                        # machine-readable sweep record

Flags are position-independent (``--window`` alone works — it is
never mistaken for the sf_dir positional; r11 advisor).
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


def source_dir_snapshot(sf_dir: str) -> dict[str, tuple[int, int]]:
    """Recursive ``{relpath: (size, mtime_ns)}`` listing of the source
    table directory — the ``read_table`` staleness invariant (VERDICT
    r13 task 9): ``sources._TABLE_HANDLES`` pins Spark's file listing
    for the application's lifetime, which is only sound while no query
    WRITES under ``sf_dir``.  The sweep snapshots before and after
    executing every registry entry and fails if anything changed, so a
    future operator that appends to a source table cannot silently
    read a stale listing."""
    root = Path(sf_dir)
    return {
        str(p.relative_to(root)): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in sorted(root.rglob("*"))
        if p.is_file()
    }


def main() -> int:
    # flags are position-independent: '--window' used to bind to the
    # sf_dir positional when given alone (r11 advisor)
    argv = sys.argv[1:]
    window_only = "--window" in argv
    record_path = None
    if "--record" in argv:
        i = argv.index("--record")
        if i + 1 >= len(argv):
            print("--record needs an output path", file=sys.stderr)
            return 2
        record_path = argv[i + 1]
        del argv[i : i + 2]
    argv = [a for a in argv if a != "--window"]
    if argv and argv[0].startswith("--"):
        print(f"unknown flag {argv[0]!r}", file=sys.stderr)
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    args = argv[1:]

    import __spark_entry__ as entrymod
    from qctimeseries_spark.session import get_spark

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    src_before = source_dir_snapshot(sf_dir)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if window_only:
        only = set(list(queries)[:50])  # the driver's hash window
    else:
        only = set(args)
    failures = []
    record: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            record[name] = {"status": "FAIL", "err": f"spark: {exc}"}
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(sdf)} (no oracle — rows-only check)")
            record[name] = {"status": "ROWS_ONLY", "rows": len(sdf)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures.append(name)
            record[name] = {"status": "FAIL", "err": f"oracle: {exc}"}
            continue
        sn, st, sh = frame_fingerprint(sdf)
        on, ot, oh = frame_fingerprint(odf)
        dt = time.time() - t0
        if sn != on:
            print(f"FAIL {name}: rows spark={sn} oracle={on}")
            failures.append(name)
            record[name] = {
                "status": "FAIL", "spark_rows": sn, "oracle_rows": on,
            }
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch (rows={sn})")
            _diff(sdf, odf, name)
            failures.append(name)
            record[name] = {"status": "FAIL", "rows": sn, "err": "hash"}
        else:
            schema_note = "" if [c for c, _ in st] == [c for c, _ in ot] else " (COLS!)"
            print(f"PASS {name}: rows={sn} hash={sh}{schema_note} [{dt:.1f}s]")
            record[name] = {
                "status": "PASS", "rows": sn, "hash": sh,
                "cols_sorted_match": [c for c, _ in st] == [c for c, _ in ot],
                "secs": round(dt, 1),
            }
    spark.stop()
    src_after = source_dir_snapshot(sf_dir)
    src_unchanged = src_after == src_before
    if not src_unchanged:
        changed = sorted(
            set(src_before.items()) ^ set(src_after.items())
        )[:10]
        print(
            "FAIL source-dir invariant: a query wrote under the source"
            f" table directory ({len(changed)}+ entries changed:"
            f" {changed}) — the read_table handle memo would serve a"
            " STALE file listing for the rest of the session"
        )
        failures.append("__source_dir_invariant__")
    if record_path is not None:
        import json

        payload = {
            "sf_dir": sf_dir,
            "n_checked": len(record),
            "n_registry": len(queries),
            "n_failures": len(failures),
            "source_dir_unchanged": src_unchanged,
            "results": record,
        }
        Path(record_path).write_text(json.dumps(payload, indent=1))
        print(f"wrote {record_path}")
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
