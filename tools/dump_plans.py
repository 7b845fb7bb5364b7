"""Dump ``.explain("formatted")`` for declared queries to files.

Usage::

    python tools/dump_plans.py OUT_DIR SUFFIX [query ...]

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` for each named query (default:
every registry entry).  Streaming-drain queries materialize before the
plan is captured (the returned frame is the drained batch table), so
the file holds the plan of the RETURNED frame — for those entries the
interesting plans are inside the drain and the committed file says so.
"""

from __future__ import annotations

import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    out_dir.mkdir(parents=True, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from qctimeseries_spark.queries import QUERIES
    from qctimeseries_spark.session import get_spark

    spark = get_spark("dump_plans")
    targets = names or list(QUERIES)
    for name in targets:
        fn = QUERIES[name]
        path = out_dir / f"{name}_{suffix}.txt"
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            plan = "ERROR capturing plan:\n" + traceback.format_exc()
        path.write_text(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
