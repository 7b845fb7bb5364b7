"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship QC pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 as paired Spark callables and DuckDB oracle SQL (see
``qctimeseries_spark/queries.py``).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's end-to-end workflow (SURVEY.md
    §3.1) on sf0.001 events — seed flags, update, and report per-variable
    progress."""
    from qctimeseries_spark.queries import q_a1_progress

    return q_a1_progress(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from qctimeseries_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from qctimeseries_spark.queries import ORACLE

    return dict(ORACLE)
