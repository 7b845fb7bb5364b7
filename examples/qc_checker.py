"""Runnable end-to-end QC checker — the scripted, non-programmer entry
point mirroring the reference's R Markdown data-checker template
(/root/reference/inst/rmarkdown/templates/data-checker/skeleton/skeleton.Rmd:24-59):
load → init flags → review windows → progress report → masked exports.

Usage:
    python examples/qc_checker.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=a temp directory.
Everything here is the public API; swap the predicate/paths for your
own data.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

import qctimeseries_spark as qc  # noqa: E402
from qctimeseries_spark.session import get_spark  # noqa: E402
from qctimeseries_spark.sources import read_table  # noqa: E402


def main(sf_dir: str, out_dir: str) -> int:
    spark = get_spark("qc_checker", master="local[4]", shuffle_partitions=4)

    # 1. load the raw series (S1/S2: any Spark-readable source works)
    raw = read_table(spark, sf_dir, "events").select("event_id", "ts", "value")

    # 2. scripted pipeline: flag init (U7/F1) + rule-based flagging (U1
    #    generalized to predicates) + progress (A1) + masking (P4+P1)
    flagged, clean, prog = qc.qc_pipeline(
        raw,
        "value",
        time_col="ts",
        flag_predicates={"value": F.col("value") > 150},
        # automated screening stage: range + jump rules flag -2 too
        rules={"value": {"lo": 0.0, "hi": 140.0, "max_step": 120.0}},
    )
    print("== progress after rule-based flagging ==")
    prog.show(truncate=False)

    # 3. interactive-style review of the first admitted window — the
    #    same U-op vocabulary the reference drives from Shiny
    sess = qc.QcSession(flagged, "value", time_col="ts", win_hours=48)
    print(f"windows admitted: {sess.n_windows} | {sess.window_label()}")
    sess.approve_unflagged()          # approve everything clean in window 0
    sess.next()
    sess.flag_window()                # window 1 looks bad: flag it all
    reviewed = sess.finish()

    # 4. progress after review + masked exports (CSV.gz ISO-8601 UTC,
    #    Parquet zstd, MD5 checksums — S3/S4/S7/S9)
    qc.progress(reviewed, ["value"]).show(truncate=False)
    written = qc.write_exports(reviewed, out_dir, "events_qc", time_col="ts")
    for fmt, paths in written.items():
        for p in paths:
            print(f"wrote [{fmt}] {p}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="qc_out_")
    raise SystemExit(main(sf, out))
