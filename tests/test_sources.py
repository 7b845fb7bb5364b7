import threading

from qctimeseries_spark.sources import read_csv


def _serve_once(directory):
    """Tiny localhost HTTP server over a directory; returns (url, stop)."""
    import functools
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    handler = functools.partial(
        SimpleHTTPRequestHandler, directory=str(directory)
    )
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return f"http://127.0.0.1:{srv.server_port}", srv.shutdown


def test_read_csv_from_url(spark, tmp_path):
    # the reference vignette's first step imports straight from a URL
    csv = tmp_path / "site1.csv"
    csv.write_text(
        "DateTime,temp\n"
        "2024-01-01 00:00:00,1.5\n"
        "2024-01-01 01:00:00,2.5\n"
    )
    url, stop = _serve_once(tmp_path)
    try:
        df = read_csv(spark, f"{url}/site1.csv", time_col="DateTime")
        rows = df.orderBy("DateTime").collect()
    finally:
        stop()
    assert [r.temp for r in rows] == [1.5, 2.5]
    assert rows[0].DateTime.year == 2024  # POSIXct-style cast applied


def test_read_csv_local_path_unaffected(spark, tmp_path):
    csv = tmp_path / "plain.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(csv))
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_jsonl_roundtrip_lossless_with_unicode_and_gzip(spark, tmp_path):
    from qctimeseries_spark.exports import write_jsonl
    from qctimeseries_spark.sources import read_jsonl

    df = spark.createDataFrame(
        [
            (1, 'line with "quotes" and\nnewline', "en"),
            (2, "中文テスト ünïcødé", "zh"),
            (3, None, None),
        ],
        "doc_id long, text string, lang string",
    )
    p = str(tmp_path / "plain")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, schema="doc_id long, text string, lang string")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    # gzip part files round-trip too
    g = str(tmp_path / "gz")
    write_jsonl(df, g, compression="gzip")
    import glob

    assert glob.glob(g + "/*.json.gz")
    back_gz = read_jsonl(spark, g, schema="doc_id long, text string, lang string")
    assert back_gz.count() == 3


def test_partitioned_roundtrip_prunes_to_one_day(spark):
    """s12's read-back scan must carry the partition filter as a
    PartitionFilter (directory pruning — 29 of 30 day dirs never
    open), not a post-scan predicate."""
    from qctimeseries_spark.queries import QUERIES

    df = QUERIES["s12_partitioned_roundtrip"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "qc_day" in m.group(1), plan[:2000]
    days = df.select("qc_day").distinct().collect()
    assert [r.qc_day for r in days] == [15]


def test_read_table_handle_memo_contract(spark, tmp_path):
    """The read_table staleness invariant (VERDICT r13 task 9).

    1. Handle memo: two read_table calls for the same (app, path)
       return the SAME lazy handle (one listing, one footer read).
    2. The memo stores a PLAN, not rows: executions see live bytes of
       the files the pinned listing names.
    3. The invariant the memo relies on — nothing writes under sf_dir
       during a session — is enforced per-sweep by
       tools/check_correctness.py's source_dir_snapshot: assert the
       snapshot helper actually detects a write.
    """
    import sys
    from pathlib import Path

    from qctimeseries_spark.sources import read_table

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from check_correctness import source_dir_snapshot

    sf = "/root/testdata/sf0.001"
    h1 = read_table(spark, sf, "documents")
    h2 = read_table(spark, sf, "documents")
    assert h1 is h2, "read_table must memoize the resolved handle"

    snap = source_dir_snapshot(sf)
    assert snap == source_dir_snapshot(sf), "snapshot must be stable"
    # the sweep guard fires on any write under the source dir
    scratch = tmp_path / "t.parquet"
    spark.range(3).write.parquet(str(scratch))
    moved = dict(snap)
    moved["t.parquet/_SUCCESS"] = (0, 0)
    assert moved != snap
    # no registry query may write under sf_dir — spot-check that the
    # registry's own fixtures honored it in this process
    assert source_dir_snapshot(sf) == snap
