"""Smoke test: the scripted data-checker example runs end-to-end."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_qc_checker_example_runs(tmp_path):
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "qc_checker.py"),
         "/root/testdata/sf0.001", str(tmp_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "progress after rule-based flagging" in out.stdout
    assert "wrote [csv]" in out.stdout or "wrote [parquet]" in out.stdout
    # the exports actually landed
    assert any(tmp_path.iterdir())


def test_curate_corpus_example_runs():
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / "curate_corpus.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "curated" in out.stdout
    assert "token budget" in out.stdout
    assert "IVF recall@10" in out.stdout
