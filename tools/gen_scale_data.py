"""Generate an sf1-scale (10x sf0.1) dataset for scaling benchmarks.

The driver ships sf0.001/0.01/0.1 only; scale claims beyond 600k rows
need bigger inputs, and /root/testdata is read-only — so this writes a
synthetic sf1 to a caller-chosen directory (default /tmp/sf1).

Construction, per table class:

- Relational tables (lineitem/orders/customer/part/supplier) and
  events: a UNION of 10 key-shifted copies of sf0.1.  Keys shift by
  copy * max_key so joins keep their exact selectivity and fan-out;
  events gain 10x the users over the same 30-day span (the realistic
  axis of growth for an event stream — per-user density, session
  structure and window layout are preserved).  nation/region are
  dimensions and copy through unchanged.
- documents: freshly synthesized word-soup from the SAME 31-token
  vocabulary and length/lang/source distributions as the driver's
  corpus, seeded — NOT copied, because copying would plant every doc
  as a 10-way exact duplicate and turn the dedup benchmarks into
  pair-explosion stress tests instead of scaling runs.  Exact dups
  (~0.5%) and near-dups (~1%, few-word substitutions) are planted at
  driver-like rates.
- embeddings: 20k near-uniform unit 64-dim float32 vectors (labels are
  metadata, NOT geometry — measured on the driver's corpus: intra-label
  mean cosine 0.00, max 0.46) plus ~1% planted near-identical pairs,
  so dup counts scale linearly instead of exploding cluster-wise.

Usage: python tools/gen_scale_data.py [out_dir] [copies]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

SHIFTS = {  # table -> {column: per-copy shift}
    "events": {"event_id": 100_000, "user_id": 1_500},
    "lineitem": {"l_orderkey": 600_000},
    "orders": {"o_orderkey": 600_000, "o_custkey": 15_000},
    "customer": {"c_custkey": 15_000},
    "part": {"p_partkey": 200_000},
    "supplier": {"s_suppkey": 10_000},
}
PASSTHROUGH = ["nation", "region"]


def _copy_shifted(con, table: str, out_dir: Path, copies: int) -> None:
    cols = [
        r[0]
        for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).fetchall()
    ]
    shifts = SHIFTS.get(table, {})
    sel = ", ".join(
        f"{c} + k * {shifts[c]} AS {c}" if c in shifts else c for c in cols
    )
    con.sql(
        f"COPY (SELECT {sel} FROM '{SRC}/{table}.parquet',"
        f" range({copies}) t(k))"
        f" TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
    )


def _gen_documents(con, out_dir: Path, copies: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    vocab = [
        r[0]
        for r in con.sql(
            "SELECT DISTINCT unnest(string_split(text, ' ')) w"
            f" FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    langs = con.sql(
        f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' GROUP BY 1"
        " ORDER BY 1"
    ).fetchall()
    lang_names = [l for l, _ in langs]
    lang_w = [c for _, c in langs]
    n = 5_000 * copies
    ids, texts = list(range(n)), []
    for i in range(n):
        n_words = rng.randint(8, 100)
        texts.append(" ".join(rng.choices(vocab, k=n_words)))
    # planted exact dups (~0.5%) and near-dups (~1%)
    for i in range(0, n, 200):
        j = rng.randrange(n)
        if j != i:
            texts[j] = texts[i]
    for i in range(100, n, 100):
        j = rng.randrange(n)
        if j != i:
            words = texts[i].split()
            for _ in range(max(1, len(words) // 30)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            texts[j] = " ".join(words)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choices(lang_names, lang_w, k=n)),
            "source": pa.array([f"src{rng.randrange(20)}" for _ in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, out_dir / "documents.parquet")


def _gen_embeddings(out_dir: Path, copies: int, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    n, dim, n_labels = 2_000 * copies, 64, 10
    vecs = rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, size=n)
    # planted near-identical pairs: overwrite ~1% with a jittered copy
    for i in range(0, n, 100):
        j = int(rng.integers(0, n))
        if j != i:
            vecs[j] = vecs[i] + 1e-4 * rng.normal(size=dim)
            vecs[j] /= np.linalg.norm(vecs[j])
            labels[j] = labels[i]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, out_dir / "embeddings.parquet")


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet')"
            f" TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in SHIFTS:
        _copy_shifted(con, t, out_dir, copies)
        print(f"wrote {t}", file=sys.stderr)
    _gen_documents(con, out_dir, copies)
    _gen_embeddings(out_dir, copies)
    print(f"sf{copies / 10:g} dataset at {out_dir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
