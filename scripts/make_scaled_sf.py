#!/usr/bin/env python3
"""Derive a larger-SF bench dataset from the driver's sf0.1 fixtures
(VERDICT r10 task #4: one sf1.0 bench point for the common19 set — all
existing records are sf0.1, so the near-linear-at-fixture-scale claims
have no measured second point).

The driver's generator isn't available, so sf1.0 is built as a 10x
KEY-SHIFTED TILING of sf0.1 — each tile is a full copy with every key
column offset by tile * (max_key + 1), preserving referential
structure (lineitem -> orders/part/supplier, orders -> customer) and
per-tile value distributions exactly.  Two columns get more than an
offset, because naive copies would EXPLODE result sizes instead of
scaling work:

- documents.text: tiles > 0 replace every 2nd whitespace token with a
  tile-suffixed twin (tok -> tok@<tile>), keeping the Zipf shape of
  the vocabulary per tile while dropping cross-tile shingle Jaccard
  to <= 1/3 (< every dedup threshold in use) — 10x more DISTINCT
  documents, not 10 copies of each (n_chars recomputed);
- embeddings.embedding: tiles > 0 apply a seeded random ROTATION
  (QR of a Gaussian, det-corrected) — within-tile cosine structure is
  preserved bit-for-bit in expectation (exact under float32 rounding),
  cross-tile cosines collapse to ~N(0, 1/sqrt(d)), so near-dup/ANN
  result structure scales with tiles instead of exploding.

region/nation (dimension tables) are copied as-is.  Output is for
BENCH SCALING ONLY — correctness oracles keep running on the driver's
own fixtures.

Usage: python scripts/make_scaled_sf.py [tiles] [out_dir]
       (default 10 /root/repo/.scale/sf1.0)
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as papq

SRC = "/root/testdata/sf0.1"

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# stride source: the table that OWNS each key (foreign keys shift by
# the owner's stride so references stay aligned)
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

_TOKEN_RE = re.compile(r"\S+")


def perturb_texts(texts: list, tile: int) -> list[str]:
    out = []
    suf = f"@{tile}"
    for t in texts:
        if t is None:
            out.append(None)
            continue
        toks = t.split()
        for i in range(1, len(toks), 2):
            toks[i] = toks[i] + suf
        out.append(" ".join(toks))
    return out


def rotation(d: int, tile: int) -> np.ndarray:
    rng = np.random.RandomState(1000 + tile)
    q, r = np.linalg.qr(rng.randn(d, d))
    return (q * np.sign(np.diag(r))).astype(np.float64)


def main() -> None:
    tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1.0"
    os.makedirs(out_dir, exist_ok=True)

    strides: dict[str, int] = {}
    for key, (tab, col) in KEY_OWNER.items():
        if key not in strides:
            t = papq.read_table(f"{SRC}/{tab}.parquet", columns=[col])
            strides[key] = int(pc.max(t.column(0)).as_py()) + 1

    for dim in ("region", "nation"):
        papq.write_table(
            papq.read_table(f"{SRC}/{dim}.parquet"),
            f"{out_dir}/{dim}.parquet",
        )
        print(f"{dim}: copied")

    for tab, keys in KEY_COLS.items():
        src = papq.read_table(f"{SRC}/{tab}.parquet")
        parts = []
        for tile in range(tiles):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in keys:
                    col = pc.add(col, tile * strides[name])
                elif tab == "documents" and name == "text" and tile > 0:
                    col = pa.array(
                        perturb_texts(col.to_pylist(), tile),
                        type=pa.string(),
                    )
                elif tab == "embeddings" and name == "embedding" and tile > 0:
                    M = np.stack(
                        [np.asarray(v, dtype=np.float64) for v in col.to_pylist()]
                    )
                    Q = rotation(M.shape[1], tile)
                    col = pa.array(
                        list((M @ Q.T).astype(np.float32)),
                        type=pa.list_(pa.float32()),
                    )
                cols[name] = col
            t = pa.table(cols)
            if tab == "documents":
                # keep n_chars consistent with the perturbed text
                t = t.set_column(
                    t.schema.get_field_index("n_chars"),
                    "n_chars",
                    pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
                )
            parts.append(t)
        full = pa.concat_tables(parts)
        papq.write_table(full, f"{out_dir}/{tab}.parquet")
        print(f"{tab}: {full.num_rows} rows ({tiles} tiles)")


if __name__ == "__main__":
    main()
