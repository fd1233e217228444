#!/usr/bin/env python3
"""Build a ~10x scale-regression dataset at /tmp/sf1 from sf0.1 (dev
tool only — the driver provides sf0.001/0.01/0.1; quadratic operators
hide at sf0.1, so the bench also runs once per round at this larger
scale to catch super-linear growth).

Each copy k shifts every primary/foreign key by k*STRIDE so joins stay
consistent. Text and embeddings are perturbed per copy (a ' dupK'
suffix token; ~0.1% multiplicative noise) so the dedup/ANN operators
see realistic high-similarity near-duplicates instead of degenerate
exact clones.

Usage: python3 scripts/make_sf1.py [K] [srcDir] [outDir]
"""
import sys

import numpy as np
import pandas as pd

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
STRIDE = 10_000_000  # far above any sf0.1 key

import os
os.makedirs(OUT, exist_ok=True)

# tiny dims: copy through unchanged (nationkey space is shared, unshifted)
for t in ("region", "nation"):
    pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(f"{OUT}/{t}.parquet", index=False)

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

for t, keys in SHIFT_COLS.items():
    base = pd.read_parquet(f"{SRC}/{t}.parquet")
    copies = []
    for k in range(K):
        c = base.copy()
        for col in keys:
            c[col] = c[col] + k * STRIDE
        if t == "documents" and k > 0:
            c["text"] = c["text"] + f" dup{k}"
        if t == "embeddings" and k > 0:
            emb = np.stack(c["embedding"].to_numpy())
            j = np.arange(emb.shape[1])
            noise = 1.0 + ((k * 31 + j) % 7 - 3) * 1e-3
            c["embedding"] = list((emb * noise).astype(np.float32))
        copies.append(c)
    out = pd.concat(copies, ignore_index=True)
    out.to_parquet(f"{OUT}/{t}.parquet", index=False)
    print(t, len(base), "->", len(out))
