#!/usr/bin/env python3
"""Generate a documents+embeddings-only corpus at a chosen multiple of
sf0.1 — the second scale octave for the dedup-family gate (GATE_SF1.md
proves 10x on the full table set; this extends documents/embeddings to
100x so the d7/d8/d30/d32 candidate-growth claims get a second
measured octave without 18 GB of relational tables).

Same distributions and seed discipline as tools/gen_sf1.py (vocab,
lang mix, ~5% near-dup tail mutations, ~0.2% exact copies, unit-norm
random embeddings). Tool-only; never imported by the Scala library.

Usage: python3 tools/gen_docs.py [outDir=data/sf10_docs] [SF=100]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "data/sf10_docs"
SF = int(sys.argv[2]) if len(sys.argv) > 2 else 100  # relative to sf0.1
rng = np.random.default_rng(42)

os.makedirs(OUT, exist_ok=True)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


# --- documents (near-dup + exact-dup structure) -------------------------
N_DOC = 5000 * SF
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
texts = []
for i in range(N_DOC):
    r = rng.random()
    if i > 10 and r < 0.002:  # exact copy of an earlier doc
        texts.append(texts[rng.integers(0, i)])
    elif i > 10 and r < 0.05:  # near-dup: tail mutation of an earlier doc
        base = texts[rng.integers(0, i)].split(" ")
        k = int(rng.integers(1, 4))
        if rng.random() < 0.5 and len(base) > k + 5:
            base = base[:-k]  # drop k tail words
        else:
            base = base + list(rng.choice(VOCAB, k))  # append k words
        texts.append(" ".join(base))
    else:
        n = int(rng.integers(10, 101))
        texts.append(" ".join(rng.choice(VOCAB, n)))
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOC, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(rng.choice(LANGS, N_DOC, p=LANG_P)),
    "source": pa.array([f"src{s}" for s in rng.integers(0, 20, N_DOC)]),
    "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
}))

# --- embeddings (unit-norm random 64-dim, labels uniform 0..9) ----------
N_EMB = 2000 * SF
M = rng.standard_normal((N_EMB, 64)).astype(np.float32)
M /= np.linalg.norm(M, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
    "embedding": pa.array(list(M)),
    "label": pa.array(rng.integers(0, 10, N_EMB).astype(np.int32)),
}))

print("done ->", OUT)
