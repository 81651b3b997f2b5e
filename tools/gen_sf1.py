#!/usr/bin/env python3
"""Generate synthetic test data beyond the driver's sf0.1 ceiling.

The driver's testdata stops at sf0.1 (/root/testdata, read-only). This
script extends the same deterministic synthetic-table family to larger
scale factors so the correctness + bench gates can execute at 10x
(sf1.0, the full-catalog gate) and 100x (sf10, the heavy-tier spot
gate — documents/embeddings/events only).

Distributions mirror sf0.1, verified by profiling (see GATE_SF1.md):
same categorical vocabularies (event types, langs, sources, brands,
segments, word vocab), same ranges, same duplicate structure in
documents (~5%% near-dup tail mutations, ~0.2%% exact copies), unit-norm
random embeddings.

Tool-only (driver-side python, never imported by the Scala library).
Usage: python3 tools/gen_sf1.py [outDir=data/sf1.0] [sfMult=10] [tables]

  sfMult is relative to sf0.1 (10 -> sf1.0, 100 -> sf10); tables is an
  optional comma-separated subset (e.g. documents,embeddings,events for
  the sf10 spot gate). Flag-like arguments are rejected — an earlier
  `--help` invocation silently generated 190 MB of parquet into a
  directory literally named `--help/`.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

args = sys.argv[1:]
if any(a.startswith("-") for a in args):
    print(__doc__)
    sys.exit(0 if args[0] in ("-h", "--help") else 2)
OUT = args[0] if args else "data/sf1.0"
SF = int(args[1]) if len(args) > 1 else 10  # relative to sf0.1
TABLES = set(args[2].split(",")) if len(args) > 2 else None
rng = np.random.default_rng(42)

os.makedirs(OUT, exist_ok=True)


def want(name):
    return TABLES is None or name in TABLES


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def ts_ms(start, end, n, sort=False):
    """Uniform timestamps in [start, end) as ms-precision epoch int64."""
    lo = np.datetime64(start, "ms").astype(np.int64)
    hi = np.datetime64(end, "ms").astype(np.int64)
    v = rng.integers(lo, hi, n)
    if sort:
        v.sort()
    return v


# NOTE: every rng draw is kept inside its table's `want()` guard, and
# the guards run in a fixed order, so a subset run produces the same
# bytes for the tables it does generate ONLY when the preceding tables
# are also skipped consistently — i.e. a given (sfMult, tables) pair is
# deterministic, but `documents` from a subset run will differ from
# `documents` of a full run. The gates never mix outputs of different
# invocations, so this is fine; regenerate a dir in one shot.

# --- region / nation (fixed-size dims) -------------------------------
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
if want("region"):
    write("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
if want("nation"):
    write("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))

# --- customer ---------------------------------------------------------
N_CUST = 15000 * SF
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
if want("customer"):
    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(N_CUST, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, N_CUST), 2)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, N_CUST)),
    }))

# --- supplier ---------------------------------------------------------
N_SUPP = 1000 * SF
if want("supplier"):
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(0, 10000, N_SUPP), 2)),
    }))

# --- part -------------------------------------------------------------
N_PART = 20000 * SF
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
if want("part"):
    pk = np.arange(N_PART, dtype=np.int64)
    write("part", pa.table({
        "p_partkey": pa.array(pk),
        "p_name": pa.array([f"{a} {n}" for a, n in
                            zip(rng.choice(ADJ, N_PART),
                                rng.choice(NOUN, N_PART))]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, N_PART)]),
        "p_type": pa.array(rng.choice(PTYPES, N_PART)),
        "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + 0.1 * (pk % 1000), 1)),
    }))

# --- orders -----------------------------------------------------------
N_ORD = 150000 * SF
day_ms = 86400000
if want("orders"):
    odate = ts_ms("1995-01-01", "2001-08-02", N_ORD)
    odate = (odate // day_ms) * day_ms  # date-truncated, like sf0.1
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD).astype(np.int64)),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], N_ORD)),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, N_ORD), 2)),
        "o_orderdate": pa.array(odate).cast(pa.timestamp("ms")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            N_ORD)),
    }))

# --- lineitem (chunked: 6M rows at sf1) --------------------------------
N_LI = 600000 * SF
if want("lineitem"):
    sdate = ts_ms("1995-01-02", "2001-11-05", N_LI)
    sdate = (sdate // day_ms) * day_ms
    li = pa.table({
        "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LI).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LI).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 8, N_LI).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, N_LI).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, N_LI), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, N_LI) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, N_LI) * 0.01, 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], N_LI)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], N_LI)),
        "l_shipdate": pa.array(sdate).cast(pa.timestamp("ms")),
    })
    write("lineitem", li)
    del li, sdate

# --- events (ns timestamps, sorted by event_id) ------------------------
N_EV = 100000 * SF
if want("events"):
    lo = np.datetime64("2024-01-01", "ns").astype(np.int64)
    hi = np.datetime64("2024-01-31", "ns").astype(np.int64)
    ets = rng.integers(lo, hi, N_EV)
    ets.sort()
    write("events", pa.table({
        "event_id": pa.array(np.arange(N_EV, dtype=np.int64)),
        "ts": pa.array(ets).cast(pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, 1500 * SF, N_EV).astype(np.int64)),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], N_EV)),
        "value": pa.array(np.round(rng.exponential(50.0, N_EV), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)]),
    }))

# --- documents (near-dup + exact-dup structure) -------------------------
N_DOC = 5000 * SF
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
if want("documents"):
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
if want("embeddings"):
    M = rng.standard_normal((N_EMB, 64)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
        "embedding": pa.array(list(M)),
        "label": pa.array(rng.integers(0, 10, N_EMB).astype(np.int32)),
    }))

print("done ->", OUT)
