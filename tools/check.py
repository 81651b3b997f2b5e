#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir] [query_filter...]

Reads outDir/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from outDir/oracle_sql.json in DuckDB against the
sf_dir parquet tables, and compares: schema (sorted column names),
row count, and values (columns sorted by name, rows sorted by all
columns).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and collapse float64 noise far below our
        # rounding granularity
        if v == 0:
            return 0.0
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return [sorted(c for c in cols)] + out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got_types = rel.columns, [str(t) for t in rel.types]
            got = rel.fetchall()
            rel = con.sql(sql)
            want_cols, want_types = rel.columns, [str(t) for t in rel.types]
            want = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        # The driver's hash compare is type-sensitive (HUGEINT != BIGINT
        # even when values agree), so compare declared result types too.
        gt = [t for _, t in sorted(zip(got_cols, got_types))]
        wt = [t for _, t in sorted(zip(want_cols, want_types))]
        g = norm_rows(got_cols, got)
        w = norm_rows(want_cols, want)
        if g[0] != w[0]:
            print(f"FAIL {name}: schema {g[0]} vs oracle {w[0]}")
            n_fail += 1
        elif gt != wt:
            print(f"FAIL {name}: types spark={gt} vs oracle={wt}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)-1} vs oracle {len(w)-1}")
            n_fail += 1
        elif g[1:] != w[1:]:
            bad = [(a, b) for a, b in zip(g[1:], w[1:]) if a != b]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)-1} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
