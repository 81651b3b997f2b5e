#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate.

Usage: python3 tools/check.py [--json out.json] [sf_dir] [out_dir] [query_filter...]

Reads outDir/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from outDir/oracle_sql.json in DuckDB against the
sf_dir parquet tables, and compares: schema (sorted column names),
row count, and values (columns sorted by name, rows sorted by all
columns).

With --json, also writes a per-query report in the driver's
CORRECTNESS_r{N}.json shape (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err); queries that have a Verify output but
no oracle SQL (rows-only ops like d11) get a rows-only entry.
"""
import json
import math
import os
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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out_dir = argv[1] if len(argv) > 1 else "/tmp/graft_verify"
    only = set(argv[2:])

    con = duckdb.connect()
    # Heavy-tier oracles (the composed-gate replay at sf10's 500k
    # docs) build larger-than-RAM intermediates; an explicit cap +
    # temp dir lets DuckDB go out-of-core instead of eating the host.
    if os.environ.get("CHECK_MEMORY_LIMIT"):
        con.execute(
            f"SET memory_limit='{os.environ['CHECK_MEMORY_LIMIT']}'")
    if os.environ.get("CHECK_TEMP_DIR"):
        os.makedirs(os.environ["CHECK_TEMP_DIR"], exist_ok=True)
        con.execute(
            f"SET temp_directory='{os.environ['CHECK_TEMP_DIR']}'")
    for t in TABLES:
        # Partial corpora are legal for targeted gates (data/sf10
        # carries only documents/embeddings/events); a query whose
        # oracle needs a missing table fails at its own row, not here.
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    report = {}

    def rec(name, rows_match, schema_match, hash_match, spark_rows,
            oracle_rows, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    # Above this many rows, compare via an order-independent DuckDB
    # hash aggregate instead of fetching both sides into Python —
    # fetchall+sort of a 24M-row result costs ~25 GB and tens of
    # minutes; the SQL hash compare streams it in seconds.
    big = int(os.environ.get("CHECK_HASH_THRESHOLD", "2000000"))

    def hash_compare(name, spark_q, oracle_q, cols, types):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def side(q):
            exprs = []
            for i in order:
                c, t = f'"{cols[i]}"', types[i]
                if t in ("DOUBLE", "FLOAT"):
                    exprs.append(
                        f"CASE WHEN isnan({c}) THEN 'NaN' WHEN {c} = 0 "
                        f"THEN '0.0' ELSE {c}::VARCHAR END")
                else:
                    exprs.append(f"{c}::VARCHAR")
            lst = ", ".join(exprs)
            return con.sql(
                f"SELECT count(*) AS n, sum(hash(list_value({lst}))) AS h "
                f"FROM ({q})").fetchone()

        gn, gh = side(spark_q)
        wn, wh = side(oracle_q)
        sr, orr = gn, wn
        if gn != wn:
            print(f"FAIL {name}: rows {gn} vs oracle {wn} (hash mode)")
            rec(name, False, True, False, sr, orr)
            return False
        if gh != wh:
            print(f"FAIL {name}: value hash mismatch over {gn} rows "
                  f"(hash mode)")
            rec(name, True, True, False, sr, orr)
            return False
        print(f"PASS {name} ({gn} rows, hash mode)")
        rec(name, True, True, True, sr, orr)
        return True

    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_q = (f"SELECT * FROM read_parquet("
                       f"'{out_dir}/{name}/*.parquet')")
            rel = con.sql(spark_q)
            got_cols, got_types = rel.columns, [str(t) for t in rel.types]
            nrows = con.sql(f"SELECT count(*) FROM ({spark_q})").fetchone()[0]
            # Count BOTH sides cheaply before choosing a compare mode:
            # a small Spark result against a badly-wrong huge oracle
            # result would otherwise fetchall() the oracle side into
            # Python — the exact blowup hash mode exists to avoid.
            o_rows = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
            if nrows > big or o_rows > big:
                rel = con.sql(sql)
                want_cols = rel.columns
                want_types = [str(t) for t in rel.types]
                gt = [t for _, t in sorted(zip(got_cols, got_types))]
                wt = [t for _, t in sorted(zip(want_cols, want_types))]
                if sorted(got_cols) != sorted(want_cols):
                    print(f"FAIL {name}: schema {sorted(got_cols)} vs "
                          f"oracle {sorted(want_cols)}")
                    rec(name, None, False, False, nrows, None)
                    n_fail += 1
                elif gt != wt:
                    print(f"FAIL {name}: types spark={gt} vs oracle={wt}")
                    rec(name, None, False, False, nrows, None)
                    n_fail += 1
                elif hash_compare(name, spark_q, sql, got_cols, got_types):
                    n_pass += 1
                else:
                    n_fail += 1
                continue
            got = rel.fetchall()
            rel = con.sql(sql)
            want_cols, want_types = rel.columns, [str(t) for t in rel.types]
            want = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            rec(name, False, False, False, None, None, str(e)[:200])
            n_fail += 1
            continue
        # The driver's hash compare is type-sensitive (HUGEINT != BIGINT
        # even when values agree), so compare declared result types too.
        gt = [t for _, t in sorted(zip(got_cols, got_types))]
        wt = [t for _, t in sorted(zip(want_cols, want_types))]
        g = norm_rows(got_cols, got)
        w = norm_rows(want_cols, want)
        sr, orr = len(g) - 1, len(w) - 1
        if g[0] != w[0]:
            print(f"FAIL {name}: schema {g[0]} vs oracle {w[0]}")
            rec(name, sr == orr, False, False, sr, orr)
            n_fail += 1
        elif gt != wt:
            print(f"FAIL {name}: types spark={gt} vs oracle={wt}")
            rec(name, sr == orr, False, False, sr, orr)
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {sr} vs oracle {orr}")
            rec(name, False, True, False, sr, orr)
            n_fail += 1
        elif g[1:] != w[1:]:
            bad = [(a, b) for a, b in zip(g[1:], w[1:]) if a != b]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            rec(name, True, True, False, sr, orr)
            n_fail += 1
        else:
            print(f"PASS {name} ({sr} rows)")
            rec(name, True, True, True, sr, orr)
            n_pass += 1

    # Rows-only entries: Verify outputs with no oracle SQL (approximate
    # ops like d11 — the driver records the same weaker check).
    for name in sorted(os.listdir(out_dir)):
        if name in oracles or not os.path.isdir(f"{out_dir}/{name}"):
            continue
        if only and name not in only:
            continue
        try:
            sr = con.sql(f"SELECT count(*) FROM read_parquet("
                         f"'{out_dir}/{name}/*.parquet')").fetchone()[0]
            ok = sr > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {sr} rows)")
            rec(name, ok, None, None, sr, None,
                None if ok else "rows-only check: 0 rows")
            n_pass += ok
            n_fail += not ok
        except Exception as e:
            print(f"FAIL {name}: rows-only error {e}")
            rec(name, False, None, None, None, None, str(e)[:200])
            n_fail += 1

    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
