#!/usr/bin/env python3
"""Tabulate per-query scaling between two Bench JSON outputs.

Usage: python3 tools/scaling.py BENCH_small.json BENCH_big.json [data_ratio]

Prints per-query time ratio big/small sorted descending, flagging
queries whose ratio exceeds the data ratio (super-linear candidates).
Sub-second small-SF timings are noise-dominated (fixed per-job
overhead), so ratios are also shown against a 0.15 s floor.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d["queries"], d.get("sf"), d.get("value")


def main():
    small_q, small_sf, small_tot = load(sys.argv[1])
    big_q, big_sf, big_tot = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for k in sorted(big_q):
        if k not in small_q:
            continue
        s, b = small_q[k], big_q[k]
        # fixed per-job overhead dominates sub-0.15s timings; the
        # floored ratio is the scale signal, the raw one is context
        floored = b / max(s, 0.15)
        rows.append((floored, k, s, b))
    rows.sort(reverse=True)
    # degrade instead of crashing when a JSON lacks 'value' or the
    # small total is zero (e.g. a filtered single-query run)
    if small_tot and big_tot:
        print(f"total: {small_tot:.1f}s -> {big_tot:.1f}s "
              f"({big_tot / small_tot:.2f}x on {ratio:.0f}x data)")
    else:
        print(f"total: n/a (small={small_tot} big={big_tot})")
    print(f"{'query':28s} {'small':>8s} {'big':>8s} {'ratio':>7s}")
    for fl, k, s, b in rows:
        flag = " <-- SUPER-LINEAR" if fl > ratio else ""
        print(f"{k:28s} {s:8.3f} {b:8.3f} {fl:6.1f}x{flag}")


if __name__ == "__main__":
    main()
