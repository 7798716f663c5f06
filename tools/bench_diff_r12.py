"""Compare two bench_full.json artifacts query-by-query (r12 evidence).

Usage: python tools/bench_diff_r12.py BEFORE.json AFTER.json [ratio]
Prints throughput probes side by side and every query whose floor moved
more than ``ratio`` (default 1.3x) either way, plus totals.
"""

import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    tb, ta = before["throughput"], after["throughput"]
    print("== probes ==")
    for k in sorted(set(tb) | set(ta)):
        if "per_sec" in k:
            b, a = tb.get(k), ta.get(k)
            r = (a / b) if (a and b) else float("nan")
            print(f"  {k}: {b} -> {a}  ({r:.2f}x)")
    print(f"== totals == {before['value']} -> {after['value']}")
    qb, qa = before["queries"], after["queries"]
    moved = []
    for k in qb:
        if k in qa and qb[k] > 0:
            r = qa[k] / qb[k]
            if r > thresh or r < 1 / thresh:
                moved.append((r, k, qb[k], qa[k]))
    noisy = set(before.get("noisy_queries", [])) | set(after.get("noisy_queries", []))
    for r, k, b, a in sorted(moved, reverse=True):
        flag = " [noisy]" if k in noisy else ""
        print(f"  {k}: {b} -> {a}  ({r:.2f}x){flag}")
    print(f"moved>{thresh}x: {len(moved)} of {len(qb)}")


if __name__ == "__main__":
    main()
