#!/usr/bin/env python3
"""Scale-curve report: per-family growth exponents from bench JSONs at
several ScaleUp factors (VERDICT r7 stretch #8 — "turn the 2.46x trend
line into a curve").

    python3 tools/scalecurve.py f1=bench_out.json f3=bench_sf03.json \
        f10=bench_sf1.json

Each arg is <factor>=<bench json>. For every query present at all
factors, fits log(time) ~ a + b*log(factor) (least squares over the
given points); b is the measured growth exponent (1.0 = linear in data,
<1 = sublinear, 2.0 = quadratic). Prints per-family medians and the
worst individual exponents. Families are name prefixes (dd_, graph_,
mm_, ann_, ts_, st_, q_, ...).
"""
import json
import math
import sys
from collections import defaultdict


def load_queries(path):
    """Accept either a bench JSON ({"queries": {name: sec}}) or a
    correctness-gate JSON whose records carry wall_sec (the sf10 tier's
    per-query walls, r13 task 1)."""
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    return {name: rec["wall_sec"] for name, rec in d.items()
            if isinstance(rec, dict) and "wall_sec" in rec}


def main():
    runs = []  # (factor, {query: sec})
    for a in sys.argv[1:]:
        f, path = a.split("=", 1)
        runs.append((float(f.lstrip("f")), load_queries(path)))
    runs.sort()
    if len(runs) < 2:
        sys.exit("need at least two <factor>=<bench.json> args")
    common = set(runs[0][1])
    for _, q in runs[1:]:
        common &= set(q)

    def fit(xs, ys):
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        den = sum((x - mx) ** 2 for x in xs)
        return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den

    expo = {}
    for name in sorted(common):
        xs = [math.log(f) for f, _ in runs]
        ys = [math.log(q[name]) for _, q in runs]
        expo[name] = fit(xs, ys)

    fams = defaultdict(list)
    for name, b in expo.items():
        fams[name.split("_")[0] + "_"].append((b, name))
    print(f"{'family':<10} {'n':>3} {'median_b':>9} {'worst_b':>8}  worst query")
    for fam in sorted(fams):
        bs = sorted(fams[fam])
        med = bs[len(bs) // 2][0]
        wb, wn = bs[-1]
        print(f"{fam:<10} {len(bs):>3} {med:>9.2f} {wb:>8.2f}  {wn}")
    print("\nworst 12 individual exponents:")
    for b, name in sorted(((b, n) for n, b in expo.items()), reverse=True)[:12]:
        times = "  ".join(f"x{f:g}={q[name]:.2f}s" for f, q in runs)
        print(f"  b={b:5.2f}  {name:<24} {times}")


if __name__ == "__main__":
    main()
