#!/usr/bin/env python3
"""Scale-rehearsal exponent table (r13 verdict task 1).

Reads two Bench artifacts measured on the SAME query set at two scale
factors (default sf0.1 and the GenSf-produced sf1) and prints per-query
scaling exponents  e = log(t_hi / t_lo) / log(scale_ratio)  sorted
descending — e ≈ 1 is linear, e ≈ 1.5 the designed intra-cell bound,
anything above that needs a named follow-up in EXPLAINS_r13.

Usage: tools/scale_exponents.py <bench_lo.json> <bench_hi.json> [ratio]
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lo, hi = load(lo_path), load(hi_path)
    qlo, qhi = lo["queries"], hi["queries"]
    common = sorted(set(qlo) & set(qhi))
    rows = []
    for q in common:
        tl, th = qlo[q], qhi[q]
        if tl <= 0 or th <= 0:
            rows.append((float("nan"), q, tl, th))
            continue
        rows.append((math.log(th / tl) / math.log(ratio), q, tl, th))
    rows.sort(key=lambda r: -(r[0] if r[0] == r[0] else -99))
    noisy_lo = set(lo.get("noisy") or [])
    noisy_hi = set(hi.get("noisy") or [])
    print(f"| query | t(sf0.1) s | t(sf1) s | exponent | note |")
    print(f"|---|---|---|---|---|")
    for e, q, tl, th in rows:
        note = []
        if q in noisy_lo:
            note.append("noisy@lo")
        if q in noisy_hi:
            note.append("noisy@hi")
        if tl < 0.5:
            note.append("sub-0.5s base")
        print(f"| {q} | {tl:.2f} | {th:.2f} | {e:.2f} | {' '.join(note)} |")
    tot_lo = sum(qlo[q] for q in common)
    tot_hi = sum(qhi[q] for q in common)
    print(f"\ncommon rows {len(common)}: total {tot_lo:.1f} -> {tot_hi:.1f} s, "
          f"aggregate exponent {math.log(tot_hi / tot_lo) / math.log(ratio):.2f}")


if __name__ == "__main__":
    main()
