#!/usr/bin/env python3
"""Scale-rehearsal exponent table (r13 verdict task 1).

Reads two Bench artifacts measured on the SAME query set at two scale
factors (default sf0.1 and the GenSf-produced sf1) and prints per-query
scaling exponents  e = log(t_hi / t_lo) / log(scale_ratio)  sorted
descending — e ≈ 1 is linear, e ≈ 1.5 the designed intra-cell bound,
anything above that needs a named follow-up in EXPLAINS_r13.

Usage: tools/scale_exponents.py <bench_lo.json> <bench_hi.json> [ratio]
       tools/scale_exponents.py <bench_lo.json> <bench_hi.json> --gate tools/exponent_ceilings.json

Gate mode (r13 verdict task 3): compares each common row's exponent to
its committed ceiling + margin and exits 1 on any breach, so a change
that reintroduces a quadratic fails loudly instead of hiding until the
next manual rehearsal. Rows with sf1 time under min_hi_seconds are
skipped (sub-second exponents are job-overhead noise); rows absent
from the ceilings file are reported as UNENROLLED (new bench rows
should be enrolled when they enter the top-25).
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def gate(lo, hi, ceilings_path):
    cfg = load(ceilings_path)
    ratio = float(cfg.get("ratio", 10.0))
    margin = float(cfg.get("margin", 0.15))
    min_hi = float(cfg.get("min_hi_seconds", 1.0))
    ceilings = cfg["queries"]
    qlo, qhi = lo["queries"], hi["queries"]
    breaches, skipped, unenrolled, ok, failed = [], [], [], [], []
    # an enrolled row that is MISSING from a run, or that failed every
    # pass (Bench reports 0.0), is a broken query, not a skip — strictly
    # worse than an exponent regression (r14 review)
    for q in sorted(ceilings):
        if q not in qlo or q not in qhi:
            failed.append((q, "missing from the run — renamed, or its warm-up trigger left the enrolled set"))
        elif qlo[q] <= 0 or qhi[q] <= 0:
            failed.append((q, f"failed every pass (t_lo={qlo[q]}, t_hi={qhi[q]}) — see Bench stderr"))
    for q in sorted(set(qlo) & set(qhi)):
        tl, th = qlo[q], qhi[q]
        if tl <= 0 or th <= 0:
            continue  # enrolled ones already in `failed`; unenrolled carry no gate signal
        if th < min_hi:
            skipped.append(q)
            continue
        e = math.log(th / tl) / math.log(ratio)
        if q not in ceilings:
            unenrolled.append((q, e))
            continue
        lim = ceilings[q] + margin
        (breaches if e > lim else ok).append((q, e, ceilings[q], tl, th))
    for q, e, c, tl, th in ok:
        print(f"[gate] OK   {q}: e={e:.2f} <= {c:.2f}+{margin} ({tl:.2f}s -> {th:.2f}s)")
    for q, e in unenrolled:
        print(f"[gate] UNENROLLED {q}: e={e:.2f} — add a ceiling when this row joins the gate set")
    if skipped:
        print(f"[gate] skipped {len(skipped)} sub-{min_hi}s rows: {', '.join(skipped)}")
    for q, e, c, tl, th in breaches:
        print(f"[gate] BREACH {q}: exponent {e:.2f} > ceiling {c:.2f} + margin {margin} "
              f"({tl:.2f}s -> {th:.2f}s) — a scale regression or a very noisy run; "
              f"re-run before trusting, then find the new shuffle/skew")
    for q, why in failed:
        print(f"[gate] FAILED {q}: {why}")
    print(f"[gate] {len(ok)} ok, {len(breaches)} breach, {len(failed)} failed, "
          f"{len(unenrolled)} unenrolled, {len(skipped)} skipped")
    return 1 if breaches or failed else 0


def main():
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    if len(sys.argv) > 4 and sys.argv[3] == "--gate":
        sys.exit(gate(load(lo_path), load(hi_path), sys.argv[4]))
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
