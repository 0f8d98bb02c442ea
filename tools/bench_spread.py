#!/usr/bin/env python3
"""Digest a bench.json (with samples_raw, round 11+) into contention
evidence: per-query relative spread of the interleaved samples, the
worst offenders, and which pass absorbed the slow outliers.

Usage: python3 tools/bench_spread.py bench.json [bench_other.json]

With a second file, also prints the per-query median ratio
(first/second) distribution — the sweep-vs-sweep (or sweep-vs-subset)
agreement check that round 10's artifacts could not support.
"""
import json, statistics, sys


def load(path):
    return json.load(open(path))


def spreads(d):
    # Only the 3 INTERLEAVED samples count: the optional 4th
    # contention-insurance sample exists only for slow queries, so
    # folding it in would both skew the spread and make the pass
    # histogram report a pass 4 that fast queries never have.
    out = {}
    for q, raw in d.get("samples_raw", {}).items():
        good = [abs(x) for x in raw[:3] if x > 0]
        if len(good) >= 2:
            med = statistics.median(good)
            out[q] = (max(good) - min(good)) / med if med > 0 else 0.0
    return out


def main(argv):
    d = load(argv[0])
    sp = spreads(d)
    if not sp:
        print("no samples_raw in", argv[0])
        return 1
    vals = sorted(sp.values())
    def pct(p):
        return vals[min(len(vals) - 1, int(p * len(vals)))]
    print(f"{len(vals)} queries with raw samples")
    print(f"relative spread (max-min)/median: "
          f"median={pct(0.5):.2f} p90={pct(0.9):.2f} max={vals[-1]:.2f}")
    worst = sorted(sp.items(), key=lambda kv: -kv[1])[:8]
    print("worst spreads:")
    for q, s in worst:
        print(f"  {q}: {s:.2f}  raw={d['samples_raw'][q]}")
    # which pass the per-query MAX landed on — a uniform distribution
    # means bursts hit passes at random (interleaving working); a pile-up
    # on pass 1 is first-touch cost (JIT/footer caches), not contention
    from collections import Counter
    c = Counter()
    n_insurance = 0
    for q, raw in d["samples_raw"].items():
        if len(raw) > 3:
            n_insurance += 1
        good = [(i, abs(x)) for i, x in enumerate(raw[:3]) if x > 0]
        if len(good) >= 2:
            c[max(good, key=lambda t: t[1])[0] + 1] += 1
    print("slowest-sample pass histogram (interleaved passes only):",
          dict(sorted(c.items())))
    if n_insurance:
        print(f"insurance samples (pass 4, slow queries only): "
              f"{n_insurance} queries")
    if len(argv) > 1:
        e = load(argv[1])
        qs, es = d.get("queries", {}), e.get("queries", {})
        common = [q for q in qs if q in es and es[q] > 0.2 and qs[q] > 0.2]
        ratios = sorted(qs[q] / es[q] for q in common)
        if ratios:
            mid = ratios[len(ratios) // 2]
            print(f"\nvs {argv[1]}: {len(common)} shared queries >0.2s, "
                  f"median ratio={mid:.2f} "
                  f"p10={ratios[int(0.1 * len(ratios))]:.2f} "
                  f"p90={ratios[int(0.9 * len(ratios))]:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
