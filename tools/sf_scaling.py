#!/usr/bin/env python3
"""sf0.1 -> sf1 scaling report (r8 verdict task 1).

Compares bench_full_sf1.json (the 10x stress run over
tools/gen_sf1.py data) against the sf0.1 record per key and prints
time ratios next to the 10x data-growth ratio. A key whose wall-time
ratio EXCEEDS the data growth is a scale suspect (superlinear);
sub-10x ratios mean fixed per-query overhead (JVM, planning,
micro-batch lifecycle) still dominates at sf1 — the expected shape for
sub-second keys.

Usage: python3 tools/sf_scaling.py [SF1.json [SF01.json]]
"""
import json
import sys

GROWTH = 10.0


def main():
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full_sf1.json"
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "bench_full_latest.json"
    sf1 = json.load(open(sf1_path))["queries"]
    ref = json.load(open(ref_path))["queries"]
    rows = []
    for k in sorted(sf1):
        if sf1[k] < 0:
            rows.append((k, ref.get(k), sf1[k], None))
            continue
        r = ref.get(k)
        rows.append((k, r, sf1[k], (sf1[k] / r) if r and r > 0 else None))
    print(f"{'key':32s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>7s}  vs {GROWTH}x growth")
    suspects = []
    for k, r, s, ratio in rows:
        tag = ""
        if ratio is not None and ratio > GROWTH:
            # fixed-overhead keys can't be superlinear suspects: at
            # sub-second absolutes the 'ratio' is JVM noise over noise
            if s > 2.0:
                tag = "  <-- SUPERLINEAR"
                suspects.append((k, r, s, ratio))
            else:
                tag = "  (sub-2s absolute, noise)"
        print(f"{k:32s} {r if r is not None else float('nan'):7.2f} "
              f"{s:8.2f} {('%.1fx' % ratio) if ratio else '—':>7s}{tag}")
    t_ref = sum(r for _, r, s, _ in rows if r and s >= 0)
    t_sf1 = sum(s for _, r, s, _ in rows if r and s >= 0)
    print(f"\n{'TOTAL (shared)':32s} {t_ref:7.1f} {t_sf1:8.1f} "
          f"{t_sf1 / t_ref:6.1f}x")
    if suspects:
        print(f"\n{len(suspects)} superlinear suspect(s) "
              f"(>%.0fx time on %.0fx data, >2s absolute):" % (GROWTH, GROWTH))
        for k, r, s, ratio in sorted(suspects, key=lambda x: -x[3]):
            print(f"  {k}: {r:.2f}s -> {s:.2f}s ({ratio:.1f}x)")
        sys.exit(1)
    print("\nno superlinear suspects: every key scales at or below "
          "data growth")


if __name__ == "__main__":
    main()
