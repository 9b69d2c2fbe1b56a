#!/usr/bin/env python3
"""Per-query bench regression check.

Usage: tools/bench_compare.py NEW.json [OLD.json] [--ratio 1.5]

Compares two bench_full_*.json records (the durable per-query artifact
graft.Bench writes) key by key, prints keys slower than --ratio times
the old figure, new keys, and dropped keys.  Exit 1 if any regression
crosses the bar (absolute floor 0.5 s — sub-second keys jitter with
the JVM, not the plan).
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)["queries"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ratio = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--ratio"):
            ratio = float(a.split("=", 1)[1])
    new = load(args[0])
    old = load(args[1] if len(args) > 1 else "bench_full_r8c.json")
    added = sorted(set(new) - set(old))
    dropped = sorted(set(old) - set(new))
    bad = []
    for k in sorted(set(new) & set(old)):
        o, n = old[k], new[k]
        if o > 0 and n > 0 and n > o * ratio and n - o > 0.5:
            bad.append((k, o, n, n / o))
    tot_old = sum(v for k, v in old.items() if k in new and v > 0)
    tot_new = sum(v for k, v in new.items() if k in old and v > 0)
    print(f"shared-key total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x) over {len(set(new) & set(old))} keys")
    if added:
        print(f"new keys ({len(added)}): "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in added))
    if dropped:
        print(f"DROPPED keys ({len(dropped)}): {', '.join(dropped)}")
    if bad:
        print(f"\nregressions (> {ratio}x and > 0.5s absolute):")
        for k, o, n, r in sorted(bad, key=lambda x: -x[3]):
            print(f"  {k:30s} {o:6.2f}s -> {n:6.2f}s  ({r:.2f}x)")
        sys.exit(1)
    print("no per-key regressions over the bar")


if __name__ == "__main__":
    main()
