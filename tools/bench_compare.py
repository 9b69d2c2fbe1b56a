#!/usr/bin/env python3
"""Per-query bench regression check.

Usage: tools/bench_compare.py NEW.json [OLD.json] [--ratio 1.5 | --ratio=1.5]
                              [--allow-cross-producer]

Compares two bench_full_*.json records (the durable per-query artifact
graft.Bench writes) key by key, prints keys slower than --ratio times
the old figure, new keys, and dropped keys.  Exit 1 if any regression
crosses the bar (absolute floor 0.5 s — sub-second keys jitter with
the JVM, not the plan).

Records carry a provenance header {sha, producer, started_at}; mixing
driver-run and builder-run figures disagreed by up to 2x in rounds 1-2
(box load), so cross-producer comparisons are refused unless
--allow-cross-producer is passed.  Headerless legacy records compare
with a warning.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    qs = d["queries"]
    # -1 is graft.Bench's did-not-finish sentinel: a DNF key has NO
    # figure — it must surface as missing evidence, never be read as a
    # (negative) record or silently vanish from the comparison
    dnf = sorted(k for k, v in qs.items()
                 if not isinstance(v, (int, float)) or v < 0)
    qs = {k: v for k, v in qs.items()
          if isinstance(v, (int, float)) and v >= 0}
    if dnf:
        print(f"warning: {p} has {len(dnf)} DNF key(s) (sentinel -1): "
              + ", ".join(dnf), file=sys.stderr)
    return qs, d.get("producer"), d.get("sha"), d


def warn_if_loaded(path, d):
    """Annotate a record produced on a busy host: loadavg above half the
    benching core count at either end means the figures measured the
    box, not the code (the round-9 drift lesson)."""
    cpus = d.get("cpus") or 32
    for side in ("load_start", "load_end"):
        la = d.get(side)
        if la is not None and la >= 0 and la > cpus / 2:
            print(f"warning: {path} {side}={la} on {cpus} cpus — this "
                  "record ran on a loaded host; treat regressions as "
                  "suspect", file=sys.stderr)


def main():
    argv = sys.argv[1:]
    args = []
    ratio = 1.5
    allow_cross = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--allow-cross-producer":
            allow_cross = True
        elif a.startswith("--ratio="):
            ratio = float(a.split("=", 1)[1])
        elif a == "--ratio":
            if i + 1 >= len(argv):
                sys.exit("--ratio needs a value (e.g. --ratio 1.5)")
            i += 1
            ratio = float(argv[i])
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a}")
        else:
            args.append(a)
        i += 1
    if not args:
        sys.exit(__doc__)
    new, new_prod, new_sha, new_hdr = load(args[0])
    old_path = args[1] if len(args) > 1 else "bench_full_r8c.json"
    old, old_prod, old_sha, old_hdr = load(old_path)
    warn_if_loaded(args[0], new_hdr)
    warn_if_loaded(old_path, old_hdr)
    if new_prod is None or old_prod is None:
        print("warning: comparing a legacy record without a provenance "
              "header — producer unknown", file=sys.stderr)
    elif new_prod != old_prod and not allow_cross:
        sys.exit(f"refusing cross-producer comparison ({new_prod} "
                 f"sha={new_sha} vs {old_prod} sha={old_sha}): figures "
                 "from different producers disagree by up to 2x (box "
                 "load). Pass --allow-cross-producer to override.")
    # same-producer records can still mix warmup REGIMES: driver runs
    # stopped warming up in r11 (warmup:false) while older driver
    # records ran warm — a measured ~10% systematic skew (676s cold vs
    # 613s warm over the full registry), enough to fake or mask a
    # regression. A record without the field predates the split and
    # ran warm.
    new_warm = new_hdr.get("warmup", True)
    old_warm = old_hdr.get("warmup", True)
    if new_warm != old_warm and not allow_cross:
        sys.exit(f"refusing cross-warmup-regime comparison "
                 f"(warmup={new_warm} sha={new_sha} vs warmup={old_warm} "
                 f"sha={old_sha}): cold and warm runs skew ~10% "
                 "systematically. Pass --allow-cross-producer to "
                 "override.")
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
