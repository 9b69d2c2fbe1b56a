#!/usr/bin/env python3
"""Merge family-sharded graft.Bench records into one bench_full JSON
with the same schema a single-JVM run writes: queries = union of the
shards' per-key figures, value = their sum, provenance header from the
shards (sha/producer must agree across shards; started_at = earliest;
load_start/load_end become per-shard min/max so a hot shard is
visible). Refuses to merge shards from different shas or producers —
that would stitch two different codebases into one record.

Usage: tools/merge_bench_shards.py OUT.json SHARD.json...
"""
import json
import sys


def main():
    argv = sys.argv[1:]
    allow_mixed_sha = "--allow-mixed-sha" in argv
    argv = [a for a in argv if a != "--allow-mixed-sha"]
    if len(argv) < 2:
        sys.exit(__doc__)
    out, shard_paths = argv[0], argv[1:]
    shards = []
    for p in shard_paths:
        with open(p) as f:
            shards.append((p, json.load(f)))
    shas = {d.get("sha") for _, d in shards}
    producers = {d.get("producer") for _, d in shards}
    sfs = {d.get("sf") for _, d in shards}
    # a record missing the field predates the warmup split and ran warm
    warmups = {d.get("warmup", True) for _, d in shards}
    if len(producers) > 1 or len(sfs) > 1 or len(warmups) > 1:
        sys.exit(f"refusing to merge mixed shards: "
                 f"producers={producers} sfs={sfs} warmups={warmups}")
    if len(shas) > 1 and not allow_mixed_sha:
        # a doc-only commit landing mid-run is legitimate; anything
        # touching the engine is not — the caller must check the diff
        # between the shas before overriding
        sys.exit(f"refusing to merge mixed shards: shas={shas} "
                 "(pass --allow-mixed-sha ONLY if the diff between "
                 "them touches no engine code)")
    queries = {}
    for p, d in shards:
        dup = set(queries) & set(d["queries"])
        if dup:
            sys.exit(f"key(s) {sorted(dup)} appear in more than one "
                     f"shard (last: {p})")
        queries.update(d["queries"])
    loads = [d.get("load_start") for _, d in shards] + \
        [d.get("load_end") for _, d in shards]
    loads = [x for x in loads if isinstance(x, (int, float)) and x >= 0]
    merged = {
        "metric": "total", "unit": "sec",
        "sha": shards[0][1].get("sha"),
        "producer": shards[0][1].get("producer"),
        "started_at": min(d.get("started_at", "") for _, d in shards),
        "load_start": min(loads) if loads else -1.0,
        "load_end": max(loads) if loads else -1.0,
        "cpus": shards[0][1].get("cpus", -1),
        "sf": shards[0][1].get("sf"),
        "passes": shards[0][1].get("passes"),
        "warmup": shards[0][1].get("warmup", True),
        "sharded": len(shards),
        "queries": queries,
        "value": sum(v for v in queries.values() if v >= 0),
    }
    with open(out, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    failed = sorted(k for k, v in queries.items() if v < 0)
    print(f"{len(queries)} keys over {len(shards)} shards, "
          f"total {merged['value']:.1f}s"
          + (f"; FAILED: {', '.join(failed)}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
