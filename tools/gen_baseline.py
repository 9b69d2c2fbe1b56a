#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query bench table from the recorded
artifacts (r6 task: the table is GENERATED; prose stays for
adjudications only).

Sources, in provenance order:
  - driver artifacts BENCH_r0N.json — the durable cross-round
    comparison base; their stdout tails truncate to ~2000 chars, so
    older keys fall off the head (parsed as far as they survive)
  - builder full records bench_full_*.json — complete per-key figures,
    same box, labeled by their provenance header when present

The table lands between the BEGIN/END GENERATED markers in
BASELINE.md; everything outside the markers is left untouched.
Run: python3 tools/gen_baseline.py  (from /root/repo)
"""
import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED BENCH TABLE (tools/gen_baseline.py) -->"
END = "<!-- END GENERATED BENCH TABLE -->"

KEY_RE = re.compile(r'"([a-z]\d+[a-z]?_\w*)":(-?[0-9]+(?:\.[0-9]+)?)')


def driver_tail(path):
    """Per-key seconds parsed from a driver artifact's truncated tail."""
    tail = json.load(open(path)).get("tail", "")
    return {k: float(v) for k, v in KEY_RE.findall(tail) if float(v) >= 0}


def full_record(path):
    d = json.load(open(path))
    # bench_full_latest.json is the BUILDER figure of record; a
    # driver-regime (one cold pass / warmup=false) record under that
    # name would silently poison every cross-round comparison. Refuse
    # loudly instead of ingesting it — graft.Bench routes driver runs
    # to bench_full_driver_latest.json, so hitting this means the
    # builder record was clobbered and must be restored first.
    if os.path.basename(path) == "bench_full_latest.json" and (
            d.get("producer") != "builder" or d.get("warmup") is False):
        raise SystemExit(
            f"REFUSING {path}: producer={d.get('producer')!r} "
            f"warmup={d.get('warmup')!r} — bench_full_latest.json must "
            "be a builder warmup record; restore the builder record "
            "(git checkout) or rerun via tools/run_bench_sharded.sh "
            "before regenerating")
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    return qs, d.get("producer"), d.get("sha"), d.get("sf", "")


def main():
    cols = []  # (label, {key: sec})
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r0*.json"))):
        n = re.search(r"BENCH_r0*(\d+)", p).group(1)
        qs = driver_tail(p)
        if qs:
            cols.append((f"r{n}d", qs))
    # builder records, oldest→newest by mtime (alphabetical would sort
    # bench_full_latest.json BEFORE bench_full_r8*.json and drop it)
    for p in sorted(glob.glob(os.path.join(ROOT, "bench_full_*.json")),
                    key=os.path.getmtime):
        qs, producer, sha, sf = full_record(p)
        if not qs:
            continue
        # the table is sf0.1 figures only: sf1 stress records (their
        # own section's evidence) must never mingle scales here.
        # Headerless legacy records predate sf1data and are sf0.1.
        if sf and not sf.rstrip("/").endswith("sf0.1"):
            continue
        # driver-regime durable records (bench_full_driver_*.json) are
        # incomparable to builder columns and already surface via the
        # BENCH_rN driver artifacts above
        if producer == "driver":
            continue
        stem = os.path.basename(p).replace("bench_full_", "") \
            .replace(".json", "")
        tag = {"driver": "d", "builder": "b"}.get(producer, "b")
        label = f"{stem}{tag}" if not stem.endswith(tag) else stem
        cols.append((label, qs))
    # keep the table readable: driver columns r5+ (r1-r4 cover only the
    # early registry and fell off the truncated tails anyway) + the last
    # two builder records
    drivers = [c for c in cols if re.match(r"^r\d+d$", c[0])
               and int(c[0][1:-1]) >= 5]
    # spot-records (single-key / sf1-subset A/B evidence) are cited in
    # the prose adjudications; only near-full builder records make
    # readable table columns
    builders = [c for c in cols if not re.match(r"^r\d+d$", c[0])
                and len(c[1]) >= 20][-2:]
    keep = drivers + builders
    keys = sorted({k for _, qs in keep for k in qs})
    lines = [BEGIN, "",
             "Per-query seconds at sf0.1 (min-of-two after warmup; -1 = "
             "failed run, blank = not in that record's surviving tail). "
             "`rNd` = driver artifact `BENCH_r0N.json` (truncated tail, "
             "head keys missing by design); other columns = builder "
             "full records `bench_full_*.json`. Driver-to-driver is the "
             "regression base; builder columns are complete but carry "
             "box-load variance (see adjudications above). Regenerate "
             "with `python3 tools/gen_baseline.py`.", "",
             "| key | " + " | ".join(l for l, _ in keep) + " |",
             "|---|" + "---|" * len(keep)]
    for k in keys:
        cells = []
        for _, qs in keep:
            cells.append(f"{qs[k]:.2f}" if k in qs else "")
        lines.append(f"| {k} | " + " | ".join(cells) + " |")
    # per-column totals over the keys each column actually has
    tot = ["| **total (recorded keys)** |"]
    for _, qs in keep:
        tot.append(f" **{sum(qs.values()):.1f} ({len(qs)})** |")
    lines.append("".join(tot))
    lines += ["", END]
    table = "\n".join(lines)

    md_path = os.path.join(ROOT, "BASELINE.md")
    md = open(md_path).read()
    if BEGIN in md and END in md:
        pre = md.split(BEGIN)[0]
        post = md.split(END)[1]
        md = pre + table + post
    else:
        md = md.rstrip() + "\n\n## Per-query record (generated)\n\n" \
            + table + "\n"
    open(md_path, "w").write(md)
    print(f"wrote table: {len(keys)} keys x {len(keep)} columns -> "
          f"{md_path}")


if __name__ == "__main__":
    main()
