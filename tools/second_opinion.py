#!/usr/bin/env python3
"""Second, DuckDB-independent opinion on a handful of registry keys.

The driver's correctness gate hash-compares the engine against DuckDB
SQL oracles (tools/check.py). That catches engine bugs but not a
CORRELATED misreading — both the Spark query and its SQL oracle
encoding the same wrong contract. This tool re-derives five
representative keys (scan-agg, dedup, streaming-batch parity, merge
replay, MinHash/LSH recall) in plain pandas / pure Python — no SQL
engine at all — and compares against the engine's Verify dumps.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/so_out \
      q03_agg_pricing,d01_exact_dedup,e01_windowed_counts,q18_upsert_replay,d23_lsh_recall"
  python3 tools/second_opinion.py /root/testdata/sf0.001 /tmp/so_out

Exit 0 with "N ok, 0 fail" on agreement.  Decimal arithmetic mirrors
the contract both existing sides implement (exact DECIMAL(12,2)
internal sums, one final cast to double) via Python's decimal module —
a third independent implementation of the same spec, not a port of
either.
"""
import hashlib
import re
import sys
from decimal import Decimal

import pandas as pd


def dec2(x):
    """CAST(x AS DECIMAL(12,2)): round-half-up to 2 places, exact."""
    return Decimal(repr(float(x))).quantize(Decimal("0.01"))


def dec4_2(x):
    """CAST(x AS DECIMAL(4,2)) for discount/tax fractions."""
    return Decimal(repr(float(x))).quantize(Decimal("0.01"))


def q03(sf):
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount", "l_tax"])
    rows = []
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        sq = sum((dec2(v) for v in g.l_quantity), Decimal(0))
        sp = sum((dec2(v) for v in g.l_extendedprice), Decimal(0))
        sd = sum((dec2(p) * (1 - dec4_2(d))
                  for p, d in zip(g.l_extendedprice, g.l_discount)),
                 Decimal(0))
        sc = sum((dec2(p) * (1 - dec4_2(d)) * (1 + dec4_2(t))
                  for p, d, t in zip(g.l_extendedprice, g.l_discount,
                                     g.l_tax)), Decimal(0))
        n = len(g)
        rows.append({"l_returnflag": rf, "l_linestatus": ls,
                     "sum_qty": float(sq), "sum_base_price": float(sp),
                     "sum_disc_price": float(sd), "sum_charge": float(sc),
                     "avg_qty": float(sq) / n,
                     "avg_price": float(sp) / n, "count_order": n})
    return pd.DataFrame(rows).sort_values(
        ["l_returnflag", "l_linestatus"]).reset_index(drop=True)


TOK = re.compile(r"[^a-z0-9]+")


def d01(sf):
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    fp = docs.text.map(lambda t: hashlib.md5(
        " ".join(w for w in TOK.sub(" ", t.lower()).strip().split(" ")
                 if w).encode()).hexdigest())
    df = pd.DataFrame({"doc_id": docs.doc_id, "fp": fp})
    rows = []
    for f, g in df.groupby("fp"):
        ids = sorted(int(i) for i in g.doc_id)
        rows.append({"fp": f, "n_docs": len(ids), "keeper": ids[0],
                     "doc_ids": ",".join(str(i) for i in ids[:100]),
                     "n_overflow": max(len(ids) - 100, 0)})
    return pd.DataFrame(rows).sort_values("fp").reset_index(drop=True)


def d23(sf):
    """MinHash/LSH recall vs exact Jaccard, re-derived from the spec:
    8 min-hashes = min over shingles of 8-hex-char slices of
    md5(sh)||md5('x'+sh), 2 bands of 4; exact side = distinct 3-token
    shingles, df cap 50, ALL co-shingled pairs (threshold 0), binned
    floor(j*10)/10. Pure dict/set Python — no SQL, no Spark."""
    import math
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    sh_of = {}
    for i, t in zip(docs.doc_id, docs.text):
        toks = [w for w in TOK.sub(" ", t.lower()).strip().split(" ") if w]
        if len(toks) >= 3:
            s = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
            if s:
                sh_of[int(i)] = s
    # --- LSH candidate pairs (d03's contract) ---
    buckets = {}
    for i, shs in sh_of.items():
        sig = None
        for s in shs:
            hx = hashlib.md5(s.encode()).hexdigest() + \
                hashlib.md5(b"x" + s.encode()).hexdigest()
            hs = [hx[8 * j:8 * j + 8] for j in range(8)]
            sig = hs if sig is None else [min(a, b)
                                          for a, b in zip(sig, hs)]
        for b in (0, 1):
            key = (b, hashlib.md5(
                "|".join(sig[4 * b:4 * b + 4]).encode()).hexdigest())
            buckets.setdefault(key, []).append(i)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                cand.add((ids[a], ids[b]))
    # --- exact Jaccard pairs at 0.5 with the df<=50 cap ---
    df_cnt = {}
    for shs in sh_of.values():
        for s in shs:
            df_cnt[s] = df_cnt.get(s, 0) + 1
    kept = {i: {s for s in shs if df_cnt[s] <= 50}
            for i, shs in sh_of.items()}
    inv = {}
    for i, shs in kept.items():
        for s in shs:
            inv.setdefault(s, []).append(i)
    inter = {}
    for ids in inv.values():
        ids = sorted(ids)
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                p = (ids[a], ids[b])
                inter[p] = inter.get(p, 0) + 1
    bins = {}
    for (a, b), n in inter.items():
        j = n / (len(kept[a]) + len(kept[b]) - n)
        sb = math.floor(j * 10) / 10
        np_, nh = bins.get(sb, (0, 0))
        bins[sb] = (np_ + 1, nh + (1 if (a, b) in cand else 0))
    rows = [{"sim_bin": sb, "n_pairs": np_, "n_hit": nh,
             "recall": nh / np_}
            for sb, (np_, nh) in sorted(bins.items())]
    return pd.DataFrame(rows)


def e01(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["ts", "event_type", "value"])
    ws = pd.to_datetime(ev.ts).dt.floor("h")
    rows = []
    for (w, et), g in ev.assign(window_start=ws).groupby(
            ["window_start", "event_type"]):
        tv = sum((dec2(v) for v in g.value), Decimal(0))
        rows.append({"window_start": w, "event_type": et,
                     "n_events": len(g), "total_value": float(tv)})
    return pd.DataFrame(rows).sort_values(
        ["window_start", "event_type"]).reset_index(drop=True)


def q18(sf):
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_orderstatus",
                                 "o_totalprice"])
    raw = pd.DataFrame({"okey": o.o_orderkey % 500,
                        "part": o.o_orderstatus,
                        "price": o.o_totalprice, "pre": o.o_orderkey})

    def batch(mask):
        b = raw[mask]
        # precombine: per (okey, part) identity keep max pre (pre =
        # o_orderkey is unique, so the winner is unambiguous)
        idx = b.groupby(["okey", "part"]).pre.idxmax()
        return b.loc[idx]

    b1 = batch(raw.pre % 7 == 0)
    b2 = batch(raw.pre % 7 == 1)
    # upsert replay: batch-2 rows win on identity, batch-1 remainder
    k2 = set(zip(b2.okey, b2.part))
    keep1 = b1[[not ((k, p) in k2)
                for k, p in zip(b1.okey, b1.part)]]
    t2 = pd.concat([b2, keep1])
    # versioned delete of identities with pre%7==0 and pre%3==0
    dkeys = set(zip(raw[(raw.pre % 7 == 0) & (raw.pre % 3 == 0)].okey,
                    raw[(raw.pre % 7 == 0) & (raw.pre % 3 == 0)].part))
    out = t2[[not ((k, p) in dkeys) for k, p in zip(t2.okey, t2.part)]]
    return out.sort_values(["part", "okey"]).reset_index(drop=True) \
        .astype({"okey": "int64", "pre": "int64"})


CHECKS = {"q03_agg_pricing": q03, "d01_exact_dedup": d01,
          "e01_windowed_counts": e01, "q18_upsert_replay": q18,
          "d23_lsh_recall": d23}


def compare(name, mine, engine):
    if list(mine.columns) != list(engine.columns):
        # column ORDER may differ; the driver compare sorts by name
        mine = mine[sorted(mine.columns)]
        engine = engine[sorted(engine.columns)]
        if list(mine.columns) != list(engine.columns):
            return f"schema mismatch: {list(mine.columns)} vs " \
                   f"{list(engine.columns)}"
    if len(mine) != len(engine):
        return f"row count {len(mine)} vs {len(engine)}"
    sort_cols = list(mine.columns)
    mine = mine.sort_values(sort_cols).reset_index(drop=True)
    engine = engine.sort_values(sort_cols).reset_index(drop=True)
    for c in mine.columns:
        a, b = mine[c], engine[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = (a.astype(float) - b.astype(float)).abs() > \
                (b.astype(float).abs() * 1e-12 + 1e-12)
        elif "datetime" in str(a.dtype) or "datetime" in str(b.dtype):
            bad = pd.to_datetime(a).values != pd.to_datetime(b).values
        else:
            bad = a.astype(str).values != b.astype(str).values
        if bad.any() if hasattr(bad, "any") else any(bad):
            i = int(pd.Series(bad).idxmax())
            return f"column {c} differs at row {i}: " \
                   f"{a.iloc[i]!r} vs {b.iloc[i]!r}"
    return None


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sf, out = sys.argv[1], sys.argv[2]
    ok = fail = 0
    for name, fn in CHECKS.items():
        try:
            # Verify writes each dump as a directory of parquet parts
            # (Spark layout) named after the key, without an extension
            engine = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"MISS {name}: no engine dump ({e}) — run graft.Verify "
                  f"first (see docstring)")
            fail += 1
            continue
        err = compare(name, fn(sf), engine)
        if err:
            print(f"FAIL {name}: {err}")
            fail += 1
        else:
            print(f"ok   {name}: {len(engine)} rows agree "
                  "(pandas/pure-python re-derivation)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
