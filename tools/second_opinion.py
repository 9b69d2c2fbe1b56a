#!/usr/bin/env python3
"""Second, DuckDB-independent opinion on a handful of registry keys.

The driver's correctness gate hash-compares the engine against DuckDB
SQL oracles (tools/check.py). That catches engine bugs but not a
CORRELATED misreading — both the Spark query and its SQL oracle
encoding the same wrong contract. This tool re-derives twenty
representative keys covering every family (scan-agg, exact dedup,
windowed streaming, stateful-session streaming, merge replay, CDC
replication AND the change-feed image-pair algebra itself, MinHash/LSH recall, brute-kNN similarity, bigram-LM text
scoring, DSIR quantized-log resampling, multimodal frame dedup,
chained crawl-ingest dedup, duplicated-span detection, MOR
snapshot-read merge) in plain
pandas / pure Python — no SQL
engine at all — and compares against the engine's Verify dumps.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/so_out \
      q03_agg_pricing,d01_exact_dedup,e01_windowed_counts,e02_sessions,\
q18_upsert_replay,x07_cdc_replica,x06_stream_cdc,d23_lsh_recall,s01_knn_brute,\
t13_lm_score,d24_dsir_sample,m05_frame_dedup,p08_ingest_dedup"
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
from decimal import Decimal, ROUND_HALF_UP

import pandas as pd


def dec2(x):
    """CAST(x AS DECIMAL(12,2)): round-half-up to 2 places, exact.
    Spark and DuckDB decimal casts round HALF_UP; quantize's context
    default is HALF_EVEN, which would disagree on exact .xx5 ties."""
    return Decimal(repr(float(x))).quantize(Decimal("0.01"),
                                            rounding=ROUND_HALF_UP)


def dec4_2(x):
    """CAST(x AS DECIMAL(4,2)) for discount/tax fractions."""
    return Decimal(repr(float(x))).quantize(Decimal("0.01"),
                                            rounding=ROUND_HALF_UP)


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


def x06(sf):
    """The change-feed algebra itself (x06/q29's row-level CDC classes:
    insert / update pre+post image pairs / delete with pre-change
    payload) re-derived in plain pandas — the one family the 18-key
    set did not cover (x07 checks the REPLICA's end state; this checks
    the stream of changes that produced it)."""
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_orderstatus",
                                 "o_totalprice"])
    raw = pd.DataFrame({"okey": o.o_orderkey % 500,
                        "part": o.o_orderstatus,
                        "price": o.o_totalprice, "pre": o.o_orderkey})

    def batch(mask):
        b = raw[mask]
        idx = b.groupby(["okey", "part"]).pre.idxmax()
        return b.loc[idx]

    b1 = batch(raw.pre % 7 == 0)
    b2 = batch(raw.pre % 7 == 1)
    k1 = {(k, p): (pr, v) for k, p, pr, v
          in zip(b1.okey, b1.part, b1.price, b1.pre)}
    k2 = set(zip(b2.okey, b2.part))
    rows = []
    # commit 1: batch-1 winners land as pure inserts
    for k, p, pr, v in zip(b1.okey, b1.part, b1.price, b1.pre):
        rows.append((k, p, pr, v, "insert", 1))
    # commit 2: batch-2 winners split insert vs update image PAIR
    for k, p, pr, v in zip(b2.okey, b2.part, b2.price, b2.pre):
        if (k, p) in k1:
            old_pr, old_v = k1[(k, p)]
            rows.append((k, p, old_pr, old_v, "update_preimage", 2))
            rows.append((k, p, pr, v, "update_postimage", 2))
        else:
            rows.append((k, p, pr, v, "insert", 2))
    # commit 3: the delete's victims carry their pre-change payload
    # from the two-batch merge state (batch-2 winner, else batch-1)
    t2 = pd.concat([b2, b1[[not ((k, p) in k2)
                            for k, p in zip(b1.okey, b1.part)]]])
    dk = raw[(raw.pre % 7 == 0) & (raw.pre % 3 == 0)]
    dkeys = set(zip(dk.okey, dk.part))
    for k, p, pr, v in zip(t2.okey, t2.part, t2.price, t2.pre):
        if (k, p) in dkeys:
            rows.append((k, p, pr, v, "delete", 3))
    return pd.DataFrame(
        rows, columns=["okey", "part", "price", "pre",
                       "_change_type", "_change_commit"]) \
        .astype({"okey": "int64", "pre": "int64",
                 "_change_commit": "int64"}) \
        .sort_values(["_change_commit", "_change_type", "part", "okey"]) \
        .reset_index(drop=True)


def e02(sf):
    """30-minute-gap sessionization (transformWithState's RocksDB path
    on the engine side): per (user, session) the epoch-ms bounds, event
    count, and the SEQUENTIAL (ts, value)-ordered float sum of value —
    the specified-order fold that makes the float total portable."""
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ev = ev[ev.user_id >= 0]
    # normalize to ns first: datetime64[us] would int-cast to MICROS
    t = pd.to_datetime(ev.ts).astype("datetime64[ns]") \
        .astype("int64") // 1_000_000  # epoch ms
    df = pd.DataFrame({"user_id": ev.user_id, "t": t,
                       "value": ev.value}).sort_values(
        ["user_id", "t", "value"], kind="mergesort")
    rows = []
    for uid, g in df.groupby("user_id"):
        brk = (g.t - g.t.shift(1)).fillna(0) > 1_800_000
        for _, s in g.groupby(brk.cumsum()):
            total = 0.0
            for v in s.value:  # sequential left fold in (ts, value) order
                total += float(v)
            rows.append({"user_id": int(uid), "start_ts": int(s.t.min()),
                         "end_ts": int(s.t.max()), "n_events": len(s),
                         "total_value": total})
    return pd.DataFrame(rows).sort_values(
        ["user_id", "start_ts"]).reset_index(drop=True)


def s01(sf):
    """Brute-force cosine top-10 (the ANN family's exactness anchor).
    Pure-Python sequential left-fold dot products — the same operation
    order as the engine's codegen'd DotProduct loop, so the doubles
    are bit-identical, not merely close."""
    import math
    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = {int(i): [float(x) for x in v]
            for i, v in zip(emb.vec_id, emb.embedding)}

    def fold_dot(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        return d

    norms = {i: math.sqrt(fold_dot(v, v)) for i, v in vecs.items()}
    rows = []
    for qid in sorted(i for i in vecs if i < 5):
        # clamp exactly as the engine and DuckDB do: exact-duplicate
        # vectors overshoot 1.0 by an ulp under product-of-sqrts
        scored = [(min(1.0, max(-1.0,
                                fold_dot(vecs[qid], vecs[cid]) /
                                (norms[qid] * norms[cid]))), cid)
                  for cid in vecs if cid >= 5 and cid != qid]
        scored.sort(key=lambda sc: (-sc[0], sc[1]))
        for rank, (sim, cid) in enumerate(scored[:10], start=1):
            rows.append({"query_id": qid, "rank": rank,
                         "corpus_id": cid, "cos_sim": sim})
    return pd.DataFrame(rows)


def t13(sf):
    """Laplace-smoothed bigram LM score: p(bigram) = (c2+1)/(c1+V)
    over exact corpus counts, per-doc mean of p folded in token-
    position order. Docs with <2 tokens keep a row (0 bigrams, null
    score)."""
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    toks_of = {}
    for i, t in zip(docs.doc_id, docs.text):
        toks_of[int(i)] = [w for w in
                           TOK.sub(" ", t.lower()).strip().split(" ") if w]
    c2 = {}
    for toks in toks_of.values():
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1 = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n
    v = len({w for toks in toks_of.values() for w in toks})
    rows = []
    for i in sorted(toks_of):
        toks = toks_of[i]
        n_big = max(len(toks) - 1, 0)
        if n_big == 0:
            rows.append({"doc_id": i, "n_bigrams": 0,
                         "lm_score": float("nan")})
            continue
        sp = 0.0
        for a, b in zip(toks, toks[1:]):  # position order, left fold
            sp += float(c2[(a, b)] + 1) / float(c1[a] + v)
        rows.append({"doc_id": i, "n_bigrams": n_big,
                     "lm_score": sp / n_big})
    return pd.DataFrame(rows)


def d24(sf):
    """DSIR importance resampling, re-derived imperatively: hashed
    unigram+bigram md5 buckets, add-one likelihood ratios on the
    floor(ln*2^20) integer grid, top 20% kept with doc-id tie-break.
    The quantized-log grid is the key's subtlest contract — exactly
    what a correlated Spark+DuckDB misreading would both get wrong."""
    import math
    from collections import Counter
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    B = 256

    def qlog(c):
        return math.floor(math.log(c) * 1048576.0)

    cq, cp, per_doc = Counter(), Counter(), {}
    for did, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        ts = [w for w in TOK.sub(" ", text.lower()).strip().split(" ") if w]
        grams = ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
        c = Counter(int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
                    for g in grams)
        per_doc[int(did)] = c
        cq.update(c)
        if lang == "en":
            cp.update(c)
    norm = qlog(sum(cq.values()) + B) - qlog(sum(cp.values()) + B)
    v = {b: qlog(cp.get(b, 0) + 1) - qlog(cq[b] + 1) for b in cq}
    rows = []
    for did in sorted(per_doc):
        c = per_doc[did]
        n = sum(c.values())
        rows.append({"doc_id": did, "n_grams": n,
                     "qlogw": sum(cnt * v[b] for b, cnt in c.items())
                     + n * norm})
    k = math.floor(len(rows) * 0.2)
    sel = set(r["doc_id"] for r in
              sorted(rows, key=lambda r: (-r["qlogw"], r["doc_id"]))[:k])
    for r in rows:
        r["selected"] = r["doc_id"] in sel
    return pd.DataFrame(rows)


def m05(sf):
    """Cross-media frame dedup re-derived byte-by-byte: payload =
    UTF-8 text, frames = 32-byte slices at stride 2 (offsets 0, 64,
    128, ... with a ragged tail), sha256 fingerprints, groups with >1
    distinct media."""
    import math
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    groups = {}
    for mid, text in zip(docs.doc_id, docs.text):
        payload = text.encode("utf-8")
        n_frames = max(math.floor((len(payload) - 1) / 64), 0) + 1
        for i in range(n_frames):
            fp = hashlib.sha256(payload[i * 64:i * 64 + 32]).hexdigest()
            groups.setdefault(fp, []).append(int(mid))
    rows = []
    for fp, ids in groups.items():
        if len(set(ids)) > 1:
            rows.append({"fp": fp, "n_media": len(set(ids)),
                         "n_occurrences": len(ids), "keeper_media": min(ids)})
    return pd.DataFrame(rows).sort_values("fp").reset_index(drop=True)


def p08(sf):
    """Chained crawl-ingest dedup re-derived: d23's banding (8
    min-hashes, 2 bands of 4) per doc, batch = doc_id % 4, a doc's
    verdict = min/count of band-colliding docs from STRICTLY EARLIER
    batches only (same-batch collisions never count)."""
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    buckets = {}
    banded = []
    for i, t in zip(docs.doc_id, docs.text):
        toks = [w for w in TOK.sub(" ", t.lower()).strip().split(" ") if w]
        if len(toks) < 3:
            continue
        shs = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        sig = None
        for s in shs:
            hx = hashlib.md5(s.encode()).hexdigest() + \
                hashlib.md5(b"x" + s.encode()).hexdigest()
            hs = [hx[8 * j:8 * j + 8] for j in range(8)]
            sig = hs if sig is None else [min(a, b)
                                          for a, b in zip(sig, hs)]
        banded.append(int(i))
        for b in (0, 1):
            key = (b, hashlib.md5(
                "|".join(sig[4 * b:4 * b + 4]).encode()).hexdigest())
            buckets.setdefault(key, set()).add(int(i))
    collide = {}
    for ids in buckets.values():
        for x in ids:
            collide.setdefault(x, set()).update(ids)
    rows = []
    for i in sorted(banded):
        earlier = {c for c in collide.get(i, set())
                   if c % 4 < i % 4}
        rows.append({"doc_id": i, "ingest_batch": i % 4,
                     "dup_of": min(earlier) if earlier else None,
                     "n_matches": len(earlier),
                     "is_dup": bool(earlier)})
    return pd.DataFrame(rows)


def d25(sf):
    """Duplicated-span detection re-derived in pure Python: count every
    8-gram's corpus-wide occurrences, flag positions with count >= 2,
    merge overlapping [pos, pos+7] spans per doc with a running max."""
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    toks_of = {}
    counts = {}
    for i, t in zip(docs.doc_id, docs.text):
        toks = [w for w in TOK.sub(" ", t.lower()).strip().split(" ") if w]
        toks_of[int(i)] = toks
        for j in range(max(len(toks) - 7, 0)):
            g = " ".join(toks[j:j + 8])
            counts[g] = counts.get(g, 0) + 1
    rows = []
    for i in sorted(toks_of):
        toks = toks_of[i]
        n_grams = max(len(toks) - 7, 0)
        dup_pos = [j + 1 for j in range(n_grams)
                   if counts[" ".join(toks[j:j + 8])] >= 2]
        covered, prev_end = 0, None
        for p in dup_pos:
            if prev_end is None:
                covered += 8
            else:
                covered += max(0, min(8, p + 7 - prev_end))
            prev_end = max(prev_end or 0, p + 7)
        rows.append({"doc_id": i, "n_tokens": len(toks),
                     "n_grams": n_grams, "dup_grams": len(dup_pos),
                     "dup_tokens": covered})
    return pd.DataFrame(rows)


def _fold_dot(a, b):
    d = 0.0
    for x, y in zip(a, b):
        d += x * y
    return d


def _normalize(v):
    import math
    n = math.sqrt(_fold_dot(v, v))
    return [x / n for x in v]


def _plane(j, dims):
    """Similarity.plane: md5("j,i") first 4 bytes big-endian unsigned,
    scaled to [-0.5, 0.5) — the hyperplane constants both engines
    ship as literals."""
    out = []
    for i in range(dims):
        d = hashlib.md5(f"{j},{i}".encode()).digest()
        u = (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]
        out.append(u / 4294967296.0 - 0.5)
    return out


def s08(sf):
    """LSH recall vs brute force, re-derived imperatively: md5-constant
    hyperplanes, sign-bit buckets over 8 tables x 4 bits, candidate
    union, normalize-then-fold cosine ranking (lshTopK's exact double
    path — NOT s01's product-of-norms shape), then per-query
    |LSH top-10 ∩ brute top-10| / 10. The float-sensitive artifact is
    the rank-10 boundary of both chains."""
    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = {int(i): [float(x) for x in v]
            for i, v in zip(emb.vec_id, emb.embedding)}
    dims = len(next(iter(vecs.values())))
    queries = sorted(i for i in vecs if i < 5)
    corpus = sorted(i for i in vecs if i >= 5)
    import math
    norms = {i: math.sqrt(_fold_dot(v, v)) for i, v in vecs.items()}
    # brute top-10 ids (s01's chain: product-of-norms cosine, clamped)
    brute = {}
    for qid in queries:
        scored = [(min(1.0, max(-1.0, _fold_dot(vecs[qid], vecs[cid]) /
                                (norms[qid] * norms[cid]))), cid)
                  for cid in corpus if cid != qid]
        scored.sort(key=lambda sc: (-sc[0], sc[1]))
        brute[qid] = set(cid for _, cid in scored[:10])
    # LSH top-10 ids: 8 tables x 4 bits
    bits, tables = 4, 8
    planes = {(t, j): _plane(t * bits + j, dims)
              for t in range(tables) for j in range(bits)}

    def buckets(v):
        out = []
        for t in range(tables):
            b = 0
            for j in range(bits):
                if _fold_dot(v, planes[(t, j)]) >= 0:
                    b += 1 << j
            out.append(b)
        return out

    cb = {cid: buckets(vecs[cid]) for cid in corpus}
    nv = {i: _normalize(v) for i, v in vecs.items()}
    rows = []
    for qid in queries:
        qb = buckets(vecs[qid])
        cands = set(cid for cid in corpus if cid != qid and
                    any(cb[cid][t] == qb[t] for t in range(tables)))
        scored = sorted(((_fold_dot(nv[qid], nv[cid]), cid)
                         for cid in cands), key=lambda sc: (-sc[0], sc[1]))
        approx = set(cid for _, cid in scored[:10])
        n_hit = len(brute[qid] & approx)
        rows.append({"query_id": qid, "n_brute": 10, "n_hit": n_hit,
                     "recall": n_hit / 10.0})
    return pd.DataFrame(rows)


def _assign_cid(nvv, cs_norm):
    """Nearest centroid by sequential-fold dot; tie -> lowest cid
    (cs_norm is cid-ordered, first seen wins)."""
    best, bs = None, None
    for cid, ncv in cs_norm:
        s = _fold_dot(nvv, ncv)
        if bs is None or s > bs:
            best, bs = cid, s
    return best


def _lloyd(train, k, iters, train_n=256):
    """The deterministic md5-sampled Lloyd both engines implement, over
    a {vec_id: vector} dict: md5-ordered sample of train_n, first-k
    seed, assign by normalized dot (ties -> lowest cid), per-dim means
    as sequential double folds in vec_id order. Empty clusters vanish
    (both engines' GROUP BY drops them). Returns [(cid, cv)]."""
    train_ids = sorted(train, key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))[:train_n]
    nvecs = {i: _normalize(train[i]) for i in train_ids}
    cents = [(c, train[i]) for c, i in enumerate(sorted(train_ids)[:k])]
    for _ in range(iters):
        cs_norm = [(cid, _normalize(cv)) for cid, cv in cents]
        members = {cid: [] for cid, _ in cents}
        for i in sorted(train_ids):
            members[_assign_cid(nvecs[i], cs_norm)].append(i)
        new = []
        for cid, _ in cents:
            ms = members[cid]
            if not ms:
                continue
            dims = len(train[ms[0]])
            acc = [0.0] * dims
            for i in ms:        # vec_id order, sequential double fold
                v = train[i]
                for d in range(dims):
                    acc[d] += v[d]
            new.append((cid, [x / len(ms) for x in acc]))
        cents = new
    return cents


def _drift_rows(cents, cells, nvecs):
    """The drift emission shared by s15/s20: per-cell exact-DECIMAL
    per-dim means of the normalized holdings, displacement vs the
    centroid on the floor(*1e6) integer grid; empty cells -> NULL."""
    import math
    from decimal import Decimal, ROUND_HALF_UP
    q20 = Decimal(1).scaleb(-20)
    rows = []
    for cid, cv in cents:
        ms = cells[cid]
        if not ms:
            rows.append({"cid": cid, "n_vecs": 0, "drift_e6": None})
            continue
        dims = len(cv)
        mv = []
        for d in range(dims):
            s = sum((Decimal(repr(nvecs[i][d]))
                     .quantize(q20, rounding=ROUND_HALF_UP)
                     for i in ms), Decimal(0))
            mv.append(float(s) / len(ms))
        drift = 1.0 - _fold_dot(_normalize(cv), _normalize(mv))
        rows.append({"cid": cid, "n_vecs": len(ms),
                     "drift_e6": math.floor(max(drift, 0.0) * 1000000.0)})
    return pd.DataFrame(rows)


def s15(sf):
    """IVF drift statistic, re-derived imperatively: the s13 scenario
    (Lloyd on the md5-sampled base, full corpus assigned frozen), exact
    DECIMAL per-dim means, sequential normalize/dot, emitted as
    floor(max(drift,0)*1e6) — the integer grid the r10 red key moved
    to. The grid is the contract under test: it must absorb the
    toString-dialect and fold-association noise that flipped the old
    8-decimal emission."""
    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = {int(i): [float(x) for x in v]
            for i, v in zip(emb.vec_id, emb.embedding)
            if int(i) >= 5}
    base = {i: v for i, v in vecs.items() if i % 10 != 9}
    nvecs = {i: _normalize(v) for i, v in vecs.items()}
    cents = _lloyd(base, 10, 3)
    # full corpus assigned frozen (build(base) + append(%10==9))
    cs_norm = [(cid, _normalize(cv)) for cid, cv in cents]
    cells = {cid: [] for cid, _ in cents}
    for i in sorted(vecs):
        cells[_assign_cid(nvecs[i], cs_norm)].append(i)
    return _drift_rows(cents, cells, nvecs)


def s20(sf):
    """IVF-PQ drift: the s18 drifted COMPOUND index re-derived
    imperatively — coarse Lloyd on the base, one codebook Lloyd per
    16-dim subspace slice of the base, full corpus assigned AND coded
    frozen, per-cell exact-DECIMAL means of the NORMALIZED
    RECONSTRUCTIONS (sub-order codeword concat), floor(drift*1e6).
    A third implementation of the whole PQ coding contract — subspace
    slicing, per-subspace codeword assignment, reconstruction order —
    the one place (r11 verdict) engine and DuckDB oracle could still
    agree on a wrong codebook contract."""
    emb = pd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    vecs = {int(i): [float(x) for x in v]
            for i, v in zip(emb.vec_id, emb.embedding)
            if int(i) >= 5}
    base = {i: v for i, v in vecs.items() if i % 10 != 9}
    nvecs = {i: _normalize(v) for i, v in vecs.items()}
    subspaces, sub_len = 4, 16
    cents = _lloyd(base, 10, 3)
    books = [_lloyd({i: v[m * sub_len:(m + 1) * sub_len]
                     for i, v in base.items()}, 16, 2)
             for m in range(subspaces)]
    # full corpus assigned frozen against the base-trained coarse level
    cs_norm = [(cid, _normalize(cv)) for cid, cv in cents]
    cells = {cid: [] for cid, _ in cents}
    for i in sorted(vecs):
        cells[_assign_cid(nvecs[i], cs_norm)].append(i)
    # ...and coded frozen against the base-trained codebooks; the
    # reconstruction is the sub-order concat of assigned codewords
    rec = {i: [] for i in vecs}
    for m in range(subspaces):
        book = books[m]
        bn = [(cid, _normalize(cv)) for cid, cv in book]
        bv = dict(book)
        for i, v in vecs.items():
            sv = v[m * sub_len:(m + 1) * sub_len]
            rec[i].extend(bv[_assign_cid(_normalize(sv), bn)])
    nrec = {i: _normalize(rv) for i, rv in rec.items()}
    return _drift_rows(cents, cells, nrec)


def q12b(sf):
    """HLL error-contract emission: exact distinct re-derived with
    pandas nunique (a third distinct-count implementation); the
    within-5% verdict is pinned to 1 — an engine whose HLL drifted
    out of bound would emit 0 and disagree here."""
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderstatus", "o_custkey"])
    rows = [(st, int(g.o_custkey.nunique()), 1)
            for st, g in o.groupby("o_orderstatus")]
    return pd.DataFrame(
        rows, columns=["o_orderstatus", "exact_custs", "hll_within_5pct"]
    ).sort_values("o_orderstatus").reset_index(drop=True)


def q17b(sf):
    """GK rank-error-contract emission: group sizes re-derived in
    pandas; every per-quantile verdict pinned to 1 (the engine
    computes the duplicate-rank interval check itself — a sketch
    outside its rank bound would emit 0 and disagree here)."""
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_returnflag"])
    rows = [(rf, int(len(g)), 1, 1, 1)
            for rf, g in li.groupby("l_returnflag")]
    return pd.DataFrame(
        rows, columns=["l_returnflag", "n", "p50_ok", "p90_ok", "p99_ok"]
    ).sort_values("l_returnflag").reset_index(drop=True)


def x05(sf):
    """x05_stream_mor: ordered-payload streaming ingestion into a MOR
    table; the SNAPSHOT view (base + live delta log, no compaction)
    must equal the corpus-wide per-(okey, part) precombine argmax
    however the file source grouped micro-batches — re-derived here as
    a plain groupby idxmax over the filtered orders projection (pre is
    the unique o_orderkey, so the argmax is tie-free). A MOR snapshot
    that leaked a shadowed delta row, dropped a base row under the
    touched-partition union, or mis-merged the ordered payload would
    disagree with this relation."""
    o = pd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_orderstatus",
                                 "o_totalprice"])
    o = o[o.o_orderkey % 7 <= 2]
    raw = pd.DataFrame({
        "okey": o.o_orderkey % 500,
        "part": o.o_orderstatus,
        "price": o.o_totalprice,
        "pre": o.o_orderkey})
    win = raw.loc[raw.groupby(["okey", "part"]).pre.idxmax()]
    return win[["okey", "part", "price", "pre"]].sort_values(
        ["part", "okey"]).reset_index(drop=True)


CHECKS = {"q03_agg_pricing": q03, "d01_exact_dedup": d01,
          # the sketch error-contract emissions (q12b exact side is a
          # genuine third distinct-count implementation)
          "q12b_approx_distinct": q12b, "q17b_approx_percentiles": q17b,
          "d24_dsir_sample": d24,
          "m05_frame_dedup": m05, "p08_ingest_dedup": p08,
          "e01_windowed_counts": e01, "q18_upsert_replay": q18,
          "d23_lsh_recall": d23,
          # x07 replicates the q18 replay through the CDC incremental
          # stream — its required end state is the SAME relation, so
          # the re-derivation is shared and the check is that the
          # replica landed on it
          "x07_cdc_replica": q18,
          # the change-feed algebra itself (r12 verdict task 7): the
          # full image-pair stream x07's replica consumed
          "x06_stream_cdc": x06,
          # the two float-sensitive similarity artifacts (the r10
          # verdict's stretch ask): the recall fraction's rank-10
          # boundary and the drift statistic's integer grid
          "s08_ann_recall": s08, "s15_ivf_drift": s15,
          # the compound-index PQ coding contract (r11 verdict item 7)
          "s20_ivf_pq_drift": s20,
          "e02_sessions": e02, "s01_knn_brute": s01,
          "t13_lm_score": t13,
          # the span-dedup family's all-integer detection contract
          "d25_dup_spans": d25,
          # the MOR snapshot surface (r13 verdict task 7): base + live
          # deltas merged read, ordered payload, streaming ingestion
          "x05_stream_mor": x05}


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
