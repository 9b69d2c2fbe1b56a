#!/usr/bin/env python3
"""Generate an sf1-scale stress copy (~10x sf0.1) of the testdata.

The driver ships sf{0.001,0.01,0.1} only; every scale claim so far is
validated at sf0.1 (~600k lineitem rows), below the regime where
shuffle partitioning and AQE decisions actually change. This tool
synthesizes a 10x scale-up INTO THE REPO (sf1data/, git-ignored) for
BENCH use only — correctness stays pinned to the driver's data + DuckDB
oracles; nothing here feeds an oracle.

Scaling rules (replica i in 0..9):
  - lineitem / orders: key-shifted replicas (l_orderkey/o_orderkey +=
    i*K with one shared K), so the order join keys stay consistent
    across both tables and fact/fact joins scale honestly; dimension
    FKs (custkey/partkey/suppkey) stay as-is — 10x fact rows per
    dimension row, which is exactly how real facts grow.
  - every shift is CONGRUENCE-ALIGNED (a multiple of the lcm of every
    modulus the registry folds that key by — %500/%7/%3/%50000/%11/
    %2/%10 for orderkeys), so each replica is a residue-exact copy of
    the sf0.1 source: a modulo-folded replay key (q18's okey%500 fold,
    the %7 batch split, the %3 delete) sees the same survivor-cell
    structure at sf1 as at sf0.1 instead of saturating to an empty
    table — replay keys stay non-vacuous BY CONSTRUCTION (the r11/r12
    carried task; previously the dense shift packed ~300 orders into
    every (okey%500, part) cell, the %3 delete covered every cell, and
    q18/x07 proved 0 == 0). Side effect: the orderkey shift
    (11,550,000) is ~77x the dense range, so the sf1 keyspace has
    TPC-H-like gaps (~1.3% fill) instead of the unrealistic dense
    packing.
  - events: event_id and user_id shifted — 10x USERS with the original
    per-user history, so sessionization/window state grows with
    entities (the dimension that matters for state stores), while the
    time range stays fixed (10x rows per hour window).
  - documents: doc_id shifted; replicas i>0 get a distinct "r{i} "
    token prefix (n_chars adjusted), so the corpus does NOT become a
    degenerate 10-way exact-dup blowup — near-dup structure within
    each replica is preserved, cross-replica shingles mostly differ.
  - embeddings: vec_id shifted, vectors as-is (top-k over 10x
    candidates; duplicate vectors are harmless to cost shape).
  - dims (region/nation/customer/supplier/part): copied once.

Usage: python3 tools/gen_sf1.py [/root/testdata/sf0.1 [sf1data]]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10


def lcm(*ns):
    import math
    out = 1
    for n in ns:
        out = out * n // math.gcd(out, n)
    return out


# every modulus the registry folds each key family by (grep
# `% <n>` over src/main against the column) — a shift that is a
# multiple of the lcm preserves every residue, so modulo-folded
# replays keep sf0.1's cell structure at sf1
ORDERKEY_ALIGN = lcm(500, 7, 3, 50000, 11, 2, 10)   # 11,550,000
DOC_ALIGN = lcm(3, 5)
EVENT_ALIGN = 2
USER_ALIGN = 8
VEC_ALIGN = lcm(10, 97)


def aligned(step, align):
    """Round the replica shift UP to the alignment (never down — the
    shift must stay >= the source key range so replicas cannot
    collide)."""
    return ((step + align - 1) // align) * align


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "sf1data")
    os.makedirs(dst, exist_ok=True)

    def read(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def write(name, table):
        pq.write_table(table.replace_schema_metadata(None),
                       f"{dst}/{name}.parquet", compression="snappy")
        print(f"{name}: {table.num_rows} rows")

    # dims: single copy
    for dim in ["region", "nation", "customer", "supplier", "part"]:
        write(dim, read(dim))

    li, od = read("lineitem"), read("orders")
    K = aligned(pc.max(od["o_orderkey"]).as_py() + 1, ORDERKEY_ALIGN)

    def shifted(table, col, step, i):
        if i == 0:
            return table
        idx = table.schema.get_field_index(col)
        return table.set_column(
            idx, col, pc.add(table[col], pa.scalar(i * step,
                                                   table[col].type)))

    write("lineitem", pa.concat_tables(
        [shifted(li, "l_orderkey", K, i) for i in range(REPLICAS)]))
    write("orders", pa.concat_tables(
        [shifted(od, "o_orderkey", K, i) for i in range(REPLICAS)]))

    ev = read("events")
    E = aligned(pc.max(ev["event_id"]).as_py() + 1, EVENT_ALIGN)
    U = aligned(pc.max(ev["user_id"]).as_py() + 1, USER_ALIGN)
    write("events", pa.concat_tables(
        [shifted(shifted(ev, "event_id", E, i), "user_id", U, i)
         for i in range(REPLICAS)]))

    docs = read("documents")
    D = aligned(pc.max(docs["doc_id"]).as_py() + 1, DOC_ALIGN)
    reps = []
    for i in range(REPLICAS):
        t = shifted(docs, "doc_id", D, i)
        if i > 0:
            prefix = f"r{i} "
            ti = t.schema.get_field_index("text")
            t = t.set_column(ti, "text",
                             pc.binary_join_element_wise(
                                 pa.scalar(prefix), t["text"], ""))
            ni = t.schema.get_field_index("n_chars")
            t = t.set_column(ni, "n_chars",
                             pc.add(t["n_chars"],
                                    pa.scalar(len(prefix), pa.int64())))
        reps.append(t)
    write("documents", pa.concat_tables(reps))

    emb = read("embeddings")
    V = aligned(pc.max(emb["vec_id"]).as_py() + 1, VEC_ALIGN)
    write("embeddings", pa.concat_tables(
        [shifted(emb, "vec_id", V, i) for i in range(REPLICAS)]))
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
