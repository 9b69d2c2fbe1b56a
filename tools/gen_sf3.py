#!/usr/bin/env python3
"""Generate an sf3-scale documents corpus (3x sf1 = 30x sf0.1) for the
span-family scale probe (r12 verdict task 3: one step beyond sf1 for
the steepest cost shape in the repo — the gram explode is O(corpus
tokens), and sf1 measured d25 at 7.2x / d26 at 8.4x on 10x data; this
probe checks the next 3x stays linear).

Two corpora are generated, each feeding one probe family:
  - documents.parquet — the span family (d25/d26/p10/p11/x42), whose
    gram explode is O(corpus tokens);
  - orders.parquet — the versioned-replay/IVM/CDC family (x07/x08/
    x13/x48, e21/e22; r13 verdict task 2), whose cost rides commit
    metadata + changed-row scans — the shape a long-lived 100 TB
    deployment stresses.

Same replica discipline as gen_sf1: key shifts congruence-aligned
(the lcm of every modulus the registry folds that key by — so every
modulo-folded replay cell keeps its sf0.1 survivor structure instead
of saturating), per-replica token prefixes ("s{i} ") on documents so
the corpus doesn't degenerate into an exact-dup blowup.

Usage: python3 tools/gen_sf3.py [sf1data [sf3data]]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 3
DOC_ALIGN = 15  # lcm(3, 5) — the doc_id moduli the registry folds by
# lcm(500, 7, 3, 50000, 11, 2, 10) — every orderkey modulus the
# registry folds by (gen_sf1.ORDERKEY_ALIGN; keep in sync)
ORDERKEY_ALIGN = 11550000


def gen_orders(src_dir, dst):
    od = pq.read_table(os.path.join(src_dir, "orders.parquet"))
    step = pc.max(od["o_orderkey"]).as_py() + 1
    step = ((step + ORDERKEY_ALIGN - 1) // ORDERKEY_ALIGN) * ORDERKEY_ALIGN
    reps = []
    for i in range(REPLICAS):
        t = od
        if i > 0:
            ki = t.schema.get_field_index("o_orderkey")
            t = t.set_column(ki, "o_orderkey",
                             pc.add(t["o_orderkey"],
                                    pa.scalar(i * step,
                                              t["o_orderkey"].type)))
        reps.append(t)
    out = pa.concat_tables(reps)
    pq.write_table(out.replace_schema_metadata(None),
                   f"{dst}/orders.parquet", compression="snappy")
    print(f"orders: {out.num_rows} rows -> {dst}")


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(root, "sf1data")
    # back-compat: a documents.parquet path selects its parent dir
    if src_dir.endswith(".parquet"):
        src_dir = os.path.dirname(src_dir)
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "sf3data")
    os.makedirs(dst, exist_ok=True)
    gen_orders(src_dir, dst)
    docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    step = pc.max(docs["doc_id"]).as_py() + 1
    step = ((step + DOC_ALIGN - 1) // DOC_ALIGN) * DOC_ALIGN
    reps = []
    for i in range(REPLICAS):
        t = docs
        if i > 0:
            di = t.schema.get_field_index("doc_id")
            t = t.set_column(di, "doc_id",
                             pc.add(t["doc_id"],
                                    pa.scalar(i * step, t["doc_id"].type)))
            prefix = f"s{i} "
            ti = t.schema.get_field_index("text")
            t = t.set_column(ti, "text",
                             pc.binary_join_element_wise(
                                 pa.scalar(prefix), t["text"], ""))
            ni = t.schema.get_field_index("n_chars")
            t = t.set_column(ni, "n_chars",
                             pc.add(t["n_chars"],
                                    pa.scalar(len(prefix), pa.int64())))
        reps.append(t)
    out = pa.concat_tables(reps)
    pq.write_table(out.replace_schema_metadata(None),
                   f"{dst}/documents.parquet", compression="snappy")
    print(f"documents: {out.num_rows} rows -> {dst}")


if __name__ == "__main__":
    main()
