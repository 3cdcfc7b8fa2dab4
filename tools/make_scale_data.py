"""Measurement-only scale-up replicator (VERDICT_r15 item 7).

Builds an sfX directory by replicating /root/testdata/sf0.1 K times
with disjoint key spaces so that the 8-vs-32-core scaling rows can be
measured above the sf0.1 overhead knee. NOT part of any query, bench,
or oracle path — the bench still reads $SPARK_GRAFT_SF_DIR untouched;
this exists purely so SCALING.md can show whether the big queries
parallelize once per-job fixed costs stop dominating.

Replication rules (replica k of K, base row counts as strides):

- every int64 entity key shifts by ``k * stride(table)`` so joins and
  groupings see K× distinct entities (orders/lineitem keep their
  orderkey relation, lineitem part/supp keys follow part/supplier);
- ``documents.text`` words get a ``~k`` suffix for k > 0 so
  content-similarity operators (shingles, MinHash bands) see K×
  distinct near-dup CLUSTERS instead of K exact copies of each doc —
  replicating text verbatim would grow LSH candidate pairs ~K²,
  which measures a different workload, not a bigger one;
- dimension tables (region, nation) copy once — at real scale dims
  stay small while facts grow, and several queries broadcast them.

Usage: python tools/make_scale_data.py <K> <outdir>
       python tools/make_scale_data.py 5 /root/scaledata/sf0.5
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: int64 key columns to shift per replica: table -> [(col, stride_of)]
SHIFTS = {
    "customer": [("c_custkey", "customer")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supplier")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
    "events": [("event_id", "events"), ("user_id", "events")],
}
DIMS = ("region", "nation")


def main() -> None:
    k_total = int(sys.argv[1])
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    tables = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in list(SHIFTS) + list(DIMS)
    }
    stride = {t: tables[t].num_rows for t in tables}
    for t in DIMS:
        pq.write_table(tables[t], f"{outdir}/{t}.parquet")
        print(f"{t}: {tables[t].num_rows} rows (dim, copied once)")
    for t, shifts in SHIFTS.items():
        base = tables[t]
        replicas = []
        for k in range(k_total):
            rep = base
            for col, stride_of in shifts:
                idx = rep.schema.get_field_index(col)
                shifted = pc.add(
                    rep.column(col), pa.scalar(k * stride[stride_of], pa.int64())
                )
                rep = rep.set_column(idx, col, shifted)
            if t == "documents" and k > 0:
                # suffix every word: split on single spaces, append ~k
                words = pc.split_pattern(rep.column("text"), " ")
                tagged = pc.binary_join_element_wise(
                    pc.list_flatten(words).cast(pa.string()),
                    pa.scalar(f"~{k}"),
                    "",
                )
                rebuilt = pa.ListArray.from_arrays(
                    pa.chunked_array(words.chunks).combine_chunks().offsets,
                    tagged.combine_chunks()
                    if isinstance(tagged, pa.ChunkedArray)
                    else tagged,
                )
                joined = pc.binary_join(rebuilt, " ")
                idx = rep.schema.get_field_index("text")
                rep = rep.set_column(idx, "text", joined)
                nidx = rep.schema.get_field_index("n_chars")
                rep = rep.set_column(
                    nidx, "n_chars", pc.utf8_length(joined).cast(pa.int64())
                )
            replicas.append(rep)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{outdir}/{t}.parquet")
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
