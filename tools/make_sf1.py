"""Synthesize a native-shaped sf1 dataset from /root/testdata/sf0.1
(r4 verdict item 6: the driver provides no sf1, so build one).

10x row replication with PROPER key remapping — every foreign key is
offset consistently per replica, so joins behave exactly as a natively
generated sf1 would (orders x10 reference customers x10, lineitem x10
references orders/part/supplier x10).  region/nation stay fixed-size,
as in real TPC-H at any SF.

documents: replica r > 0 rewrites every 3rd token with a replica tag,
so cross-replica Jaccard is ~0 and the DUP RATE PER DOC matches the
original corpus instead of turning every doc into a 10-clique (the
round-4 /tmp/sf1_synth smoke deliberately did the opposite to stress
the worst case; this generator targets native-like density).

embeddings: ids offset, vectors reused — brute-force cosine cost is
unaffected by duplicate vectors.

Usage: python tools/make_sf1.py [out_dir]     # default .data/sf1
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

#: per-table key columns to offset by replica * (1 + max over source)
OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: which table each offset column's stride derives from (FK -> PK)
STRIDE_SOURCE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _perturb_docs(tab: pa.Table, r: int) -> pa.Table:
    """Replica-tag every 3rd token so replicas are NOT near-dups."""
    texts = tab.column("text").to_pylist()
    out = []
    for t in texts:
        words = t.split(" ")
        for i in range(0, len(words), 3):
            words[i] = f"{words[i]}r{r}"
        out.append(" ".join(words))
    i = tab.schema.get_field_index("text")
    return tab.set_column(i, tab.schema.field(i), pa.array(out, pa.string()))


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    strides = {}
    for col, (tab_name, pk) in STRIDE_SOURCE.items():
        t = pq.read_table(f"{SRC}/{tab_name}.parquet", columns=[pk])
        strides[col] = int(pc.max(t.column(pk)).as_py()) + 1

    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if name in ("region", "nation"):
            pq.write_table(src, f"{out_dir}/{name}.parquet")
            print(f"{name}: {src.num_rows} rows (fixed-size)")
            continue
        parts = []
        for r in range(REPLICAS):
            tab = src
            if name == "documents" and r > 0:
                tab = _perturb_docs(tab, r)
            for col in OFFSETS[name]:
                i = tab.schema.get_field_index(col)
                shifted = pc.add(
                    tab.column(col).cast(pa.int64()),
                    pa.scalar(r * strides[col], pa.int64()),
                )
                tab = tab.set_column(i, tab.schema.field(i), shifted)
            parts.append(tab)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{out_dir}/{name}.parquet")
        print(f"{name}: {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".data/sf1")
