#!/usr/bin/env python3
"""Deterministic scale-up of the test fixture: synthesize sf<F*base> from
an existing sf directory by unioning F key-shifted copies of every
SF-scaled table (dims region/nation stay fixed, like TPC-H).

Referential integrity is preserved exactly: each key domain gets its own
shift stride (a round power of ten above the max key), and every foreign
key column shifts by the same stride as its parent — copy i of lineitem
joins copy i of orders/part/supplier, so join cardinalities scale
linearly and query semantics are unchanged.

Copy 0 is the identity, so the scaled directory is a superset of the
source. No randomness anywhere: runs are byte-reproducible.

Embedding vectors are circularly rotated per copy (norm-preserving, so
norms/self-cosines are unchanged while cross-copy vectors differ);
document text is left identical across copies ON PURPOSE — a corpus
where every doc has ~F exact duplicates is precisely the workload the
dedup operators exist for, and it makes their expected output at the
scaled SF analytically checkable (keep-min-id keeps copy 0).

Usage: scaleup.py SRC_DIR DST_DIR FACTOR
(pyarrow is harness-side tooling — the library itself never sees this
script; it only reads the parquet it produces.)
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def stride(maxval: int) -> int:
    s = 10
    while s <= maxval:
        s *= 10
    return s


def shift(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    arr = tbl.column(i)
    typ = tbl.schema.field(i).type
    shifted = pa.chunked_array(
        [pa.compute.add(c, pa.scalar(delta, type=typ)) for c in arr.chunks],
        type=typ)
    return tbl.set_column(i, tbl.schema.field(i), shifted)


def rotate_embeddings(tbl: pa.Table, rot: int) -> pa.Table:
    i = tbl.schema.get_field_index("embedding")
    field = tbl.schema.field(i)
    out_chunks = []
    for chunk in tbl.column(i).chunks:
        flat = chunk.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // len(chunk)
        mat = flat.reshape(len(chunk), dim)
        rolled = np.roll(mat, rot % dim, axis=1)
        out_chunks.append(pa.FixedSizeListArray.from_arrays(
            pa.array(rolled.ravel(), type=field.type.value_type),
            dim).cast(field.type) if pa.types.is_fixed_size_list(field.type)
            else pa.ListArray.from_arrays(
                pa.array(range(0, (len(chunk) + 1) * dim, dim), type=pa.int32()),
                pa.array(rolled.ravel(), type=field.type.value_type)))
    return tbl.set_column(i, field, pa.chunked_array(out_chunks, type=field.type))


def main(src: str, dst: str, factor: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)

    def read(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def write(name, tbl, schema):
        pq.write_table(tbl.cast(schema), f"{dst}/{name}.parquet")

    # fixed dims: copied verbatim
    for name in ("region", "nation"):
        t = read(name)
        write(name, t, t.schema)

    # key strides from the SOURCE key domains
    orders = read("orders")
    k_order = stride(pa.compute.max(orders.column("o_orderkey")).as_py())
    k_cust = stride(pa.compute.max(read("customer").column("c_custkey")).as_py())
    k_part = stride(pa.compute.max(read("part").column("p_partkey")).as_py())
    k_supp = stride(pa.compute.max(read("supplier").column("s_suppkey")).as_py())
    ev = read("events")
    k_event = stride(pa.compute.max(ev.column("event_id")).as_py())
    k_user = stride(pa.compute.max(ev.column("user_id")).as_py())
    k_doc = stride(pa.compute.max(read("documents").column("doc_id")).as_py())
    k_vec = stride(pa.compute.max(read("embeddings").column("vec_id")).as_py())

    plans = {
        "customer": {"c_custkey": k_cust},
        "supplier": {"s_suppkey": k_supp},
        "part": {"p_partkey": k_part},
        "orders": {"o_orderkey": k_order, "o_custkey": k_cust},
        "lineitem": {"l_orderkey": k_order, "l_partkey": k_part,
                     "l_suppkey": k_supp},
        "events": {"event_id": k_event, "user_id": k_user},
        "documents": {"doc_id": k_doc},
        "embeddings": {"vec_id": k_vec},
    }
    for name, keys in plans.items():
        base = read(name)
        copies = []
        for i in range(factor):
            t = base
            for col, k in keys.items():
                if i:
                    t = shift(t, col, i * k)
            if name == "embeddings" and i:
                t = rotate_embeddings(t, 7 * i)
            copies.append(t)
        write(name, pa.concat_tables(copies), base.schema)
        print(f"{name}: {base.num_rows} -> {base.num_rows * factor}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
