#!/usr/bin/env python3
"""Deterministic scale-factor replicator (VERDICT r8 #1).

Usage: make_sf_replica.py SRC_DIR DST_DIR FACTOR

Builds a FACTOR-times replica of a driver-generated sf dir by
key-shifted replication: replica i shifts every key column by
i * stride, where stride = the smallest power of 10 above the source
key's max — so replica key ranges never collide, referential integrity
(lineitem→orders→customer, events users, doc/vec ids) is preserved
within every replica, and the output is a pure function of the source
(floors stay meaningful across regenerations).

Fixed-cardinality dims (region, nation) are copied verbatim — TPC-H
does not scale them. Scaled tables are written as CHUNKS (4) parquet
files per replica inside a `<table>.parquet/` directory: Spark treats
the directory as the table and gets FACTOR×CHUNKS parallel scan
splits — the layout a cluster would actually read (Spark only splits
parquet files larger than maxPartitionBytes, so a 10-file sf1 replica
would cap every scan at 10 tasks on 32 cores). Schemas are preserved
bit-for-bit (pyarrow rewrites with the source schema, so events.ts
stays TIMESTAMP(NANOS))."""
import os, shutil, sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> columns sharing each key domain (stride computed per domain
# from the domain-owning table so foreign keys shift consistently)
DOMAINS = {
    "custkey": ("customer", "c_custkey", [("customer", "c_custkey"), ("orders", "o_custkey")]),
    "orderkey": ("orders", "o_orderkey", [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]),
    "partkey": ("part", "p_partkey", [("part", "p_partkey"), ("lineitem", "l_partkey")]),
    "suppkey": ("supplier", "s_suppkey", [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")]),
    "event_id": ("events", "event_id", [("events", "event_id")]),
    "user_id": ("events", "user_id", [("events", "user_id")]),
    "doc_id": ("documents", "doc_id", [("documents", "doc_id")]),
    "vec_id": ("embeddings", "vec_id", [("embeddings", "vec_id")]),
}
COPY_VERBATIM = ["region", "nation"]
SCALED = ["customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def stride_above(n: int) -> int:
    s = 1
    while s <= n:
        s *= 10
    return s


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for t in COPY_VERBATIM:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied (fixed dim)")

    strides = {}  # (table, column) -> stride
    for dom, (own_t, own_c, cols) in DOMAINS.items():
        mx = pq.read_table(f"{src}/{own_t}.parquet", columns=[own_c])
        stride = stride_above(pc.max(mx[own_c]).as_py())
        for tc in cols:
            strides[tc] = stride
        print(f"domain {dom}: stride {stride}")

    for t in SCALED:
        table = pq.read_table(f"{src}/{t}.parquet")
        out_dir = f"{dst}/{t}.parquet"
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)
        shifted_cols = [(i, c, strides[(t, c)])
                        for i, c in enumerate(table.column_names)
                        if (t, c) in strides]
        chunks = 4
        for r in range(factor):
            rep = table
            for i, c, stride in shifted_cols:
                shifted = pc.add(rep[c], pa.scalar(r * stride, type=rep[c].type))
                rep = rep.set_column(i, rep.schema.field(i), shifted)
            step = (rep.num_rows + chunks - 1) // chunks
            for k in range(chunks):
                part = rep.slice(k * step, step)
                if part.num_rows:
                    pq.write_table(part, f"{out_dir}/r{r:02d}_c{k}.parquet")
        print(f"{t}: {factor} replicas x {chunks} chunks x {table.num_rows} rows")


if __name__ == "__main__":
    main()
