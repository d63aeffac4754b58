#!/usr/bin/env python3
"""Deterministic 10x scale-up of the FACT tables (orders + lineitem)
for the table-format family's sf1.0 proof sweep: copy k>0 shifts both
o_orderkey and l_orderkey by k*(max_orderkey+1), so join consistency
holds and every key-range/bloom/zorder closed form recomputes on the
scaled domain. Order dates and custkeys are kept (same year partitions
and customers, 10x the orders per each); all other tables are
byte-copied from the source dir.

Usage: gen_sf1_facts.py <src_sf_dir> <out_dir> [copies=10]
"""
import sys, shutil, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, out = sys.argv[1], sys.argv[2]
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

o = pq.read_table(f"{src}/orders.parquet")
li = pq.read_table(f"{src}/lineitem.parquet")
shift = pc.max(o.column("o_orderkey")).as_py() + 1

parts = []
for k in range(copies):
    t = o.set_column(o.schema.get_field_index("o_orderkey"), "o_orderkey",
                     pc.add(o.column("o_orderkey"), k * shift))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{out}/orders.parquet")
print(f"orders: {o.num_rows} -> {o.num_rows * copies} (shift {shift})")

parts = []
for k in range(copies):
    t = li.set_column(li.schema.get_field_index("l_orderkey"), "l_orderkey",
                      pc.add(li.column("l_orderkey"), k * shift))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{out}/lineitem.parquet")
print(f"lineitem: {li.num_rows} -> {li.num_rows * copies}")

for name in ["region", "nation", "customer", "supplier", "part",
             "events", "documents", "embeddings"]:
    shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
    print(f"copied {name}.parquet")
