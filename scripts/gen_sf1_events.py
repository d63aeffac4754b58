#!/usr/bin/env python3
"""Deterministic 10x scale-up of the EVENTS table for the streaming
twins' sf1.0 proof sweep: copy k>0 shifts event_id and user_id by
k*(max+1), so every per-user structure (sessions, sliding windows,
dedup keys, as-of sequences) is preserved within each copy while the
stream cardinality, key space, and sketch inputs scale 10x. Timestamps
are kept, so watermark/window boundaries land identically in both
engines on the scaled domain. All other tables are byte-copied.

Usage: gen_sf1_events.py <src_sf_dir> <out_dir> [copies=10]
"""
import sys, shutil, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

src, out = sys.argv[1], sys.argv[2]
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

ev = pq.read_table(f"{src}/events.parquet")
eshift = pc.max(ev.column("event_id")).as_py() + 1
ushift = pc.max(ev.column("user_id")).as_py() + 1

parts = []
for k in range(copies):
    t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                      pc.add(ev.column("event_id"), k * eshift))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(ev.column("user_id"), k * ushift))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
print(f"events: {ev.num_rows} -> {ev.num_rows * copies} "
      f"(eshift {eshift}, ushift {ushift})")

for name in ["region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "documents", "embeddings"]:
    shutil.copyfile(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
    print(f"copied {name}.parquet")
