#!/usr/bin/env python3
"""Deterministic 10x scale-up of the doc/embedding tables for the
sf1.0 proof sweep (SURVEY §6): documents and embeddings are expanded
by 10 id-shifted copies; copy k>0 is perturbed so that WITHIN-copy
similarity structure matches the original while CROSS-copy duplicates
of the same row fall below the near-dup thresholds (every 3rd word is
replaced by a copy-specific token -> jaccard ~0.5 across copies;
embeddings get a +-0.05-range deterministic component offset). All
other tables are byte-copied from the source sf dir, so TPC-H-driven
queries stay at the source scale (documented in SURVEY §6).

Usage: gen_sf1.py <src_sf_dir> <out_dir> [copies=10]
"""
import sys, shutil, os
import pyarrow as pa
import pyarrow.parquet as pq

src, out = sys.argv[1], sys.argv[2]
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

# --- documents ---
t = pq.read_table(f"{src}/documents.parquet")
n = t.num_rows
cols = {c: t.column(c).to_pylist() for c in t.column_names}
docs = {c: [] for c in t.column_names}
for k in range(copies):
    for i in range(n):
        text = cols["text"][i]
        if k > 0:
            w = text.split(" ")
            for j in range(0, len(w), 3):
                w[j] = f"ck{k}w{j}"
            text = " ".join(w)
        docs["doc_id"].append(cols["doc_id"][i] + k * n)
        docs["text"].append(text)
        docs["lang"].append(cols["lang"][i])
        docs["source"].append(cols["source"][i])
        docs["n_chars"].append(len(text))
pq.write_table(pa.table(docs, schema=t.schema), f"{out}/documents.parquet")
print(f"documents: {n} -> {n * copies}")

# --- embeddings ---
t = pq.read_table(f"{src}/embeddings.parquet")
m = t.num_rows
vec_ids = t.column("vec_id").to_pylist()
embs = t.column("embedding").to_pylist()
labels = t.column("label").to_pylist()
eo = {"vec_id": [], "embedding": [], "label": []}
for k in range(copies):
    for i in range(m):
        e = embs[i]
        if k > 0:
            e = [x + ((k * 31 + j * 7) % 11 - 5) * 0.01 for j, x in enumerate(e)]
        eo["vec_id"].append(vec_ids[i] + k * m)
        eo["embedding"].append(e)
        eo["label"].append(labels[i])
pq.write_table(pa.table(eo, schema=t.schema), f"{out}/embeddings.parquet")
print(f"embeddings: {m} -> {m * copies}")

# --- everything else: byte copy ---
for f in sorted(os.listdir(src)):
    if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
        shutil.copyfile(f"{src}/{f}", f"{out}/{f}")
        print(f"copied {f}")
