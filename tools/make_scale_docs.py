#!/usr/bin/env python3
"""Build a K x documents-only scale corpus under /tmp.

The 1000x per-row-codec probes (mm_audio_*, mm_resize_exec,
pipeline_cascade — VERDICT r12 #5) read ONLY the documents table, so
amplifying the full fact schema (lineitem at 600M rows) would burn
~10 GB of disk and minutes of generation for tables the probes never
scan. Same key discipline as make_scale10.py: doc_id += i * 1_000_000
per replica (even offsets preserve the id-parity modality split; exact
dups model the dup-heavy crawl). Dimension-free: the probe queries are
single-table scans.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdocs1000x"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

os.makedirs(DST, exist_ok=True)
base = pq.read_table(f"{SRC}/documents.parquet")
idx = base.schema.get_field_index("doc_id")
writer = pq.ParquetWriter(f"{DST}/documents.parquet", base.schema)
for i in range(K):
    t = base if i == 0 else base.set_column(
        idx, base.schema.field(idx),
        pc.add(base.column("doc_id"),
               pa.scalar(1_000_000 * i, type=pa.int64()))
        .cast(base.schema.field(idx).type))
    writer.write_table(t)
writer.close()
print(f"documents: {base.num_rows} -> {base.num_rows * K}; done: {DST}")
