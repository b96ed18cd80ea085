#!/usr/bin/env python3
"""Build a 10x scale copy of sf0.1 under /tmp for the scale bench.

Dimensions (region, nation, customer, supplier, part) stay 1x — the
realistic growth shape (facts grow, dims are stable) and it keeps the
z-order audit's 16-bit custkey-offset guard and PageRank's 1M supplier
offset valid. Fact tables are replicated 10x with key offsets:

  orders.o_orderkey    +i * 1_000_000   (lineitem.l_orderkey matches)
  events.event_id      +i * 10_000_000  (user_id/ts unchanged: denser stream)
  documents.doc_id     +i * 1_000_000   (even offsets preserve id-parity
                                         modality split; 10x exact dups =
                                         the dup-heavy crawl stress case)
  embeddings.vec_id    2*(id + i*100_000)+1 for i>0 (odd ids never hit
                                         vec_id % 50 == 0: the strided
                                         query/centroid set stays FIXED
                                         while the corpus grows 10x)

pyarrow copies column types verbatim (events.ts stays TIMESTAMP(NANOS)).
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_OFFSETS = {
    "orders": {"o_orderkey": 1_000_000},
    "lineitem": {"l_orderkey": 1_000_000},
    "events": {"event_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 100_000},
}


def shifted(table: pa.Table, offsets: dict, i: int, odd_ids: bool) -> pa.Table:
    if i == 0:
        return table
    for name, step in offsets.items():
        idx = table.schema.get_field_index(name)
        if odd_ids:
            # replica id = 2*(orig + step*i) + 1: always ODD, hence never
            # a multiple of 50 — a constant offset can't guarantee that
            # (any constant maps exactly one residue class onto the
            # stride; the old "+1" bump leaked ids ≡ 49 (mod 50) into
            # the query/centroid set, growing it 10x at 10x scale)
            col = pc.add(pc.multiply(pc.add(table.column(name),
                pa.scalar(step * i, type=pa.int64())),
                pa.scalar(2, type=pa.int64())), pa.scalar(1, type=pa.int64()))
        else:
            col = pc.add(table.column(name), pa.scalar(step * i, type=pa.int64()))
        table = table.set_column(idx, table.schema.field(idx), col.cast(table.schema.field(idx).type))
    return table


import os
os.makedirs(DST, exist_ok=True)
for t in DIMS:
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
    print(f"{t}: copied 1x")
for t, offsets in FACT_OFFSETS.items():
    base = pq.read_table(f"{SRC}/{t}.parquet")
    parts = [shifted(base, offsets, i, odd_ids=(t == "embeddings")) for i in range(K)]
    out = pa.concat_tables(parts)
    # realistic row-group layout: pyarrow's default packs ALL rows into
    # one row group, and a single-row-group file can only ever be
    # decoded by ONE Spark task no matter how it is byte-split — the
    # 10x/100x probes then serialize every per-row-heavy pass on one
    # core and report layout cost as plan cost (measured: the only
    # above-linear ratios in the 10x suite traced to this). A real
    # crawl is many files / many row groups; ~8k-row groups give the
    # probes the same splittable shape.
    pq.write_table(out, f"{DST}/{t}.parquet", row_group_size=8192)
    print(f"{t}: {base.num_rows} -> {out.num_rows}")
print("done:", DST)
