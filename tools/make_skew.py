#!/usr/bin/env python3
"""Build a HOT-KEY skewed variant of sf0.1 under /tmp for the skew
stress bench (VERDICT r10 #4) — the Zipf reality of a crawl corpus
(one boilerplate page / one bot user carrying half the mass), applied
as deterministic surgery on the harness tables:

  documents: every EVEN doc_id's text is replaced by ONE fixed
             boilerplate page (~50% of the corpus becomes identical
             content -> one hot md5 content key, one hot shingle set,
             and its tokens dominate the urlcount key space);
  events:    every EVEN event_id is reassigned to user_id 1 (~50% of
             the stream on one user -> the hottest possible key for
             per-user rollups, sessionization windows, and the
             salted/AQE mitigation paths).

Everything else copies verbatim. The bench criterion is wall-time:
on local[32], a plan whose skewed key collapses into a single-task
stage shows up as a family-total blowup vs the uniform sf0.1 run;
rep-collapse (dedup), map-side partial aggregation (urlcount) and
AQE skew handling (joins) should keep the ratios near 1.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_skew"

# one boilerplate page: ~120 tokens, dominated by a handful of hot
# tokens — the "same cookie banner on half the crawl" shape
BOILER = ("cookie notice this site uses cookies to improve your experience "
          "accept all cookies or manage preferences privacy policy terms of "
          "service all rights reserved ") * 6

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

os.makedirs(DST, exist_ok=True)
for t in TABLES:
    table = pq.read_table(f"{SRC}/{t}.parquet")
    if t == "documents":
        hot = pc.equal(pc.bit_wise_and(table.column("doc_id"),
                                       pa.scalar(1, type=pa.int64())),
                       pa.scalar(0, type=pa.int64()))
        idx = table.schema.get_field_index("text")
        text = pc.if_else(hot, pa.scalar(BOILER.strip()), table.column("text"))
        table = table.set_column(idx, table.schema.field(idx), text)
        nidx = table.schema.get_field_index("n_chars")
        nch = pc.cast(pc.utf8_length(table.column("text")),
                      table.schema.field(nidx).type)
        table = table.set_column(nidx, table.schema.field(nidx), nch)
        print(f"documents: {pc.sum(pc.cast(hot, pa.int64())).as_py()} of "
              f"{table.num_rows} rows -> one boilerplate page")
    elif t == "events":
        hot = pc.equal(pc.bit_wise_and(table.column("event_id"),
                                       pa.scalar(1, type=pa.int64())),
                       pa.scalar(0, type=pa.int64()))
        idx = table.schema.get_field_index("user_id")
        uid = pc.if_else(hot, pa.scalar(1, type=pa.int64()),
                         table.column("user_id"))
        table = table.set_column(idx, table.schema.field(idx),
                                 pc.cast(uid, table.schema.field(idx).type))
        print(f"events: {pc.sum(pc.cast(hot, pa.int64())).as_py()} of "
              f"{table.num_rows} rows -> user_id 1")
    pq.write_table(table, f"{DST}/{t}.parquet")
print("done:", DST)
