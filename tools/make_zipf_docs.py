#!/usr/bin/env python3
"""Build a Zipfian-vocabulary retrieval corpus under /tmp (VERDICT r15 #1).

The driver's synthetic documents table has a 31-WORD vocabulary: every
term appears in ~77% of docs, so query-by-document BM25 candidate mass
is anchors x corpus x ~17 shared terms and NO term-selectivity pruning
can bind — retrieval bench numbers on it price the corpus, not the
plan. This tool regenerates ONLY the `text` column with a bounded-Zipf
vocabulary (V terms, exponent s — the natural-language shape where
champion-list / lowest-df pruning is the production discipline), and
keeps everything else harness-identical:

  - schema + doc_id/lang/source scaffold come from sf0.1 documents
    (n_chars recomputed from the new text);
  - per-doc TOKEN COUNT is the scaffold row's count x M (default 8):
    the harness's 10-100-token snippets average ~40 distinct terms, so
    a 32-term champion budget keeps nearly the whole query and cannot
    bind on ANY vocabulary; production crawl documents run hundreds of
    tokens, and at M=8 (~430 tokens, ~280 distinct) the budget keeps
    only the selective tail (measured: kept-32 avg df ~20 vs ~950
    unpruned at M=1 — the relative length distribution is preserved);
  - replication follows make_scale10.py exactly: documents doc_id
    += 1e6 per replica (replica ids stay on the %50 anchor stride but
    the anchor set is the nAnchors smallest — fixed while the corpus
    grows), embeddings replicate with the odd-id map so the strided
    query/centroid set stays fixed;
  - each replica draws FRESH text (seeded per replica) — dfs grow with
    the corpus as in a real crawl, not as 100 exact copies;
  - all other sf0.1 tables are copied 1x so the dir is a complete
    harness sfDir (compare.py views, Bench state sizing).

Usage: make_zipf_docs.py DST [K] [V] [S] [M] [D]
  K replication factor (default 1), V vocabulary size (default 100000),
  S Zipf exponent (default 1.05), M doc-length multiplier (default 8),
  D planted near-dup fraction (default 0 = none, the r16 corpora).

D > 0 (round 17): the fresh-draw corpus has NO true near-dups, so the
dedup audits measure pure collision behavior (precision is degenerate
0/0 above the collision floor and the recall half of the LSH S-curve
is unmeasurable on it). With D, every floor(1/D)-th doc of a replica
is re-issued as a MUTATED copy of the previous doc: token positions
are re-drawn from the vocabulary at a per-pair mutation rate cycling
through {0%, 2%, 5%, 10%, 20%} — planting known-similarity pairs
across the whole S-curve so banding recall/precision and minhash
calibration error are measurable on a realistic vocabulary. Planting
happens before doc_id assignment, so pairs are (doc_id-1, doc_id)
neighbors; the oracle replays identically (it sees only the text).
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfzipf"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1
V = int(sys.argv[3]) if len(sys.argv) > 3 else 100000
S = float(sys.argv[4]) if len(sys.argv) > 4 else 1.05
M = int(sys.argv[5]) if len(sys.argv) > 5 else 8
D = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0

os.makedirs(DST, exist_ok=True)

# bounded Zipf over ranks 1..V (np.random.zipf is unbounded)
ranks = np.arange(1, V + 1, dtype=np.float64)
probs = ranks ** -S
probs /= probs.sum()
vocab = np.array([f"w{r:05d}" for r in range(1, V + 1)])

base = pq.read_table(f"{SRC}/documents.parquet")
doc_ids = base.column("doc_id").to_numpy()
langs = base.column("lang")
sources = base.column("source")
tok_counts = np.array([len(t.split()) * M
                       for t in base.column("text").to_pylist()])

writer = pq.ParquetWriter(f"{DST}/documents.parquet", base.schema)
for i in range(K):
    rng = np.random.default_rng(16_000 + i)  # fresh draw per replica
    total = int(tok_counts.sum())
    draw = vocab[rng.choice(V, size=total, p=probs)]
    texts, pos = [], 0
    for n in tok_counts:
        texts.append(" ".join(draw[pos:pos + n]))
        pos += n
    if D > 0:
        # plant near-dups: every stride-th doc becomes a mutated copy of
        # its predecessor, mutation rate cycling across the S-curve
        stride = max(2, int(round(1.0 / D)))
        rates = [0.0, 0.02, 0.05, 0.10, 0.20]
        planted = 0
        for j in range(stride, len(texts), stride):
            toks = texts[j - 1].split(" ")
            rate = rates[planted % len(rates)]
            if rate > 0:
                flip = rng.random(len(toks)) < rate
                repl = vocab[rng.choice(V, size=int(flip.sum()), p=probs)]
                toks = np.array(toks, dtype=object)
                toks[flip] = repl
                toks = toks.tolist()
            texts[j] = " ".join(toks)
            planted += 1
        if i == 0:
            print(f"planted {planted} near-dup pairs per replica "
                  f"(stride {stride}, rates {rates})")
    t = pa.table({
        "doc_id": pa.array(doc_ids + 1_000_000 * i, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": langs,
        "source": sources,
        "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
    }, schema=base.schema)
    writer.write_table(t, row_group_size=8192)
writer.close()
print(f"documents: {base.num_rows} x {K} zipf(V={V}, s={S}, M={M})")

emb = pq.read_table(f"{SRC}/embeddings.parquet")
vid = emb.schema.get_field_index("vec_id")
parts = []
for i in range(K):
    if i == 0:
        parts.append(emb)
    else:
        # odd ids: never a multiple of 50 -> strided query set stays fixed
        col = (emb.column("vec_id").to_numpy() + 100_000 * i) * 2 + 1
        parts.append(emb.set_column(
            vid, emb.schema.field(vid), pa.array(col, type=pa.int64())))
pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet",
               row_group_size=8192)
print(f"embeddings: {emb.num_rows} -> {emb.num_rows * K}")

for t in "region nation customer supplier part orders lineitem events".split():
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("done:", DST)
