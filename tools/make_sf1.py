#!/usr/bin/env python3
"""Build a 10x scale replica of sf0.1's documents/embeddings for the
round-9 scaling-curve measurement (tools-only; never an oracle input).

Replication must not CHANGE the workload shape, only its size:
- documents: replica k suffixes every word with k (k=0 keeps the
  original), so replicas share no shingles — duplicate/near-dup
  density per document stays at sf0.1's natural level instead of
  every doc gaining 9 planted near-duplicates.
- embeddings: replica k rotates the vector by 7k+3 positions (k=0
  keeps the original) — norms and coordinate distributions are
  preserved, cross-replica cosine decorrelates.

Other tables are symlinked from sf0.1 (Bench's warmup reads lineitem).
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/tmp/sf1.0"
REPLICAS = 10
DOC_OFF = 10_000_000
VEC_OFF = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

doc_parts = []
for k in range(REPLICAS):
    text = ("text" if k == 0
            else f"regexp_replace(text, '([A-Za-z0-9]+)', '\\1{k}', 'g')")
    doc_parts.append(
        f"SELECT doc_id + {k * DOC_OFF} AS doc_id, {text} AS text, "
        f"lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet')")
con.execute(
    f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{DST}/documents.parquet' "
    "(FORMAT PARQUET)")

emb_parts = []
DIM = 64  # fixture embedding length; rotation must stay inside it or
          # a replica degenerates to the identity (exact-dup vectors)
for k in range(REPLICAS):
    rot = (7 * k + 3) % DIM
    vec = ("embedding" if k == 0 or rot == 0 else
           f"embedding[{rot + 1}:] || embedding[:{rot}]")
    emb_parts.append(
        f"SELECT vec_id + {k * VEC_OFF} AS vec_id, ({vec})::FLOAT[] AS embedding, "
        f"label FROM read_parquet('{SRC}/embeddings.parquet')")
con.execute(
    f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{DST}/embeddings.parquet' "
    "(FORMAT PARQUET)")

for t in ("region nation customer supplier part orders lineitem events"
          ).split():
    link = f"{DST}/{t}.parquet"
    if not os.path.exists(link):
        os.symlink(f"{SRC}/{t}.parquet", link)

for t in ("documents", "embeddings"):
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
