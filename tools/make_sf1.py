#!/usr/bin/env python3
"""Deterministic 10x scale-up of /root/testdata/sf0.1 -> an sf1-equivalent
dataset for the scale-proof battery (dev tooling only, NOT shipped).

Usage: python3 tools/make_sf1.py [outDir] [nCopies]

Design: copy k=0 is the original data byte-for-byte; copies k>0 shift every
key by k*(max_key+1) so referential integrity holds within each copy and
keys never collide across copies. Two columns get content treatment so the
scale-up stresses operators the way real 10x data would:

- documents.text (k>0): tokens are deterministically SHUFFLED per
  (copy, doc) — seeded rng — so copies are NOT near-duplicates of each
  other (token-level shingles change completely). Without this, every
  dedup bucket would hold 10x members and pair-expansion queries would
  blow up ~100x for data-distribution reasons, which would pollute the
  "is the PLAN superlinear?" signal the sf1 run exists to measure.
  n_chars is recomputed from the rebuilt text.
- embeddings.embedding (k>0): per-dim uniform(-0.05, 0.05) seeded noise so
  copies are distinct points (identical vectors would put 10x mass on
  single ANN buckets / identical cosine ties).

region/nation are fixed-cardinality dimensions at every TPC-H SF and are
copied unchanged.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
from pathlib import Path

SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1")
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def rd(name):
    return pq.read_table(SRC / f"{name}.parquet")


def wr(name, tables):
    t = pa.concat_tables(tables)
    OUT.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, OUT / f"{name}.parquet")
    print(f"{name}: {t.num_rows} rows")


def shift(col, k, span):
    return pc.add(col, pa.scalar(k * span, type=col.type))


def span_of(t, col):
    return pc.max(t[col]).as_py() + 1


def main():
    # fixed dimensions: unchanged
    for name in ["region", "nation"]:
        wr(name, [rd(name)])

    cust = rd("customer"); cspan = span_of(cust, "c_custkey")
    supp = rd("supplier"); sspan = span_of(supp, "s_suppkey")
    part = rd("part"); pspan = span_of(part, "p_partkey")
    orders = rd("orders"); ospan = span_of(orders, "o_orderkey")
    events = rd("events"); espan = span_of(events, "event_id")
    uspan = span_of(events, "user_id")
    li = rd("lineitem")
    docs = rd("documents"); dspan = span_of(docs, "doc_id")
    emb = rd("embeddings"); vspan = span_of(emb, "vec_id")

    wr("customer", [cust.set_column(0, "c_custkey", shift(cust["c_custkey"], k, cspan))
                    for k in range(N)])
    wr("supplier", [supp.set_column(0, "s_suppkey", shift(supp["s_suppkey"], k, sspan))
                    for k in range(N)])
    wr("part", [part.set_column(0, "p_partkey", shift(part["p_partkey"], k, pspan))
                for k in range(N)])
    wr("orders", [orders
                  .set_column(0, "o_orderkey", shift(orders["o_orderkey"], k, ospan))
                  .set_column(1, "o_custkey", shift(orders["o_custkey"], k, cspan))
                  for k in range(N)])
    wr("lineitem", [li
                    .set_column(0, "l_orderkey", shift(li["l_orderkey"], k, ospan))
                    .set_column(1, "l_partkey", shift(li["l_partkey"], k, pspan))
                    .set_column(2, "l_suppkey", shift(li["l_suppkey"], k, sspan))
                    for k in range(N)])
    wr("events", [events
                  .set_column(0, "event_id", shift(events["event_id"], k, espan))
                  .set_column(2, "user_id", shift(events["user_id"], k, uspan))
                  for k in range(N)])

    # documents: shuffle tokens per (copy, doc) for k>0
    texts = docs["text"].to_pylist()
    out_docs = []
    for k in range(N):
        if k == 0:
            out_docs.append(docs)
            continue
        rng = np.random.default_rng(42_000 + k)
        new_texts = []
        for t in texts:
            toks = t.split()
            rng.shuffle(toks)
            new_texts.append(" ".join(toks))
        nt = pa.array(new_texts, type=pa.string())
        nc = pa.array([len(s) for s in new_texts], type=pa.int64())
        out_docs.append(docs
                        .set_column(0, "doc_id", shift(docs["doc_id"], k, dspan))
                        .set_column(1, "text", nt)
                        .set_column(4, "n_chars", nc))
    wr("documents", out_docs)

    # embeddings: per-dim seeded noise for k>0
    vecs = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    out_emb = []
    for k in range(N):
        if k == 0:
            out_emb.append(emb)
            continue
        rng = np.random.default_rng(77_000 + k)
        noisy = vecs + rng.uniform(-0.05, 0.05, size=vecs.shape).astype(np.float32)
        ne = pa.array(noisy.tolist(), type=pa.list_(pa.field("element", pa.float32())))
        out_emb.append(emb
                       .set_column(0, "vec_id", shift(emb["vec_id"], k, vspan))
                       .set_column(1, "embedding", ne))
    wr("embeddings", out_emb)


if __name__ == "__main__":
    main()
