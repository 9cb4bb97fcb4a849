#!/usr/bin/env python3
"""Build a K-times-sf0.1 synthetic dir for scale spot-runs (PLANS.md
"measured scaling" table). Not used by the driver — dev tooling only.

Usage: python3 scripts/make_scale_dir.py [K] [dst]
       python3 scripts/make_scale_dir.py --events-only K dst
       python3 scripts/make_scale_dir.py --docs-only K dst

--events-only scales ONLY the events fact table K-fold (every other
table copied 1x): the measurement point where the event-volume shuffle
of the cohort/event-analytics family must dominate (VERDICT r10 task 4
— at uniform K the events table is a small slice of sf0.1, so the
family's measured exponents were near-flat partly by arithmetic).

--docs-only scales ONLY documents (same near-duplicate recipe as the
uniform path), every other table 1x: the documents-dominated dir the
corpus-linear family (contamination prefilter, streaming cross-dedup)
needs for its 100x decade (VERDICT r13 task 2) without paying 100x
lineitem/events that those faces never read.

Shapes (deliberately NOT exact duplication, which would be an
unrealistically degenerate dedup input):
 - documents: K copies with doc_id offsets; copies >0 get a per-copy
   suffix token, so the corpus is NEAR-duplicate-heavy (clusters of
   size K) — the realistic crawl shape for the dedup family.
 - embeddings: K copies with seeded gaussian noise (sigma 0.05) on
   copies >0 — near-duplicate clusters in cosine space.
 - events: K copies with event_id offsets, ts shifted a day per copy,
   and half the copies minting new user_ids (key cardinality grows
   with volume, as real traffic does).
"""
import sys, os, shutil
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

def scale_events(src, dst, K):
    """K copies of events: event_id offsets, ts shifted a day per copy,
    half the copies minting new user_ids (same recipe as the uniform
    path — key cardinality grows with volume, as real traffic does)."""
    ev = pq.read_table(f'{src}/events.parquet').to_pandas()
    maxe = ev.event_id.max() + 1
    maxu = ev.user_id.max() + 1
    w = None
    for i in range(K):
        c = ev.copy()
        c['event_id'] = c.event_id + i * maxe
        if i % 2 == 1:
            c['user_id'] = c.user_id + (i // 2 + 1) * maxu
        c['ts'] = c.ts + pd.Timedelta(days=i)
        tab = pa.Table.from_pandas(c, preserve_index=False)
        if w is None:
            w = pq.ParquetWriter(f'{dst}/events.parquet', tab.schema)
        w.write_table(tab)
    w.close()

def events_only(K, dst):
    src = '/root/testdata/sf0.1'
    os.makedirs(dst, exist_ok=True)
    scale_events(src, dst, K)
    for tb in ['region', 'nation', 'customer', 'supplier', 'part',
               'orders', 'lineitem', 'documents', 'embeddings']:
        shutil.copy(f'{src}/{tb}.parquet', f'{dst}/{tb}.parquet')
    print(f'wrote {dst}: events at {K}x sf0.1, all other tables 1x')

def scale_documents(src, dst, K):
    """K near-duplicate copies of documents: doc_id offsets, per-copy
    suffix token on copies >0 (clusters of size K — the realistic
    crawl shape for the dedup family). Written in chunked row groups
    so a 100x build stays bounded in memory."""
    t = pq.read_table(f'{src}/documents.parquet').to_pandas()
    maxid = t.doc_id.max() + 1
    writer = None
    for i in range(K):
        c = t.copy()
        c['doc_id'] = c.doc_id + i * maxid
        if i > 0:
            c['text'] = c.text + f' copyv{i}'
            c['n_chars'] = c.n_chars + len(f' copyv{i}')
        tab = pa.Table.from_pandas(c, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(f'{dst}/documents.parquet', tab.schema)
        writer.write_table(tab)
    writer.close()

def docs_only(K, dst):
    src = '/root/testdata/sf0.1'
    os.makedirs(dst, exist_ok=True)
    scale_documents(src, dst, K)
    for tb in ['region', 'nation', 'customer', 'supplier', 'part',
               'orders', 'lineitem', 'events', 'embeddings']:
        shutil.copy(f'{src}/{tb}.parquet', f'{dst}/{tb}.parquet')
    print(f'wrote {dst}: documents at {K}x sf0.1, all other tables 1x')

def scale_embeddings(src, dst, K):
    """K near-duplicate copies of embeddings (σ=0.05 seeded noise on
    copies >0), one row group per copy."""
    e = pq.read_table(f'{src}/embeddings.parquet').to_pandas()
    rng = np.random.default_rng(42)
    maxv = e.vec_id.max() + 1
    sch = pa.schema([('vec_id', pa.int64()),
                     ('embedding', pa.list_(pa.float32())),
                     ('label', pa.int32())])
    ew = pq.ParquetWriter(f'{dst}/embeddings.parquet', sch)
    for i in range(K):
        c = e.copy()
        c['vec_id'] = c.vec_id + i * maxv
        if i > 0:
            c['embedding'] = c.embedding.map(
                lambda a: (np.asarray(a, dtype=np.float32) +
                           rng.normal(0, 0.05, len(a)).astype(np.float32)).tolist())
        ew.write_table(pa.Table.from_pandas(c, schema=sch, preserve_index=False))
    ew.close()

def emb_only(K, dst):
    src = '/root/testdata/sf0.1'
    os.makedirs(dst, exist_ok=True)
    scale_embeddings(src, dst, K)
    for tb in ['region', 'nation', 'customer', 'supplier', 'part',
               'orders', 'lineitem', 'events', 'documents']:
        shutil.copy(f'{src}/{tb}.parquet', f'{dst}/{tb}.parquet')
    print(f'wrote {dst}: embeddings at {K}x sf0.1, all other tables 1x')

def parse_k(s, mode):
    """ADVICE r14: K=0 leaves every chunked writer as None and w.close()
    raises AttributeError — reject non-positive K at entry instead."""
    K = int(s)
    if K < 1:
        sys.exit(f'make_scale_dir.py: K must be >= 1 (got {K}) for {mode}')
    return K

def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--events-only':
        if len(sys.argv) < 4:
            print('usage: make_scale_dir.py --events-only K dst')
            sys.exit(1)
        return events_only(parse_k(sys.argv[2], '--events-only'), sys.argv[3])
    if len(sys.argv) > 1 and sys.argv[1] == '--docs-only':
        if len(sys.argv) < 4:
            print('usage: make_scale_dir.py --docs-only K dst')
            sys.exit(1)
        return docs_only(parse_k(sys.argv[2], '--docs-only'), sys.argv[3])
    if len(sys.argv) > 1 and sys.argv[1] == '--emb-only':
        if len(sys.argv) < 4:
            print('usage: make_scale_dir.py --emb-only K dst')
            sys.exit(1)
        return emb_only(parse_k(sys.argv[2], '--emb-only'), sys.argv[3])
    K = parse_k(sys.argv[1], 'uniform scaling') if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sfbig'
    src = '/root/testdata/sf0.1'
    os.makedirs(dst, exist_ok=True)

    scale_documents(src, dst, K)

    # one row group per copy for every scaled table (same reason as
    # scale_documents: a single-row-group file serializes the Spark
    # scan on ONE task — the measured layout lesson in PLANS.md)
    scale_embeddings(src, dst, K)

    scale_events(src, dst, K)

    # fact tables scale with volume (orderkey offsets keep the
    # orders<->lineitem join consistent; custkey/partkey/suppkey stay in
    # range — dims grow far slower than facts in every real warehouse,
    # so they are copied at 1x)
    o = pq.read_table(f'{src}/orders.parquet').to_pandas()
    l = pq.read_table(f'{src}/lineitem.parquet').to_pandas()
    maxo = o.o_orderkey.max() + 1
    ow, lw = None, None
    for i in range(K):
        co = o.copy(); co['o_orderkey'] = co.o_orderkey + i * maxo
        cl = l.copy(); cl['l_orderkey'] = cl.l_orderkey + i * maxo
        to = pa.Table.from_pandas(co, preserve_index=False)
        tl = pa.Table.from_pandas(cl, preserve_index=False)
        if ow is None:
            ow = pq.ParquetWriter(f'{dst}/orders.parquet', to.schema)
            lw = pq.ParquetWriter(f'{dst}/lineitem.parquet', tl.schema)
        ow.write_table(to)
        lw.write_table(tl)
    ow.close(); lw.close()

    for tb in ['region', 'nation', 'customer', 'supplier', 'part']:
        shutil.copy(f'{src}/{tb}.parquet', f'{dst}/{tb}.parquet')
    print(f'wrote {dst} at {K}x sf0.1')

if __name__ == '__main__':
    main()
