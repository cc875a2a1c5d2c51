#!/usr/bin/env python3
"""Build an adversarial edge-case dataset for oracle-divergence hunting.

Copies sf0.001 and replaces documents/events/embeddings with corpora
containing: empty/1-char/2-token docs, all-stopword and unicode docs,
exact+near duplicate texts, consecutive-space tokens, same-user
same-timestamp event ties at session boundaries, and zero/constant
embedding vectors. Run graft.Verify + tools/check.py against the output
dir; every latent cross-engine divergence found so far (ascii('') vs
unicode(''), NaN cosine ordering, shingle NULL indexing, session-id
tie-breaks) was caught by this dataset.

Usage: python3 tools/make_edge_data.py [/tmp/edge_sf]
"""
import sys, os, shutil
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

src = '/root/testdata/sf0.001'
dst = sys.argv[1] if len(sys.argv) > 1 else '/tmp/edge_sf'
os.makedirs(dst, exist_ok=True)
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders', 'lineitem']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')

con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet' WHERE doc_id < 50
  UNION ALL
  SELECT * FROM (VALUES
    (1000, '', 'xx', 'edge', 0),
    (1001, 'a', 'xx', 'edge', 1),
    (1002, 'a b', 'xx', 'edge', 3),
    (1003, 'the the the the the the the the the the the the the the the the the the the the the', 'en', 'edge', 85),
    (1004, 'café résumé naïve über straße café résumé naïve über straße café résumé naïve über straße café résumé naïve über straße', 'de', 'edge', 120),
    (1005, 'the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight', 'en', 'edge', 96),
    (1006, 'the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest today', 'en', 'edge', 94),
    (1007, 'the quick brown fox jumps over the lazy dog and runs far away into the deep dark forest tonight', 'en', 'edge', 96),
    (1008, 'x  y   z', 'xx', 'edge', 8),
    (1009, 'reach bob.smith+tag@corp.example.org or jane@ex.io, call 555-123-4567 from 10.0.42.7 and 1.2.3.4.5 redacts wholly', 'en', 'edge', 114),
    (1010, '<div class="x"><b>bold &amp;lt; text</b> &quot;quoted&quot; &#39;ok&#39;   tabs	and
newlines</div>', 'en', 'edge', 99),
    (1011, 'email@no-tld@ 999-99-9999 256.300.1.1 stays (octets out of range) <notclosed', 'xx', 'edge', 76)
  ) AS v(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
con.sql(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet' WHERE vec_id < 100
  UNION ALL
  SELECT * FROM (VALUES
    (8000, CAST([0.0 for i in range(64)] AS FLOAT[]), 1),
    (8001, CAST([1.0 for i in range(64)] AS FLOAT[]), 2),
    (8002, CAST([0.5 for i in range(32)] AS FLOAT[]), 3)
  ) AS v(vec_id, embedding, label)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")

# events must stay TIMESTAMP_NS (DuckDB's writer downgrades to micros);
# pyarrow preserves the original schema
orig = pq.read_table(f'{src}/events.parquet')
df = orig.to_pandas()
extra = pd.DataFrame({
    'event_id': [9000, 9001, 9002, 9003,
                 # constant-value event type: zero variance, must be EXCLUDED
                 # from z-scores by the std>0 contract in both engines
                 9004, 9005, 9006,
                 # single-event user: one 1-event session, gapfill spine of 1;
                 # plus a 3-day gap user for forward-fill across multiple days
                 9007, 9008, 9009],
    'ts': pd.to_datetime(['2024-06-01 00:00:00', '2024-06-01 00:00:00',
                          '2024-06-01 00:30:00', '2024-06-01 00:30:00',
                          '2024-06-02 01:00:00', '2024-06-02 02:00:00',
                          '2024-06-02 03:00:00',
                          '2024-06-03 00:00:00',
                          '2024-06-04 00:00:00', '2024-06-07 23:59:59']),
    'user_id': [7777] * 4 + [7778] * 3 + [7779, 7780, 7780],
    'event_type': ['tie'] * 4 + ['const'] * 3 + ['view', 'view', 'view'],
    'value': [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0, 9.99, 1.25, 2.50],
    'props': ['{"k": 1}'] * 10,
})
out = pd.concat([df[df.event_id < 400], extra], ignore_index=True)
pq.write_table(pa.Table.from_pandas(out, schema=orig.schema, preserve_index=False),
               f'{dst}/events.parquet')
print(f'edge dataset written to {dst}')
