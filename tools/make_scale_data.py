#!/usr/bin/env python3
"""Generate a LARGER scale factor of the harness testdata for scaling probes.

/root/testdata is read-only and tops out at sf0.1; the 100 TB claims in
SURVEY.md §6 deserve at least one measured point above that, so this tool
synthesizes sf0.25 / sf0.5 / ... with the same schemas and (approximately)
the same marginal distributions as the driver's sf0.1 data:

- region/nation: copied verbatim (fixed-size dims).
- customer/supplier/part: UPSAMPLED from the real sf0.1 rows — new row i
  reuses row (i mod n0) with its key remapped to i, so every format,
  category distribution, and blocking-key cardinality is preserved exactly.
- orders/lineitem/events: generated from deterministic hash formulas with
  the observed marginals (uniform orderkey fanout with mean ~4 lines/order,
  same categorical values, same date windows, ~66 events/user over the same
  30-day window).
- documents: token sequences drawn from the sf0.1 corpus's empirical
  unigram distribution (31-token vocabulary), lengths 30..79 tokens — the
  same small-vocab regime the dedup/text tiers are designed against.
- embeddings: 64-dim uniform[-1, 1] vectors from hashes; vec_id 0 exists
  (the query-vector convention) and labels are 0..9.

Everything derives from DuckDB hash() of (table-salt, row, column) — no
RNG state, so output is bit-stable across runs.

Row counts per sf follow the driver's scaling: customer 150k·s, supplier
100k·s, part 200k·s, orders 1.5M·s, lineitem 6M·s, events 1M·s (users
15k·s), documents 50k·s, embeddings max(500, 20k·s).

Usage: python3 tools/make_scale_data.py 0.5 [/tmp/sf0.5]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
dst = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{sf}"
os.makedirs(dst, exist_ok=True)

n_cust = int(1_500_000 * sf)
n_supp = int(100_000 * sf)
n_part = int(2_000_000 * sf)
n_ord = int(15_000_000 * sf)
n_line = int(60_000_000 * sf)
n_evt = int(10_000_000 * sf)
n_user = int(150_000 * sf)
n_doc = int(500_000 * sf)
n_vec = max(500, int(200_000 * sf))
# the sf in the counts above is the driver's own unit (sf0.1 = x/10)
n_cust, n_supp, n_part = n_cust // 10, n_supp // 10, n_part // 10
n_ord, n_line, n_evt = n_ord // 10, n_line // 10, n_evt // 10
n_user, n_doc = n_user // 10, n_doc // 10
n_vec = max(500, n_vec // 10)

con = duckdb.connect()


def h(*exprs):
    """Deterministic uniform BIGINT from the given SQL expressions."""
    return "CAST(hash(" + " || '|' || ".join(str(e) for e in exprs) + ") % 9007199254740881 AS BIGINT)"


for t in ["region", "nation"]:
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")

# --- dims: upsample real rows, remap the key -------------------------------
con.sql(f"""
COPY (
  WITH base AS (SELECT *, ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS rn
                FROM '{SRC}/customer.parquet'),
  idx AS (SELECT i FROM range({n_cust}) t(i))
  SELECT i AS c_custkey,
         'Customer#' || LPAD(CAST(i AS VARCHAR), 9, '0') AS c_name,
         b.c_nationkey, b.c_acctbal, b.c_mktsegment
  FROM idx JOIN base b ON b.rn = i % (SELECT COUNT(*) FROM base)
  ORDER BY i
) TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

con.sql(f"""
COPY (
  WITH base AS (SELECT *, ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS rn
                FROM '{SRC}/supplier.parquet'),
  idx AS (SELECT i FROM range({n_supp}) t(i))
  SELECT i AS s_suppkey,
         'Supplier#' || LPAD(CAST(i AS VARCHAR), 9, '0') AS s_name,
         b.s_nationkey, b.s_acctbal
  FROM idx JOIN base b ON b.rn = i % (SELECT COUNT(*) FROM base)
  ORDER BY i
) TO '{dst}/supplier.parquet' (FORMAT PARQUET)""")

con.sql(f"""
COPY (
  WITH base AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p_partkey) - 1 AS rn
                FROM '{SRC}/part.parquet'),
  idx AS (SELECT i FROM range({n_part}) t(i))
  SELECT i AS p_partkey, b.p_name, b.p_brand, b.p_type, b.p_size, b.p_retailprice
  FROM idx JOIN base b ON b.rn = i % (SELECT COUNT(*) FROM base)
  ORDER BY i
) TO '{dst}/part.parquet' (FORMAT PARQUET)""")

# --- facts: hash-generated with the observed marginals ---------------------
con.sql(f"""
COPY (
  SELECT i AS o_orderkey,
         {h("'ocust'", "i")} % {n_cust} AS o_custkey,
         ['O', 'F', 'P'][1 + {h("'ostat'", "i")} % 3] AS o_orderstatus,
         ROUND(1000 + ({h("'oprice'", "i")} % 45000000) / 100.0, 2) AS o_totalprice,
         TIMESTAMP '1995-01-01' + INTERVAL (CAST({h("'odate'", "i")} % 2404 AS INTEGER)) DAY AS o_orderdate,
         ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
           [1 + {h("'oprio'", "i")} % 5] AS o_orderpriority
  FROM range({n_ord}) t(i) ORDER BY i
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

con.sql(f"""
COPY (
  WITH raw AS (
    SELECT i, {h("'lord'", "i")} % {n_ord} AS l_orderkey FROM range({n_line}) t(i))
  SELECT l_orderkey,
         {h("'lpart'", "i")} % {n_part} AS l_partkey,
         {h("'lsupp'", "i")} % {n_supp} AS l_suppkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY i) AS INTEGER) AS l_linenumber,
         CAST(1 + {h("'lqty'", "i")} % 50 AS DOUBLE) AS l_quantity,
         ROUND(900 + ({h("'lprice'", "i")} % 10000000) / 100.0, 2) AS l_extendedprice,
         ({h("'ldisc'", "i")} % 11) / 100.0 AS l_discount,
         ({h("'ltax'", "i")} % 9) / 100.0 AS l_tax,
         ['N', 'A', 'R'][1 + {h("'lflag'", "i")} % 3] AS l_returnflag,
         ['O', 'F'][1 + {h("'lls'", "i")} % 2] AS l_linestatus,
         TIMESTAMP '1995-01-02' + INTERVAL (CAST({h("'lship'", "i")} % 2498 AS INTEGER)) DAY AS l_shipdate
  FROM raw ORDER BY i
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

con.sql(f"""
COPY (
  SELECT i AS event_id,
         TIMESTAMP '2024-01-01' + to_microseconds({h("'ets'", "i")} % (CAST(2592000 AS BIGINT) * 1000000)) AS ts,
         {h("'euser'", "i")} % {n_user} AS user_id,
         ['view', 'click', 'purchase', 'signup', 'error'][1 + {h("'etype'", "i")} % 5] AS event_type,
         ROUND(({h("'eval'", "i")} % 100000) / 100.0, 2) AS value,
         '{{"k": ' || CAST({h("'eprops'", "i")} % 100 AS VARCHAR) || '}}' AS props
  FROM range({n_evt}) t(i) ORDER BY i
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

# --- documents: sample the empirical unigram distribution ------------------
con.sql(f"""
COPY (
  WITH toks AS (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM '{SRC}/documents.parquet'),
  freq AS (
    SELECT tok, COUNT(*) AS c FROM toks WHERE tok <> '' GROUP BY tok),
  slots AS (  -- 1000 slots, each token filling slots proportional to frequency
    SELECT LIST(tok ORDER BY tok) AS ts FROM (
      SELECT tok, UNNEST(range(CAST(ROUND(1000.0 * c / (SELECT SUM(c) FROM freq)) AS INTEGER) + 1))
      FROM freq)),
  docs AS (
    SELECT i AS doc_id,
           30 + {h("'dlen'", "i")} % 50 AS len
    FROM range({n_doc}) t(i)),
  texts AS (
    SELECT doc_id,
           ARRAY_TO_STRING(
             LIST_TRANSFORM(range(1, CAST(len AS INTEGER) + 1),
               j -> ts[1 + CAST({h("'dtok'", "doc_id", "j")} % LEN(ts) AS INTEGER)]),
             ' ') AS text
    FROM docs CROSS JOIN slots)
  SELECT doc_id, text,
         ['en', 'en', 'en', 'en', 'zh', 'es', 'fr', 'de'][1 + {h("'dlang'", "doc_id")} % 8] AS lang,
         'src' || CAST({h("'dsrc'", "doc_id")} % 20 AS VARCHAR) AS source,
         LENGTH(text) AS n_chars
  FROM texts ORDER BY doc_id
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

con.sql(f"""
COPY (
  SELECT i AS vec_id,
         LIST_TRANSFORM(range(64),
           d -> CAST((CAST(hash(i || '|' || d || '|emb') % 2000001 AS BIGINT) - 1000000) / 1000000.0 AS FLOAT))
           AS embedding,
         CAST({h("'elabel'", "i")} % 10 AS INTEGER) AS label
  FROM range({n_vec}) t(i) ORDER BY i
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

print(f"scale dataset sf={sf} written to {dst}")
for t in ["customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"  {t}: {n}")
