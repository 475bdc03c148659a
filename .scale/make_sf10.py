#!/usr/bin/env python
"""Generate the similarity-disjoint 100x sf10 dataset (round-14 verdict
item 3: measure the brief's "survives a 100x scale-up" bar instead of
extrapolating from 10x). Same construction as make_sf1.py with 100
copies of sf0.1: documents get per-copy token renames (within-copy
Jaccard preserved exactly, cross-copy shingle sets disjoint),
orders/lineitem/events/customer get key shifts (100 disjoint trade
graphs / event streams), and embeddings get a per-copy ORTHOGONAL
transform — circular rotation by (k % 64) composed with a first-half
sign flip for k >= 64 — so within-copy geometry (all pairwise dot
products) is exactly preserved while cross-copy cosines decorrelate
(plain rotation alone would repeat with period 64 and manufacture
cross-copy exact duplicates at k and k+64).

Output: .scale/sf10/*.parquet (~60M lineitem rows, 500k docs, 200k
embeddings, 10M events)."""

import os
import shutil

import duckdb

S = "/root/testdata/sf0.1"
D = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf10")
K = 100
os.makedirs(D, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT doc_id + k.k * 100000 AS doc_id,
         CASE WHEN k.k = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1x' || k.k, 'g') END AS text,
         lang, source,
         length(CASE WHEN k.k = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1x' || k.k, 'g') END) AS n_chars
  FROM read_parquet('{S}/documents.parquet'), (SELECT unnest(range({K})) AS k) k
) TO '{D}/documents.parquet'
  (FORMAT parquet, COMPRESSION snappy, ROW_GROUP_SIZE 15000)
""")
# ROW_GROUP_SIZE on the small-row/CPU-heavy tables: parquet splits at
# row-group boundaries, so a 500k-row single file at duckdb's default
# 122880-row groups caps Spark at ~4 tasks — measured round-14:
# text_quality_score read 36 s at sf10 (111x) purely from running its
# regex map on 5 of 32 cores. 15000-row groups -> 30+ splits.
con.execute(f"""
COPY (
  SELECT o_orderkey + k.k * 1000000 AS o_orderkey,
         o_custkey + k.k * 100000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{S}/orders.parquet'), (SELECT unnest(range({K})) AS k) k
) TO '{D}/orders.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
con.execute(f"""
COPY (
  SELECT l_orderkey + k.k * 1000000 AS l_orderkey,
         l_partkey,
         l_suppkey + k.k * 10000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{S}/lineitem.parquet'), (SELECT unnest(range({K})) AS k) k
) TO '{D}/lineitem.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
con.execute(f"""
COPY (
  SELECT event_id + k.k * 10000000 AS event_id,
         ts,
         user_id + k.k * 1000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{S}/events.parquet'), (SELECT unnest(range({K})) AS k) k
) TO '{D}/events.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
# per-copy orthogonal transform: rotate by (k % 64), then for k >= 64
# flip the sign of the first 32 coordinates. Both factors are
# orthogonal (a coordinate permutation and a diagonal +-1), so every
# within-copy pairwise dot product is EXACTLY preserved; the 100
# transforms are pairwise distinct, so cross-copy cosines decorrelate.
con.execute(f"""
COPY (
  SELECT vec_id + kk * 1000000 AS vec_id,
         CASE WHEN kk >= 64 THEN list_concat(
                list_transform(rot[1:32], x -> -x), rot[33:])
              ELSE rot END AS embedding,
         label
  FROM (
    SELECT vec_id, label,
           list_concat(embedding[(k.k % 64) + 1:],
                       embedding[1:(k.k % 64)]) AS rot,
           k.k AS kk
    FROM read_parquet('{S}/embeddings.parquet'),
         (SELECT unnest(range({K})) AS k) k
  )
) TO '{D}/embeddings.parquet'
  (FORMAT parquet, COMPRESSION snappy, ROW_GROUP_SIZE 6250)
""")
con.execute(f"""
COPY (
  SELECT c_custkey + k.k * 100000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{S}/customer.parquet'), (SELECT unnest(range({K})) AS k) k
) TO '{D}/customer.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
for t in ("region", "nation", "supplier", "part"):
    shutil.copy(f"{S}/{t}.parquet", f"{D}/{t}.parquet")
print("sf10 written to", D)
