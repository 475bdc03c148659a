#!/usr/bin/env python
"""Generate the similarity-disjoint 10x sf1 dataset used by SCALE.md:
documents get per-copy token renames (within-copy Jaccard preserved
exactly, cross-copy shingle sets disjoint), orders/lineitem get key
shifts (ten disjoint trade graphs). Output: .scale/sf1/*.parquet."""

import os
import shutil

import duckdb

S = "/root/testdata/sf0.1"
D = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf1")
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
  FROM read_parquet('{S}/documents.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{D}/documents.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
con.execute(f"""
COPY (
  SELECT o_orderkey + k.k * 1000000 AS o_orderkey,
         o_custkey + k.k * 100000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{S}/orders.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{D}/orders.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
con.execute(f"""
COPY (
  SELECT l_orderkey + k.k * 1000000 AS l_orderkey,
         l_partkey,
         l_suppkey + k.k * 10000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{S}/lineitem.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{D}/lineitem.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
# round 9: the full-headline-set scale sweep also needs 10x events,
# embeddings, and customer (they were 1x copies while only the six
# slowest document/order queries were swept). Copies stay DISJOINT in
# the dimension each operator joins on:
#  - events: user/event keys shift per copy (sessions, as-of spines,
#    and HLL user sets are per-copy; timestamps unchanged = 10x density
#    over the same period, the honest growth shape for event streams)
#  - embeddings: vec_id shifts and the vector is circularly rotated by
#    the copy index — within-copy geometry (all pairwise dot products)
#    is EXACTLY preserved under a shared permutation, while cross-copy
#    cosines decorrelate, so ANN bucket populations grow 10x without
#    manufacturing cross-copy near-duplicates
#  - customer: key shift in lockstep with the orders o_custkey shift,
#    so join fan-outs stay per-copy
con.execute(f"""
COPY (
  SELECT event_id + k.k * 10000000 AS event_id,
         ts,
         user_id + k.k * 1000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{S}/events.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{D}/events.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
con.execute(f"""
COPY (
  SELECT vec_id + k.k * 1000000 AS vec_id,
         list_concat(embedding[k.k + 1:], embedding[1:k.k]) AS embedding,
         label
  FROM read_parquet('{S}/embeddings.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{D}/embeddings.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
con.execute(f"""
COPY (
  SELECT c_custkey + k.k * 100000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{S}/customer.parquet'), (SELECT unnest(range(10)) AS k) k
) TO '{D}/customer.parquet' (FORMAT parquet, COMPRESSION snappy)
""")
for t in ("region", "nation", "supplier", "part"):
    shutil.copy(f"{S}/{t}.parquet", f"{D}/{t}.parquet")
print("sf1 written to", D)
