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

LAYOUT MATTERS (measured, round-14): a single parquet file per table
caps Spark's scan parallelism at ceil(file_bytes / maxPartitionBytes)
— sf10 documents compress to ~60 MB, one 128 MB split, so a CPU-heavy
regex map ran on ONE of 32 cores (text_quality_score read 36-40 s,
~100x its fair share). A production 100 TB estate is always many
files; this generator mirrors that by writing each scaled table as a
DIRECTORY of {NF} files (copy blocks k % {NF} == j — deterministic,
every file similarity-disjoint from the rest).

Output: .scale/sf10/<table>.parquet/part-*.parquet (~60M lineitem
rows, 500k docs, 200k embeddings, 10M events).
"""

import os
import shutil

import duckdb

S = "/root/testdata/sf0.1"
D = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sf10")
K = 100   # copies
NF = 32   # files per scaled table (one per local core)

SELECTS = {
    "documents": """
  SELECT doc_id + k.k * 100000 AS doc_id,
         CASE WHEN k.k = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1x' || k.k, 'g') END AS text,
         lang, source,
         length(CASE WHEN k.k = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1x' || k.k, 'g') END) AS n_chars
  FROM read_parquet('{S}/documents.parquet'), KRANGE k
""",
    "orders": """
  SELECT o_orderkey + k.k * 1000000 AS o_orderkey,
         o_custkey + k.k * 100000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{S}/orders.parquet'), KRANGE k
""",
    "lineitem": """
  SELECT l_orderkey + k.k * 1000000 AS l_orderkey,
         l_partkey,
         l_suppkey + k.k * 10000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{S}/lineitem.parquet'), KRANGE k
""",
    "events": """
  SELECT event_id + k.k * 10000000 AS event_id,
         ts,
         user_id + k.k * 1000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{S}/events.parquet'), KRANGE k
""",
    # per-copy orthogonal transform: rotate by (k % 64), then for
    # k >= 64 flip the sign of the first 32 coordinates — both factors
    # orthogonal, so within-copy dot products are EXACTLY preserved
    # while the 100 transforms stay pairwise distinct.
    "embeddings": """
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
    FROM read_parquet('{S}/embeddings.parquet'), KRANGE k
  )
""",
    "customer": """
  SELECT c_custkey + k.k * 100000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{S}/customer.parquet'), KRANGE k
""",
}


def main():
    con = duckdb.connect()
    for tbl, sel in SELECTS.items():
        out = f"{D}/{tbl}.parquet"
        shutil.rmtree(out, ignore_errors=True)
        if os.path.isfile(out):
            os.remove(out)
        os.makedirs(out, exist_ok=True)
        for j in range(NF):
            krange = (f"(SELECT unnest(range({K})) AS k) k "
                      f"WHERE (k.k % {NF}) = {j}")
            # the k filter composes with any existing WHERE-less FROM
            q = sel.format(S=S).replace("KRANGE k", krange)
            con.execute(
                f"COPY ({q}) TO '{out}/part-{j:03d}.parquet' "
                f"(FORMAT parquet, COMPRESSION snappy)"
            )
        print(f"{tbl}: {NF} files")
    for t in ("region", "nation", "supplier", "part"):
        dst = f"{D}/{t}.parquet"
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copy(f"{S}/{t}.parquet", dst)
    print("sf10 written to", D)


if __name__ == "__main__":
    main()
