#!/usr/bin/env python3
"""Builds the PERF-ONLY 10x corpus at /tmp/sfperf from sf0.1 (never used
for correctness): fact tables replicated R times with key-space shifts so
join/graph structure scales (not just row count), documents replicated with
a per-replica text salt so byte-level operators see distinct payloads.
Small dims copied as-is. See SCALING.md "Measured 10x scale-up"."""
import os
import sys
import duckdb

# Defaults build the canonical 10x-of-sf0.1 corpus (~sf1: ~6M lineitem
# rows — the "one decade past the driver fixtures" scale the heavy-tier
# SCALING.md rows are measured at). Override positionally:
#   tools/make_perf_corpus.py [SRC] [DST] [R]
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfperf"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def one(v):
    return con.sql(v).fetchone()[0]

mok = one(f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'")
mpk = one(f"SELECT max(l_partkey) + 1 FROM '{SRC}/lineitem.parquet'")
msk = one(f"SELECT max(l_suppkey) + 1 FROM '{SRC}/lineitem.parquet'")
muid = one(f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'")
meid = one(f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'")
mdid = one(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'")

def copy(sql, table):
    con.sql(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(table, one(f"SELECT count(*) FROM '{DST}/{table}.parquet'"))

copy(f"""SELECT l_orderkey + r * {mok} AS l_orderkey,
           l_partkey + r * {mpk} AS l_partkey,
           l_suppkey + r * {msk} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
         FROM read_parquet('{SRC}/lineitem.parquet'), range(0, {R}) t(r)""",
     "lineitem")

copy(f"""SELECT o_orderkey + r * {mok} AS o_orderkey, o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM read_parquet('{SRC}/orders.parquet'), range(0, {R}) t(r)""",
     "orders")

copy(f"""SELECT event_id + r * {meid} AS event_id, ts,
           user_id + r * {muid} AS user_id, event_type, value, props
         FROM read_parquet('{SRC}/events.parquet'), range(0, {R}) t(r)""",
     "events")

copy(f"""SELECT doc_id + r * {mdid} AS doc_id,
           'r' || r || ' ' || text AS text, lang, source, n_chars + 3 AS n_chars
         FROM read_parquet('{SRC}/documents.parquet'), range(0, {R}) t(r)""",
     "documents")

for t in ["customer", "supplier", "part", "nation", "region"]:
    copy(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')", t)

# embeddings replicate with shifted ids and a deterministic per-replica
# perturbation (replica r nudges every dimension by ((r*17 + 13) % 7 - 3)
# * 1e-3), so ANN/clustering see 10x DISTINCT vectors — near-dup structure
# survives within a replica, exact cross-replica collisions don't exist
mvid = one(f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'")
copy(f"""SELECT vec_id + r * {mvid} AS vec_id,
           list_transform(embeddings.embedding,
             x -> CAST(x + ((r * 17 + 13) % 7 - 3) * 0.001 AS FLOAT)) AS embedding,
           label
         FROM read_parquet('{SRC}/embeddings.parquet') embeddings, range(0, {R}) t(r)""",
     "embeddings")
