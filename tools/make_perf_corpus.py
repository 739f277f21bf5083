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
# the documents Caesar shift is r % 26: past 26 replicas the trigram
# universes would silently collide again (replica 26 == replica 0 text),
# reintroducing the anti-Zipfian saturation this generator exists to fix
assert 1 <= R <= 26, f"R={R}: documents replica salting supports at most 26 replicas"

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

# documents, corpus v3 (round-11): the old 2-char-prefix salt made the
# scaled corpus ANTI-ZIPFIAN for shingle operators — the ~400-trigram
# universe stayed fixed while every df grew Rx, and the residue-
# preserving id shift put all R near-copies of a sampled doc into every
# `doc_id % 10` slice: q113's candidate mass saturated (~1e9 pairs,
# measured — SCALING.md round-10). But the SOURCE corpus is already
# saturated at every scale (31-word vocabulary -> prefix_ppm ~18.5e6 at
# sf0.01 AND sf0.1, measured round-11), so a distribution-preserving
# scale-up alone cannot fix it — the generator must ADD the doc-level
# rare-shingle structure real text has. Three changes:
#   1. doc_id = doc_id + r*max + r — the trailing +r ROTATES the
#      `doc_id % 10` residue per replica, so a %10 sample holds each
#      original doc EXACTLY ONCE (ranges stay disjoint; r=0 ids
#      unchanged, so original doc_id == vec_id alignment survives).
#   2. replica r>0 Caesar-shifts letters by r — replica trigram
#      universes are fully disjoint (injective char map), so the
#      vocabulary scales linearly with the corpus and each replica's
#      within-replica df distribution is EXACTLY the source's (the
#      distribution-preserving analogue of the key-shifted fact tables).
#   3. every doc gets ~len/12 appended 6-char [A-Za-z0-9] codes derived
#      from hash(doc_id, k) — deterministic doc-unique material whose
#      trigrams live in a 62^3 universe with df ~ 3: the low-df shingles
#      that PPJoin/AllPairs prefixes key on in real Zipfian text
#      (without them every prefix position falls on a high-df body
#      trigram and candidate generation degenerates quadratic).
# Plus planted near-dups so the join has real output at scale: base
# docs with doc_id % 37 == 5 get a TWIN (id + 10*R*(max+1), residue
# preserved) that drops the first token and KEEPS the codes —
# Jaccard ~0.95, found through the rare-prefix path like real near-dups.
ALPHA = ("abcdefghijklmnopqrstuvwxyz"
         "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
AZ = "abcdefghijklmnopqrstuvwxyz"

def _docs_sql():
    shifted = (f"CASE WHEN r = 0 THEN text ELSE translate(text, '{AZ}', "
               f"substring('{AZ}' || '{AZ}', CAST(r % 26 AS INTEGER) + 1, 26)) END")
    code = (f"array_to_string(list_transform(generate_series(0, 5), j -> "
            f"substring('{ALPHA}', CAST((hash(did * 131 + k) >> (j * 6)) & 63 "
            f"AS INTEGER) % 62 + 1, 1)), '')")
    codes = (f"array_to_string(list_transform("
             f"generate_series(0, CAST(ceil(length(text) / 12.0) AS BIGINT) - 1), "
             f"k -> {code}), ' ')")
    return f"""
      WITH base AS (
        SELECT doc_id + r * {mdid} + r AS did,
               {shifted} AS btext, lang, source
        FROM read_parquet('{SRC}/documents.parquet'), range(0, {R}) t(r)),
      salted AS (
        SELECT did, btext || ' ' || {codes.replace("length(text)", "length(btext)")} AS text,
               lang, source
        FROM base),
      twins AS (
        SELECT did + 10 * {R} * ({mdid} + 1) AS did,
               regexp_replace(text, '^[^ ]+ ', '') AS text, lang, source
        FROM salted WHERE did % 37 = 5)
      SELECT did AS doc_id, text, lang, source,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM (SELECT * FROM salted UNION ALL SELECT * FROM twins)"""

copy(_docs_sql(), "documents")

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
