#!/usr/bin/env python3
"""Rebuild the sf1 decade-scale dataset (10x sf0.1) into /tmp/sf1 by
key-offset replication — the recipe recorded in BASELINE.md §(d):

- fact tables (lineitem, orders, events, documents, embeddings) get 10
  copies with their PRIMARY keys offset per copy; dimension tables are
  symlink-copied single-copy.
- orders/lineitem share the o_orderkey/l_orderkey offset so the join
  survives; other lineitem FKs stay in the original dim keyspace.
- events.user_id is offset MODULO the customer keyspace so the
  events->customer join still resolves.
- documents.text is word-ROTATED per copy (clone k starts at word k) so
  clones are not shingle near-dups of their originals; doc_id offset.
- embeddings.embedding is element-ROTATED per copy for the same reason
  (cosine near-dup injection must stay the fixtures' job); vec_id offset.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir] [n_copies]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DIMS = ["region", "nation", "customer", "supplier", "part"]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count() or 8}")

for t in DIMS:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

okey_span, = con.execute(
    f"SELECT max(o_orderkey) + 1 FROM '{SRC}/orders.parquet'").fetchone()
cust_span, = con.execute(
    f"SELECT max(c_custkey) + 1 FROM '{SRC}/customer.parquet'").fetchone()
eid_span, = con.execute(
    f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'").fetchone()
doc_span, = con.execute(
    f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()
vec_span, = con.execute(
    f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'").fetchone()

copies = f"(SELECT unnest(range({N})) AS k)"

con.execute(f"""COPY (
  SELECT o_orderkey + k * {okey_span} AS o_orderkey,
    o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet' CROSS JOIN {copies}
) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT l_orderkey + k * {okey_span} AS l_orderkey,
    l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet' CROSS JOIN {copies}
) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

con.execute(f"""COPY (
  SELECT event_id + k * {eid_span} AS event_id, ts,
    CASE WHEN user_id IS NULL THEN NULL
      ELSE (user_id + k * 101) % {cust_span} END AS user_id,
    event_type, value, props
  FROM '{SRC}/events.parquet' CROSS JOIN {copies}
) TO '{DST}/events.parquet' (FORMAT PARQUET)""")

# word rotation: copy k's text starts at word (k mod n_words)
con.execute(f"""COPY (
  WITH t AS (SELECT doc_id, text, lang, source, n_chars,
      string_split(text, ' ') AS ws
    FROM '{SRC}/documents.parquet')
  SELECT doc_id + k * {doc_span} AS doc_id,
    CASE WHEN k = 0 OR len(ws) <= 1 THEN text
      ELSE array_to_string(
        ws[(k % len(ws)) + 1:] || ws[:(k % len(ws))], ' ') END AS text,
    lang, source, n_chars
  FROM t CROSS JOIN {copies}
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

# element rotation: copy k's vector starts at element (k mod dim)
con.execute(f"""COPY (
  WITH t AS (SELECT vec_id, embedding, label,
      len(embedding) AS d FROM '{SRC}/embeddings.parquet')
  SELECT vec_id + k * {vec_span} AS vec_id,
    CASE WHEN k = 0 THEN embedding
      ELSE embedding[(k % d) + 1:] || embedding[:(k % d)] END AS embedding,
    label
  FROM t CROSS JOIN {copies}
) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")

for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
    n, = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()
    print(f"{t}: {n}")
