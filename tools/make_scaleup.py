#!/usr/bin/env python3
"""Build a K-times replica of the sf0.1 tables for scale-up experiments.

Driver-side tooling (like check.py): replicates each parquet table K
times with shifted keys so results stay meaningful —
  - lineitem/orders: orderkeys shifted per copy (joins stay valid,
    dimension tables shared, so fact-side volume grows Kx)
  - events: event_id shifted, ts shifted by 31 days per copy (sessions
    and windows don't merge across copies)
  - documents: every token prefixed with a per-copy marker, so shingle
    sets are disjoint across copies (dedup workload scales linearly,
    not quadratically through planted cross-copy duplicates)
  - embeddings: vector rotated by copy index (decorrelated copies)

Usage: python3 tools/make_scaleup.py /root/testdata/sf0.1 /tmp/sfx10 10
"""
import sys

import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.execute("SET threads TO 32")
import os

os.makedirs(dst, exist_ok=True)


def copy_union(table, select_i):
    parts = " UNION ALL ".join(select_i(i) for i in range(k))
    con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(
        f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
    )

okey = con.execute(f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
copy_union(
    "orders",
    lambda i: f"SELECT o_orderkey + {i * okey} AS o_orderkey, o_custkey, o_orderstatus,"
    f" o_totalprice, o_orderdate, o_orderpriority FROM '{src}/orders.parquet'",
)
copy_union(
    "lineitem",
    lambda i: f"SELECT l_orderkey + {i * okey} AS l_orderkey, l_partkey, l_suppkey,"
    f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
    f" l_linestatus, l_shipdate FROM '{src}/lineitem.parquet'",
)
ekey = con.execute(f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
copy_union(
    "events",
    lambda i: f"SELECT event_id + {i * ekey} AS event_id,"
    # raw int64 nanos: graft.Tables.events reads the ts column as a
    # long (nanosAsLong) and divides to micros, so a plain BIGINT
    # column is read identically to the testdata's TIMESTAMP(NANOS)
    f" epoch_ns(ts + INTERVAL {i * 31} DAY) AS ts,"
    f" user_id, event_type, value, props FROM '{src}/events.parquet'",
)
dkey = con.execute(f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
copy_union(
    "documents",
    lambda i: f"SELECT doc_id + {i * dkey} AS doc_id,"
    f" regexp_replace(text, '(\\w+)', 'c{i}\\1', 'g') AS text, lang, source, n_chars"
    f" FROM '{src}/documents.parquet'",
)
vkey = con.execute(f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
copy_union(
    "embeddings",
    lambda i: f"SELECT vec_id + {i * vkey} AS vec_id,"
    f" embedding[{i + 1}:] || embedding[:{i}] AS embedding, label"
    f" FROM '{src}/embeddings.parquet'",
)
for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(t, n)
