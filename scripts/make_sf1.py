"""Synthesize an sf1 probe corpus (~6M-row lineitem) by 10x key-shifted
replication of the driver's read-only sf0.1 tables (VERDICT r11 item 4 —
the query-side decade probe; the ETL side has its own 100M-row decade,
BASELINE §10).

Replication discipline — the goal is PLAN-SHAPE realism, not value
realism:

* every fact/dim table gets 10 copies with its primary key (and the
  foreign keys that reference a scaled dim) shifted by copy * stride, so
  keyed joins scale 10x without fan-out anomalies;
* nation/region stay fixed (TPC-H dims that do not scale);
* documents.text gets a per-copy suffix tag — verbatim 10x text would
  collapse exact dedup to 90% and blow the near-dup clusters to K10s
  (45 pairs per doc), which is not what a 10x corpus looks like;
* embeddings roll the vector by copy positions — norm-preserving but
  direction-changing, so ANN top-k does not degenerate into 10-way ties;
* events shift event_id/user_id and keep the timestamp distribution
  (windows see 10x density, the honest scale-up for a fixed period).

Usage: python scripts/make_sf1.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
STRIDE = 100_000_000  # far above any sf0.1 key


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS c")

    def gen(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table:<12}{n:>12,} rows")

    def src(table: str) -> str:
        return f"read_parquet('{SRC}/{table}.parquet')"

    for t in ("region", "nation"):
        gen(t, f"SELECT * FROM {src(t)}")

    gen(
        "customer",
        f"""SELECT c_custkey + c * {STRIDE} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, copies""",
    )
    gen(
        "supplier",
        f"""SELECT s_suppkey + c * {STRIDE} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM {src('supplier')}, copies""",
    )
    gen(
        "part",
        f"""SELECT p_partkey + c * {STRIDE} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')}, copies""",
    )
    gen(
        "orders",
        f"""SELECT o_orderkey + c * {STRIDE} AS o_orderkey,
                   o_custkey + c * {STRIDE} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, copies""",
    )
    gen(
        "lineitem",
        f"""SELECT l_orderkey + c * {STRIDE} AS l_orderkey,
                   l_partkey + c * {STRIDE} AS l_partkey,
                   l_suppkey + c * {STRIDE} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, copies""",
    )
    gen(
        "events",
        f"""SELECT event_id + c * {STRIDE} AS event_id, ts,
                   user_id + c * {STRIDE} AS user_id,
                   event_type, value, props
            FROM {src('events')}, copies""",
    )
    gen(
        "documents",
        f"""SELECT doc_id + c * {STRIDE} AS doc_id,
                   CASE WHEN c = 0 THEN text
                        ELSE text || ' copy' || CAST(c AS VARCHAR) END AS text,
                   lang, source,
                   n_chars + CASE WHEN c = 0 THEN 0
                                  ELSE 6 + CASE WHEN c >= 10 THEN 1 ELSE 0 END
                             END AS n_chars
            FROM {src('documents')}, copies""",
    )
    gen(
        "embeddings",
        f"""SELECT vec_id + c * {STRIDE} AS vec_id,
                   CASE WHEN c = 0 THEN embedding
                        ELSE list_concat(embedding[c + 1:],
                                         embedding[1:c]) END AS embedding,
                   label
            FROM {src('embeddings')}, copies""",
    )


if __name__ == "__main__":
    main()
