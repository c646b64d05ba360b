"""Deterministic SCALE-STRESS fixture: upsample an existing testdata sf dir
by an integer factor (default 10x of sf0.1 ≙ "sf1") — the analog of the
reference's 1 GB ``Team2StressTest.java:26-59`` corpus, sized so the full
91-key contract, rank identity, and WAND audits run at 10x the largest
driver-provided scale.

Method: each fact table is replicated ``factor`` times with every key
domain shifted by ``copy * (max_key + 1)`` so cross-table joins stay
consistent (orderkey ↔ lineitem, custkey ↔ orders, part/supp ↔ lineitem);
dimension tables (region, nation) are copied once. Text and vectors are
perturbed deterministically per copy — documents rotate their token list by
``copy`` positions (same bag of words, different string, so exact-dup /
minhash / simhash operators see near-dups, not byte-dups), embeddings
rotate the vector by ``copy`` lanes (norm-preserving). Everything is pure
SQL over the source parquet — no RNG, no external data; re-running
produces byte-identical tables.

Usage: python tools/gen_sf_stress.py [src_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sfstress1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def gen(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")
    con.sql(f"CREATE VIEW copies AS SELECT unnest(range({factor})) AS copy")

    def shift(col: str, table: str, key: str) -> str:
        return f"{col} + copy * ((SELECT max({key}) + 1 FROM {table}))"

    sqls = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT {shift('c_custkey', 'customer', 'c_custkey')} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer, copies""",
        "supplier": f"""
            SELECT {shift('s_suppkey', 'supplier', 's_suppkey')} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier, copies""",
        "part": f"""
            SELECT {shift('p_partkey', 'part', 'p_partkey')} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part, copies""",
        "orders": f"""
            SELECT {shift('o_orderkey', 'orders', 'o_orderkey')} AS o_orderkey,
                   {shift('o_custkey', 'customer', 'c_custkey')} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, copies""",
        "lineitem": f"""
            SELECT {shift('l_orderkey', 'orders', 'o_orderkey')} AS l_orderkey,
                   {shift('l_partkey', 'part', 'p_partkey')} AS l_partkey,
                   {shift('l_suppkey', 'supplier', 's_suppkey')} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, copies""",
        "events": f"""
            SELECT {shift('event_id', 'events', 'event_id')} AS event_id,
                   ts + to_seconds(copy) AS ts,
                   {shift('user_id', 'events', 'user_id')} AS user_id,
                   event_type, value, props
            FROM events, copies""",
        # rotate the token list by `copy` (same tokens, different string)
        "documents": f"""
            WITH toks AS (
              SELECT doc_id, copy, lang, source,
                     string_split(text, ' ') AS t
              FROM documents, copies
            )
            SELECT {shift('doc_id', 'documents', 'doc_id')} AS doc_id,
                   array_to_string(
                     list_concat(t[1 + (copy % len(t)):],
                                 t[:copy % len(t)]), ' ') AS text,
                   lang, source,
                   length(array_to_string(
                     list_concat(t[1 + (copy % len(t)):],
                                 t[:copy % len(t)]), ' '))::int AS n_chars
            FROM toks""",
        # rotate vector lanes by `copy` (norm-preserving, deterministic)
        "embeddings": f"""
            SELECT {shift('vec_id', 'embeddings', 'vec_id')} AS vec_id,
                   list_concat(embedding[1 + (copy % len(embedding)):],
                               embedding[:copy % len(embedding)])
                     ::float[] AS embedding,
                   label
            FROM embeddings, copies""",
    }
    for t in TABLES:
        dest = os.path.join(out, f"{t}.parquet")
        con.sql(f"COPY ({sqls[t]}) TO '{dest}' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{t}: {n} rows -> {dest} "
              f"({os.path.getsize(dest) / 1e6:.1f} MB)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfstress1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    gen(src, out, factor)
