"""Generate the measurement-only 10x scale-up of an sf fixture dir.

The driver's escalated-SF data (BENCH_r05.json: sf=1.0, 50k docs / 6M
lineitem rows) is generated driver-side and not retained between
sessions, so at-scale validation runs in OPTIMIZATION_r06.md use this
reproducible stand-in: COPIES deterministic copies of the sf0.1 tables
with per-copy key shifts that preserve referential integrity
(customer->orders->lineitem, part/supplier->lineitem, events.user_id
grouping) and per-copy text/embedding perturbation so the dedup/ANN
workloads are not pathologically duplicate-heavy (10 exact copies of
every doc would inflate every LSH bucket and candidate-pair set far
beyond what a real 10x corpus produces).

NOT oracle data: oracle_sql() parity is checked on the pristine
/root/testdata/sf* fixtures only.  This data exists purely so frozen
``bench.py`` can be pointed at a driver-sf1.0-sized input
(SPARK_GRAFT_SF_DIR=<out_dir>).

Usage:  python jobs/make_scale10_data.py [src_dir] [out_dir] [copies]
Defaults: /root/testdata/sf0.1 /root/scale10/sf1.0 10

NB: frozen ``bench.py`` derives its reported "sf" from the directory
name (``sf_dir.split("sf")[-1]``), so the out dir must end in
``sf<float>`` — e.g. ``/root/scale10/sf1.0``.
"""

from __future__ import annotations

import os
import sys

import duckdb

# one offset per copy, far above every key domain in the fixtures
# (max key at sf0.1 is o_orderkey=149999)
OFF = 1_000_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/scale10/sf1.0"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT range AS i FROM range({copies})")

    def gen(table: str, select: str, order: str) -> None:
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet') "
            f"CROSS JOIN copies ORDER BY {order}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    # dimension tables are constant across scale (TPC-H convention):
    # nationkey/regionkey references stay valid in every copy
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied unchanged")

    gen(
        "customer",
        f"c_custkey + i*{OFF} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment",
        "i, c_custkey",
    )
    gen(
        "supplier",
        f"s_suppkey + i*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal",
        "i, s_suppkey",
    )
    gen(
        "part",
        f"p_partkey + i*{OFF} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice",
        "i, p_partkey",
    )
    gen(
        "orders",
        f"o_orderkey + i*{OFF} AS o_orderkey, o_custkey + i*{OFF} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
        "i, o_orderkey",
    )
    gen(
        "lineitem",
        f"l_orderkey + i*{OFF} AS l_orderkey, l_partkey + i*{OFF} AS l_partkey, "
        f"l_suppkey + i*{OFF} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
        "i, l_orderkey, l_linenumber",
    )
    gen(
        "events",
        f"event_id + i*{OFF} AS event_id, ts, user_id + i*{OFF} AS user_id, "
        "event_type, value, props",
        "i, event_id",
    )
    # copy 0 keeps the original text; copies >0 get a short per-copy tag so
    # exact/near-dup work sees a realistically diverse 10x corpus
    gen(
        "documents",
        f"doc_id + i*{OFF} AS doc_id, "
        "CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text, "
        "lang, source, "
        "CASE WHEN i = 0 THEN n_chars ELSE n_chars + 2 + length(CAST(i AS VARCHAR)) END AS n_chars",
        "i, doc_id",
    )
    # per-copy uniform shift keeps vectors near (same ANN workload shape)
    # but not byte-identical across copies
    gen(
        "embeddings",
        f"vec_id + i*{OFF} AS vec_id, "
        "CASE WHEN i = 0 THEN embedding "
        "ELSE list_transform(embedding, x -> CAST(x + i * 0.0017 AS FLOAT)) END AS embedding, "
        "label",
        "i, vec_id",
    )
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
