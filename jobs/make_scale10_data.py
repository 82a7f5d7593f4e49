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

Usage:  python jobs/make_scale10_data.py [src_dir] [out_dir] [copies] [mode]
Defaults: /root/testdata/sf0.1 /root/scale10/sf1.0 10 tag

Perturbation modes:
- ``tag`` (default; the mode behind OPTIMIZATION_r06.md's paired 10x
  numbers): copies >0 get a short per-copy text suffix and a uniform
  per-copy embedding shift.  Copies stay NEAR-duplicates of each other
  (Jaccard/cosine just below identity), so every source row becomes a
  <copies>-member near-dup family — a harsh-but-valid stress of the
  dedup family; do not read its dedup-query seconds as driver-like.
- ``decor``: copies are decorrelated — each copy drops a different ~20%
  of the words (shingle Jaccard across copies ~0.5, below the 0.8
  near-dup threshold) and adds per-(copy, dim) pseudo-noise to the
  embeddings (cosine across copies well below the verify radius).  Use
  for large copy counts (e.g. 100x) where quadratic family growth in
  ``tag`` mode would swamp the dedup queries with candidate pairs no
  organic corpus produces.

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
    mode = sys.argv[4] if len(sys.argv) > 4 else "tag"
    assert mode in ("tag", "decor"), mode
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
    # copy 0 always keeps the original rows (oracle-fixture text survives
    # verbatim in every mode)
    if mode == "tag":
        text_expr = "CASE WHEN i = 0 THEN text ELSE text || ' c' || i END"
        emb_expr = (
            "CASE WHEN i = 0 THEN embedding "
            "ELSE list_transform(embedding, x -> CAST(x + i * 0.0017 AS FLOAT)) END"
        )
    else:  # decor: each copy drops a different ~20% of words / adds
        # per-(copy, dim) pseudo-noise, so cross-copy pairs fall below
        # the near-dup thresholds (1-based lambda index j)
        text_expr = (
            "CASE WHEN i = 0 THEN text ELSE array_to_string("
            "list_filter(string_split(text, ' '), (w, j) -> ((j + i*7) % 5) != 0), ' ') END"
        )
        # per-copy pseudo-random SIGN pattern: an isometry (within-copy
        # cosines/distances exactly preserved) whose cross-copy cosines
        # scatter around 0 (far below any verify radius) — additive noise
        # cannot do this: the embed verify threshold is cosine >= 0.4
        emb_expr = (
            "CASE WHEN i = 0 THEN embedding "
            "ELSE list_transform(embedding, (x, j) -> "
            "CAST(x * (CASE WHEN hash(i*64 + j) % 2 = 0 THEN 1 ELSE -1 END) AS FLOAT)) END"
        )
    gen(
        "documents",
        f"doc_id + i*{OFF} AS doc_id, {text_expr} AS text, "
        f"lang, source, length({text_expr}) AS n_chars",
        "i, doc_id",
    )
    gen(
        "embeddings",
        f"vec_id + i*{OFF} AS vec_id, {emb_expr} AS embedding, label",
        "i, vec_id",
    )
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
