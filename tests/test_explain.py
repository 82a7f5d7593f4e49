"""Provenance reconstruction (operators/explain.py): the Spark-side
analogue of following reference Cause/Entailment links
(src/cause.rs:9-40) from the engine's narrow (rule_id, subst_hash)
lineage.  The two driver queries (explain_geo, explain_tc_support) pin
the happy paths against DuckDB oracles; these tests pin the paths an
oracle can't reach: existential pinning, the non-invertible fallback,
the strict round-decrease invariant, and the cycle/no-leak error path.
"""

import pytest
from pyspark.sql import functions as F

from inferdf_rs_spark import (
    System,
    blank,
    build_dataset,
    call,
    dec,
    iri,
    pat,
    rule,
    stmt_triple,
    v,
)
from inferdf_rs_spark.caches import persistent_rdd_ids, unpersist_rdd_ids
from inferdf_rs_spark.engine import Dataset
from inferdf_rs_spark.operators.explain import explain_step, stated_support
from inferdf_rs_spark.schemas import CAUSE_ENTAILED, CAUSE_STATED
from inferdf_rs_spark.terms import encode_terms

EX = "https://example.org/#"


def _tc_rule():
    return rule(
        variables=3,
        hypothesis=[
            pat("+", v(0), iri(EX + "next"), v(1)),
            pat("+", v(1), iri(EX + "next"), v(2)),
        ],
        statements=[stmt_triple("+", v(0), iri(EX + "next"), v(2))],
    )


def _chain_store(spark, n=6):
    facts = [(blank(str(i)), iri(EX + "next"), blank(str(i + 1))) for i in range(n - 1)]
    ds = build_dataset(spark, facts)
    sysm = System(spark, [_tc_rule()])
    res = sysm.fixpoint(ds)
    return Dataset(res.store, res.terms), sysm


def test_explain_premises_exist_and_rounds_decrease(spark):
    # every reconstructed premise is IN the store, and its fixpoint round
    # is strictly below the explained fact's — the invariant that bounds
    # the recursive walk
    ds, sysm = _chain_store(spark)
    edges = explain_step(ds, sysm)
    fact_rounds = ds.triples.select("s", "p", "o", "sign", F.col("round").alias("f_round"))
    prem_rounds = ds.triples.select(
        F.col("s").alias("ps"),
        F.col("p").alias("pp"),
        F.col("o").alias("po"),
        F.col("sign").alias("psign"),
        F.col("round").alias("p_round"),
    )
    joined = edges.join(fact_rounds, ["s", "p", "o", "sign"]).join(
        prem_rounds, ["ps", "pp", "po", "psign"], "left"
    )
    rows = joined.collect()
    n_entailed = ds.triples.filter(F.col("cause_kind") == CAUSE_ENTAILED).count()
    assert len(rows) == 2 * n_entailed  # two hypothesis slots per fact
    for r in rows:
        assert r["p_round"] is not None, "premise missing from store"
        assert r["p_round"] < r["f_round"], "premise round must strictly decrease"


def test_explain_existential_pinned_to_minted_id(spark):
    # conclusion with an existential: {?x next ?y} => {?x via _:z} mints
    # z deterministically from (rule_id, subst_hash, j); the seed inverts
    # that minting, so the premise comes back exactly
    facts = [(blank("a"), iri(EX + "next"), blank("b"))]
    ds = build_dataset(spark, facts)
    r = rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "next"), v(1))],
        statements=[stmt_triple("+", v(0), iri(EX + "via"), v(2))],
        existentials=1,
    )
    sysm = System(spark, [r])
    res = sysm.fixpoint(ds)
    store_ds = Dataset(res.store, res.terms)
    edges = explain_step(store_ds, sysm).collect()
    assert len(edges) == 1
    ids = encode_terms(spark, [blank("a"), iri(EX + "next"), blank("b")])
    e = edges[0]
    assert (e["ps"], e["pp"], e["po"], e["psign"]) == (
        ids[blank("a")],
        ids[iri(EX + "next")],
        ids[blank("b")],
        True,
    )


def test_explain_non_invertible_falls_back_to_full_match(spark):
    # computed conclusion position (a literal-valued expression, F12):
    # the conclusion can't be inverted, so the winning substitution is
    # recovered by a full hypothesis match semi-joined on subst_hash
    facts = [
        (blank("a"), iri(EX + "next"), blank("b")),
        (blank("b"), iri(EX + "next"), blank("c")),
    ]
    ds = build_dataset(spark, facts)
    r = rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "next"), v(1))],
        statements=[stmt_triple("+", v(0), iri(EX + "flagged"), call("eq", dec(1), dec(1)))],
    )
    sysm = System(spark, [r])
    res = sysm.fixpoint(ds)
    store_ds = Dataset(res.store, res.terms)
    edges = explain_step(store_ds, sysm)
    ids = encode_terms(spark, [blank("a"), blank("b"), blank("c"), iri(EX + "next")])
    got = sorted((e["ps"], e["po"]) for e in edges.collect())
    want = sorted(
        [
            (ids[blank("a")], ids[blank("b")]),
            (ids[blank("b")], ids[blank("c")]),
        ]
    )
    assert got == want


def test_stated_support_releases_and_cycle_raises(spark):
    # (1) the recursive walk retains only its final checkpointed result;
    # (2) a store with cyclic lineage (fact whose winning substitution
    # re-derives itself — impossible from this engine's fixpoint, but
    # possible in foreign input) raises instead of looping, and the
    # error path leaks nothing
    ds, sysm = _chain_store(spark)
    before = persistent_rdd_ids(spark)
    sup = stated_support(ds, sysm)
    assert sup.count() > 0
    growth = persistent_rdd_ids(spark) - before
    assert len(growth) <= 1, f"stated_support leaked {len(growth)} generations"
    unpersist_rdd_ids(spark, growth)

    # cyclic store: {a loop a} entailed, via rule {?x loop ?y}=>{?x loop ?y}
    r = rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "loop"), v(1))],
        statements=[stmt_triple("+", v(0), iri(EX + "loop"), v(1))],
    )
    sysm2 = System(spark, [r])
    ids = encode_terms(spark, [blank("a"), iri(EX + "loop")])
    a, p = ids[blank("a")], ids[iri(EX + "loop")]
    base = build_dataset(spark, [(blank("a"), iri(EX + "loop"), blank("a"))])
    hsh = spark.range(1).select(
        F.xxhash64(F.lit(r.rule_id), F.lit(a), F.lit(a)).alias("h")
    ).collect()[0]["h"]
    cyc = base.triples.select(
        "s",
        "p",
        "o",
        "sign",
        F.lit(CAUSE_ENTAILED).alias("cause_kind"),
        F.lit(r.rule_id).alias("rule_id"),
        F.lit(hsh).cast("long").alias("subst_hash"),
        F.lit(1).alias("round"),
        "src_partition",
        "g",
    )
    before = persistent_rdd_ids(spark)
    with pytest.raises(RuntimeError, match="did not bottom out"):
        stated_support(Dataset(cyc, base.terms), sysm2, max_depth=4)
    leaked = persistent_rdd_ids(spark) - before
    assert not leaked, f"cycle error path leaked {len(leaked)} generations"
