"""Storage-pool lifecycle: iterative operators must not leak cached
generations (VERDICT r2: unpersist superseded localCheckpoints, release
fixpoint caches per streaming batch, bound repeated near-dup calls)."""

from inferdf_rs_spark import System, blank, iri, pat, rule, stmt_triple, v, build_dataset
from inferdf_rs_spark.caches import persistent_rdd_ids, unpersist_rdd_ids

EX = "https://example.org/#"


def _chain_dataset(spark, n=12):
    facts = [(blank(f"n{i}"), iri(EX + "next"), blank(f"n{i+1}")) for i in range(n)]
    return build_dataset(spark, facts)


def test_eq_closure_releases_superseded_generations(spark):
    # a 17-node chain needs several hook+jump rounds; only the FINAL
    # label generation may stay persisted (edges + intermediates freed)
    from inferdf_rs_spark.operators.eqclosure import eq_closure

    pairs = spark.createDataFrame([(i, i + 1) for i in range(16)], "a bigint, b bigint")
    before = persistent_rdd_ids(spark)
    mapping = eq_closure(pairs)
    assert mapping.count() == 17
    growth = persistent_rdd_ids(spark) - before
    assert len(growth) <= 1, f"eq_closure leaked {len(growth)} cached generations"
    unpersist_rdd_ids(spark, growth)


def test_canon_releases_superseded_generations(spark):
    from inferdf_rs_spark.operators.canon import canonical_bnode_labels

    ds = _chain_dataset(spark)
    before = persistent_rdd_ids(spark)
    labels = canonical_bnode_labels(ds.triples, ds.terms, iterations=4)
    assert labels.count() == 13
    growth = persistent_rdd_ids(spark) - before
    assert len(growth) <= 1, f"canon leaked {len(growth)} cached generations"
    unpersist_rdd_ids(spark, growth)


def test_near_dup_pairs_storage_no_growth(spark):
    # repeated calls must not accumulate shingle/band caches: each call
    # may retain ONLY its own materialized result, released by the caller
    from inferdf_rs_spark.operators.dedup import minhash_near_dup_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + ("x" if i % 2 else "y")) for i in range(20)],
        "doc_id bigint, text string",
    )
    baseline = persistent_rdd_ids(spark)
    for _ in range(3):
        out = minhash_near_dup_pairs(docs)
        assert out.count() >= 0
        created = persistent_rdd_ids(spark) - baseline
        assert len(created) <= 1, f"near_dup_pairs leaked {len(created)} cache entries"
        unpersist_rdd_ids(spark, created)
    # one-sided: Spark's ContextCleaner may concurrently drop OTHER tests'
    # stale ids from the pool — we only assert WE added nothing
    assert persistent_rdd_ids(spark) - baseline == set()


def test_fixpoint_release_restores_pool(spark):
    # FixpointResult.release() must free every internal cache/checkpoint
    ds = _chain_dataset(spark, n=6)
    tc = rule(
        variables=3,
        hypothesis=[
            pat("+", v(0), iri(EX + "next"), v(1)),
            pat("+", v(1), iri(EX + "next"), v(2)),
        ],
        statements=[stmt_triple("+", v(0), iri(EX + "next"), v(2))],
    )
    sysm = System(spark, [tc])
    baseline = persistent_rdd_ids(spark)
    res = sysm.fixpoint(ds)
    assert res.store.count() == 6 * 7 // 2  # full transitive closure of the chain
    assert persistent_rdd_ids(spark) - baseline, "expected fixpoint to cache state"
    res.release()
    assert persistent_rdd_ids(spark) - baseline == set(), "release() left cached state behind"


def test_streaming_pool_bounded_across_batches(spark):
    # the pool must hold ONE generation of graph state between batches —
    # pool size after batch k+1 equals pool size after batch k
    from inferdf_rs_spark.encode import iri_edges
    from inferdf_rs_spark.streaming.ingest import StreamingGraph

    r = rule(
        variables=2,
        hypothesis=[pat("+", v(0), iri(EX + "a"), v(1))],
        statements=[stmt_triple("+", v(0), iri(EX + "b"), v(1))],
    )
    sysm = System(spark, [r])
    sg = StreamingGraph(spark, sysm, out_dir="/tmp/unused")

    def batch(i):
        return iri_edges(
            spark.createDataFrame(
                [(EX + f"x{i}", EX + "a", EX + f"y{i}")], "s_lex string, p_lex string, o_lex string"
            )
        )

    sizes = []
    for i in range(3):
        sg.process_batch(batch(i), i)
        sizes.append(len(persistent_rdd_ids(spark)))
    assert sizes[2] <= sizes[1], f"streaming pool grew across batches: {sizes}"
    assert sg.store.count() == 6  # 3 stated + 3 deduced
    sg._tracker.release()
