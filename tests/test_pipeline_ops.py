"""Unit tests for the round-5 pipeline operators: distributed prefix
sum / sequence packing, as-of join, sampling, PII redaction, quality
gate, signed-store contradictions, predicate stats."""

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inferdf_rs_spark import build_dataset, iri  # noqa: E402
from inferdf_rs_spark.operators.asof import asof_join  # noqa: E402
from inferdf_rs_spark.operators.packing import (  # noqa: E402
    distributed_prefix_sum,
    pack_sequences,
)
from inferdf_rs_spark.operators.sampling import (  # noqa: E402
    stratified_sample,
    topk_per_group,
)
from inferdf_rs_spark.operators.stats import predicate_stats  # noqa: E402
from inferdf_rs_spark.operators.textstats import (  # noqa: E402
    QUALITY_REASON_ALPHA_RATIO,
    QUALITY_REASON_DISTINCT_RATIO,
    QUALITY_REASON_MEAN_TOK_LEN,
    QUALITY_REASON_TOO_FEW_TOKENS,
    pii_redact,
    quality_filter,
)
from inferdf_rs_spark.operators.validate import find_contradictions  # noqa: E402


# ------------------------------------------------------- prefix sum / packing


def test_prefix_sum_matches_sequential(spark):
    # non-contiguous, unsorted keys; values include zeros
    rows = [(k, (k * 7919) % 13) for k in [3, 100, 7, 42, 999, 0, 512, 17, 256, 64]]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in distributed_prefix_sum(df, "k", "v", "cum", n_buckets=4).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert got[k] == acc, f"key {k}"


def test_prefix_sum_bucket_count_invariance(spark):
    rows = [(k, k % 5) for k in range(200)]
    df = spark.createDataFrame(rows, "k long, v long")
    one = sorted(
        (r["k"], r["cum"])
        for r in distributed_prefix_sum(df, "k", "v", "cum", n_buckets=1).collect()
    )
    many = sorted(
        (r["k"], r["cum"])
        for r in distributed_prefix_sum(df, "k", "v", "cum", n_buckets=37).collect()
    )
    assert one == many


def test_pack_sequences_boundaries(spark):
    # budget 10: cumulative 4, 10, 14 -> packs 0, 0, 1; a zero-token doc
    # rides with its predecessor's pack (and clamps at 0 when leading)
    docs = spark.createDataFrame(
        [
            (0, ""),  # 0 tokens, cum 0 -> clamped pack 0
            (1, "a b c d"),  # cum 4 -> pack 0
            (2, "a b c d e f"),  # cum 10 -> pack 0 (boundary-inclusive)
            (3, "x y z w"),  # cum 14 -> pack 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["cum_tokens"], r["pack_id"]) for r in pack_sequences(docs, budget=10).collect()}
    assert got == {0: (0, 0), 1: (4, 0), 2: (10, 0), 3: (14, 1)}


# ---------------------------------------------------------------- as-of join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 250), (3, 20, 100), (4, 5, 999)],
        "lid long, uid long, t long",
    )
    right = spark.createDataFrame(
        [
            (10, 100, 7, 1.0),  # exactly at left t=100 -> inclusive match
            (10, 100, 9, 2.0),  # same ts: larger tie id wins
            (10, 200, 11, 3.0),
            (20, 50, 13, 4.0),
        ],
        "uid long, t long, rid long, val double",
    )
    out = {
        r["lid"]: (r["asof_rid"], r["asof_val"])
        for r in asof_join(
            left, right, on="uid", order="t", values=["rid", "val"], tie="rid"
        ).collect()
    }
    assert out[1] == (9, 2.0)  # inclusive tie, deterministic winner
    assert out[2] == (11, 3.0)  # latest prior
    assert out[3] == (13, 4.0)
    assert out[4] == (None, None)  # no prior right row


# ----------------------------------------------------------------- sampling


def test_topk_per_group_equals_plain_window(spark):
    # skewed: group "hot" has 500 rows, others 3
    rows = [("hot", i, (i * 37) % 101) for i in range(500)]
    rows += [(g, i, i) for g in ("a", "b") for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id long, score long")
    order = [F.col("score").desc(), F.col("id").asc()]
    got = sorted(
        (r["g"], r["id"], r["rank"])
        for r in topk_per_group(df, ["g"], order, k=4, n_salts=8).collect()
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        (r["g"], r["id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 4)
        .collect()
    )
    assert got == want


def test_stratified_sample_deterministic_subset(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(300)], "doc_id long, lang string"
    )
    a = sorted(r["doc_id"] for r in stratified_sample(df, {"en": 30, "fr": 70}).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, {"en": 30, "fr": 70}).collect())
    assert a == b and 0 < len(a) < 300
    # rate monotonicity: a higher quota strictly contains the lower one
    wider = sorted(r["doc_id"] for r in stratified_sample(df, {"en": 60, "fr": 90}).collect())
    assert set(a) <= set(wider)


# ---------------------------------------------------- text quality / PII


def test_quality_filter_reason_bits(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over lazy dogs today"),  # clean
            (1, "hi"),  # too few tokens
            (2, "a b c d e f g h"),  # mean token len 1.0 < 2.0
            (3, "1234 5678 9012 3456 7890"),  # alpha ratio 0
            (4, "spam spam spam spam spam spam spam spam spam spam"),  # distinct 100m
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reasons"]) for r in quality_filter(docs).collect()}
    assert got[0] == (True, 0)
    assert got[1][1] & QUALITY_REASON_TOO_FEW_TOKENS
    assert got[2][1] & QUALITY_REASON_MEAN_TOK_LEN
    assert got[3][1] & QUALITY_REASON_ALPHA_RATIO
    assert got[4][1] & QUALITY_REASON_DISTINCT_RATIO
    assert not any(got[i][0] for i in (1, 2, 3, 4))


def test_pii_redact_multiple_hits(spark):
    docs = spark.createDataFrame(
        [(0, "mail a@b.com and c.d@e.org call 555-123-4567 from 10.0.0.1 ok")],
        "doc_id long, text string",
    )
    r = pii_redact(docs).collect()[0]
    assert r["n_email"] == 2 and r["n_phone"] == 1 and r["n_ipv4"] == 1
    assert (
        r["clean_text"]
        == "mail <EMAIL> and <EMAIL> call <PHONE> from <IPV4> ok"
    )


# ------------------------------------------------- contradictions / stats


def test_find_contradictions(spark):
    ds = build_dataset(
        spark,
        [
            (iri("a"), iri("p"), iri("x"), True),
            (iri("a"), iri("p"), iri("x"), False),  # conflict
            (iri("b"), iri("p"), iri("x"), True),
            (iri("b"), iri("p"), iri("x"), True),  # same-sign dup: NOT a conflict
            (iri("c"), iri("p"), iri("x"), False),
        ],
    )
    bad = find_contradictions(ds.triples)
    lex = (
        bad.join(ds.terms, bad["s"] == ds.terms["term_id"])
        .select("lexical")
        .collect()
    )
    assert [r["lexical"] for r in lex] == ["a"]


def test_predicate_stats_counts(spark):
    ds = build_dataset(
        spark,
        [
            (iri("s1"), iri("p1"), iri("o1")),
            (iri("s1"), iri("p1"), iri("o2")),
            (iri("s1"), iri("p1"), iri("o2")),  # duplicate row still counts
            (iri("s2"), iri("p1"), iri("o1")),
            (iri("s9"), iri("p2"), iri("o9")),
        ],
    )
    out = {
        r["p"]: (r["n_facts"], r["n_subjects"], r["n_objects"], r["max_s_degree"])
        for r in predicate_stats(ds.triples).collect()
    }
    pid = {r["lexical"]: r["term_id"] for r in ds.terms.collect()}
    assert out[pid["p1"]] == (4, 2, 2, 3)
    assert out[pid["p2"]] == (1, 1, 1, 1)


# ------------------------------------------------- repetition / sessions


def test_repetition_features_exact(spark):
    from inferdf_rs_spark.operators.textstats import repetition_features

    docs = spark.createDataFrame(
        [
            (0, "a b a b a"),  # bigrams 4 total / 2 distinct; trigrams 3/2
            (1, "solo"),  # too short for any n-gram
            (2, "x y"),  # 1 bigram, no dup; too short for trigram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["dup2_milli"], r["dup3_milli"]) for r in repetition_features(docs).collect()}
    assert got == {0: (500, 333), 1: (0, 0), 2: (0, 0)}


def test_sessionize_gaps_and_ties(spark):
    import datetime as dt

    from inferdf_rs_spark.operators.sessionize import sessionize

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            (1, 10, at(0)),
            (2, 10, at(100)),
            (3, 10, at(2000)),  # 1900s gap > 900 -> new session
            (4, 10, at(2100)),
            (5, 20, at(0)),  # other user: independent numbering
            (7, 30, at(50)),  # same-ts tie: event_id orders deterministically
            (6, 30, at(50)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r["session_idx"] for r in sessionize(ev, gap_seconds=900).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1}


# ------------------------------------------------------- decontamination


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_threshold_and_partition(spark):
    from inferdf_rs_spark.operators.decontaminate import (
        contamination_hits,
        decontaminate,
    )

    bench = _docs_df(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs_df(
        spark,
        [
            (1, "a quick brown fox ran away"),        # 1 shared 3-gram
            (2, "the quick brown fox jumps high"),    # 3 shared 3-grams
            (3, "entirely unrelated text body here"), # 0
        ],
    )
    hits = {r.doc_id: r.n_hits for r in contamination_hits(corpus, bench, n=3).collect()}
    assert hits == {1: 1, 2: 3}

    # min_hits partitions the corpus: survivors + flagged == corpus
    surv1 = {r.doc_id for r in decontaminate(corpus, bench, n=3, min_hits=1).collect()}
    assert surv1 == {3}
    surv2 = {r.doc_id for r in decontaminate(corpus, bench, n=3, min_hits=2).collect()}
    assert surv2 == {1, 3}


def test_decontaminate_plan_broadcasts_both_sides(spark):
    """The probe join and the final anti-join must both broadcast — the
    corpus side never shuffles."""
    from inferdf_rs_spark.operators.decontaminate import decontaminate

    bench = _docs_df(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs_df(spark, [(1, "alpha beta gamma epsilon"), (2, "zeta eta theta iota")])
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------- k-means / IVF


def test_kmeans_deterministic_and_partitioning(spark):
    from inferdf_rs_spark.operators.clustering import kmeans_assign, kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = kmeans_fit(emb, k=4, iters=2)
    c2 = kmeans_fit(emb, k=4, iters=2)
    assert c1 == c2  # integer-exact Lloyd is bit-reproducible
    a = kmeans_assign(emb, c1)
    rows = a.collect()
    assert len(rows) == emb.count()
    assert {r.cluster for r in rows} <= set(range(4))


def test_ann_ivf_recall_vs_brute_force(spark):
    from inferdf_rs_spark.operators.clustering import ann_ivf, kmeans_fit
    from inferdf_rs_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    centers = kmeans_fit(emb, k=8, iters=2)
    ivf = ann_ivf(emb, centers, qids, k=10, nprobe=2)
    exact = brute_force_topk(emb, qids, k=10)
    ivf_n = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    ex_n = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(ivf_n & ex_n) / len(ex_n)
    # labeled synthetic clusters: 2-probe IVF recovers most exact
    # neighbors (cosine vs L2 ranking differ slightly — bound, not equality)
    assert recall >= 0.7, recall


def test_semantic_dedup_keeps_min_id_rep(spark):
    from inferdf_rs_spark.operators.clustering import kmeans_fit, semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # duplicate vec 7 under a fresh higher id: the copy must drop, 7 stays
    dup = emb.filter(F.col("vec_id") == 7).withColumn("vec_id", F.lit(100000))
    both = emb.unionByName(dup)
    centers = kmeans_fit(emb, k=4, iters=2)
    kept = {r.vec_id for r in semantic_dedup(both, centers, max_dist_milli2=0).collect()}
    assert 7 in kept and 100000 not in kept
    assert kept == {r.vec_id for r in emb.select("vec_id").collect()}


# ------------------------------------------------------- mixture resampling


def test_resample_to_mix_proportions_and_guard(spark):
    import pytest as _pytest

    from inferdf_rs_spark.operators.sampling import resample_to_mix

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = resample_to_mix(docs, {"s0": 2, "s1": 1, "s2": 1}).collect()
    by_src = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # W=4, n_s=1000, T=min(1000*4//2, 1000*4//1)=2000; targets 1000/500/500
    assert by_src["s0"] == 1000  # bottleneck source keeps everything
    for s in ("s1", "s2"):  # hash gate: expected 500, binomial spread
        assert 400 <= by_src[s] <= 600, by_src
    # determinism
    out2 = resample_to_mix(docs, {"s0": 2, "s1": 1, "s2": 1}).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)
    # zero-weight source drops entirely
    none = resample_to_mix(docs, {"s0": 1, "s1": 1, "s2": 0}).collect()
    assert not [r for r in none if r.source == "s2"]
    # unknown source raises instead of silently skewing the mix
    with _pytest.raises(ValueError):
        resample_to_mix(docs, {"s0": 1, "s1": 1})


def test_resample_to_mix_plan_is_broadcast_mapside(spark):
    from inferdf_rs_spark.operators.sampling import resample_to_mix

    docs = spark.createDataFrame([(i, f"s{i % 2}") for i in range(100)], "doc_id long, source string")
    plan = resample_to_mix(docs, {"s0": 1, "s1": 3})._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_prefix_sum_extreme_key_span_no_overflow(spark):
    """ADVICE r5 (low): bucket arithmetic must not overflow for order
    keys spanning nearly the whole int64 range (hash-derived ids) — the
    old (key-lo)*n_buckets product overflowed and broke key-order
    monotonicity of the buckets, silently corrupting the prefix sum."""
    from inferdf_rs_spark.operators.packing import distributed_prefix_sum

    lo, hi = -(2**62) - 7, 2**62 + 11
    keys = sorted([lo, lo + 1, -3, 0, 5, hi - 1, hi, 2**61, -(2**61) + 3])
    rows = [(k, i + 1) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["c"]
        for r in distributed_prefix_sum(df, "k", "v", out_col="c", n_buckets=4).collect()
    }
    run = 0
    expect = {}
    for k, v in rows:
        run += v
        expect[k] = run
    assert out == expect


def test_sessionize_ntz_gap_is_dst_safe(spark):
    """ADVICE r5 (low): NTZ gaps must be computed on the naive value
    itself.  Under a DST-observing session timezone the old
    session-zone cast remapped the nonexistent local hour (spring
    forward), inflating a 15-minute gap to 75 minutes and wrongly
    splitting the session."""
    import datetime as dt

    from inferdf_rs_spark.operators.sessionize import sessionize

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [
            # 02:10 does not exist in America/New_York on 2026-03-08
            (1, 100, dt.datetime(2026, 3, 8, 1, 55, 0)),
            (1, 101, dt.datetime(2026, 3, 8, 2, 10, 0)),
            (1, 102, dt.datetime(2026, 3, 8, 9, 0, 0)),
        ]
        ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz")
        out = {
            r["event_id"]: r["session_idx"]
            for r in sessionize(ev, gap_seconds=900).collect()
        }
        assert out == {100: 1, 101: 1, 102: 2}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_kmeans_family_scales_past_plan_literal_k(spark):
    """VERDICT r5 #1: centroids must not be compiled into the plan — at
    k=1024 the former per-centroid literal-struct expression tree did
    not compile; the broadcast-matrix pandas-UDF assignment must handle
    it, and the plan must NOT grow with k (occupancy, not k, bounds the
    work)."""
    from inferdf_rs_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        semantic_dedup,
    )

    n, dim, k = 2048, 8, 1024
    rows = [(i, [float((i * 7 + j * 13) % 29 - 14) for j in range(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centers = kmeans_fit(emb, k=k, iters=1)
    assert len(centers) == k and all(len(c) == dim for c in centers)

    out = kmeans_assign(emb, centers)
    clusters = [r["cluster"] for r in out.collect()]
    assert len(clusters) == n and all(0 <= c < k for c in clusters)

    # plan size must be k-independent: the former literal expression tree
    # grew by ~k structs; the broadcast path stays flat
    def plan_len(kk):
        cs = centers[:kk]
        return len(
            semantic_dedup(emb, cs, max_dist_milli2=0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    small, large = plan_len(8), plan_len(k)
    assert large < small * 2, (small, large)

    # exact duplicates collapse to the min id even at large k
    dup = spark.createDataFrame(
        [(10_000, rows[0][1]), (10_001, rows[0][1])], "vec_id long, embedding array<float>"
    )
    kept = {
        r["vec_id"]
        for r in semantic_dedup(emb.unionByName(dup), centers, max_dist_milli2=0).collect()
    }
    assert 0 in kept and 10_000 not in kept and 10_001 not in kept


def test_retract_overdelete_action_budget(spark):
    """VERDICT r5 #5 done-criterion: each overdelete round runs at most
    2 driver actions (newly checkpoint + one stats aggregate)."""
    from inferdf_rs_spark import build_dataset, iri
    from inferdf_rs_spark.engine import Dataset, System
    from inferdf_rs_spark.rules import pat, rule, stmt_triple, v

    P = "http://kg/next"
    facts = [(iri(f"n://{i}"), iri(P), iri(f"n://{i+1}")) for i in range(8)]
    ds = build_dataset(spark, facts)
    r = rule(
        variables=3,
        hypothesis=[pat("+", v(0), iri(P), v(1)), pat("+", v(1), iri(P), v(2))],
        statements=[stmt_triple("+", v(0), iri(P), v(2))],
    )
    sysm = System(spark, [r])
    closed = sysm.fixpoint(ds)
    pair = build_dataset(spark, [(iri("n://3"), iri(P), iri("n://4"))])

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    from inferdf_rs_spark.operators.retract import retract as _retract

    # AQE splits one driver action into several Spark jobs (one per
    # materialized query stage) — turn it off so job count == action
    # count for the budget assertion
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        before_jobs = len(tracker.getJobIdsForGroup(None) or [])
        res = _retract(
            spark,
            closed.store,
            closed.terms,
            sysm.rules,
            sysm.const_ids(),
            pair.triples.select("s", "p", "o", "sign"),
        )
        res.store.count()
        after_jobs = len(tracker.getJobIdsForGroup(None) or [])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    # whole-call budget for this fixture: measured 17 jobs with the
    # folded 2-action overdelete rounds vs 23 with the former 4-action
    # rounds — 20 cleanly separates the two
    total_jobs = after_jobs - before_jobs
    assert total_jobs <= 20, f"retract ran {total_jobs} driver jobs (budget 20)"
    res.release()
