"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator family from SURVEY.md §2
(plus the training-data-pipeline operators) to a callable over the
synthetic tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL.
Rule-engine queries run the full engine path: bulk xxhash64 dictionary
encoding → pattern-scan/join cascade → conclusion eval → decode back to
lexical strings, so the oracle validates semantics end-to-end.

Every query has an oracle — including ``ann_lsh``: the LSH pipeline is
deterministic and integer-exact (md5 integer hyperplanes × quantized
embeddings, see operators/similarity.py), so DuckDB regenerates the
plane matrix, codes, Hamming-ball probe and cosine re-rank in SQL.
Being *approximate* (vs exact top-k) is a property of the algorithm,
not of its reproducibility; the recall-vs-exact harness in
tests/test_extensions.py separately guards the semantic quality
(recall ≥ 0.9 @ k=10 against ann_topk).

Float-boundary caveat (ADVICE r3): for the LSH/cosine family
(``ann_lsh``, ``ann_topk``, ``embed_near_dup``, ``cosine_consecutive``)
the *bucketing/candidate* stage is integer-exact, but the final cosine,
its ``floor(cos*1e6)`` micro-quantization, and rank tie-breaks rely on
Spark's codegen'd aggregate fold and DuckDB's ``list_aggregate('sum')``
both folding left-to-right in IEEE double — which they do today (pinned
by the hash matches at sf0.01 since r2/r3).  A last-ulp divergence at a
floor or rank boundary in some future engine version would flake the
value-hash even though the engine is correct; if that ever happens,
compare ``cosine_micro`` with ±1 tolerance and rank via the cosine
ordering rather than strict equality — do not "fix" the engine.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inferdf_rs_spark.pipelines import demo_queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one deduction round of the geo rule over sf0.001 —
    dictionary-encode, conjunctive join, conclude, decode."""
    return Q.q_deduce_geo(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # rule engine (reference parity ops)
        "pattern_scan": Q.q_pattern_scan,
        "pattern_scan_p_bound": Q.q_pattern_scan_p_bound,
        "neg_pattern_scan": Q.q_neg_pattern_scan,
        "nonlinear_self": Q.q_nonlinear_self,
        "conj_join": Q.q_conj_join,
        "deduce_geo": Q.q_deduce_geo,
        "antijoin_new_facts": Q.q_antijoin_new_facts,
        "fixpoint_tc": Q.q_fixpoint_tc,
        # DRed delete-rederive: incremental retraction of a stated edge
        # from the closed chain, vs the oracle's from-scratch closure of
        # the surviving edges
        "retract_tc": Q.q_retract_tc,
        "eq_closure_chain": Q.q_eq_closure_chain,
        # Eq statements end-to-end: rule-emitted Eq → fixpoint side table
        # → closure → merged facet view → AmbiguousLiteral surfacing
        "eq_merge_ambiguity": Q.q_eq_merge_ambiguity,
        # provenance: premise reconstruction from narrow lineage
        # (src/cause.rs Cause/Entailment), one-hop + recursive-to-stated
        "explain_geo": Q.q_explain_geo,
        "explain_tc_support": Q.q_explain_tc_support,
        "validate_missing": Q.q_validate_missing,
        "compare_filter": Q.q_compare_filter,
        "regex_filter": Q.q_regex_filter,
        # dedup family
        "exact_dedup": Q.q_exact_dedup,
        "minhash_sig": Q.q_minhash_sig,
        "lsh_buckets": Q.q_lsh_buckets,
        "near_dup_pairs": Q.q_near_dup_pairs,
        # cluster-level dedup: connected components over the pair graph
        # (reuses the engine's Shiloach-Vishkin eq-closure) + the
        # deduplicated corpus it induces
        "dedup_groups": Q.q_dedup_groups,
        "dedup_corpus": Q.q_dedup_corpus,
        "simhash": Q.q_simhash,
        "ngram_jaccard": Q.q_ngram_jaccard,
        # benchmark decontamination: 3-gram overlap vs the doc_id%97
        # eval split — per-doc hit counts + the surviving corpus
        "decontam_hits": Q.q_decontam_hits,
        "decontam_corpus": Q.q_decontam_corpus,
        # DoReMi-style mixture resampling: exact-integer hash gate
        "resample_mix": Q.q_resample_mix,
        # text analysis
        "token_count": Q.q_token_count,
        "quality": Q.q_quality,
        "lang_id": Q.q_lang_id,
        "fingerprint": Q.q_fingerprint,
        # similarity
        "cosine_consecutive": Q.q_cosine_consecutive,
        "ann_topk": Q.q_ann_topk,
        "ann_lsh": Q.q_ann_lsh,  # deterministic integer LSH — fully oracled
        "ann_lsh_auto": Q.q_ann_lsh_auto,  # corpus-size-derived (planes, tables, probes)
        "embed_near_dup": Q.q_embed_near_dup,  # embedding-cosine dedup
        # k-means family (integer-exact Lloyd): IVF is the classic
        # alternative to LSH bucketing; SemDeDup = semantic dedup
        "kmeans_assign": Q.q_kmeans_assign,
        "ann_ivf": Q.q_ann_ivf,
        "semantic_dedup": Q.q_semantic_dedup,
        # multimodal plumbing (deterministic stub decode — oracled)
        "multimodal_features": Q.q_multimodal_features,
        "multimodal_frames": Q.q_multimodal_frames,
        # pipeline ops (r5): pack assembly, quality gate, PII, sampling,
        # as-of join, signed-store consistency, skew-planner stats
        "pack_sequences": Q.q_pack_sequences,
        "quality_filter": Q.q_quality_filter,
        "pii_redact": Q.q_pii_redact,
        "stratified_sample": Q.q_stratified_sample,
        "topk_per_lang": Q.q_topk_per_lang,
        "events_asof": Q.q_events_asof,
        "contradictions": Q.q_contradictions,
        "predicate_stats": Q.q_predicate_stats,
        "repetition": Q.q_repetition,
        "sessionize": Q.q_sessionize,
        "nt_export": Q.q_nt_export,
    }


# ---------------------------------------------------------------- oracles

# shared DuckDB CTE fragments
_TOKS4 = (
    "toks AS (SELECT doc_id, unnest(list_distinct(list_filter("
    "regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) >= 4))) AS token "
    "FROM documents)"
)

_TS = (
    "ts AS (SELECT doc_id, list_filter("
    "regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks "
    "FROM documents)"
)


def _shingles(k: int) -> str:
    ends = {3: "len(toks)-1", 2: "len(toks)"}[k]
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    return (
        f"sh AS (SELECT doc_id, CASE WHEN len(toks) >= {k} THEN "
        f"list_distinct(list_transform(range(1, {ends}), i -> {parts})) "
        f"ELSE [] END AS shingles FROM ts)"
    )


_MD5INT = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

# PII patterns (operators/textstats.py PII_PATTERNS) — Java/RE2-common
# dialect; kept verbatim-identical on both engines
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_QUALITY_FEATURES_SQL = (
    "SELECT doc_id, len(text) AS n_chars_m, "
    "len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha, "
    "len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit, "
    "len(regexp_replace(text, '[^ ]', '', 'g')) AS n_space, "
    "len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS n_tokens, "
    "CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) > 0 THEN "
    "floor(list_aggregate(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0), t -> len(t)), 'sum') * 1000 / "
    "len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)))::BIGINT ELSE 0 END AS mean_tok_len_milli, "
    "CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) > 0 THEN "
    "floor(len(list_distinct(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0))) * 1000 / "
    "len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)))::BIGINT ELSE 0 END AS distinct_ratio_milli "
    "FROM documents"
)

# minhash j = 32-bit window (j%4) of md5((j//4) || ':' || shingle)
_MINHASH_J = (
    "list_min(list_transform(shingles, g -> "
    "('0x' || substr(md5(({s}) || ':' || g), ({w}) * 8 + 1, 8))::BIGINT))"
)

_SIGS = (
    "sigs AS (SELECT doc_id, list_transform(range(16), j -> "
    + _MINHASH_J.format(s="j // 4", w="j % 4")
    + ") AS sig FROM sh)"
)

_BANDS = (
    "bands AS (SELECT doc_id, band, md5(array_to_string("
    "list_transform(sig[band*4+1:band*4+4], x -> x::VARCHAR), ',')) AS bucket "
    "FROM sigs CROSS JOIN (VALUES (0::BIGINT),(1),(2),(3)) b(band))"
)

# band-collision candidates verified by exact shingle Jaccard — shared by
# near_dup_pairs and the cluster-level queries built on top of it
_PAIRS_CTES = (
    f"{_TS}, {_shingles(3)}, {_SIGS}, {_BANDS}, "
    "cands AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket "
    "AND a.doc_id < b.doc_id), "
    "ver AS (SELECT id_a, id_b, "
    "len(list_intersect(sa.shingles, sb.shingles))::DOUBLE / "
    "len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS j "
    "FROM cands JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)"
)

# connected components over the verified pairs via recursive min-label
# propagation: the component minimum seeds at its own row and flows along
# the symmetrized edges to every reachable member; min() per node at the
# fixpoint = the component's canonical id (= eq_closure's output)
_COMP_CTES = (
    "WITH RECURSIVE " + _PAIRS_CTES + ", "
    "edges AS (SELECT id_a AS x, id_b AS y FROM ver WHERE j >= 0.8 "
    "UNION SELECT id_b, id_a FROM ver WHERE j >= 0.8), "
    "lbl(x, rep) AS (SELECT x, least(x, min(y)) FROM edges GROUP BY x "
    "UNION SELECT e.x, l.rep FROM edges e JOIN lbl l ON l.x = e.y), "
    "comp AS (SELECT x AS doc_id, min(rep) AS rep_id FROM lbl GROUP BY x) "
)


# k-means oracle fragments (operators/clustering.py): two Lloyd
# iterations in exact milli-int arithmetic — quantize, assign by
# (distance, centroid-index), update centroids as floor(sum/count)
# (exact: |sum| << 2^53 and non-integer quotients sit >= 1/count from an
# integer), with emptied clusters keeping their previous centroid.
# a3/c2 = final assignment / final centroids, shared by kmeans_assign,
# ann_ivf and semantic_dedup.
_KM_DIST = (
    "list_sum(list_transform(range(1, len({v})+1), "
    "i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"
)


def _km_assign(name: str, centers: str) -> str:
    d = _KM_DIST.format(v="mv.v", c=f"{centers}.ctr")
    return (
        f"{name} AS (SELECT vec_id, v, c AS cl FROM ("
        f"SELECT mv.vec_id, mv.v, {centers}.c, "
        f"row_number() OVER (PARTITION BY mv.vec_id ORDER BY {d}, {centers}.c) AS rn "
        f"FROM mv, {centers}) WHERE rn = 1)"
    )


def _km_update(aname: str, prev: str, out: str) -> str:
    return (
        f"{out}_s AS (SELECT cl, pos, CAST(floor(sum(val)::DOUBLE / count(*)) AS BIGINT) AS cv "
        f"FROM (SELECT cl, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM {aname}) "
        f"GROUP BY cl, pos), "
        f"{out} AS (SELECT p.c, COALESCE(n.ctr, p.ctr) AS ctr FROM {prev} p LEFT JOIN "
        f"(SELECT cl AS c, list(cv ORDER BY pos) AS ctr FROM {out}_s GROUP BY cl) n USING (c))"
    )


_KMEANS_CTES = ", ".join(
    [
        "mv AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS v FROM embeddings)",
        "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v AS ctr "
        "FROM (SELECT vec_id, v FROM mv ORDER BY vec_id LIMIT 8))",
        _km_assign("a1", "c0"),
        _km_update("a1", "c0", "c1"),
        _km_assign("a2", "c1"),
        _km_update("a2", "c1", "c2"),
        _km_assign("a3", "c2"),
    ]
)


# ann_lsh oracle fragments: regenerate the integer hyperplane matrix
# (md5 first-4-bytes, centered — operators/similarity.py _hyperplanes),
# assign per-table sign codes over 2^20-quantized embeddings in exact
# int64 arithmetic, then probe the Hamming-≤2 ball (= the multi-probe
# mask expansion) and re-rank candidates by exact cosine.
_LSH_N_TABLES = 8
_LSH_N_PLANES = 8

# ann_lsh_auto oracle parameters: derived from the engine's own model at
# the driver gate's corpus size (sf0.01 ⇒ 500 embeddings), so the oracle
# can never silently diverge from auto_lsh_params defaults
from inferdf_rs_spark.operators.similarity import auto_lsh_params as _auto_lsh_params  # noqa: E402

_AUTO_PLANES, _AUTO_TABLES, _AUTO_PROBES = _auto_lsh_params(500)
assert (_AUTO_PLANES, _AUTO_TABLES, _AUTO_PROBES) == (4, 8, 3), (
    "auto_lsh_params defaults drifted — regenerate the ann_lsh_auto oracle "
    f"for {(_AUTO_PLANES, _AUTO_TABLES, _AUTO_PROBES)}"
)
_LSH_DIM = 64


def _lsh_planes(n_tables: int, n_planes: int) -> str:
    return (
        "pl AS (SELECT t, p, list(w ORDER BY d) AS wl FROM ("
        "SELECT tt.t, pp.p, dd.d, "
        "(('0x' || substr(md5('plane:' || tt.t || ':' || pp.p || ':' || dd.d), 1, 8))::BIGINT"
        " - 2147483648) AS w "
        f"FROM (SELECT unnest(range({n_tables})) AS t) tt, "
        f"(SELECT unnest(range({n_planes})) AS p) pp, "
        f"(SELECT unnest(range({_LSH_DIM})) AS d) dd) GROUP BY t, p)"
    )


_LSH_PLANES = _lsh_planes(_LSH_N_TABLES, _LSH_N_PLANES)

_LSH_CODES = (
    "eq AS (SELECT vec_id, list_transform(embedding, x -> "
    "floor(x::DOUBLE * 1048576)::BIGINT) AS q FROM embeddings), "
    "codes AS (SELECT eq.vec_id, pl.t, sum(CASE WHEN "
    f"list_aggregate(list_transform(range(1, {_LSH_DIM + 1}), i -> eq.q[i] * pl.wl[i]), 'sum')"
    " > 0 THEN (1::BIGINT << pl.p) ELSE 0 END)::BIGINT AS code "
    "FROM eq CROSS JOIN pl GROUP BY eq.vec_id, pl.t)"
)


def _ann_lsh_sql(n_tables: int, n_planes: int, hamming: int) -> str:
    """The full ANN-LSH oracle at a given parameterization (the probe
    expansion is equivalent to a Hamming-ball join on the codes)."""
    return (
        f"WITH {_lsh_planes(n_tables, n_planes)}, {_LSH_CODES}, "
        "qc AS (SELECT vec_id AS query_id, t, code FROM codes WHERE vec_id IN (0,1,2,3,4)), "
        "cands AS (SELECT DISTINCT qc.query_id, c.vec_id AS neighbor_id "
        f"FROM codes c JOIN qc ON c.t = qc.t AND bit_count(xor(c.code, qc.code)) <= {hamming} "
        "WHERE c.vec_id <> qc.query_id), "
        "scored AS (SELECT cands.query_id, cands.neighbor_id, "
        + _cos("qe.embedding", "ne.embedding")
        + " AS cos FROM cands "
        "JOIN embeddings qe ON qe.vec_id = cands.query_id "
        "JOIN embeddings ne ON ne.vec_id = cands.neighbor_id), "
        "r2 AS (SELECT query_id, neighbor_id, cos, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) "
        "SELECT query_id, neighbor_id, rank, floor(cos * 1000000)::BIGINT AS cosine_micro "
        "FROM r2 WHERE rank <= 10"
    )


def _dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')"
    )


def _cos(a: str, b: str) -> str:
    return f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"


def oracle_sql() -> dict[str, str]:
    simhash_sums = ", ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}" for b in range(16)
    )
    simhash_bits = " + ".join(f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(16))

    return {
        "pattern_scan": f"WITH {_TOKS4} "
        "SELECT 'doc://' || doc_id AS doc_iri FROM toks WHERE token = 'data'",
        "pattern_scan_p_bound": "SELECT DISTINCT 'res://' || l_partkey AS s_iri, "
        "'res://' || l_suppkey AS o_iri FROM lineitem",
        "neg_pattern_scan": "SELECT 'order://' || o_orderkey AS order_iri "
        "FROM orders WHERE o_orderstatus <> 'O'",
        "eq_closure_chain": "SELECT n_nationkey::BIGINT AS term_id, "
        "(SELECT min(n_nationkey) FROM nation)::BIGINT AS res FROM nation",
        # Eq-merge flow: odd custkeys equate two DIFFERENT decimals
        # (v, v+1000000) → AmbiguousLiteral; even custkeys self-merge
        # (single facet) and must emit nothing
        "eq_merge_ambiguity": "SELECT c_custkey::BIGINT AS val_lo, "
        "(c_custkey + 1000000)::BIGINT AS val_hi FROM customer "
        "WHERE c_custkey % 2 = 1",
        # validation: no locatedIn facts are stated, so every deduced
        # conclusion is a MissingTriple violation == the deduction itself
        "validate_missing": "SELECT 'cust://' || c_custkey AS cust_iri, "
        "'region://' || n_regionkey AS region_iri "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey",
        "nonlinear_self": "SELECT DISTINCT 'res://' || l_partkey AS res_iri FROM lineitem "
        "WHERE l_partkey = l_suppkey",
        "conj_join": f"WITH {_TOKS4} "
        "SELECT 'doc://' || doc_id AS doc_iri FROM toks WHERE token = 'data' "
        "INTERSECT SELECT 'doc://' || doc_id FROM toks WHERE token = 'batch'",
        "deduce_geo": "SELECT 'cust://' || c_custkey AS cust_iri, "
        "'region://' || n_regionkey AS region_iri "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey",
        "antijoin_new_facts": "SELECT 'cust://' || c_custkey AS cust_iri, "
        "'region://' || n_regionkey AS region_iri "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "WHERE c_custkey % 10 <> 0",
        "fixpoint_tc": "WITH RECURSIVE e(a, b) AS ("
        "SELECT n_nationkey, n_nationkey + 1 FROM nation "
        "WHERE n_nationkey < (SELECT max(n_nationkey) FROM nation)), "
        "tc(a, b) AS (SELECT a, b FROM e "
        "UNION SELECT tc.a, e.b FROM tc JOIN e ON tc.b = e.a) "
        "SELECT 'n://' || a AS a_iri, 'n://' || b AS b_iri FROM tc",
        # retraction == from-scratch closure of the edges minus (12, 13)
        "retract_tc": "WITH RECURSIVE e(a, b) AS ("
        "SELECT n_nationkey, n_nationkey + 1 FROM nation "
        "WHERE n_nationkey < (SELECT max(n_nationkey) FROM nation) "
        "AND n_nationkey <> 12), "
        "tc(a, b) AS (SELECT a, b FROM e "
        "UNION SELECT tc.a, e.b FROM tc JOIN e ON tc.b = e.a) "
        "SELECT 'n://' || a AS a_iri, 'n://' || b AS b_iri FROM tc",
        # one-hop provenance: each deduced locatedIn fact has exactly one
        # derivation (customer->nation->region are functional), so the
        # winning substitution — and both reconstructed premises — are
        # deterministic
        "explain_geo": "SELECT 'cust://' || c_custkey AS cust_iri, "
        "'region://' || n_regionkey AS region_iri, 0 AS hyp_idx, "
        "'cust://' || c_custkey AS prem_s_iri, "
        "'nation://' || c_nationkey AS prem_o_iri "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "UNION ALL "
        "SELECT 'cust://' || c_custkey, 'region://' || n_regionkey, 1, "
        "'nation://' || c_nationkey, 'region://' || n_regionkey "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey",
        # recursive provenance to stated leaves: ANY derivation of chain
        # fact (a, b) under the doubling rule bottoms out on exactly the
        # stated edges in [a, b], so the support set is winner-independent
        # even though the stored lineage keeps one min-struct derivation
        "explain_tc_support": "WITH RECURSIVE e(a, b) AS ("
        "SELECT n_nationkey, n_nationkey + 1 FROM nation "
        "WHERE n_nationkey < (SELECT max(n_nationkey) FROM nation)), "
        "tc(a, b) AS (SELECT a, b FROM e "
        "UNION SELECT tc.a, e.b FROM tc JOIN e ON tc.b = e.a) "
        "SELECT 'n://' || t.a AS a_iri, 'n://' || t.b AS b_iri, "
        "'n://' || e.a AS leaf_a_iri, 'n://' || e.b AS leaf_b_iri "
        "FROM tc t JOIN e ON e.a >= t.a AND e.b <= t.b "
        "WHERE t.b > t.a + 1",
        "compare_filter": "SELECT 'doc://' || doc_id AS doc_iri FROM documents "
        "WHERE n_chars >= 300",
        "regex_filter": f"WITH {_TOKS4} "
        "SELECT DISTINCT 'doc://' || doc_id AS doc_iri FROM toks "
        "WHERE regexp_matches(token, '^me[a-z]*$')",
        # ----- dedup
        "exact_dedup": "SELECT doc_id, md5(text) AS dup_key, "
        "count(*) OVER (PARTITION BY md5(text)) AS group_size, "
        "(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)) = 1 AS keep "
        "FROM documents",
        "minhash_sig": f"WITH {_TS}, {_shingles(3)} "
        "SELECT doc_id, h.h_idx, "
        + _MINHASH_J.format(s="h.h_idx // 4", w="h.h_idx % 4")
        + " AS minhash FROM sh CROSS JOIN (SELECT unnest(range(16)) AS h_idx) h",
        "lsh_buckets": f"WITH {_TS}, {_shingles(3)}, {_SIGS}, {_BANDS} "
        "SELECT doc_id, band, bucket FROM bands",
        "near_dup_pairs": f"WITH {_PAIRS_CTES} "
        "SELECT id_a, id_b, floor(j * 1000000)::BIGINT AS jaccard_micro "
        "FROM ver WHERE j >= 0.8",
        "dedup_groups": _COMP_CTES
        + "SELECT doc_id, rep_id, "
        "count(*) OVER (PARTITION BY rep_id) AS cluster_size FROM comp",
        "dedup_corpus": _COMP_CTES
        + "SELECT doc_id, n_chars FROM documents WHERE doc_id NOT IN "
        "(SELECT doc_id FROM comp WHERE doc_id != rep_id)",
        "simhash": f"WITH {_TS}, "
        "tok AS (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM ts), "
        "h AS (SELECT doc_id, " + _MD5INT.format(x="t") + " AS hv FROM tok), "
        f"per AS (SELECT doc_id, {simhash_sums} FROM h GROUP BY doc_id) "
        f"SELECT doc_id, ({simhash_bits})::BIGINT AS simhash FROM per",
        "ngram_jaccard": f"WITH {_TS}, {_shingles(2)} "
        "SELECT a.doc_id, floor("
        "len(list_intersect(a.shingles, b.shingles))::DOUBLE / "
        "len(list_distinct(list_concat(a.shingles, b.shingles))) * 1000000)::BIGINT "
        "AS jaccard_micro "
        "FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 "
        "WHERE len(list_distinct(list_concat(a.shingles, b.shingles))) > 0",
        # benchmark decontamination (operators/decontaminate.py): shingle
        # dedup inside a doc makes count(*) the distinct-hit count
        "decontam_hits": f"WITH {_TS}, {_shingles(3)}, "
        "bg AS (SELECT DISTINCT unnest(shingles) AS gram FROM sh "
        "WHERE doc_id % 97 = 0), "
        "cg AS (SELECT doc_id, unnest(shingles) AS gram FROM sh "
        "WHERE doc_id % 97 <> 0) "
        "SELECT doc_id, count(*)::BIGINT AS n_hits "
        "FROM cg JOIN bg USING (gram) GROUP BY doc_id",
        "decontam_corpus": f"WITH {_TS}, {_shingles(3)}, "
        "bg AS (SELECT DISTINCT unnest(shingles) AS gram FROM sh "
        "WHERE doc_id % 97 = 0), "
        "cg AS (SELECT doc_id, unnest(shingles) AS gram FROM sh "
        "WHERE doc_id % 97 <> 0) "
        "SELECT doc_id FROM documents WHERE doc_id % 97 <> 0 "
        "AND doc_id NOT IN (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram))",
        # mixture resampling (operators/sampling.py resample_to_mix):
        # same exact-integer plan arithmetic — W = sum of weights,
        # T = min_s floor(n_s*W/w_s), keep when h % (W*n_s) < w_s*T
        "resample_mix": "WITH c AS (SELECT source, count(*) AS n, "
        "(CAST(substr(source, 4) AS INT) % 4) + 1 AS w "
        "FROM documents GROUP BY source), "
        "t1 AS (SELECT sum(w)::BIGINT AS tot FROM c), "
        "t AS (SELECT tot, (SELECT min(n * t1.tot // w) FROM c)::BIGINT AS cap "
        "FROM t1) "
        "SELECT d.doc_id, d.source FROM documents d JOIN c USING (source), t "
        "WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT "
        "% (t.tot * c.n) < c.w * t.cap",
        # ----- text analysis
        "token_count": f"WITH {_TS} SELECT doc_id, len(toks) AS n_tokens FROM ts",
        "quality": _QUALITY_FEATURES_SQL,
        "lang_id": f"WITH {_TS}, "
        "c AS (SELECT doc_id, "
        "len(list_filter(toks, x -> list_contains(['der','die','und','das','ein','ist'], x))) AS de, "
        "len(list_filter(toks, x -> list_contains(['the','and','of','to','a','is'], x))) AS en, "
        "len(list_filter(toks, x -> list_contains(['el','la','los','que','un','es'], x))) AS es, "
        "len(list_filter(toks, x -> list_contains(['le','la','et','les','des','un'], x))) AS fr "
        "FROM ts) "
        "SELECT doc_id, CASE WHEN de >= en AND de >= es AND de >= fr THEN 'de' "
        "WHEN en >= es AND en >= fr THEN 'en' WHEN es >= fr THEN 'es' ELSE 'fr' END AS pred_lang, "
        "greatest(de, en, es, fr)::BIGINT AS marker_hits FROM c",
        "fingerprint": "SELECT doc_id, "
        "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint FROM documents",
        # ----- similarity
        "cosine_consecutive": "SELECT a.vec_id, "
        "floor(" + _cos("a.embedding", "b.embedding") + " * 1000000)::BIGINT AS cosine_micro "
        "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1",
        "ann_topk": "WITH q AS (SELECT vec_id AS query_id, embedding AS qvec "
        "FROM embeddings WHERE vec_id IN (0,1,2,3,4)), "
        "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        + _cos("q.qvec", "e.embedding")
        + " AS cos FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id), "
        "r AS (SELECT query_id, neighbor_id, cos, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM scored) "
        "SELECT query_id, neighbor_id, rank, floor(cos * 1000000)::BIGINT AS cosine_micro "
        "FROM r WHERE rank <= 10",
        "embed_near_dup": f"WITH {_LSH_PLANES}, {_LSH_CODES}, "
        "cands AS (SELECT DISTINCT c1.vec_id AS id_a, c2.vec_id AS id_b "
        "FROM codes c1 JOIN codes c2 ON c1.t = c2.t AND c1.code = c2.code "
        "AND c1.vec_id < c2.vec_id), "
        "ver AS (SELECT id_a, id_b, "
        + _cos("qa.embedding", "qb.embedding")
        + " AS cos FROM cands "
        "JOIN embeddings qa ON qa.vec_id = id_a "
        "JOIN embeddings qb ON qb.vec_id = id_b) "
        "SELECT id_a, id_b, floor(cos * 1000000)::BIGINT AS cosine_micro "
        "FROM ver WHERE cos >= 0.4",
        # ----- k-means family: shared a3 (assignments) / c2 (centroids)
        "kmeans_assign": f"WITH {_KMEANS_CTES} "
        "SELECT vec_id, cl::INT AS cluster FROM a3",
        "ann_ivf": f"WITH {_KMEANS_CTES}, "
        "qp AS (SELECT query_id, qvec, c AS cluster FROM ("
        "SELECT q.vec_id AS query_id, q.v AS qvec, c2.c, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _KM_DIST.format(v="q.v", c="c2.ctr")
        + ", c2.c) AS rn "
        "FROM (SELECT vec_id, v FROM a3 WHERE vec_id IN (0,1,2,3,4)) q, c2) "
        "WHERE rn <= 2), "
        "cand AS (SELECT qp.query_id, a3.vec_id AS neighbor_id, "
        + _KM_DIST.format(v="a3.v", c="qp.qvec")
        + "::BIGINT AS d "
        "FROM qp JOIN a3 ON a3.cl = qp.cluster AND a3.vec_id <> qp.query_id) "
        "SELECT query_id, neighbor_id, rank, d AS dist_milli2 FROM ("
        "SELECT query_id, neighbor_id, d, row_number() OVER ("
        "PARTITION BY query_id ORDER BY d, neighbor_id) AS rank FROM cand) "
        "WHERE rank <= 10",
        "semantic_dedup": f"WITH {_KMEANS_CTES}, "
        "dropped AS (SELECT DISTINCT a.vec_id FROM a3 a JOIN a3 b "
        "ON a.cl = b.cl AND b.vec_id < a.vec_id AND "
        + _KM_DIST.format(v="a.v", c="b.v")
        + " <= 1400000) "
        "SELECT vec_id FROM a3 WHERE vec_id NOT IN (SELECT vec_id FROM dropped)",
        "ann_lsh": _ann_lsh_sql(_LSH_N_TABLES, _LSH_N_PLANES, hamming=2),
        # the auto oracle derives its parameterization from the SAME
        # model call the engine makes at the sf0.01 gate (n=500
        # embeddings ⇒ planes lo-clamp 4, tables 8, probes 3 ⇒
        # Hamming-≤2 ball) — parameter drift in auto_lsh_params fails
        # loudly here instead of reading as an engine hash mismatch
        "ann_lsh_auto": _ann_lsh_sql(
            _AUTO_TABLES, _AUTO_PLANES, hamming=_AUTO_PROBES - 1
        ),
        # ----- multimodal (stub decode is deterministic md5 math — fully
        # oracle-expressible; payload is the utf-8 bytes of text, so
        # DuckDB's md5/strlen over the VARCHAR see identical bytes)
        "multimodal_features": "WITH m AS (SELECT doc_id AS media_id, "
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
        "strlen(text)::BIGINT AS n_bytes, md5(text) AS h FROM documents) "
        "SELECT media_id, kind, n_bytes, i AS feat_idx, "
        "('0x' || substr(h, (i * 4 + 1)::INT, 4))::BIGINT AS feat_u16 "
        "FROM m CROSS JOIN (SELECT unnest(range(8)) AS i) r",
        "multimodal_frames": "SELECT doc_id AS media_id, i AS frame_idx, "
        "(i * 1000) AS ts_ms, md5(text || i::VARCHAR) AS frame_digest "
        "FROM documents CROSS JOIN (SELECT unnest(range(3)) AS i) r "
        "WHERE doc_id % 3 = 2",
        # ----- pipeline ops (r5)
        "pack_sequences": f"WITH {_TS}, "
        "c AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM ts) "
        "SELECT doc_id, n_tokens, "
        "CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens, "
        "greatest(0, floor((cum_tokens - 1) / 200))::BIGINT AS pack_id FROM c",
        "quality_filter": "WITH f AS (" + _QUALITY_FEATURES_SQL + "), "
        "r AS (SELECT doc_id, ("
        "CASE WHEN n_tokens < 5 THEN 1 ELSE 0 END "
        "+ CASE WHEN n_tokens > 1000000 THEN 2 ELSE 0 END "
        "+ CASE WHEN mean_tok_len_milli < 2000 OR mean_tok_len_milli > 12000 THEN 4 ELSE 0 END "
        "+ CASE WHEN (CASE WHEN n_chars_m > 0 THEN floor(n_alpha * 1000 / n_chars_m) ELSE 0 END) < 500 THEN 8 ELSE 0 END "
        "+ CASE WHEN distinct_ratio_milli < 200 THEN 16 ELSE 0 END)::BIGINT AS reasons FROM f) "
        "SELECT doc_id, reasons, reasons = 0 AS keep FROM r",
        "pii_redact": "WITH seeded AS (SELECT doc_id, text || "
        "(CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com now' "
        "WHEN doc_id % 3 = 1 THEN ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-1234 today' "
        "ELSE ' host 10.0.' || (doc_id % 256) || '.7 up' END) AS text FROM documents) "
        "SELECT doc_id, "
        f"regexp_replace(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{_PII_PHONE}', '<PHONE>', 'g'), '{_PII_IPV4}', '<IPV4>', 'g') AS clean_text, "
        f"len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_email, "
        f"len(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phone, "
        f"len(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT AS n_ipv4 "
        "FROM seeded",
        "stratified_sample": "SELECT doc_id, lang FROM documents WHERE "
        + _MD5INT.format(x="doc_id::VARCHAR")
        + " % 100 < (CASE lang WHEN 'en' THEN 25 WHEN 'fr' THEN 80 "
        "WHEN 'de' THEN 55 WHEN 'es' THEN 10 ELSE 0 END)",
        "topk_per_lang": "WITH r AS (SELECT lang, doc_id, n_chars, "
        "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank "
        "FROM documents) SELECT lang, doc_id, n_chars, rank FROM r WHERE rank <= 5",
        # DuckDB ASOF JOIN matches the operator's inclusive
        # right.ts <= left.ts semantics (ties: (user_id, ts) is unique
        # in the fixture — asserted by tests/test_extensions.py)
        "events_asof": "WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'), "
        "errors AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error') "
        "SELECT c.event_id AS click_id, e.event_id AS err_id, e.value AS err_value "
        "FROM clicks c ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND e.ts <= c.ts",
        "contradictions": "SELECT 'order://' || o_orderkey AS order_iri "
        "FROM orders WHERE (o_orderstatus = 'O') <> (o_orderpriority LIKE '1-%')",
        "predicate_stats": "WITH pairs AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem), "
        "deg AS (SELECT pk, count(*)::BIGINT AS d FROM pairs GROUP BY pk) "
        "SELECT (SELECT sum(d) FROM deg)::BIGINT AS n_facts, "
        "(SELECT count(*) FROM deg)::BIGINT AS n_subjects, "
        "(SELECT count(DISTINCT sk) FROM pairs)::BIGINT AS n_objects, "
        "(SELECT max(d) FROM deg)::BIGINT AS max_s_degree, "
        "'kg:rel' AS p_iri",
        "repetition": f"WITH {_TS}, g AS (SELECT doc_id, toks, "
        "CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS g2, "
        "CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [] END AS g3 "
        "FROM ts) SELECT doc_id, "
        "CASE WHEN len(toks) >= 2 THEN floor((len(g2) - len(list_distinct(g2))) * 1000 / len(g2))::BIGINT ELSE 0 END AS dup2_milli, "
        "CASE WHEN len(toks) >= 3 THEN floor((len(g3) - len(list_distinct(g3))) * 1000 / len(g3))::BIGINT ELSE 0 END AS dup3_milli "
        "FROM g",
        "sessionize": "WITH o AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events), "
        "f AS (SELECT event_id, user_id, ts, "
        "CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 900000000 THEN 1 ELSE 0 END AS ns "
        "FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT event_id, user_id, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM f",
        "nt_export": "SELECT '<cust://' || c_custkey || '> <kg:from> <nation://' || c_nationkey || '> .' AS line FROM customer "
        "UNION ALL SELECT '<nation://' || n_nationkey || '> <kg:in> <region://' || n_regionkey || '> .' FROM nation",
    }
