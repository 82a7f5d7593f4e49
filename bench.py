"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Variance control (round 5): each query gets ONE untimed warmup pass
(JIT + shuffle-service + fixture-encode first-touch) followed by
``SPARK_GRAFT_BENCH_REPS`` timed passes (default 3).  ``queries``
reports the per-query MEDIAN; ``spread`` reports [min, max] so a
reader can tell a real regression from run-to-run noise.  Set
``SPARK_GRAFT_BENCH_REPS=1`` to reproduce the old single-shot harness.

Every pass is forced through the noop sink (full computation, no
column-pruned shortcut counts).  ``docs_per_sec`` reports extraction+
pipeline throughput on the documents table (the north-star unit).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inferdf_rs_spark.pipelines import demo_queries as Q  # noqa: E402
from inferdf_rs_spark.session import get_spark  # noqa: E402

HEADLINE = [
    ("pattern_scan", Q.q_pattern_scan),
    ("neg_pattern_scan", Q.q_neg_pattern_scan),
    ("conj_join", Q.q_conj_join),
    ("deduce_geo", Q.q_deduce_geo),
    ("antijoin_new_facts", Q.q_antijoin_new_facts),
    ("fixpoint_tc", Q.q_fixpoint_tc),
    ("retract_tc", Q.q_retract_tc),
    ("eq_closure_chain", Q.q_eq_closure_chain),
    ("explain_tc_support", Q.q_explain_tc_support),
    ("eq_merge_ambiguity", Q.q_eq_merge_ambiguity),
    ("validate_missing", Q.q_validate_missing),
    ("compare_filter", Q.q_compare_filter),
    ("regex_filter", Q.q_regex_filter),
    ("exact_dedup", Q.q_exact_dedup),
    ("near_dup_pairs", Q.q_near_dup_pairs),
    ("dedup_groups", Q.q_dedup_groups),
    ("simhash", Q.q_simhash),
    ("token_count", Q.q_token_count),
    ("lang_id", Q.q_lang_id),
    ("ann_topk", Q.q_ann_topk),
    ("ann_lsh", Q.q_ann_lsh),
    ("ann_lsh_auto", Q.q_ann_lsh_auto),
    ("embed_near_dup", Q.q_embed_near_dup),
    ("ann_ivf", Q.q_ann_ivf),
    ("semantic_dedup", Q.q_semantic_dedup),
    ("multimodal_features", Q.q_multimodal_features),
    # r5 pipeline ops (docs/sec denominator stays the r4 8-query set so
    # the throughput metric remains comparable across rounds)
    ("decontam_corpus", Q.q_decontam_corpus),
    ("pack_sequences", Q.q_pack_sequences),
    ("quality_filter", Q.q_quality_filter),
    ("resample_mix", Q.q_resample_mix),
    ("pii_redact", Q.q_pii_redact),
    ("events_asof", Q.q_events_asof),
    ("contradictions", Q.q_contradictions),
    ("predicate_stats", Q.q_predicate_stats),
]


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark(app_name="inferdf_bench")

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    per_query: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, fn in HEADLINE:
        if reps > 1:
            run_noop(fn(spark, sf_dir))  # warmup, untimed
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_noop(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 3)
        spread[name] = [round(min(times), 3), round(max(times), 3)]
    total = sum(per_query.values())

    # docs/sec over the document-centric pipeline stages (extraction-side
    # ops: dedup + text stats + mentions-KG build+scan)
    doc_queries = [
        "pattern_scan",
        "conj_join",
        "exact_dedup",
        "near_dup_pairs",
        "simhash",
        "token_count",
        "lang_id",
        "multimodal_features",
    ]
    doc_sec = sum(per_query[q] for q in doc_queries)
    docs_per_sec = round(n_docs * len(doc_queries) / doc_sec, 1) if doc_sec else None

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "spread": spread,
                "reps": reps,
                "warmup": 1 if reps > 1 else 0,
                "sf": float(sf),
                "n_docs": n_docs,
                "docs_per_sec": docs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
