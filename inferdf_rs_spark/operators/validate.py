"""Validation: deduce one round, then check every concluded statement holds.

Reference: ``Rule::validate`` / ``System::validate``
(src/rule/mod.rs:110-158,210-237; src/system/mod.rs:188-265) and the
per-statement checks in ``Deductions::try_validate``
(src/system/deduction.rs:90-168):

- Triple  ⇒ must be contained (signed) in the dataset → MissingTriple
- Eq(a,b) ⇒ Positive: ids equal (NotEq) / Negative: differ (NotNe)
- True(r) ⇒ resource must carry an xsd:boolean literal equal to the
  sign (NotTrue/NotFalse); malformed boolean literal ⇒ InvalidLiteral

The reference short-circuits at the first violation; Spark finds **all**
violations in one pass — same validity verdict, a superset of diagnostics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caches import CheckpointTracker, unpersist_rdd_ids
from ..rules import Rule
from ..schemas import (
    ERR_INVALID_LITERAL,
    KIND_LITERAL,
    TRIPLE_KEY,
    VT_ANY,
    VT_BOOL,
    XSD_BOOLEAN,
)
from ..terms import resource_facets
from .conclude import conclude, merge_concluded
from .fixpoint import ExpressionError
from .match import find_substitutions

# reason_kind codes (reference Reason, src/lib.rs:188-206)
REASON_MISSING_TRIPLE = 0
REASON_NOT_EQ = 1
REASON_NOT_NE = 2
REASON_NOT_TRUE = 3
REASON_NOT_FALSE = 4

VIOLATIONS_SCHEMA = (
    "reason_kind int, s bigint, p bigint, o bigint, sign boolean, a bigint, b bigint, "
    "res bigint, rule_id bigint, subst_hash bigint"
)


@dataclass
class ValidationResult:
    violations: DataFrame
    # localCheckpoint blocks backing the per-rule substitutions the
    # violations DataFrame reads — release() once done with the result
    cache_ids: set = field(default_factory=set)
    # memoized validity probe: the violation joins are cheap reads over
    # the checkpointed substitutions, but a caller alternating
    # is_valid()/violations actions shouldn't pay them per call
    _is_valid: bool | None = field(default=None, repr=False)

    def is_valid(self) -> bool:
        if self._is_valid is None:
            self._is_valid = not self.violations.limit(1).collect()
        return self._is_valid

    def release(self, blocking: bool = False) -> None:
        """Free the cached substitutions (``violations`` becomes
        unusable afterwards — lineage is truncated)."""
        unpersist_rdd_ids(self.violations.sparkSession, self.cache_ids, blocking)
        self.cache_ids = set()


def boolean_facets(terms: DataFrame) -> DataFrame:
    """Per-resource xsd:boolean literal summary for the True check (V4).

    The reference scans *all* literals of the resource, considering only
    xsd:boolean-typed ones; a malformed boolean lexical is an
    InvalidLiteral error (src/system/deduction.rs:132-162)."""
    b = F.when(F.col("lexical").isin("true", "1"), F.lit(True)).when(
        F.col("lexical").isin("false", "0"), F.lit(False)
    )
    return (
        terms.filter((F.col("kind") == KIND_LITERAL) & (F.col("datatype") == XSD_BOOLEAN))
        .select(F.col("term_id").alias("bres"), b.alias("bb"))
        .groupBy("bres")
        .agg(
            F.max(F.col("bb") == True).alias("has_true"),  # noqa: E712
            F.max(F.col("bb") == False).alias("has_false"),  # noqa: E712
            F.max(F.col("bb").isNull()).alias("parse_err"),
        )
    )


def find_contradictions(store: DataFrame) -> DataFrame:
    """Signed-store consistency probe: triples asserted BOTH positive
    and negative.

    The reference's signed model (``Signed<Quad>``, src/sign.rs:17,
    src/dataset.rs:14-20) permits a store to hold (t, +) and (t, −)
    simultaneously — nothing in insertion prevents it, and the False
    statement check (src/system/deduction.rs:125-131) only surfaces a
    conflict when a rule asks.  This operator surfaces ALL of them in
    one pass: a self-semi-join on the triple key across the sign split.
    One hash shuffle on (s, p, o); at 10^12 facts the aggregate form
    (groupBy key, collect both signs) beats the join form — Catalyst's
    map-side partial aggregation halves the exchange."""
    return (
        store.groupBy("s", "p", "o")
        .agg(
            F.max(F.col("sign") == True).alias("_pos"),  # noqa: E712
            F.max(F.col("sign") == False).alias("_neg"),  # noqa: E712
        )
        .filter(F.col("_pos") & F.col("_neg"))
        .select("s", "p", "o")
    )


def validate(
    spark: SparkSession,
    store: DataFrame,
    terms: DataFrame,
    rules: list[Rule],
    const_ids: dict,
    functions: dict | None = None,
    p_buckets: int | None = None,
) -> ValidationResult:
    """One full deduction round routed into the three violation checks.

    The per-rule substitution sets are localCheckpointed: the hypothesis
    join cascade over the store — the expensive part of the round — runs
    ONCE per rule, and both the error probe below and the caller's later
    ``violations`` action read the cached bindings instead of each
    recomputing the deduction (the probe + violations previously cost
    2-3 full rounds).  ``p_buckets`` enables predicate-bucket partition
    pruning on a materialized store (see ``match.scan_pattern``).
    """
    facets = resource_facets(terms)
    tracker = CheckpointTracker(spark)
    batches = []
    for idx, rule in enumerate(rules):
        subst = find_substitutions(store, rule, const_ids, delta=None, p_buckets=p_buckets)
        subst, _ = tracker.checkpoint(subst)
        batches.append(conclude(subst, rule, idx, const_ids, facets, 0, functions))
    c = merge_concluded(spark, batches)

    nulls = {
        "s": F.lit(None).cast("bigint"),
        "p": F.lit(None).cast("bigint"),
        "o": F.lit(None).cast("bigint"),
        "sign": F.lit(None).cast("boolean"),
        "a": F.lit(None).cast("bigint"),
        "b": F.lit(None).cast("bigint"),
        "res": F.lit(None).cast("bigint"),
    }

    def shape(df: DataFrame, reason, **cols) -> DataFrame:
        merged = {**nulls, **cols}
        return df.select(
            F.lit(reason).alias("reason_kind"),
            *[merged[k].alias(k) for k in ("s", "p", "o", "sign", "a", "b", "res")],
            F.col("rule_id"),
            F.col("subst_hash"),
        )

    # V2 / J4: containment anti-join — concluded triples absent from the store
    missing = c.triples.join(store.select(*TRIPLE_KEY).dropDuplicates(), on=TRIPLE_KEY, how="left_anti")
    v_missing = shape(
        missing, REASON_MISSING_TRIPLE, s=F.col("s"), p=F.col("p"), o=F.col("o"), sign=F.col("sign")
    )

    # V3: Eq / Ne id checks
    not_eq = c.eqs.filter(F.col("sign") & (F.col("a") != F.col("b")))
    not_ne = c.eqs.filter(~F.col("sign") & (F.col("a") == F.col("b")))
    v_eq = shape(not_eq, REASON_NOT_EQ, a=F.col("a"), b=F.col("b"))
    v_ne = shape(not_ne, REASON_NOT_NE, a=F.col("a"), b=F.col("b"))

    # V4: True / False boolean-facet check
    bf = boolean_facets(terms)
    t = c.trues.join(bf, c.trues.res == bf.bres, "left")
    t_err = t.filter(F.coalesce(F.col("parse_err"), F.lit(False)))

    # ONE error action for both eval errors (expression trees) and V4's
    # InvalidLiteral (malformed boolean facet) — the reference propagates
    # either as Err; two separate limit(1) jobs each re-ran the deduction
    errs = (
        c.errors.select(F.lit("expression").alias("kind"), "rule_id", "subst_hash", "err")
        .unionByName(
            t_err.select(
                F.lit("invalid_boolean_literal").alias("kind"),
                "rule_id",
                "subst_hash",
                F.lit(ERR_INVALID_LITERAL).alias("err"),
            )
        )
        .limit(1)
        .collect()
    )
    if errs:
        tracker.release()  # no-leak on the error path
        raise ExpressionError(f"error during validation: {errs[0].asDict()}")
    expected = F.col("sign")
    found = (
        F.when(F.col("vtype") == VT_BOOL, F.col("bval") == expected)
        .when(
            F.col("vtype") == VT_ANY,
            F.when(expected, F.coalesce(F.col("has_true"), F.lit(False))).otherwise(
                F.coalesce(F.col("has_false"), F.lit(False))
            ),
        )
        .otherwise(F.lit(False))
    )
    not_true = t.filter(~found)
    # reason depends on the statement sign (NotTrue vs NotFalse)
    v_true = not_true.select(
        F.when(F.col("sign"), F.lit(REASON_NOT_TRUE)).otherwise(F.lit(REASON_NOT_FALSE)).alias("reason_kind"),
        *[nulls[k].alias(k) for k in ("s", "p", "o", "sign", "a", "b")],
        F.col("res"),
        F.col("rule_id"),
        F.col("subst_hash"),
    )

    violations = v_missing.unionByName(v_eq).unionByName(v_ne).unionByName(v_true)
    return ValidationResult(violations, tracker.ids)
