"""Conclusion evaluation: existential minting, statement projection, lineage.

Reference flow (``Deduction::eval``, src/system/deduction.rs:210-245):
for each satisfying substitution, bind each conclusion variable ``i`` to
a **fresh** resource (one per (rule, substitution) deduction, shared
across that deduction's statements — src/system/deduction.rs:225-229),
fully substitute the statement templates, evaluate expression trees and
intern computed literals as resources.

Distributed twist: the reference's sequential blank-node generator
cannot be replicated across executors, so fresh nodes are minted
**deterministically** as ``xxhash64(rule_id, substitution_hash,
var_index)`` — stable across runs, retries and checkpoint resumes.
Matching the reference's generator-labeled blanks is then a
canonicalization concern (operators/canon.py), not an execution one.

Every emitted fact carries lineage (``Cause``/``Entailment``,
src/cause.rs:9-40): cause_kind, rule_id, substitution hash, fixpoint
round, and source partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rules import EqStmt, Rule, TripleStmt, TrueStmt
from ..schemas import CAUSE_ENTAILED, ERR_NONE, KIND_BLANK, VT_ANY
from .expr import ExprCompiler, join_facets, statement_facet_vars

EQS_COLS = ["a", "b", "sign", "rule_id", "subst_hash"]
TRUES_COLS = ["res", "vtype", "bval", "verr", "sign", "rule_id", "subst_hash"]

NEW_TERM_STRUCT = "struct<term_id:bigint,kind:int,lexical:string,datatype:string,lang:string>"

def _fold_errs(cols) -> "F.Column":
    """First-error-wins fold, skipping literal no-error columns (rules
    without expressions would otherwise build 0==0 predicates)."""
    trivial = str(F.lit(ERR_NONE))  # built lazily: needs an active session
    errs = [c for c in cols if str(c) != trivial]
    if not errs:
        return F.lit(ERR_NONE)
    out = errs[0]
    for c in errs[1:]:
        out = F.when(out != ERR_NONE, out).otherwise(c)
    return out


@dataclass
class Concluded:
    """Evaluated deductions of one rule (DeductionsInstance equivalent)."""

    triples: DataFrame  # s,p,o,sign,cause_kind,rule_id,subst_hash,round,src_partition
    eqs: DataFrame  # a,b,sign,rule_id,subst_hash
    trues: DataFrame  # res,vtype,bval,verr,sign,rule_id,subst_hash
    new_terms: DataFrame  # TERMS_SCHEMA
    errors: DataFrame  # rule_id,subst_hash,err


def _empty(spark, schema: str) -> DataFrame:
    return spark.createDataFrame([], schema)


def conclude(
    subst: DataFrame,
    rule: Rule,
    rule_idx: int,
    const_ids: dict,
    facets: DataFrame,
    round_num: int = 0,
    functions: dict | None = None,
    subst_lineage: bool = False,
) -> Concluded:
    """Evaluate one rule's conclusions over its substitutions DataFrame.

    ``subst_lineage=True`` additionally stores the dense binding vector
    (``subst: array<long>``, index = rule var, null = unbound) on every
    emitted triple — the reference's ``Vec<Option<T>>`` substitution
    payload (src/pattern/mod.rs:99-119, src/cause.rs:28-34), enabling
    "why does this fact exist" replay.  Off by default: it fattens the
    per-round shuffle by ~8B×variables/row, and the fixpoint only needs
    the hash."""
    spark = subst.sparkSession
    rid = rule.rule_id
    hyp_vars = sorted(rule.hypothesis_vars())

    # substitution identity → lineage + existential minting seed
    # (Entailment substitution vector, src/cause.rs:28-34)
    if hyp_vars:
        subst = subst.withColumn(
            "subst_hash", F.xxhash64(F.lit(rid), *[F.col(f"v{i}") for i in hyp_vars])
        )
    else:
        subst = subst.withColumn("subst_hash", F.xxhash64(F.lit(rid)))
    if subst_lineage:
        hv = set(hyp_vars)
        subst = subst.withColumn(
            "_subst_vec",
            F.array(
                *[
                    F.col(f"v{i}") if i in hv else F.lit(None).cast("long")
                    for i in range(rule.variables)
                ]
            ),
        )

    # mint fresh existential resources: deterministic per (rule, subst, var)
    minted_terms = []
    for j in range(rule.conclusion.variables):
        x = rule.variables + j
        subst = subst.withColumn(
            f"v{x}", F.xxhash64(F.lit("inferdf:ex"), F.lit(rid), F.col("subst_hash"), F.lit(j))
        )
        minted_terms.append(
            F.struct(
                F.col(f"v{x}").alias("term_id"),
                F.lit(KIND_BLANK).alias("kind"),
                F.concat(F.lit("ex"), F.hex(F.col(f"v{x}"))).alias("lexical"),
                F.lit(None).cast("string").alias("datatype"),
                F.lit(None).cast("string").alias("lang"),
            )
        )

    facet_vars = statement_facet_vars(rule.conclusion.statements)
    subst = join_facets(subst, facets, facet_vars)
    comp = ExprCompiler(const_ids, facet_vars, functions)

    triples_parts, eqs_parts, trues_parts, terms_parts, err_parts = [], [], [], [], []

    if minted_terms:
        terms_parts.append(
            subst.select(F.explode(F.array(*minted_terms)).alias("t")).select("t.*")
        )

    for st in rule.conclusion.statements:
        s = st.stmt
        sign = F.lit(bool(st.sign))
        if isinstance(s, TripleStmt):
            cvs = [comp.compile(e) for e in (s.s, s.p, s.o)]
            insts = [comp.instantiate(cv) for cv in cvs]
            err = _fold_errs([cv.err for cv in cvs])
            lineage_cols = [F.col("_subst_vec").alias("subst")] if subst_lineage else []
            row = subst.select(
                insts[0][0].alias("s"),
                insts[1][0].alias("p"),
                insts[2][0].alias("o"),
                sign.alias("sign"),
                F.lit(CAUSE_ENTAILED).alias("cause_kind"),
                F.lit(rid).alias("rule_id"),
                F.col("subst_hash"),
                F.lit(round_num).alias("round"),
                F.lit(f"r{rule_idx}").alias("src_partition"),
                # deduced facts land in the default graph (the reference's
                # deduction emits graph-less TripleStatements)
                F.lit(None).cast("long").alias("g"),
                *lineage_cols,
                err.alias("_err"),
                F.array(*[i[1] for i in insts]).alias("_terms"),
            )
            err_parts.append(
                row.filter(F.col("_err") != ERR_NONE).select(
                    "rule_id", "subst_hash", F.col("_err").alias("err")
                )
            )
            ok = row.filter(F.col("_err") == ERR_NONE)
            terms_parts.append(
                ok.select(F.explode("_terms").alias("t")).filter(F.col("t").isNotNull()).select("t.*")
            )
            triples_parts.append(ok.drop("_err", "_terms"))
        elif isinstance(s, EqStmt):
            ca, cb = comp.compile(s.a), comp.compile(s.b)
            ia, ib = comp.instantiate(ca), comp.instantiate(cb)
            err = _fold_errs([ca.err, cb.err])
            row = subst.select(
                ia[0].alias("a"),
                ib[0].alias("b"),
                sign.alias("sign"),
                F.lit(rid).alias("rule_id"),
                F.col("subst_hash"),
                err.alias("_err"),
                F.array(ia[1], ib[1]).alias("_terms"),
            )
            err_parts.append(
                row.filter(F.col("_err") != ERR_NONE).select(
                    "rule_id", "subst_hash", F.col("_err").alias("err")
                )
            )
            ok = row.filter(F.col("_err") == ERR_NONE)
            terms_parts.append(
                ok.select(F.explode("_terms").alias("t")).filter(F.col("t").isNotNull()).select("t.*")
            )
            eqs_parts.append(ok.drop("_err", "_terms"))
        elif isinstance(s, TrueStmt):
            cv = comp.compile(s.e)
            ires, iterm = comp.instantiate(cv)
            if cv.is_resource:
                # Bare resource in a True statement: the reference's eval
                # never errors on Expression::Resource — the V4 check
                # scans only the resource's xsd:boolean facets
                # (src/system/deduction.rs:132-153).  Do NOT fold facet
                # parse errors (e.g. a malformed decimal facet) into verr;
                # emit the resource and let the True check decide.
                vtype_c, bval_c, verr_c = F.lit(VT_ANY), F.lit(None).cast("boolean"), F.lit(ERR_NONE)
            else:
                vtype_c, bval_c, verr_c = cv.vtype, cv.b, cv.err
            row = subst.select(
                ires.alias("res"),
                vtype_c.alias("vtype"),
                bval_c.alias("bval"),
                verr_c.alias("verr"),
                sign.alias("sign"),
                F.lit(rid).alias("rule_id"),
                F.col("subst_hash"),
                iterm.alias("_term"),
            )
            err_parts.append(
                row.filter(F.col("verr") != ERR_NONE).select(
                    "rule_id", "subst_hash", F.col("verr").alias("err")
                )
            )
            ok = row.filter(F.col("verr") == ERR_NONE)
            terms_parts.append(
                ok.select(F.col("_term").alias("t")).filter(F.col("t").isNotNull()).select("t.*")
            )
            trues_parts.append(ok.drop("_term"))
        else:
            raise TypeError(f"unknown statement {s!r}")

    def u(parts, schema):
        if not parts:
            return _empty(spark, schema)
        out = parts[0]
        for pdf in parts[1:]:
            out = out.unionByName(pdf)
        return out

    from ..schemas import TRIPLES_SCHEMA, TERMS_SCHEMA

    triples_schema = TRIPLES_SCHEMA
    if subst_lineage:
        import pyspark.sql.types as _T

        triples_schema = _T.StructType(
            TRIPLES_SCHEMA.fields + [_T.StructField("subst", _T.ArrayType(_T.LongType()), True)]
        )

    return Concluded(
        triples=u(triples_parts, triples_schema),
        eqs=u(eqs_parts, "a bigint, b bigint, sign boolean, rule_id bigint, subst_hash bigint"),
        trues=u(
            trues_parts,
            "res bigint, vtype int, bval boolean, verr int, sign boolean, rule_id bigint, subst_hash bigint",
        ),
        new_terms=u(terms_parts, TERMS_SCHEMA),
        errors=u(err_parts, "rule_id bigint, subst_hash bigint, err int"),
    )


def merge_concluded(spark, batches: list[Concluded]) -> Concluded:
    """U1: union per-rule deduction batches (Deductions::merge_with)."""
    from ..schemas import TERMS_SCHEMA, TRIPLES_SCHEMA

    if not batches:
        e = lambda s: _empty(spark, s)  # noqa: E731
        return Concluded(
            e(TRIPLES_SCHEMA),
            e("a bigint, b bigint, sign boolean, rule_id bigint, subst_hash bigint"),
            e("res bigint, vtype int, bval boolean, verr int, sign boolean, rule_id bigint, subst_hash bigint"),
            e(TERMS_SCHEMA),
            e("rule_id bigint, subst_hash bigint, err int"),
        )
    out = batches[0]
    for nxt in batches[1:]:
        out = Concluded(
            out.triples.unionByName(nxt.triples),
            out.eqs.unionByName(nxt.eqs),
            out.trues.unionByName(nxt.trues),
            out.new_terms.unionByName(nxt.new_terms),
            out.errors.unionByName(nxt.errors),
        )
    return out
