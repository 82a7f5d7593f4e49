"""Pattern matching: scans + conjunctive hypothesis joins.

The reference matches one signed triple pattern at a time against an
indexed store (src/dataset.rs:24-44) and combines per-pattern matches by
DFS backtracking with unification (src/rule/mod.rs:160-207,
src/utils/search.rs:34-75).  Spark-first re-expression: each pattern is a
filtered **scan** (constant positions become Catalyst-pushed predicates),
and the backtracking product becomes a cascade of **equi-joins on shared
variables** — set-at-a-time instead of tuple-at-a-time.  Catalyst/AQE
picks broadcast vs sort-merge per join and mitigates skewed hub keys
(rdf:type / sameAs) via adaptive skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rules import Rule, SignedPattern, Var
from ..terms import Term

ConstIds = dict  # Term -> int64 id


def scan_pattern(
    triples: DataFrame,
    pattern: SignedPattern,
    const_ids: ConstIds,
    p_buckets: int | None = None,
) -> DataFrame:
    """Match one signed pattern; returns the variable bindings it induces.

    - constant position ⇒ pushed-down equality predicate
      (reference ResourceOrVar::matching constant arm, src/pattern/mod.rs:32-39)
    - repeated variable ⇒ intra-row equality (non-linear pattern,
      src/pattern/mod.rs:16-26)
    - pattern sign selects the store sign partition; on a store with no
      negative rows a negative pattern matches nothing — the closed-world
      blanket impl of src/dataset.rs:46-60.
    - ``p_buckets``: predicate-bucket count of a materialized graph
      (``Dataset.p_buckets`` from ``pipelines.webkg.read_graph``); a
      constant-``p`` pattern then also filters on the ``p_bucket``
      partition column, so the parquet scan prunes to one bucket
      directory — the reference's canonical-pattern index
      (src/pattern/map.rs:13-25) as Hive-style partition pruning.  The
      predicate is only added when ``p_bucket`` is actually among the
      store's columns (a wrapped/projected frame may have dropped it);
      the legacy ``_inferdf_p_buckets`` DataFrame attribute is honored
      as a fallback.

    Output columns: ``v{i}`` for each variable ``i`` in the pattern.
    """
    n_p_buckets = p_buckets if p_buckets is not None else getattr(triples, "_inferdf_p_buckets", None)
    if n_p_buckets and "p_bucket" not in triples.columns:
        n_p_buckets = None
    cond = F.col("sign") == F.lit(bool(pattern.sign))
    proj: dict[int, str] = {}
    for pos_name, node in zip(("s", "p", "o"), pattern.positions()):
        if isinstance(node, Var):
            if node.index in proj:
                cond = cond & (F.col(pos_name) == F.col(proj[node.index]))
            else:
                proj[node.index] = pos_name
        elif isinstance(node, Term):
            cond = cond & (F.col(pos_name) == F.lit(const_ids[node]))
            if pos_name == "p" and n_p_buckets:
                cond = cond & (
                    F.col("p_bucket") == F.lit(int(const_ids[node]) % int(n_p_buckets))
                )
        else:
            raise TypeError(f"pattern position must be Var or Term, got {node!r}")
    out = triples.filter(cond)
    if not proj:
        # fully-ground pattern: containment probe; one marker column
        return out.select(F.lit(1).alias("_ground")).limit(1)
    return out.select(*[F.col(pos).alias(f"v{i}") for i, pos in sorted(proj.items())])


def _join_bindings(acc: DataFrame | None, nxt: DataFrame) -> DataFrame:
    """Natural join on shared variable columns (binding-consistency join,
    reference PatternSubstitution::bind, src/pattern/mod.rs:77-93)."""
    if acc is None:
        return nxt
    shared = sorted(set(acc.columns) & set(nxt.columns) - {"_ground"})
    if "_ground" in nxt.columns:
        return acc.join(nxt.select(F.lit(1).alias("_g")), how="cross").drop("_g")
    if not shared:
        return acc.crossJoin(nxt)
    return acc.join(nxt, on=shared, how="inner")


def find_substitutions(
    store: DataFrame,
    rule: Rule,
    const_ids: ConstIds,
    delta: DataFrame | None = None,
    distinct: bool = True,
    p_buckets: int | None = None,
) -> DataFrame:
    """All substitutions satisfying the rule hypothesis (J1), optionally
    restricted to those touching at least one ``delta`` triple (J2).

    Full mode mirrors ``Rule::try_deduce_from(store, empty, None)``
    (src/rule/mod.rs:79-108).  Delta mode is the semi-naive step built on
    the reference's seeded API (``excluded_hypothesis``,
    src/rule/mod.rs:83,175-177): for each hypothesis slot *i*, slot *i*
    scans the (small) delta while the remaining slots scan the full
    store, then the per-slot variants are unioned and deduped.  AQE
    broadcasts the delta side at runtime when it is small.

    Returns a DataFrame with one column ``v{i}`` per hypothesis variable.
    """
    patterns = list(rule.hypothesis)
    if not patterns:
        # empty hypothesis: a single empty substitution (matches everything once)
        return store.sparkSession.range(1).select(F.lit(1).alias("_ground"))

    def one_variant(delta_slot: int | None) -> DataFrame:
        acc = None
        # match the delta slot first so the (small) delta seeds the cascade
        order = list(range(len(patterns)))
        if delta_slot is not None:
            order = [delta_slot] + [j for j in order if j != delta_slot]
        for j in order:
            src = delta if j == delta_slot else store
            # bucket pruning applies to store-side scans only (the delta
            # is an in-flight DataFrame without the partition column)
            pb = None if j == delta_slot else p_buckets
            acc = _join_bindings(acc, scan_pattern(src, patterns[j], const_ids, p_buckets=pb))
        return acc

    if delta is None:
        out = one_variant(None)
    else:
        variants = [one_variant(i) for i in range(len(patterns))]
        out = variants[0]
        for df in variants[1:]:
            out = out.unionByName(df)

    if "_ground" in out.columns and len(out.columns) > 1:
        out = out.drop("_ground")
    if distinct:
        out = out.dropDuplicates()
    return out
