"""inferdf_rs_spark — a from-scratch PySpark-native re-expression of the
spruceid/inferdf-rs RDF deduction engine, wrapped in a web-scale
knowledge-graph construction pipeline (extraction → dictionary-encoded
interpretation → semi-naive forward chaining → materialization).

Reference semantics: /root/reference (inferdf v0.1.0). Architecture:
idiomatic Spark DataFrames — pattern scans are pushed-down filters,
hypothesis conjunction is an equi-join cascade, the fixpoint is a
driver-side semi-naive loop with per-round checkpoints.
"""

from .engine import Dataset, System, build_dataset
from .rules import (
    Rule,
    call,
    dec,
    iri,
    blank,
    lit,
    pat,
    regex,
    rule,
    rule_from_json,
    rule_to_json,
    s_,
    stmt_eq,
    stmt_triple,
    stmt_true,
    v,
)
from .session import get_spark
from .terms import Term, encode_terms, id_bits, resource_facets, set_id_bits, terms_df

__all__ = [
    "Dataset",
    "System",
    "build_dataset",
    "Rule",
    "Term",
    "get_spark",
    "encode_terms",
    "id_bits",
    "set_id_bits",
    "resource_facets",
    "terms_df",
    "rule",
    "rule_from_json",
    "rule_to_json",
    "pat",
    "stmt_triple",
    "stmt_eq",
    "stmt_true",
    "call",
    "v",
    "iri",
    "blank",
    "lit",
    "dec",
    "s_",
    "regex",
]
