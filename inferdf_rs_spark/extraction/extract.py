"""Extraction front-end: html→text + batched mention detection +
alias-dictionary entity linking.

Mandated by the north rule, not by the reference (the reference's
"stated" facts enter by caller insertion — src/cause.rs:10-11,
src/lib.rs:66); this stage produces that stated layer from raw pages.

All Python code paths are **vectorized Arrow UDFs** (pandas_udf) — no
per-row Python.  Entity-link scoring stays JVM-side: a broadcast join
against the (tiny) alias dictionary + a deterministic argmax window
(score desc, iri asc) — the idiomatic-Spark half of the contract.

Fidelity invariant: ``html_to_text(html)`` must be byte-identical to
the page's ``text`` column per url (verified by ``verify_fidelity``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style|head)\b[^>]*>.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def _strip_html(s: str | None) -> str:
    if s is None:
        return ""
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for k, v in _ENTITIES:  # &amp; last so &amp;lt; doesn't double-decode
        s = s.replace(k, v)
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(T.StringType())
def html_to_text(html_str: pd.Series) -> pd.Series:
    """Deterministic tag-strip + entity-unescape + whitespace collapse
    (Arrow-batched; the de-facto extraction kernel).  Takes the
    utf-8-decoded html *string* — byte→string decode runs JVM-side
    (measured ~1.6x faster than shipping binary through Arrow)."""
    return html_str.map(_strip_html)


def extract_text(pages: DataFrame) -> DataFrame:
    return pages.withColumn(
        "extracted_text", html_to_text(F.decode(F.col("html"), "utf-8"))
    )


def verify_fidelity(pages_with_extracted: DataFrame) -> int:
    """Count of urls whose extracted text is NOT byte-identical to the
    stated text column — must be 0 (north-rule invariant)."""
    return pages_with_extracted.filter(
        ~(F.col("extracted_text").eqNullSafe(F.col("text")))
    ).count()


_NORM_RE = re.compile(r"[^a-z0-9]+")

# above this vocabulary size the compiled-alternation regex explodes in
# compile time/memory (re.compile over ≥100k escaped alternatives) — the
# token-trie path takes over (Aho-Corasick-over-tokens equivalent for
# boundary-anchored, non-overlapping leftmost-longest matching)
REGEX_GAZETTEER_MAX = 1024

_TRIE_TERM = ""  # terminal marker key inside trie nodes
# per-worker trie cache, keyed by a uuid minted at detector build time
# (NOT id() of the broadcast value — a recycled address after GC would
# silently serve a stale vocabulary)
_TRIE_CACHE: dict[str, dict] = {}
_TRIE_CACHE_MAX = 4

# driver-side detector cache: one broadcast + compiled detector per
# (session, vocabulary) — repeated link_mentions calls (per micro-batch)
# must not leak one broadcast each.  Entries are (detector, broadcast);
# eviction unpersists the broadcast's executor copies (unpersist, not
# destroy: a detector still held by a caller stays usable — the value
# is re-shipped on next use).
_DETECTOR_CACHE: dict[tuple, tuple] = {}


def _norm_alias_map(alias_list: list[str]) -> dict[str, str]:
    """normalized form → original alias (deterministic: the
    lexicographically-smallest original wins per normalized form)."""
    out: dict[str, str] = {}
    for a in sorted(set(alias_list)):
        nm = " ".join(_NORM_RE.sub(" ", a.lower()).split())
        if nm:
            out.setdefault(nm, a)
    return out


def _build_token_trie(norm_map: dict[str, str]) -> dict:
    root: dict = {}
    for nm, original in norm_map.items():
        node = root
        for tok in nm.split():
            node = node.setdefault(tok, {})
        node[_TRIE_TERM] = original
    return root


def _trie_for(key: str, norm_map: dict[str, str]) -> dict:
    trie = _TRIE_CACHE.get(key)
    if trie is None:
        trie = _build_token_trie(norm_map)
        if len(_TRIE_CACHE) >= _TRIE_CACHE_MAX:
            _TRIE_CACHE.pop(next(iter(_TRIE_CACHE)))
        _TRIE_CACHE[key] = trie
    return trie


def _match_tokens(toks: list[str], trie: dict) -> list[str]:
    """Leftmost-longest non-overlapping token-sequence match (identical
    semantics to the longest-first alternation regex, including the
    distinct/first-occurrence output order)."""
    out: list[str] = []
    seen: set[str] = set()
    i, n = 0, len(toks)
    while i < n:
        node, j = trie, i
        best, best_end = None, i
        while j < n and toks[j] in node:
            node = node[toks[j]]
            j += 1
            if _TRIE_TERM in node:
                best, best_end = node[_TRIE_TERM], j
        if best is not None:
            if best not in seen:
                seen.add(best)
                out.append(best)
            i = best_end
        else:
            i += 1
    return out


def make_mention_detector(alias_list: list[str], spark=None):
    """Build a batched mention detector over the alias vocabulary.

    Semantics: **leftmost-longest (maximal-munch) token-sequence match**
    of the *normalized* alias forms over the normalized (lowercased,
    non-alnum→space) text — the standard gazetteer-NER matching rule.
    Emitted surfaces are the ORIGINAL dictionary aliases (when two
    aliases normalize identically, the lexicographically-smallest
    original represents both — deterministic).  Output: distinct
    surfaces in first-occurrence order.

    Two physical paths with identical semantics (parity-tested):
    - ≤ REGEX_GAZETTEER_MAX aliases: ONE compiled alternation regex over
      the normalized forms (longest alternatives first) evaluated by
      pandas' C string machinery;
    - larger: the vocabulary ships via ``sparkContext.broadcast`` (one
      copy per executor, not per task closure) and matching walks a
      token trie built once per worker — Aho-Corasick-equivalent for
      this anchored non-overlapping discipline, linear in tokens, and
      immune to the alternation-regex compile blow-up at 10⁵-10⁶
      aliases.

    Detectors are cached per (session, vocabulary) so repeated calls
    (e.g. one per streaming micro-batch) reuse one broadcast instead of
    leaking one per call."""
    if not alias_list:
        empty = [[]]

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def detect_none(text: pd.Series) -> pd.Series:
            return pd.Series(empty * len(text))

        return detect_none

    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    norm_map = _norm_alias_map(alias_list)
    path = "regex" if len(norm_map) <= REGEX_GAZETTEER_MAX else "trie"
    cache_key = (
        spark.sparkContext.applicationId if spark is not None else None,
        path,
        len(norm_map),
        # hash keys AND values: two vocabularies whose aliases normalize
        # identically but spell differently ('Foo Bar' vs 'Foo-Bar')
        # must not collide — a stale detector would emit the wrong
        # original surfaces and the downstream alias join would silently
        # drop those mentions
        hash(tuple(sorted(norm_map.items()))),
    )
    cached = _DETECTOR_CACHE.get(cache_key)
    if cached is not None:
        return cached[0]

    match_normed, bc = _make_normed_matcher(spark, norm_map, path)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def detect(text: pd.Series) -> pd.Series:
        normed = text.fillna("").str.lower().str.replace(_NORM_RE, " ", regex=True)
        return match_normed(normed)

    _cache_detector(cache_key, detect, bc)
    return detect


def _make_normed_matcher(spark, norm_map: dict[str, str], path: str):
    """The shared matching core: a callable over the NORMALIZED text
    series returning per-row surface lists, plus the broadcast handle
    (trie path).  Both the standalone detector and the fused
    extract+detect kernel wrap this, so the two physical paths keep one
    semantics definition."""
    if not norm_map:

        def match_none(normed: pd.Series) -> pd.Series:
            return pd.Series([[] for _ in range(len(normed))], index=normed.index)

        return match_none, None
    if path == "regex":
        alts = "|".join(re.escape(a) for a in sorted(norm_map, key=lambda a: (-len(a), a)))
        pat = re.compile(rf"(?<![a-z0-9])(?:{alts})(?![a-z0-9])")
        surface_of = dict(norm_map)

        def match_normed(normed: pd.Series) -> pd.Series:
            return normed.str.findall(pat).map(
                lambda xs: list(dict.fromkeys(surface_of[x] for x in xs))
            )

        return match_normed, None

    import uuid

    bc = spark.sparkContext.broadcast(norm_map)
    trie_key = uuid.uuid4().hex  # stable per detector, survives GC address reuse

    def match_normed(normed: pd.Series) -> pd.Series:
        trie = _trie_for(trie_key, bc.value)
        return normed.map(lambda s: _match_tokens(s.split(), trie))

    return match_normed, bc


def _cache_detector(cache_key, detector, bc) -> None:
    if len(_DETECTOR_CACHE) >= 8:
        for _, old_bc in _DETECTOR_CACHE.values():
            if old_bc is not None:
                old_bc.unpersist(False)
        _DETECTOR_CACHE.clear()
    _DETECTOR_CACHE[cache_key] = (detector, bc)


def make_fused_extract_detect(alias_list: list[str], spark=None):
    """One Arrow pass: html → text-strip → fidelity bit → normalized
    mention detection, returning ``struct<surfaces:array<string>,
    fid_ok:boolean>``.

    The pipeline fast path (``webkg.run_pipeline``): the extracted text
    itself never leaves the Python worker — only the (tiny) surface
    list and the fidelity bit cross Arrow and enter the storage pool.
    The unfused shape (extract_text → persist extracted_text → detect
    UDF) moves the full text through Arrow twice AND through the block
    store once; at 2M pages that made the extract stage
    memory-bandwidth-bound (stage scaling efficiency 0.446 at 8→32
    cores on one socket) while the matcher itself is CPU-bound and
    scales ~4x.  Semantics are IDENTICAL to extract_text +
    make_mention_detector + eqNullSafe fidelity (parity-tested:
    tests/test_webkg.py::test_fused_extract_detect_parity); the
    matching core is shared (``_make_normed_matcher``)."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    norm_map = _norm_alias_map(alias_list)
    path = "regex" if len(norm_map) <= REGEX_GAZETTEER_MAX else "trie"
    cache_key = (
        spark.sparkContext.applicationId if spark is not None else None,
        "fused:" + path,
        len(norm_map),
        hash(tuple(sorted(norm_map.items()))),
    )
    cached = _DETECTOR_CACHE.get(cache_key)
    if cached is not None:
        return cached[0]

    match_normed, bc = _make_normed_matcher(spark, norm_map, path)

    @F.pandas_udf("surfaces array<string>, fid_ok boolean")
    def fused(html_str: pd.Series, text: pd.Series) -> pd.DataFrame:
        extracted = html_str.map(_strip_html)  # never null ("" for null html)
        # eqNullSafe parity: extracted is non-null, so null text ⇒ False
        fid_ok = extracted.eq(text).fillna(False)
        normed = extracted.str.lower().str.replace(_NORM_RE, " ", regex=True)
        return pd.DataFrame({"surfaces": match_normed(normed), "fid_ok": fid_ok})

    _cache_detector(cache_key, fused, bc)
    return fused


def best_links(alias_dict: DataFrame) -> DataFrame:
    """Deterministic argmax per alias (score desc, iri asc) computed on
    the tiny dictionary itself — the per-mention window this replaces
    would shuffle the full mention table for the same result."""
    w = Window.partitionBy("alias").orderBy(F.col("score").desc(), F.col("iri").asc())
    return (
        alias_dict.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def collect_alias_vocabulary(alias_dict: DataFrame) -> list[str]:
    """One driver materialization of the alias vocabulary — collect it
    ONCE per vocabulary version and pass it to ``link_mentions`` when
    calling repeatedly (per bench iteration / streaming micro-batch): at
    10⁷-10⁸ aliases the per-call driver collect is itself the bound,
    detector cache or not."""
    return [r.alias for r in alias_dict.select("alias").distinct().collect()]


def link_mentions(
    pages: DataFrame,
    alias_dict: DataFrame,
    text_col: str = "text",
    aliases: list[str] | None = None,
) -> DataFrame:
    """Detect alias mentions and link each to its best-scoring entity.

    - detection: Arrow-batched UDF over the text column (one compiled
      alternation regex);
    - linking: broadcast join to the pre-argmaxed alias dictionary —
      map-side only, no shuffle of the mention table.

    ``aliases``: optional pre-collected vocabulary (see
    ``collect_alias_vocabulary``) — skips the per-call driver collect.

    Returns (url, surface, iri, score)."""
    if aliases is None:
        aliases = collect_alias_vocabulary(alias_dict)
    detect = make_mention_detector(aliases, spark=pages.sparkSession)
    mentions = pages.select(
        "url", F.explode(detect(F.col(text_col))).alias("surface")
    )
    dim = best_links(alias_dict)
    return mentions.join(
        F.broadcast(dim), mentions.surface == dim["alias"], "inner"
    ).select("url", "surface", "iri", "score")
