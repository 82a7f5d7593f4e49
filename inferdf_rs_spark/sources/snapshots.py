"""Versioned graph store: snapshot-isolated commits over plain parquet.

The reference's paged on-disk store (reference src/store.rs — one
mutable page file) maps at cluster scale onto a table format: a
manifest log over IMMUTABLE data files with an atomic pointer swap per
commit — the public Iceberg/Delta design.  The Iceberg jars are absent
from this container (the one gated test), so this module implements
that pattern directly with nothing but parquet + POSIX rename:

- each commit writes its data under a fresh ``data/v{N}/`` directory
  (the salted, p_bucket-partitioned layout of ``webkg.write_graph`` —
  partition pruning is untouched);
- a version manifest ``snapshots/v{N}.json`` records the data
  location plus the footer-derived row counts;
- ``LATEST`` advances by ``os.replace`` (atomic on POSIX) — a reader
  that resolved version N is never affected by a concurrent N+1
  commit (snapshot isolation), and any retained version can be
  re-opened (time travel).

Crash discipline: dying before the manifest rename leaves an orphan
data directory; dying between manifest and pointer leaves a committed
but un-pointed version — both invisible to readers, never a corrupt
store.  ``vacuum`` removes data directories no retained manifest
references (orphans included).  Single committer assumed (the Spark
driver), as with a real metastore-less Delta log.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _snap_dir(root: str) -> str:
    return os.path.join(root, "snapshots")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_snap_dir(root), f"v{version:05d}.json")


def _atomic_write(path: str, payload: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def versions(root: str) -> list[dict]:
    """All committed manifests, oldest first (committed = manifest
    present; the LATEST pointer additionally gates reader visibility)."""
    d = _snap_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def latest_version(root: str) -> int | None:
    try:
        with open(os.path.join(root, "LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def commit_graph(
    triples: DataFrame,
    terms: DataFrame,
    root: str,
    n_buckets: int = 16,
    metrics=None,
) -> int:
    """Write a new immutable snapshot and atomically publish it.
    Returns the committed version number."""
    from ..pipelines.webkg import write_graph

    os.makedirs(_snap_dir(root), exist_ok=True)
    known = versions(root)
    version = (known[-1]["version"] + 1) if known else 1
    data_dir = os.path.join(root, "data", f"v{version:05d}")
    # 1. data files (salted writers, p_bucket layout, footer counts)
    write_graph(triples, terms, data_dir, n_buckets=n_buckets, metrics=metrics)
    with open(os.path.join(data_dir, "graph_meta.json")) as f:
        meta = json.load(f)
    # 2. manifest — after this rename the version exists for time travel
    manifest = {
        "version": version,
        "parent": version - 1 if version > 1 else None,
        "data_dir": data_dir,
        **meta,
    }
    _atomic_write(_manifest_path(root, version), json.dumps(manifest))
    # 3. pointer — after this rename the version is what readers open
    _atomic_write(os.path.join(root, "LATEST"), str(version))
    return version


def read_graph_version(spark: SparkSession, root: str, version: int | None = None):
    """Open a snapshot as a Dataset (p_bucket pruning intact).  Default:
    the LATEST-published version; pass ``version=`` for time travel."""
    from ..pipelines.webkg import read_graph

    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no published snapshot under {root}")
    path = _manifest_path(root, version)
    try:
        with open(path) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"snapshot v{version} not found under {root} — "
            f"committed versions: {[v['version'] for v in versions(root)]} "
            "(it may have been vacuumed)"
        ) from None
    if not os.path.isdir(manifest["data_dir"]):
        raise FileNotFoundError(
            f"snapshot v{version} manifest exists but its data directory "
            f"{manifest['data_dir']} is gone — vacuumed without dropping the manifest?"
        )
    return read_graph(spark, manifest["data_dir"])


def snapshot_diff(
    spark: SparkSession, root: str, v_from: int, v_to: int | None = None
) -> DataFrame:
    """Change-data feed between two committed versions: every signed
    fact present in exactly one of them, tagged ``change`` =
    ``added`` | ``removed`` (w.r.t. the older → newer direction).
    ``v_to`` defaults to LATEST.

    Fact identity is the signed quad ``(s, p, o, sign, g)`` — lineage
    columns (cause_kind/rule_id/…/round) are derivation metadata, not
    identity, so a fact re-derived by a different rule in the newer
    run is NOT a change.

    Scale shape: both sides are immutable snapshot scans that keep
    their hive ``p_bucket`` partition column, and both anti-joins key
    on it first, so the exchange hashes co-bucketed fact keys — no
    wide rows move (5 longs + a bool per side) and a consumer filter
    on ``p_bucket`` prunes both scans before the join.  This is the
    payoff of the immutable-version design: CDC costs two narrow
    scans, never a log replay.
    """
    if v_to is None:
        v_to = latest_version(root)
        if v_to is None:
            raise FileNotFoundError(f"no published snapshot under {root}")
    key = ["p_bucket", "s", "p", "o", "sign", "g"]
    old = read_graph_version(spark, root, v_from).triples.select(key)
    new = read_graph_version(spark, root, v_to).triples.select(key)

    def _anti(left: DataFrame, right: DataFrame) -> DataFrame:
        # g is nullable (default graph = NULL): a name-list join's plain
        # equality never matches NULL = NULL, which would tag every
        # default-graph fact present in BOTH versions as added AND
        # removed.  eqNullSafe (<=>) is still an equi-join predicate, so
        # the hash-partitioned SMJ plan is unchanged.
        l, r = left.alias("l"), right.alias("r")
        cond = F.lit(True)
        for c in key:
            cond = cond & F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        return l.join(r, cond, "left_anti")

    added = _anti(new, old).withColumn("change", F.lit("added"))
    removed = _anti(old, new).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def vacuum(root: str, keep_last: int = 2) -> list[str]:
    """Drop all but the last ``keep_last`` versions: their manifests and
    every data directory no retained manifest references (which also
    collects orphans from crashed commits).  Returns removed paths."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1: the published version must survive")
    known = versions(root)
    keep = {v["version"] for v in known[-keep_last:]}
    retained_dirs = {
        os.path.abspath(v["data_dir"]) for v in known if v["version"] in keep
    }
    removed: list[str] = []
    for v in known:
        if v["version"] not in keep:
            os.remove(_manifest_path(root, v["version"]))
            removed.append(_manifest_path(root, v["version"]))
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            d = os.path.abspath(os.path.join(data_root, name))
            if d not in retained_dirs:
                shutil.rmtree(d)
                removed.append(d)
    return removed
