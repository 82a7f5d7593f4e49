"""Event sessionization — gap-based session assignment.

Not part of the reference engine (SURVEY.md §2.10); event/telemetry
corpora need sessions before any per-session aggregation or
training-example assembly.  The batch twin of the streaming
``applyInPandasWithState`` session operator in ``streaming/corpus.py``.

Spark-first shape: ONE narrow shuffle on the entity key, then two
window passes over the same (key, order) sort — ``lag`` to flag gap
starts, running ``sum`` to number sessions.  Catalyst executes both in
a single WindowExec over a single exchange (same partitioning + same
ordering), so the operator costs one shuffle regardless of corpus
size; skewed entities can be pre-split upstream by day before
sessionizing if a single user's history outgrows a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tie: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-key session index: a new session starts at the first
    event and whenever the gap from the previous event exceeds
    ``gap_seconds``.  Adds ``session_idx`` (1-based, per key); ties in
    ``ts`` are ordered by ``tie`` so numbering is deterministic.
    """
    order = [F.col(ts).asc(), F.col(tie).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    tcol = F.col(ts)
    # unix_micros takes TIMESTAMP only; NTZ columns (the parquet default
    # for naive timestamps) are interpreted as UTC wall time explicitly
    # (to_utc_timestamp with a pinned 'UTC') — a plain session-zone cast
    # only cancels for fixed-offset zones, and in a DST-observing session
    # timezone gaps spanning a transition were off by the shift
    # (ADVICE r5)
    if isinstance(events.schema[ts].dataType, TimestampNTZType):
        tcol = F.to_utc_timestamp(tcol, "UTC")
    us = F.unix_micros(tcol)
    new_sess = F.when(
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn(
        "session_idx", F.sum(new_sess).over(run).cast("long")
    )
