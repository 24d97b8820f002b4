"""Stream-stream interval join — the Structured Streaming join family the
CDC surface doesn't need (the reference joins stream×static only, SURVEY
§2.3) but an events consumer does: attribute a purchase stream to a click
stream within a time bound, both sides unbounded.

Semantics: inner equi-join on the user key plus an event-time interval
(right within [left_ts, left_ts + max_gap]). Both sides carry watermarks
so the join state is bounded: a buffered left row can be evicted once the
right watermark passes left_ts + max_gap (and vice versa) — Spark derives
the state-cleanup predicate from the time-bound condition automatically.

Scale: state size ~ input rate × (watermark delay + max_gap), independent
of history length; the join shuffles both streams on the user key once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Join right-side rows to left-side rows of the same ``key`` with
    ``left_ts <= right_ts <= left_ts + max_gap``.

    Works identically on batch DataFrames (watermarks are a no-op there)
    — the §7.1 one-pipeline rule. Column names must be disjoint except
    ``key``.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
