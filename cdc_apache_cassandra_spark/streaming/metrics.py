"""Pipeline metrics (SURVEY A6) — the reference exports mutation counters
and latency gauges per node (agent-c4/.../CdcMetrics.java:29-53;
connector CassandraSource.java:104-134,522-553; monitor.adoc). Spark
mapping: `observe()` metrics evaluated inside the plan (no extra pass)
plus a StreamingQueryListener that surfaces them per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

#: The reference's counter set, as observe() aggregates over the event
#: stream (op column per P3).
def mutation_metrics() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("events_total"),
        F.sum(F.when(F.col("op") == "INSERT", 1).otherwise(0)).alias("inserts"),
        F.sum(F.when(F.col("op") == "UPDATE", 1).otherwise(0)).alias("updates"),
        F.sum(F.when(F.col("op") == "DELETE", 1).otherwise(0)).alias("deletes"),
        # observe() forbids exact distinct aggregates; HLL sketch instead
        F.approx_count_distinct("digest").alias("approx_distinct_mutations"),
    ]


def observe_batch(events: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach the counter set to a batch DataFrame; read
    `observation.get` after any action (CdcMetrics sent/skipped
    analogue, zero extra scan)."""
    obs = Observation("cdc_metrics")
    return events.observe(obs, *mutation_metrics()), obs


def observe_stream(events: DataFrame, name: str = "cdc_metrics") -> DataFrame:
    """Streaming variant: metrics arrive on each progress event under
    `observedMetrics[name]` — consume with MetricsListener."""
    return events.observe(name, *mutation_metrics())


class MetricsListener(StreamingQueryListener):
    """Collects observed metrics per micro-batch — the Prometheus-export
    hook point (reference monitor.adoc); here they accumulate in memory
    for tests/inspection."""

    def __init__(self, metric_name: str = "cdc_metrics"):
        self.metric_name = metric_name
        self.batches: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        om = event.progress.observedMetrics
        if self.metric_name in om:
            row = om[self.metric_name]
            self.batches.append(row.asDict())

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass

    def totals(self) -> dict:
        out: dict[str, int] = {}
        for b in self.batches:
            for k, v in b.items():
                out[k] = out.get(k, 0) + (v or 0)
        return out
