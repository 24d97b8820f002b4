"""Scale-safe global ordered computations (rank / running sum / ntile).

``Window.orderBy(...)`` with no partition key compiles to
``Exchange SinglePartition`` + a single-task sort over EVERY row — the
canonical 100x-scale killer for unbounded-cardinality keys (customers,
users, documents all grow with the data). This module provides the
two-pass replacement, bit-identical in output:

1. ``repartitionByRange`` on the FULL ordering key (which must be a
   total order — callers tie-break on a unique id) places rows into
   range-ordered partitions;
2. a *partitioned* window (`partitionBy(partition-id)`) ranks and
   running-sums locally — every task sorts only its own slice;
3. per-partition row counts / sum totals (one tiny row per partition,
   bounded by the partition count, never by the data) are cross-paired
   via a broadcast join and aggregated into cumulative offsets —
   deliberately avoiding both a driver ``collect`` and an
   ``Exchange SinglePartition``;
4. global rank = local rank + offset; global running sum = local
   running sum + offset sum; the grand total comes from the same tiny
   aggregate for free (NTILE needs it).

Exactness: offsets add *counts* (exact) and running sums must be exact
types (integer / DECIMAL). Callers that need a float derive it ONCE per
row after the exact accumulation — the same cross-engine determinism
rule the whole suite follows (plans/registry.py module docstring).

NTILE(k) is derived from the global rank and total count with
Spark/DuckDB's shared bucket rule: the first ``n % k`` buckets get
``n // k + 1`` rows, the rest ``n // k``.

Reference parity note: the reference has no ranking surface at all
(SURVEY.md §2.6) — this operator exists for the 100 TB analytics /
LLM-pipeline extensions (pareto, RFM, DSIR, systematic sampling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gr_pid"
_LRK = "_gr_lrk"


def attach_global_order(
    df: DataFrame,
    order_cols: list[Column],
    *,
    rank_col: str = "rk",
    total_col: str | None = None,
    running_sums: dict[str, str] | None = None,
    num_partitions: int | None = None,
    persist_input: bool = False,
) -> DataFrame:
    """Attach a global ``row_number`` over ``order_cols`` (and optional
    exact running sums / total row count) without a single-partition sort.

    order_cols   : full ordering spec; MUST be a total order (unique
                   tie-break) or ranks are nondeterministic — same
                   contract as ``ROW_NUMBER() OVER (ORDER BY ...)``.
    rank_col     : output column for the 1-based global rank.
    total_col    : if set, also attach the total row count (for NTILE /
                   top-percent selections) — saves a separate scalar agg.
    running_sums : {out_col: src_col} running ``SUM(src_col)`` up to and
                   including the current row in global order. src must be
                   an exact (integer/decimal) column.
    persist_input: ``repartitionByRange`` runs a separate boundary-
                   sampling job over the input before the real shuffle
                   reads it again. Spark reuses the input lineage's
                   shuffle outputs across the two passes, so only the
                   tail AFTER the input's last exchange recomputes —
                   measured CHEAPER than caching for every aggregate-
                   shaped input in this repo (DSIR 0.87s vs 1.21s
                   cached at sf0.1; RFM and vocab-growth similar).
                   Pass True only when that post-exchange tail is
                   genuinely expensive (e.g. a heavy UDF projection);
                   the persist is scoped (caching.persist_scoped) and
                   released by the registry/bench after the action.
    """
    running_sums = running_sums or {}
    if persist_input:
        from cdc_apache_cassandra_spark.caching import persist_scoped

        df = persist_scoped(df)
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    rp = df.repartitionByRange(n_part, *order_cols).select(
        "*", F.spark_partition_id().alias(_PID)
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    local = rp.select(
        "*",
        F.row_number().over(w).alias(_LRK),
        *[
            F.sum(src).over(w_run).alias(f"_gr_run_{out}")
            for out, src in running_sums.items()
        ],
    )
    totals = local.groupBy(_PID).agg(
        F.count("*").alias("_gr_cnt"),
        *[
            F.sum(src).alias(f"_gr_tot_{out}")
            for out, src in running_sums.items()
        ],
    )
    # Cumulative offsets over the tiny per-partition totals (<= n_part
    # rows). A window here would itself be an Exchange SinglePartition —
    # instead cross-pair against a broadcast copy and aggregate, which
    # plans as a condition-free broadcast nested-loop over n_part^2 tiny
    # rows + one hash aggregate.
    b = totals.select(
        F.col(_PID).alias("_gr_pid_b"),
        F.col("_gr_cnt").alias("_gr_cnt_b"),
        *[
            F.col(f"_gr_tot_{out}").alias(f"_gr_tot_{out}_b")
            for out in running_sums
        ],
    )
    before = F.col("_gr_pid_b") < F.col(_PID)
    offsets = (
        totals.join(F.broadcast(b))
        .groupBy(_PID)
        .agg(
            F.sum(F.when(before, F.col("_gr_cnt_b")).otherwise(F.lit(0))).alias(
                "_gr_off"
            ),
            F.sum("_gr_cnt_b").alias("_gr_n"),
            *[
                F.sum(
                    F.when(before, F.col(f"_gr_tot_{out}_b")).otherwise(F.lit(0))
                ).alias(f"_gr_soff_{out}")
                for out in running_sums
            ],
        )
    )
    out = local.join(F.broadcast(offsets), _PID)
    proj = [
        *df.columns,
        (F.col("_gr_off") + F.col(_LRK)).alias(rank_col),
        *[
            (
                F.coalesce(F.col(f"_gr_soff_{out}"), F.lit(0))
                + F.col(f"_gr_run_{out}")
            ).alias(out)
            for out in running_sums
        ],
    ]
    if total_col is not None:
        proj.append(F.col("_gr_n").alias(total_col))
    return out.select(*proj)


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """NTILE(k) from a 1-based global rank and the total row count —
    Spark's and DuckDB's shared rule: the first ``total % k`` buckets
    hold ``total // k + 1`` rows, the remainder ``total // k``.

    Integer-exact for ranks below 2^53 (the division runs in doubles but
    floor(a/b) is exact there — a 100 TB corpus is ~1e11 rows, four
    orders of magnitude under the bound)."""
    base = F.floor(total.cast("long") / k)
    rem = total.cast("long") % k
    big_span = rem * (base + 1)
    in_big = rank.cast("long") <= big_span
    tile_big = F.floor((rank.cast("long") - 1) / (base + 1)) + 1
    # guard base=0 (total < k): in_big then covers every row, but Spark
    # evaluates both branches — keep the dead branch finite
    base_safe = F.greatest(base, F.lit(1))
    tile_small = rem + F.floor((rank.cast("long") - big_span - 1) / base_safe) + 1
    return F.when(in_big, tile_big).otherwise(tile_small).cast("int")
