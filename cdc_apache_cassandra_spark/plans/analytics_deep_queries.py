"""Statistical / analytic query surface: the remaining TPC-H shape (Q20),
exact distribution statistics (percentiles, correlation), and rank-bucket
analytics. All engine additions beyond the reference's J1-only surface
(SURVEY §2.3 note) — Catalyst built-ins behind our API.

Determinism rules per plans/registry.py: DECIMAL exact aggregation before
any double math; double formulas written with the SAME operation order in
Spark and the DuckDB oracle (IEEE ops are deterministic, so identical
expressions yield identical bits); ROUND only as a final presentation
step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.ranking import (
    attach_global_order,
    ntile_from_rank,
)
from cdc_apache_cassandra_spark.operators.graphs import (
    order_item_sets,
    order_pair_counts,
    pair_counts_from_sets,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, load_tables
from cdc_apache_cassandra_spark.caching import persist_scoped


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


# --- Q20: dominant suppliers of a part family (nested-aggregate shape) ------

_Q20_SHARE = 0.3

_Q20_SQL = f"""
WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem JOIN red ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
tot AS (
  SELECT l_partkey, SUM(qty) AS part_qty FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name, COUNT(*) AS n_dominant_parts
FROM shipped
JOIN tot USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE CAST(qty AS DOUBLE) > {_Q20_SHARE} * CAST(part_qty AS DOUBLE)
GROUP BY s_suppkey, s_name
"""


@register("tpch_q20ish_dominant_suppliers", sql=_Q20_SQL)
def q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp in the corpus): a supplier is
    'dominant' for a part when its 1996 shipped quantity exceeds {share} of
    that part's total — per-group aggregate compared against a second
    aggregate over the SAME grouped relation (reused, not recomputed: one
    scan feeds both levels). part filter broadcast; the only big shuffle
    is the (suppkey, partkey) aggregate; the per-part total is a
    re-aggregation of that already-small intermediate."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    shipped = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    dominant = shipped.join(tot, "l_partkey").filter(
        F.col("qty").cast("double") > _Q20_SHARE * F.col("part_qty").cast("double")
    )
    return (
        dominant.join(
            t["supplier"], dominant["l_suppkey"] == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominant_parts"))
    )


# --- exact percentiles per group --------------------------------------------

_PCTS = (0.25, 0.5, 0.75, 0.9)

_PCT_COLS_SQL = ",\n       ".join(
    f"CAST(ROUND(quantile_cont(l_extendedprice, {p}), 4) AS DOUBLE)"
    f" AS price_p{int(p * 100)}"
    for p in _PCTS
)

_PCT_SQL = f"""
SELECT l_returnflag,
       {_PCT_COLS_SQL},
       CAST(ROUND(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS qty_median
FROM lineitem
GROUP BY l_returnflag
"""


@register("stats_percentiles_by_flag", sql=_PCT_SQL)
def percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linear-interpolated percentiles per group (no approx sketch:
    the oracle needs exact, and Spark's `percentile` is a single-pass
    sort-based exact aggregate). One shuffle on the 3-value group key;
    at 100 TB swap in approx_percentile for the sketch path — same plan
    shape, mergeable state."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE percentile buffer for all four price points (array form) —
    # four scalar percentile aggregates each built and shuffled their
    # own value->count map of the SAME column; the array form sorts one
    # buffer and reads the four interpolation points from it (identical
    # algorithm per point, so identical doubles)
    prices = F.percentile(
        "l_extendedprice", F.array(*[F.lit(p) for p in _PCTS])
    )
    out = li.groupBy("l_returnflag").agg(
        prices.alias("_prices"),
        F.round(F.percentile("l_quantity", 0.5), 4).alias("qty_median"),
    )
    return out.select(
        "l_returnflag",
        *[
            F.round(F.col("_prices")[i], 4).alias(f"price_p{int(p * 100)}")
            for i, p in enumerate(_PCTS)
        ],
        "qty_median",
    )


# --- correlation from exact component sums ----------------------------------

_CORR_SQL = """
WITH comp AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                  * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(ROUND((n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS DOUBLE)
         AS corr_price_discount_r
FROM comp
"""


@register("stats_corr_price_discount", sql=_CORR_SQL)
def corr_price_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group, computed from EXACT decimal component
    sums (n, Σx, Σy, Σxy, Σx², Σy²) then one double formula — unlike the
    built-in `corr` (streaming double accumulation, order-dependent in the
    last bits), this is bit-reproducible across partitionings and engines.
    Single map-side-combinable aggregate; the formula runs on G rows."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = _dec("l_extendedprice"), _dec("l_discount")
    comp = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return comp.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_price_discount_r")
    )


# --- ntile decile buckets over event values ---------------------------------

_NTILE_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         NTILE(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS decile
  FROM events
)
SELECT event_type, decile, COUNT(*) AS n_events,
       MIN(value) AS lo, MAX(value) AS hi
FROM ranked
GROUP BY event_type, decile
"""


@register("events_ntile_value_deciles", sql=_NTILE_SQL)
def ntile_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing per event type: NTILE(10) with a TOTAL order
    (value, event_id tie-break — without it the bucket boundaries are
    nondeterministic), then per-bucket count/min/max. min/max of doubles
    are order-independent, so no decimal detour needed. One shuffle on
    event_type (5 partitions — at 100 TB pre-range-partition by value
    instead; same semantics via percent_rank)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


# --- fixed-width histogram ---------------------------------------------------

_HIST_BIN_WIDTH = 5000.0
_HIST_MAX_BIN = 19

_HIST_SQL = f"""
SELECT l_returnflag,
       LEAST(CAST(FLOOR(l_extendedprice / {_HIST_BIN_WIDTH}) AS BIGINT),
             {_HIST_MAX_BIN}) AS bin,
       COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi
FROM lineitem
GROUP BY l_returnflag,
         LEAST(CAST(FLOOR(l_extendedprice / {_HIST_BIN_WIDTH}) AS BIGINT),
               {_HIST_MAX_BIN})
"""


@register("stats_histogram_price", sql=_HIST_SQL)
def histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram with a clamped overflow bin — the profiling
    primitive behind data-quality dashboards. bin = min(⌊x/w⌋, max_bin):
    one double divide + floor per row (deterministic — no percentile
    sort), then a single group-by whose key space is bounded (flags ×
    bins), so the final aggregate is tiny at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.floor(F.col("l_extendedprice") / _HIST_BIN_WIDTH).cast("bigint"),
        F.lit(_HIST_MAX_BIN).cast("bigint"),
    )
    return (
        li.select("l_returnflag", bin_col.alias("bin"), "l_extendedprice")
        .groupBy("l_returnflag", "bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
    )


# --- exact heavy hitters per event type --------------------------------------

_HH_TOPK = 5

_HH_SQL = f"""
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS n_events
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, n_events, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, user_id) AS rk
  FROM counts
) WHERE rk <= {_HH_TOPK}
"""


@register("events_heavy_hitters", sql=_HH_SQL)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{k} users by event count per type: count aggregate (the
    corpus-sized shuffle, map-side combinable) then a bounded top-k window
    over the already-aggregated counts with a total-order tie-break. At
    100 TB the window input is |users × types| rows, not |events| — the
    heavy lifting stays in the combinable aggregate."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), "user_id"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HH_TOPK)
        .select("event_type", "user_id", "n_events", "rk")
    )


# --- pivot: daily event-type count matrix ------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_SQL = f"""
SELECT date_trunc('day', ts) AS day,
       {", ".join(
           f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY date_trunc('day', ts)
"""


@register("events_pivot_daily_type_counts", sql=_PIVOT_SQL)
def pivot_daily_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshape: one row per day, one column per event type,
    as ONE conditional aggregate (single shuffle on day, map-side
    combinable). Spark's `.pivot(values)` expresses the same result but
    compiles to TWO aggregates/exchanges ((day,type) count then
    pivotfirst) — measured and pinned in test_pivot_fewer_exchanges — so
    for a FIXED small column set the CASE-sum form is the 100 TB plan;
    `.pivot` earns its keep only when the value list is open-ended."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return ev.select(day, "event_type").groupBy("day").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
            for t in _EVENT_TYPES
        ]
    )


def pivot_daily_type_counts_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`.pivot`-operator twin of events_pivot_daily_type_counts (same
    rows/schema; two-exchange plan). Kept for the plan-shape comparison."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# --- z-score anomaly flagging ------------------------------------------------

_Z_THRESH = 3.0

_ZSCORE_SQL = """
WITH comp AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
stats AS (
  SELECT event_type, n, s1 / n AS mu,
         sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma
  FROM comp
)
SELECT e.event_id, e.event_type, e.value,
       CAST(ROUND((e.value - s.mu) / s.sigma, 6) AS DOUBLE) AS z_r
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE abs((e.value - s.mu) / s.sigma) > {z}
""".format(z=_Z_THRESH)


@register("events_anomaly_zscore", sql=_ZSCORE_SQL)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging per event type: population mean/std from
    EXACT decimal component sums (bit-reproducible, like
    stats_corr_price_discount), broadcast back onto the stream, keep
    |z| > {t}. Two passes over events — the stats aggregate (5 groups)
    and the scoring scan with a broadcast join; no row-level shuffle."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    comp = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    stats = comp.select(
        "event_type",
        "n",
        mu.alias("mu"),
        F.sqrt(F.col("s2") / F.col("n") - mu * mu).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > _Z_THRESH)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z_r"))
    )


# --- Markov transition matrix over user event sequences ----------------------

_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(ROUND(CAST(n_transitions AS DOUBLE) /
            SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS DOUBLE)
         AS prob_r
FROM trans
"""


@register("events_markov_transitions", sql=_MARKOV_SQL)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: lag window
    per user (total order (ts, event_id)), transition counts, row-
    normalized probabilities. The per-user window shuffles events once on
    user_id; everything after runs on the |types|² transition matrix.
    Probabilities are exact-count ratios — no float accumulation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    wt = Window.partitionBy("prev_type")
    prob = F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wt)
    return trans.select(
        "prev_type", "next_type", "n_transitions",
        F.round(prob, 6).alias("prob_r"),
    )


# --- RFM segmentation --------------------------------------------------------

_RFM_SQL = """
WITH anchor AS (SELECT MAX(ts) AS max_ts FROM events),
purchases AS (
  SELECT user_id,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary,
         MAX(ts) AS last_purchase
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
scored AS (
  SELECT p.user_id, p.frequency, p.monetary,
         date_diff('second', p.last_purchase, a.max_ts) AS recency_s,
         NTILE(5) OVER (ORDER BY date_diff('second', p.last_purchase, a.max_ts),
                        p.user_id) AS r_score,
         NTILE(5) OVER (ORDER BY p.frequency DESC, p.user_id) AS f_score,
         NTILE(5) OVER (ORDER BY p.monetary DESC, p.user_id) AS m_score
  FROM purchases p CROSS JOIN anchor a
)
SELECT user_id, frequency, monetary, recency_s, r_score, f_score, m_score,
       (r_score = 1 AND f_score <= 2) AS is_champion
FROM scored
"""


@register("events_rfm_segmentation", sql=_RFM_SQL)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency/frequency/monetary per user with
    NTILE(5) scores (total-order tie-breaks on user_id — without them the
    quintile edges are nondeterministic). Monetary uses the exact-decimal
    sum.

    Scale shape: user cardinality grows with the data, so each of the
    three NTILEs is computed as a two-pass range-partitioned global rank
    (operators/ranking.py) + the shared NTILE bucket formula over
    (rank, total) — three range shuffles over the user-grain aggregate,
    zero single-partition sorts."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    purchases = p.groupBy("user_id").agg(
        F.count("*").alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("monetary"),
        F.max("ts").alias("last_purchase"),
    )
    scored = purchases.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_s",
        F.col("max_ts").cast("long") - F.col("last_purchase").cast("long"),
    )
    # three INDEPENDENT narrow rank pipelines joined back on the unique
    # user key, instead of chaining the three two-pass ranks (chained,
    # each repartitionByRange's boundary sampling re-executed every
    # upstream pass — ~40 serial jobs per action; independent, the three
    # range sorts run as parallel stages of one DAG and each shuffles
    # only (user_id, one measure) instead of the widening row)
    scored = scored.transform(persist_scoped)
    rk_r = attach_global_order(
        scored.select("user_id", "recency_s"),
        [F.col("recency_s").asc(), F.col("user_id").asc()],
        rank_col="_rk_r", total_col="_n",
    ).select("user_id", "_rk_r", "_n")
    rk_f = attach_global_order(
        scored.select("user_id", "frequency"),
        [F.col("frequency").desc(), F.col("user_id").asc()],
        rank_col="_rk_f",
    ).select("user_id", "_rk_f")
    rk_m = attach_global_order(
        scored.select("user_id", "monetary"),
        [F.col("monetary").desc(), F.col("user_id").asc()],
        rank_col="_rk_m",
    ).select("user_id", "_rk_m")
    out = (
        scored.join(rk_r, "user_id")
        .join(rk_f, "user_id")
        .join(rk_m, "user_id")
        .select(
            "user_id",
            "frequency",
            "monetary",
            "recency_s",
            ntile_from_rank(F.col("_rk_r"), F.col("_n"), 5).alias("r_score"),
            ntile_from_rank(F.col("_rk_f"), F.col("_n"), 5).alias("f_score"),
            ntile_from_rank(F.col("_rk_m"), F.col("_n"), 5).alias("m_score"),
        )
    )
    return out.withColumn(
        "is_champion", (F.col("r_score") == 1) & (F.col("f_score") <= 2)
    )


# --- top 3-step user paths ---------------------------------------------------

_PATHS_TOPK = 10

_PATHS_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS prev1,
         LAG(event_type, 2) OVER w AS prev2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT prev2 || '>' || prev1 || '>' || event_type AS path,
         COUNT(*) AS n_paths
  FROM seq WHERE prev2 IS NOT NULL
  GROUP BY prev2 || '>' || prev1 || '>' || event_type
)
SELECT path, n_paths, rk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_paths DESC, path) AS rk
  FROM paths
) WHERE rk <= {_PATHS_TOPK}
"""


@register("events_top_paths_3step", sql=_PATHS_SQL)
def top_paths_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: top-{k} 3-step event-type sequences across all user
    journeys — two LAGs over the same per-user window (one shuffle on
    user_id, windows share the sort), then a count on the tiny |types|³
    path space and a bounded top-k."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    )
    paths = (
        seq.filter(F.col("prev2").isNotNull())
        .select(
            F.concat_ws(">", "prev2", "prev1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_paths"))
    )
    wr = Window.orderBy(F.col("n_paths").desc(), "path")
    return (
        paths.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _PATHS_TOPK)
        .select("path", "n_paths", "rk")
    )


# --- referential-integrity audit ---------------------------------------------

_RI_SQL = """
SELECT 'lineitem.l_orderkey -> orders' AS fk, COUNT(*) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders.o_custkey -> customer', COUNT(*)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer.c_nationkey -> nation', COUNT(*)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'lineitem.l_partkey -> part', COUNT(*)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
"""


@register("dq_referential_integrity", sql=_RI_SQL)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every FK edge of
    the corpus, as LEFT ANTI joins (no row multiplication, dims
    broadcast). The union of four tiny counts is the DQ report a
    pipeline gates on before publishing — the batch analogue of the
    connector's tombstone-vs-missing-row distinction."""
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )

    def orphans(child, key, parent, pkey, label):
        return (
            child.select(F.col(key))
            .join(parent.select(F.col(pkey).alias(key)), key, "left_anti")
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(t["lineitem"], "l_orderkey", t["orders"], "o_orderkey",
                "lineitem.l_orderkey -> orders")
        .unionByName(
            orphans(t["orders"], "o_custkey", t["customer"], "c_custkey",
                    "orders.o_custkey -> customer"))
        .unionByName(
            orphans(t["customer"], "c_nationkey", t["nation"], "n_nationkey",
                    "customer.c_nationkey -> nation"))
        .unionByName(
            orphans(t["lineitem"], "l_partkey", t["part"], "p_partkey",
                    "lineitem.l_partkey -> part"))
    )


# --- market-basket part-pair lift --------------------------------------------

_BASKET_MIN_PAIR = 3
_BASKET_TOPK = 20

_BASKET_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
item AS (
  SELECT l_partkey, COUNT(*) AS n_item FROM baskets GROUP BY l_partkey
),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_BASKET_MIN_PAIR}
),
scored AS (
  SELECT p.part_a, p.part_b, p.n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
         CAST(p.n_pair AS DOUBLE) * n.n_orders
           / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE)) AS lift
  FROM pair p
  JOIN item ia ON ia.l_partkey = p.part_a
  JOIN item ib ON ib.l_partkey = p.part_b
  CROSS JOIN n
)
SELECT part_a, part_b, n_pair, n_a, n_b, rk,
       CAST(ROUND(lift, 6) AS DOUBLE) AS lift_r
FROM (
  SELECT *, ROW_NUMBER() OVER (
      ORDER BY lift DESC, part_a, part_b) AS rk
  FROM scored
) WHERE rk <= {_BASKET_TOPK}
"""


@register("basket_part_pair_lift", sql=_BASKET_SQL)
def basket_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top part pairs by lift = P(a,b)/(P(a)P(b))
    over order baskets. Pairs come from the per-order item-SET expansion
    (operators/graphs.pair_counts_from_sets: baskets are small, so
    per-row pair mass is |basket|² ≈ 16, never corpus²) — one
    order-keyed exchange feeds pairs, supports AND the total; the SQL
    above keeps the distinct + order-keyed self-join form because that
    is the oracle's dialect, not this plan's shape. Lift is an
    exact-count rational. HAVING prunes the pair tail before scoring."""
    li = load_table(spark, sf_dir, "lineitem")
    # per-order item sets (operators/graphs.py): ONE order-keyed exchange
    # feeds pairs, supports AND the total — the distinct + order-keyed
    # self-join shape cost 4 exchanges for the same relations
    sets = order_item_sets(li)
    sets.transform(persist_scoped)  # feeds pair expansion + supports + total
    # total-order count as a LAZY broadcast scalar (cross-joined onto the
    # pair-grain relation) instead of a blocking .count() at plan time —
    # one DAG, no driver round trip, same exact integer (one row per
    # distinct order, so count(*) == the old countDistinct(l_orderkey))
    n_orders_df = sets.agg(F.count("*").alias("_n_orders"))
    item = (
        sets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_item"))
    )
    pair = (
        pair_counts_from_sets(sets)
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("w").alias("n_pair"),
        )
        .filter(F.col("n_pair") >= _BASKET_MIN_PAIR)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    lift = (
        F.col("n_pair").cast("double")
        * F.col("_n_orders")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    scored = (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "part_a", "part_b", "n_pair", "n_a", "n_b", lift.alias("lift")
        )
    )
    w = Window.orderBy(F.col("lift").desc(), "part_a", "part_b")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BASKET_TOPK)
        .select(
            "part_a", "part_b", "n_pair", "n_a", "n_b", "rk",
            F.round("lift", 6).alias("lift_r"),
        )
    )


# --- CUSUM changepoint detection over daily volumes --------------------------

_CUSUM_THRESH = 50.0

_CUSUM_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY date_trunc('day', ts)
),
m AS (
  SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu FROM daily
),
c AS (
  SELECT day, n,
         SUM(n) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         ROW_NUMBER() OVER (ORDER BY day) AS rk,
         m.mu
  FROM daily CROSS JOIN m
),
s AS (
  SELECT day, n,
         CAST(cum_n AS DOUBLE) - CAST(rk AS DOUBLE) * mu AS cusum
  FROM c
)
SELECT day, n, CAST(ROUND(cusum, 6) + 0.0 AS DOUBLE) AS cusum_r,
       (abs(cusum) > {t}) AS is_shift
FROM s
""".format(t=_CUSUM_THRESH)


@register("events_cusum_changepoint", sql=_CUSUM_SQL)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen on daily event volume: cumulative sum of
    deviations from the global mean; |CUSUM| exceeding the threshold
    flags a level shift. The corpus-sized work is one daily count
    aggregate; the running sum orders only the day-grain relation.
    Accumulation is INTEGER (exact running count), and the deviation form
    cusum_k = cum_n − k·mu is a single float expression per row — no
    float accumulation at all, because engines disagree on windowed float
    summation internals (DuckDB produced −0.0 where Spark produced +0.0
    on the naive Σ(n−mu) form)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    m = daily.agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mu")
    )
    w_rows = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_rank = Window.orderBy("day")
    c = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        F.sum("n").over(w_rows).alias("cum_n"),
        F.row_number().over(w_rank).alias("rk"),
        "mu",
    )
    cusum = F.col("cum_n").cast("double") - F.col("rk").cast("double") * F.col("mu")
    return c.select(
        "day",
        "n",
        # +0.0 folds IEEE −0.0 to +0.0: DuckDB's ROUND preserves the sign
        # of a tiny negative (−0.0) where Spark's BigDecimal round gives
        # +0.0 — the one place the engines' ROUNDs disagree
        (F.round(cusum, 6) + F.lit(0.0)).alias("cusum_r"),
        (F.abs(cusum) > _CUSUM_THRESH).alias("is_shift"),
    )


# --- Pareto 80/20: cumulative revenue concentration --------------------------

_PARETO_SHARE = 0.8

_PARETO_SQL = f"""
WITH cust AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT SUM(revenue) AS total FROM cust),
ranked AS (
  SELECT c.o_custkey, c.revenue,
         ROW_NUMBER() OVER (ORDER BY c.revenue DESC, c.o_custkey) AS rk,
         CAST(SUM(c.revenue) OVER (ORDER BY c.revenue DESC, c.o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(t.total AS DOUBLE) AS cum_share
  FROM cust c CROSS JOIN tot t
)
SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue_d, rk,
       CAST(ROUND(cum_share, 6) AS DOUBLE) AS cum_share_r
FROM ranked
WHERE cum_share <= {_PARETO_SHARE}
"""


@register("orders_pareto_8020", sql=_PARETO_SQL)
def pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: the top customers that together cover 80% of
    revenue — descending running share over the customer-grain aggregate
    (exact decimal sums; ONE double division against the exact total per
    row, so the share is order-independent of the aggregate's
    parallelism). Revenue ties broken by custkey for a total order.

    Scale shape: customer cardinality grows with the data, so the global
    rank + running sum use the two-pass range-partitioned operator
    (operators/ranking.py) — no ``Window.orderBy`` single-partition sort
    over the customer grain; the only single-partition fold left is the
    one-row grand-total aggregate."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
    )
    tot = cust.agg(F.sum("revenue").alias("total"))
    ranked = attach_global_order(
        cust,
        [F.col("revenue").desc(), F.col("o_custkey").asc()],
        rank_col="rk",
        running_sums={"cum_rev": "revenue"},
    )
    shared = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "cum_share", F.col("cum_rev").cast("double") / F.col("total").cast("double")
    )
    return shared.filter(F.col("cum_share") <= _PARETO_SHARE).select(
        "o_custkey",
        F.col("revenue").cast("double").alias("revenue_d"),
        "rk",
        F.round("cum_share", 6).alias("cum_share_r"),
    )


# --- triangle counting on the co-purchase graph ------------------------------

_TRI_MIN_PAIR = 2

_TRIANGLE_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_TRI_MIN_PAIR}
)
SELECT e1.u AS part_a, e1.v AS part_b, e2.v AS part_c
FROM edges e1
JOIN edges e2 ON e2.u = e1.v
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


@register("graph_copurchase_triangles", sql=_TRIANGLE_SQL)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the co-purchase graph (parts bought
    together ≥ {m} times): the canonical u<v<w two-join pattern over the
    ORIENTED edge list — orientation (u<v) means each triangle matches
    exactly once and the join fan-out is bounded by out-degree, the
    standard distributed triangle formulation. Edge building reuses the
    basket self-join shape (order-keyed, never corpus²)."""
    li = load_table(spark, sf_dir, "lineitem")
    # edge build via per-order item sets (operators/graphs.py): one
    # order-keyed exchange + the pair aggregate, replacing the distinct +
    # order-keyed self-join shape (4 exchanges); counts identical
    edges = (
        order_pair_counts(li)
        .filter(F.col("w") >= _TRI_MIN_PAIR)
        .select("u", "v")
    )
    edges.transform(persist_scoped)  # three roles in the triangle join
    e1 = edges.select(F.col("u").alias("part_a"), F.col("v").alias("part_b"))
    e2 = edges.select(F.col("u").alias("part_b"), F.col("v").alias("part_c"))
    e3 = edges.select(F.col("u").alias("part_a"), F.col("v").alias("part_c"))
    return (
        e1.join(e2, "part_b")
        .join(e3, ["part_a", "part_c"])
        .select("part_a", "part_b", "part_c")
    )


# --- A/B conversion z-test ---------------------------------------------------

_AB_SQL = """
WITH assign AS (
  SELECT DISTINCT user_id, (user_id % 2 = 0) AS treated FROM events
),
converted AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND value >= 150
),
arms AS (
  SELECT a.treated,
         COUNT(*) AS n_users,
         CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conv
  FROM assign a LEFT JOIN converted c ON c.user_id = a.user_id
  GROUP BY a.treated
),
wide AS (
  SELECT
    MAX(CASE WHEN treated THEN n_users END) AS n1,
    MAX(CASE WHEN treated THEN n_conv END) AS x1,
    MAX(CASE WHEN NOT treated THEN n_users END) AS n2,
    MAX(CASE WHEN NOT treated THEN n_conv END) AS x2
  FROM arms
)
SELECT n1, x1, n2, x2,
       CAST(ROUND(CAST(x1 AS DOUBLE) / n1, 6) AS DOUBLE) AS p1_r,
       CAST(ROUND(CAST(x2 AS DOUBLE) / n2, 6) AS DOUBLE) AS p2_r,
       CAST(ROUND(
         (CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
         / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                * (1.0 / n1 + 1.0 / n2)), 6) AS DOUBLE) AS z_r
FROM wide
"""


@register("events_ab_conversion_ztest", sql=_AB_SQL)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between hash-assigned
    arms (user_id parity — the deterministic assignment an experiment
    platform uses); conversion = any high-value purchase (≥150 — plain
    'any purchase' is degenerate on this corpus: every user converts and
    the pooled variance is zero). Counts are exact; the z statistic is ONE double
    formula over four integers, written with identical operation order in
    both engines. The per-user collapse is the only corpus-sized work."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2 == 0).alias("treated")
    ).distinct()
    converted = (
        ev.filter(
            (F.col("event_type") == "purchase") & (F.col("value") >= 150)
        )
        .select("user_id").distinct()
        .withColumn("conv", F.lit(1))
    )
    arms = (
        assign.join(converted, "user_id", "left")
        .groupBy("treated")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("conv"), F.lit(0))).alias("n_conv"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("treated"), F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("treated"), F.col("n_conv"))).alias("x1"),
        F.max(F.when(~F.col("treated"), F.col("n_users"))).alias("n2"),
        F.max(F.when(~F.col("treated"), F.col("n_conv"))).alias("x2"),
    )
    n1, x1 = F.col("n1"), F.col("x1")
    n2, x2 = F.col("n2"), F.col("x2")
    p1 = x1.cast("double") / n1
    p2 = x2.cast("double") / n2
    pool = (x1 + x2).cast("double") / (n1 + n2)
    z = (p1 - p2) / F.sqrt(
        pool * (1 - pool) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    )
    return wide.select(
        "n1", "x1", "n2", "x2",
        F.round(p1, 6).alias("p1_r"),
        F.round(p2, 6).alias("p2_r"),
        F.round(z, 6).alias("z_r"),
    )


# --- PK uniqueness audit -----------------------------------------------------

_UNIQ_SQL = """
SELECT 'customer.c_custkey' AS pk, COUNT(*) AS n_rows,
       COUNT(DISTINCT c_custkey) AS n_distinct,
       (COUNT(*) = COUNT(DISTINCT c_custkey)) AS is_unique
FROM customer
UNION ALL
SELECT 'orders.o_orderkey', COUNT(*), COUNT(DISTINCT o_orderkey),
       COUNT(*) = COUNT(DISTINCT o_orderkey)
FROM orders
UNION ALL
SELECT 'part.p_partkey', COUNT(*), COUNT(DISTINCT p_partkey),
       COUNT(*) = COUNT(DISTINCT p_partkey)
FROM part
UNION ALL
SELECT 'lineitem.(orderkey,linenumber,partkey,suppkey)', COUNT(*),
       COUNT(DISTINCT (l_orderkey, l_linenumber, l_partkey, l_suppkey)),
       COUNT(*) = COUNT(DISTINCT (l_orderkey, l_linenumber, l_partkey, l_suppkey))
FROM lineitem
"""


@register("dq_pk_uniqueness", sql=_UNIQ_SQL)
def pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit per table (row count vs distinct key
    count) — with the RI audit, the two invariants every CDC-materialized
    table must keep (a broken LWW merge shows up here first). Each leg is
    one combinable aggregate; the compound lineitem key counts distinct
    structs."""
    t = load_tables(spark, sf_dir, "customer", "orders", "part", "lineitem")

    def leg(df, label, *cols):
        key = F.struct(*[F.col(c) for c in cols]) if len(cols) > 1 else F.col(cols[0])
        return df.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(key).alias("n_distinct"),
        ).select(
            F.lit(label).alias("pk"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
        )

    return (
        leg(t["customer"], "customer.c_custkey", "c_custkey")
        .unionByName(leg(t["orders"], "orders.o_orderkey", "o_orderkey"))
        .unionByName(leg(t["part"], "part.p_partkey", "p_partkey"))
        .unionByName(
            leg(
                t["lineitem"],
                "lineitem.(orderkey,linenumber,partkey,suppkey)",
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            )
        )
    )


# --- day-of-week seasonality profile ----------------------------------------

_DOW_SQL = """
WITH d AS (
  SELECT dayofweek(ts) AS dow, COUNT(*) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purch
  FROM events GROUP BY dayofweek(ts)
),
t AS (SELECT SUM(n) AS total FROM d)
SELECT d.dow, d.n, d.n_purch,
       CAST(ROUND(CAST(d.n AS DOUBLE) / t.total, 6) AS DOUBLE) AS share_r,
       CAST(ROUND(CAST(d.n_purch AS DOUBLE) / d.n, 6) AS DOUBLE)
         AS purchase_rate_r
FROM d CROSS JOIN t
"""


@register("events_dow_seasonality", sql=_DOW_SQL)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: traffic share and purchase rate per
    weekday — the seasonal profile that feeds anomaly baselines and
    capacity planning. One conditional aggregate over events (7 groups);
    shares are exact-count rationals. DuckDB's dayofweek is 0=Sunday and
    Spark's is 1=Sunday — normalized to DuckDB's numbering."""
    ev = load_table(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday
    dow = (F.dayofweek("ts") - 1).alias("dow")
    d = ev.select(dow, "event_type").groupBy("dow").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purch"),
    )
    t = d.agg(F.sum("n").alias("total"))
    return d.crossJoin(F.broadcast(t)).select(
        "dow",
        "n",
        "n_purch",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share_r"),
        F.round(F.col("n_purch").cast("double") / F.col("n"), 6).alias(
            "purchase_rate_r"
        ),
    )


# --- month-over-month revenue growth -----------------------------------------

_MOM_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY date_trunc('month', o_orderdate)
),
seq AS (
  SELECT month, revenue,
         LAG(revenue) OVER (ORDER BY month) AS prev_rev
  FROM monthly
)
SELECT month, CAST(revenue AS DOUBLE) AS revenue_d,
       CAST(ROUND(CASE WHEN prev_rev IS NULL THEN NULL
            ELSE CAST(revenue - prev_rev AS DOUBLE)
                 / CAST(prev_rev AS DOUBLE) END, 6) AS DOUBLE) AS mom_growth_r
FROM seq
"""


@register("orders_monthly_growth", sql=_MOM_SQL)
def monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: exact decimal monthly sums, LAG
    over the month-grain relation, growth = exact decimal difference over
    the exact prior month (ONE double division — no float chaining).
    First month's growth is null by construction."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("month")
        .agg(F.sum("p").alias("revenue"))
    )
    w = Window.orderBy("month")
    seq = monthly.withColumn("prev_rev", F.lag("revenue").over(w))
    growth = F.when(
        F.col("prev_rev").isNull(), F.lit(None).cast("double")
    ).otherwise(
        (F.col("revenue") - F.col("prev_rev")).cast("double")
        / F.col("prev_rev").cast("double")
    )
    return seq.select(
        "month",
        F.col("revenue").cast("double").alias("revenue_d"),
        F.round(growth, 6).alias("mom_growth_r"),
    )


# --- inter-arrival gap statistics per event type -----------------------------

_GAP_SQL = """
WITH seq AS (
  SELECT event_type,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_gaps,
       MIN(gap_s) AS min_gap_s,
       CAST(ROUND(quantile_cont(CAST(gap_s AS DOUBLE), 0.5), 4) AS DOUBLE)
         AS median_gap_s,
       CAST(ROUND(quantile_cont(CAST(gap_s AS DOUBLE), 0.9), 4) AS DOUBLE)
         AS p90_gap_s,
       MAX(gap_s) AS max_gap_s
FROM seq WHERE gap_s IS NOT NULL
GROUP BY event_type
"""


@register("events_interarrival_gaps", sql=_GAP_SQL)
def interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event type (per-user LAG, then
    exact percentiles of the integer-second gaps) — the statistic that
    calibrates session-gap thresholds and watermark delays (p90 gap ≈
    the smallest safe session timeout). One shuffle on (user, type) for
    the lag; percentiles aggregate the gap relation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    seq = ev.select("event_type", gap.alias("gap_s"))
    g = F.col("gap_s").cast("double")
    return (
        seq.filter(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.round(F.percentile(g, 0.5), 4).alias("median_gap_s"),
            F.round(F.percentile(g, 0.9), 4).alias("p90_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
    )
