"""Additional engine surface: bounded BFS traversal, median-absolute-
deviation robust stats, and array/regexp function galleries.

Determinism: BFS hops and MAD follow the established regimes (integer
hops / interpolated exact percentiles that Spark `percentile` and DuckDB
`quantile_cont` compute identically, ROUND as presentation). Regexp
patterns are restricted to constructs RE2 (DuckDB) and Java regex agree
on (character classes, anchors, +) — no backrefs/lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.operators.graphs import order_pair_counts
from cdc_apache_cassandra_spark.operators.ranking import attach_global_order
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table
from cdc_apache_cassandra_spark.caching import persist_scoped

# --- bounded BFS: hop distance from seed parts over co-purchase edges -------

_BFS_MIN_PAIR = 2
_BFS_SEED_SIZE = 50
_BFS_HOPS = 3

_BFS_EDGES_CTE = f"""
baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
halfedges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_BFS_MIN_PAIR}
),
edges AS (
  SELECT u, v FROM halfedges UNION ALL SELECT v, u FROM halfedges
),
seeds AS (
  SELECT p_partkey AS node FROM part WHERE p_size = {_BFS_SEED_SIZE}
),
h0 AS (SELECT node, 0 AS hop FROM seeds),
h1 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM h0
    UNION ALL
    SELECT e.v AS node, 1 AS hop FROM h0 JOIN edges e ON e.u = h0.node
  ) GROUP BY node
),
h2 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM h1
    UNION ALL
    SELECT e.v AS node, h1.hop + 1 AS hop FROM h1 JOIN edges e ON e.u = h1.node
  ) GROUP BY node
),
h3 AS (
  SELECT node, MIN(hop) AS hop FROM (
    SELECT node, hop FROM h2
    UNION ALL
    SELECT e.v AS node, h2.hop + 1 AS hop FROM h2 JOIN edges e ON e.u = h2.node
  ) GROUP BY node
)
"""

_BFS_SQL = f"""
WITH {_BFS_EDGES_CTE}
SELECT node AS p_partkey, hop FROM h3
"""


@register("graph_bfs_hops", sql=_BFS_SQL)
def bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS ({h} hops) from seed parts over the symmetric
    co-purchase graph: each iteration is one join + min-aggregate —
    frontier-free label relaxation (every iteration relaxes ALL labels,
    so min(hop) converges like Bellman-Ford; for a {h}-hop cap the
    unrolled form IS the fixpoint). The oracle unrolls the identical
    three steps. Each iteration persists its label table (read twice:
    union + join) and broadcasts it into the edge join — labels stay
    seed-bounded while edges stream; for unbounded BFS reuse
    operators/text_dedup.connected_components' checkpoint discipline."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # edge build via per-order item sets (operators/graphs.py): one
    # order-keyed exchange + the pair aggregate, replacing the distinct +
    # order-keyed self-join shape (4 exchanges); counts identical
    half = (
        order_pair_counts(li)
        .filter(F.col("w") >= _BFS_MIN_PAIR)
        .select("u", "v")
    )
    edges = half.unionByName(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(persist_scoped)
    hops = part.filter(F.col("p_size") == _BFS_SEED_SIZE).select(
        F.col("p_partkey").alias("node"), F.lit(0).alias("hop")
    )
    for _ in range(_BFS_HOPS):
        relaxed = F.broadcast(hops).join(edges, hops["node"] == edges["u"]).select(
            F.col("v").alias("node"), (F.col("hop") + 1).alias("hop")
        )
        hops = (
            hops.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hop").alias("hop"))
            # each iteration reads `hops` TWICE (union + join input): persist
            # or the subtree doubles per hop (2^h recomputation)
            .transform(persist_scoped)
        )
    return hops.select(F.col("node").alias("p_partkey"), "hop")


# --- robust stats: median absolute deviation --------------------------------

_MAD_SQL = """
WITH med AS (
  SELECT event_type, COUNT(*) AS n,
         quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, m.n, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON m.event_type = e.event_type
)
SELECT event_type, n,
       CAST(ROUND(med, 4) AS DOUBLE) AS median_r,
       CAST(ROUND(quantile_cont(adev, 0.5), 4) AS DOUBLE) AS mad_r
FROM dev GROUP BY event_type, n, med
"""


@register("stats_mad_value", sql=_MAD_SQL)
def mad_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust spread
    estimator outlier screens want (z-scores blow up on heavy tails).
    Two exact percentile passes: per-type median (tiny broadcast back),
    then median of |value − median|. Same deterministic interpolated
    percentile both engines; doubles only pass through abs/subtract."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    return dev.groupBy("event_type", "n", "med").agg(
        F.round(F.first("med"), 4).alias("median_r0"),
        F.round(F.percentile("adev", 0.5), 4).alias("mad_r"),
    ).select(
        "event_type",
        "n",
        F.col("median_r0").alias("median_r"),
        "mad_r",
    )


# --- array function gallery -------------------------------------------------

_ARRAY_SQL = """
WITH items AS (
  SELECT l_orderkey, list_sort(list(l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(parts) AS n_items,
       len(list_distinct(parts)) AS n_distinct,
       CAST(to_json(parts[1:3]) AS VARCHAR) AS first3,
       parts[1] AS head_part,
       parts[len(parts)] AS last_part,
       list_min(parts) AS min_part,
       list_max(parts) AS max_part,
       list_contains(parts, 10) AS has_anchor,
       CAST(to_json(list_reverse(parts)) AS VARCHAR) AS parts_desc
FROM items
"""


@register("fn_array_gallery", sql=_ARRAY_SQL)
def array_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array built-ins over the per-order item list (array built by a
    total-order sort so both engines hold identical arrays): size,
    distinct, slice, head/last element_at, min/max, membership, reverse.
    One shuffle (the groupBy); everything after is a narrow map."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("parts")
    )
    return items.select(
        "l_orderkey",
        F.size("parts").alias("n_items"),
        F.size(F.array_distinct("parts")).alias("n_distinct"),
        F.to_json(F.slice("parts", 1, 3)).alias("first3"),
        F.element_at("parts", 1).alias("head_part"),
        F.element_at("parts", -1).alias("last_part"),
        F.array_min("parts").alias("min_part"),
        F.array_max("parts").alias("max_part"),
        F.array_contains("parts", F.lit(10)).alias("has_anchor"),
        F.to_json(F.reverse("parts")).alias("parts_desc"),
    )


# --- regexp function gallery ------------------------------------------------

_REGEX_SQL = """
SELECT p_partkey,
       regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_no_vowels,
       regexp_matches(p_name, 'widget$') AS is_widget,
       regexp_matches(p_name, '^(small|large)') AS has_size_prefix,
       length(regexp_replace(p_brand, '[^0-9]', '', 'g')) AS n_digits,
       regexp_replace(p_type, '^PROMO', 'P_', 'g') AS type_abbrev
FROM part
"""


@register("fn_regex_gallery", sql=_REGEX_SQL)
def regex_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp built-ins: extract/replace-all/match, restricted to the
    regex subset RE2 and Java agree on (classes, anchors, alternation —
    no backrefs or lookaround, which RE2 rejects by design). Narrow map,
    codegen'd JVM regex in the hot path."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_no_vowels"),
        F.col("p_name").rlike("widget$").alias("is_widget"),
        F.col("p_name").rlike("^(small|large)").alias("has_size_prefix"),
        F.length(F.regexp_replace("p_brand", "[^0-9]", "")).alias("n_digits"),
        F.regexp_replace("p_type", "^PROMO", "P_").alias("type_abbrev"),
    )


# --- null-safe join (IS NOT DISTINCT FROM / eqNullSafe) ---------------------

_NULLSAFE_SQL_TEMPLATE = """
WITH {cte},
muts AS (
  SELECT DISTINCT pk_p, pk_c, op, writetime FROM compound_events
),
pairs AS (
  SELECT a.pk_p, a.pk_c
  FROM muts a JOIN muts b
    ON a.pk_p = b.pk_p
   AND a.pk_c IS NOT DISTINCT FROM b.pk_c
   AND a.writetime < b.writetime
),
paircnt AS (
  SELECT pk_p, pk_c, COUNT(*) AS n_ordered_pairs
  FROM pairs GROUP BY pk_p, pk_c
)
SELECT m.pk_p, m.pk_c, COUNT(*) AS n_muts,
       COALESCE(MAX(p.n_ordered_pairs), 0) AS n_ordered_pairs
FROM muts m
LEFT JOIN paircnt p
  ON p.pk_p = m.pk_p AND p.pk_c IS NOT DISTINCT FROM m.pk_c
GROUP BY m.pk_p, m.pk_c
"""


def _nullsafe_sql() -> str:
    from cdc_apache_cassandra_spark.sources.compound_event_source import (
        compound_events_cte,
    )

    return _NULLSAFE_SQL_TEMPLATE.format(cte=compound_events_cte())


@register("join_null_safe_mutation_pairs", sql=_nullsafe_sql())
def null_safe_mutation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (eqNullSafe / IS NOT DISTINCT FROM): mutations
    hitting the same (partition, clustering) target must group together
    even when the clustering key is NULL (partition-level events, P8) —
    a plain `=` join silently drops every NULL-keyed row, the classic
    tombstone-handling bug. Spark plans eqNullSafe as a hash join on the
    null-wrapped key, so it shuffles like any equi-join (no nested loop)."""
    from cdc_apache_cassandra_spark.sources.compound_event_source import (
        compound_events,
    )

    muts = (
        compound_events(spark, sf_dir)
        .select("pk_p", "pk_c", "op", "writetime")
        .distinct()
        .transform(persist_scoped)
    )
    a = muts.select("pk_p", "pk_c", F.col("writetime").alias("wt_a"))
    b = muts.select(
        F.col("pk_p").alias("pk_p_b"),
        F.col("pk_c").alias("pk_c_b"),
        F.col("writetime").alias("wt_b"),
    )
    paircnt = (
        a.join(
            b,
            (F.col("pk_p") == F.col("pk_p_b"))
            & F.col("pk_c").eqNullSafe(F.col("pk_c_b"))
            & (F.col("wt_a") < F.col("wt_b")),
        )
        .groupBy("pk_p", "pk_c")
        .agg(F.count("*").alias("n_ordered_pairs"))
    )
    pc = paircnt.select(
        F.col("pk_p").alias("pk_p_p"),
        F.col("pk_c").alias("pk_c_p"),
        "n_ordered_pairs",
    )
    return (
        muts.join(
            pc,
            (F.col("pk_p") == F.col("pk_p_p"))
            & F.col("pk_c").eqNullSafe(F.col("pk_c_p")),
            "left",
        )
        .groupBy("pk_p", "pk_c")
        .agg(
            F.count("*").alias("n_muts"),
            F.coalesce(F.max("n_ordered_pairs"), F.lit(0))
            .cast("bigint")
            .alias("n_ordered_pairs"),
        )
    )


# --- DAU/MAU stickiness ------------------------------------------------------

_STICKY_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
daily AS (
  SELECT day, COUNT(*) AS dau FROM du GROUP BY day
),
monthly AS (
  SELECT date_trunc('month', day) AS month,
         COUNT(DISTINCT user_id) AS mau
  FROM du GROUP BY date_trunc('month', day)
),
dsum AS (
  SELECT date_trunc('month', day) AS month,
         CAST(SUM(dau) AS BIGINT) AS dau_sum,
         COUNT(*) AS n_days
  FROM daily GROUP BY date_trunc('month', day)
)
SELECT m.month, m.mau, d.dau_sum, d.n_days,
       CAST(ROUND(CAST(d.dau_sum AS DOUBLE) /
            (CAST(d.n_days AS DOUBLE) * CAST(m.mau AS DOUBLE)), 6) AS DOUBLE)
         AS stickiness_r
FROM monthly m JOIN dsum d ON d.month = m.month
"""


@register("events_stickiness_dau_mau", sql=_STICKY_SQL)
def stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness (avg DAU / MAU) per month — the engagement ratio product
    analytics always asks for. One corpus-sized distinct to (day, user);
    everything after runs on day- and month-grain relations. Exact integer
    counts; one double ratio in identical operation order both engines."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    du = du.transform(persist_scoped)
    daily = du.groupBy("day").agg(F.count("*").alias("dau"))
    month = F.date_trunc("month", F.col("day")).alias("month")
    monthly = du.groupBy(month).agg(F.countDistinct("user_id").alias("mau"))
    dsum = daily.groupBy(month).agg(
        F.sum("dau").cast("bigint").alias("dau_sum"),
        F.count("*").alias("n_days"),
    )
    return monthly.join(dsum, "month").select(
        "month",
        "mau",
        "dau_sum",
        "n_days",
        F.round(
            F.col("dau_sum").cast("double")
            / (F.col("n_days").cast("double") * F.col("mau").cast("double")),
            6,
        ).alias("stickiness_r"),
    )


# --- map-type surface: build / extract / fold a MapType column --------------

_MAP_SQL = """
WITH counts AS (
  SELECT o_custkey, o_orderstatus, COUNT(*) AS cnt
  FROM orders GROUP BY o_custkey, o_orderstatus
),
m AS (
  SELECT o_custkey,
         map(list(o_orderstatus ORDER BY o_orderstatus),
             list(cnt ORDER BY o_orderstatus)) AS status_map
  FROM counts GROUP BY o_custkey
)
SELECT o_custkey,
       len(map_keys(status_map)) AS n_statuses,
       CAST(COALESCE(map_extract(status_map, 'O')[1], 0) AS BIGINT) AS open_cnt,
       CAST(list_sum(map_values(status_map)) AS BIGINT) AS total_orders
FROM m
"""


@register("fn_map_gallery", sql=_MAP_SQL)
def map_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType end-to-end: build a per-customer status->count map from
    sorted entries (map_from_entries), then size / element_at / fold over
    map_values — the CQL map-column operations (§1.2 map<k,v>) as engine
    surface. The map stays internal; outputs are scalars because DuckDB
    fetches MAP as a key/value struct-of-lists (representation, not
    semantics — both engines hold the same mapping)."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    m = counts.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
        ).alias("status_map")
    )
    return m.select(
        "o_custkey",
        F.size("status_map").alias("n_statuses"),
        F.coalesce(F.element_at("status_map", "O"), F.lit(0))
        .cast("bigint")
        .alias("open_cnt"),
        F.aggregate(
            F.map_values("status_map"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_orders"),
    )


# --- trailing-N ROWS frame with conditional aggregate -----------------------

_TRAIL_N = 10

_TRAIL_SQL = f"""
SELECT event_id, user_id, ts, event_type,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w
         AS BIGINT) AS purchases_last{_TRAIL_N},
       COUNT(*) OVER w AS window_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_TRAIL_N - 1} PRECEDING AND CURRENT ROW)
"""


@register("window_trailing10_purchases", sql=_TRAIL_SQL)
def trailing10_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-events conditional count per user (ROWS frame — the
    physical-offset complement of the RANGE frame already covered):
    recent-behavior features for churn/propensity models. Integer counts
    over a total order (ts, event_id), one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_TRAIL_N - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w)
        .alias(f"purchases_last{_TRAIL_N}"),
        F.count("*").over(w).alias("window_n"),
    )


# --- systematic sampling (every k-th in a total order) -----------------------

_SYS_K = 25

_SYS_SQL = f"""
WITH numbered AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, n_chars, rn FROM numbered WHERE rn % {_SYS_K} = 1
"""


@register("llm_systematic_sample", sql=_SYS_SQL)
def systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sample in doc_id order — the third sampling
    mode beside hash-stratified and fixed-k: deterministic, evenly spaced
    through the corpus (good for eyeball QA sweeps), trivially repeatable.
    The global row_number runs as the two-pass range-partitioned rank
    (operators/ranking.py) — every task numbers only its own range
    slice, so the ordered pass scales with the cluster instead of
    serializing the corpus through one partition."""
    docs = load_table(spark, sf_dir, "documents")
    numbered = attach_global_order(
        docs.select("doc_id", "lang", "n_chars"),
        [F.col("doc_id").asc()],
        rank_col="rn",
    )
    return numbered.filter(F.col("rn") % _SYS_K == 1)


# --- per-table topic routing (S4: events-<ks>.<table>) ----------------------

_ROUTING_SQL_TEMPLATE = """
WITH {cte},
{ccte},
tagged AS (
  SELECT 'events-ks1.customer' AS topic, CAST(pk AS VARCHAR) AS mkey
  FROM events_stream
  UNION ALL
  SELECT 'events-ks1.orders',
         CAST(pk_p AS VARCHAR) || ':' || CAST(COALESCE(pk_c, -1) AS VARCHAR)
  FROM compound_events
)
SELECT topic, COUNT(*) AS n_events, COUNT(DISTINCT mkey) AS n_keys
FROM tagged GROUP BY topic
"""


def _routing_sql() -> str:
    from cdc_apache_cassandra_spark.sources.compound_event_source import (
        compound_events_cte,
    )
    from cdc_apache_cassandra_spark.sources.event_source import events_cte

    return _ROUTING_SQL_TEMPLATE.format(
        cte=events_cte(), ccte=compound_events_cte()
    )


@register("cdc_multi_table_routing", sql=_routing_sql())
def multi_table_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table topic routing (S4: one `events-<ks>.<table>` topic per
    table, AbstractPulsarMutationSender.java:168-172): two tables' event
    streams tagged with their topic and fanned in; per-topic event and
    distinct-key counts. In production each topic is a separate sink —
    the union here exists only to audit the routing in one result."""
    from cdc_apache_cassandra_spark.sources.compound_event_source import (
        compound_events,
    )
    from cdc_apache_cassandra_spark.sources.event_source import mutation_events

    single = mutation_events(spark, sf_dir).select(
        F.lit("events-ks1.customer").alias("topic"),
        F.col("pk").cast("string").alias("mkey"),
    )
    compound = compound_events(spark, sf_dir).select(
        F.lit("events-ks1.orders").alias("topic"),
        F.concat(
            F.col("pk_p").cast("string"),
            F.lit(":"),
            F.coalesce(F.col("pk_c"), F.lit(-1)).cast("string"),
        ).alias("mkey"),
    )
    return (
        single.unionByName(compound)
        .groupBy("topic")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("mkey").alias("n_keys"),
        )
    )


# --- time-series gap fill: date spine + LOCF --------------------------------

_LOCF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders WHERE o_custkey % 100 = 0
  GROUP BY CAST(o_orderdate AS DATE)
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
joined AS (
  SELECT s.day, d.rev, (d.rev IS NULL) AS was_gap
  FROM spine s LEFT JOIN daily d ON d.day = s.day
)
SELECT day, was_gap,
       CAST(LAST_VALUE(rev IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rev_filled
FROM joined
"""


@register("events_locf_gap_fill", sql=_LOCF_SQL)
def locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: build the complete date spine with
    sequence()/generate_series, LEFT JOIN the sparse daily aggregate, and
    carry the last observation forward (LAST_VALUE IGNORE NULLS) — the
    standard densify step before any rolling model. The spine explode is
    bounds-sized (one row per day, never corpus-sized); values stay
    DECIMAL until the presentation cast."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 100 == 0
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = spine.join(daily, "day", "left").select(
        "day", "rev", F.col("rev").isNull().alias("was_gap")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.select(
        F.col("day").cast("timestamp").alias("day"),
        "was_gap",
        F.last("rev", ignorenulls=True).over(w).cast("double").alias("rev_filled"),
    )


# --- time-series gap fill: linear interpolation ------------------------------

_LERP_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders WHERE o_custkey % 100 = 0
  GROUP BY CAST(o_orderdate AS DATE)
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
joined AS (
  SELECT s.day, d.rev FROM spine s LEFT JOIN daily d ON d.day = s.day
),
anchored AS (
  SELECT day, rev,
         LAST_VALUE(rev IGNORE NULLS) OVER wa AS prev_rev,
         LAST_VALUE(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
             OVER wa AS prev_day,
         FIRST_VALUE(rev IGNORE NULLS) OVER wb AS next_rev,
         FIRST_VALUE(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS)
             OVER wb AS next_day
  FROM joined
  WINDOW wa AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wb AS (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT day, (rev IS NULL) AS was_gap,
       CAST(ROUND(CASE
         WHEN rev IS NOT NULL THEN CAST(rev AS DOUBLE)
         WHEN prev_rev IS NULL THEN CAST(next_rev AS DOUBLE)
         WHEN next_rev IS NULL THEN CAST(prev_rev AS DOUBLE)
         ELSE CAST(prev_rev AS DOUBLE)
              + (CAST(next_rev AS DOUBLE) - CAST(prev_rev AS DOUBLE))
                * CAST(datediff('day', prev_day, day) AS DOUBLE)
                / CAST(datediff('day', prev_day, next_day) AS DOUBLE)
       END, 6) AS DOUBLE) AS rev_interp
FROM anchored
"""


@register("events_linear_interpolation", sql=_LERP_SQL)
def linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps — the smooth complement to LOCF:
    both-direction anchor carry (last non-null backward, first non-null
    forward, with their days), then one lerp formula written in identical
    operation order in both engines. Two ordered windows over the tiny
    day spine share one sort."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 100 == 0
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    joined = spine.join(daily, "day", "left")
    wa = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wb = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    day_if_val = F.when(F.col("rev").isNotNull(), F.col("day"))
    anchored = joined.select(
        "day",
        "rev",
        F.last("rev", ignorenulls=True).over(wa).alias("prev_rev"),
        F.last(day_if_val, ignorenulls=True).over(wa).alias("prev_day"),
        F.first("rev", ignorenulls=True).over(wb).alias("next_rev"),
        F.first(day_if_val, ignorenulls=True).over(wb).alias("next_day"),
    )
    prev_d = F.col("prev_rev").cast("double")
    next_d = F.col("next_rev").cast("double")
    lerp = prev_d + (next_d - prev_d) * (
        F.datediff(F.col("day"), F.col("prev_day")).cast("double")
        / F.datediff(F.col("next_day"), F.col("prev_day")).cast("double")
    )
    return anchored.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("rev").isNull().alias("was_gap"),
        F.round(
            F.when(F.col("rev").isNotNull(), F.col("rev").cast("double"))
            .when(F.col("prev_rev").isNull(), next_d)
            .when(F.col("next_rev").isNull(), prev_d)
            .otherwise(lerp),
            6,
        ).cast("double").alias("rev_interp"),
    )


# --- winsorized mean (robust to outliers, decimal-exact sum) -----------------

_WINSOR_SQL = """
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p5,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
),
clamped AS (
  SELECT e.event_type, c.p5, c.p95,
         CAST(LEAST(GREATEST(e.value, c.p5), c.p95) AS DECIMAL(18,6)) AS w
  FROM events e JOIN cuts c ON c.event_type = e.event_type
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(ROUND(p5, 4) AS DOUBLE) AS p5_r,
       CAST(ROUND(p95, 4) AS DOUBLE) AS p95_r,
       CAST(ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
         AS winsorized_mean_r
FROM clamped GROUP BY event_type, p5, p95
"""


@register("stats_winsorized_mean", sql=_WINSOR_SQL)
def winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clamp to [p5, p95] (exact
    interpolated percentiles), then average — robust to the heavy tail
    that wrecks a plain mean. Clamped doubles are cast to DECIMAL before
    summing (order-free exact sum), one double division at the end."""
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p5"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clamped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        "p5",
        "p95",
        F.least(F.greatest(F.col("value"), F.col("p5")), F.col("p95"))
        .cast("decimal(18,6)")
        .alias("w"),
    )
    return clamped.groupBy("event_type", "p5", "p95").agg(
        F.count("*").alias("n"),
        F.round(F.first("p5"), 4).alias("p5_r0"),
        F.round(F.first("p95"), 4).alias("p95_r0"),
        F.round(F.sum("w").cast("double") / F.count("*"), 6).alias(
            "winsorized_mean_r"
        ),
    ).select(
        "event_type",
        "n",
        F.col("p5_r0").alias("p5_r"),
        F.col("p95_r0").alias("p95_r"),
        "winsorized_mean_r",
    )


# --- boilerplate-template detection by shared prefix ------------------------

_PREFIX_N = 8
_TEMPLATE_MIN = 3

_PREFIX_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS tokens
  FROM documents WHERE length(trim(text)) > 0
),
pfx AS (
  SELECT doc_id,
         md5(array_to_string(tokens[1:{_PREFIX_N}], ' ')) AS prefix_hash
  FROM toks WHERE len(tokens) >= {_PREFIX_N}
),
grp AS (
  SELECT prefix_hash, COUNT(*) AS n_docs, MIN(doc_id) AS exemplar_doc
  FROM pfx GROUP BY prefix_hash
)
SELECT prefix_hash, n_docs, exemplar_doc,
       (n_docs >= {_TEMPLATE_MIN}) AS is_template
FROM grp
"""


@register("llm_prefix_template_groups", sql=_PREFIX_SQL)
def prefix_template_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection by shared {n}-token prefix — docs
    generated from one form letter share their opening; a prefix-hash
    group count finds them in one aggregate (no pair join at all, unlike
    similarity dedup). Groups of >= {m} are flagged as templates; the
    exemplar (min doc_id) seeds a human review queue."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("tokens")
    ).filter(F.size("tokens") >= _PREFIX_N)
    pfx = toks.select(
        "doc_id",
        F.md5(F.array_join(F.slice("tokens", 1, _PREFIX_N), " ")).alias(
            "prefix_hash"
        ),
    )
    return (
        pfx.groupBy("prefix_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("exemplar_doc"))
        .select(
            "prefix_hash",
            "n_docs",
            "exemplar_doc",
            (F.col("n_docs") >= _TEMPLATE_MIN).alias("is_template"),
        )
    )


# --- ratio-to-report window --------------------------------------------------

_RATIO_SQL = """
WITH base AS (
  SELECT s_suppkey, s_nationkey,
         CAST(s_acctbal AS DECIMAL(18,2)) AS bal
  FROM supplier
),
tot AS (
  SELECT s_suppkey, s_nationkey, bal,
         SUM(bal) OVER (PARTITION BY s_nationkey) AS nation_bal
  FROM base
)
SELECT s_suppkey, s_nationkey,
       CAST(bal AS DOUBLE) AS acctbal,
       CAST(nation_bal AS DOUBLE) AS nation_total,
       CAST(ROUND(CAST(bal AS DOUBLE) / CAST(nation_bal AS DOUBLE), 6)
            AS DOUBLE) AS nation_share_r
FROM tot
"""


@register("window_ratio_to_report", sql=_RATIO_SQL)
def ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier's share of its nation's total
    balance — unbounded partition SUM as a window (no self-join), the
    share a double ratio of two exact decimals. One shuffle on the
    partition key."""
    s = load_table(spark, sf_dir, "supplier")
    base = s.select(
        "s_suppkey",
        "s_nationkey",
        F.col("s_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    w = Window.partitionBy("s_nationkey")
    return base.select(
        "s_suppkey",
        "s_nationkey",
        F.col("bal").cast("double").alias("acctbal"),
        F.sum("bal").over(w).cast("double").alias("nation_total"),
        F.round(
            F.col("bal").cast("double") / F.sum("bal").over(w).cast("double"), 6
        ).alias("nation_share_r"),
    )


# --- GROUPING() level markers on ROLLUP -------------------------------------

_GROUPING_ID_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER)
         AS level_id,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("agg_grouping_id_levels", sql=_GROUPING_ID_SQL)
def grouping_id_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on a ROLLUP — the only way to tell a real NULL
    group key from a subtotal row (the rollup queries elsewhere rely on
    non-null keys; this exposes the general mechanism). level_id is the
    standard bit-packed grouping id, derived identically in both
    dialects."""
    li = load_table(spark, sf_dir, "lineitem")
    g_flag = F.grouping("l_returnflag").cast("int")
    g_status = F.grouping("l_linestatus").cast("int")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        g_flag.alias("g_flag"),
        g_status.alias("g_status"),
        (g_flag * 2 + g_status).cast("int").alias("level_id"),
        F.count("*").alias("n"),
    )


# --- commitlog segment audit (O1 ordering invariants) -----------------------

_SEGMENT_AUDIT_SQL_TEMPLATE = """
WITH {cte},
per_seg AS (
  SELECT segment,
         COUNT(*) AS n_events,
         COUNT(DISTINCT position) AS n_positions,
         MIN(position) AS min_pos, MAX(position) AS max_pos,
         MIN(writetime) AS min_wt, MAX(writetime) AS max_wt
  FROM events_stream GROUP BY segment
)
SELECT segment, n_events, n_positions, min_pos, max_pos, min_wt, max_wt,
       (max_pos >= min_pos AND n_positions <= n_events) AS positions_sane
FROM per_seg
"""


def _segment_audit_sql() -> str:
    from cdc_apache_cassandra_spark.sources.event_source import events_cte

    return _SEGMENT_AUDIT_SQL_TEMPLATE.format(cte=events_cte())


@register("cdc_segment_audit", sql=_segment_audit_sql())
def segment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment audit of the commitlog invariants the reader relies on
    (O1: segments replay in ascending order; positions are byte offsets,
    unique per mutation within a segment): event/position counts and
    position/writetime ranges per segment — the report a backfill or
    recovery run checks before trusting offsets
    (CommitLogReaderService.java:74-89, SegmentOffsetFileWriter.java)."""
    from cdc_apache_cassandra_spark.sources.event_source import mutation_events

    ev = mutation_events(spark, sf_dir)
    per_seg = ev.groupBy("segment").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("position").alias("n_positions"),
        F.min("position").alias("min_pos"),
        F.max("position").alias("max_pos"),
        F.min("writetime").alias("min_wt"),
        F.max("writetime").alias("max_wt"),
    )
    return per_seg.select(
        "*",
        (
            (F.col("max_pos") >= F.col("min_pos"))
            & (F.col("n_positions") <= F.col("n_events"))
        ).alias("positions_sane"),
    )


# --- INTERSECT ALL (bag semantics) ------------------------------------------

_INTERSECT_ALL_SQL = """
SELECT p_size FROM (SELECT p_size FROM part WHERE p_type = 'PROMO')
INTERSECT ALL
SELECT p_size FROM (SELECT p_size FROM part WHERE p_type = 'ECONOMY')
"""


@register("setop_intersect_all_sizes", sql=_INTERSECT_ALL_SQL)
def intersect_all_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag (multiplicity-preserving) intersection, the
    set-op the distinct variants can't express: a size occurring 3x in
    PROMO and 2x in ECONOMY appears exactly min(3,2)=2 times. Spark
    plans it as a count-min aggregate, one shuffle per side."""
    p = load_table(spark, sf_dir, "part")
    promo = p.filter(F.col("p_type") == "PROMO").select("p_size")
    econ = p.filter(F.col("p_type") == "ECONOMY").select("p_size")
    return promo.intersectAll(econ)
