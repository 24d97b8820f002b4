"""Gap-filling relational shapes: EXCEPT, greatest-per-group via
correlated max (TPC-H Q2's join shape on the slim schema), and the
golden type-conversion matrix (DataSpec equivalent, SURVEY §5.2) under
the driver's oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.functions.conversions import (
    date_to_cassandra_raw,
    date_to_epoch_days,
    timestamp_to_epoch_millis,
    tinyint_to_unsigned_int,
)
from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, load_tables, spread_scan
from cdc_apache_cassandra_spark.caching import persist_scoped


def _dec(c):
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")

# --- EXCEPT ----------------------------------------------------------------

_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


@register("setop_except_never_urgent", sql=_EXCEPT_SQL)
def setop_except_never_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): customers with orders but no
    URGENT order — Spark plans it as an aggregate + anti join."""
    o = load_table(spark, sf_dir, "orders")
    all_cust = o.select(F.col("o_custkey").alias("custkey"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.subtract(urgent)  # subtract == SQL EXCEPT (distinct)


# --- Q2 shape: greatest-per-group via correlated max -----------------------

_Q2ISH_SQL = """
SELECT n_name, s1.s_suppkey, s1.s_name,
       CAST(s1.s_acctbal AS DOUBLE) AS acctbal
FROM supplier s1
JOIN nation ON n_nationkey = s1.s_nationkey
WHERE s1.s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                      WHERE s2.s_nationkey = s1.s_nationkey)
"""


@register("tpch_q2ish_richest_supplier_per_nation", sql=_Q2ISH_SQL)
def q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-MAX shape on the slim schema: the supplier(s)
    holding each nation's maximum account balance. Spark side decorrelates
    explicitly (per-nation max + equi-join) — exactly Catalyst's rewrite
    of the correlated SQL; ties all surface (no arbitrary pick)."""
    t = load_tables(spark, sf_dir, "supplier", "nation")
    mx = t["supplier"].groupBy(F.col("s_nationkey").alias("mx_nk")).agg(
        F.max("s_acctbal").alias("mx_bal")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(mx),
            (F.col("s_nationkey") == F.col("mx_nk"))
            & (F.col("s_acctbal") == F.col("mx_bal")),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "n_name",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )


# --- Q21 shape: semi + anti on the same fact -------------------------------

_Q21ISH_SQL = """
SELECT s_suppkey, s_name, COUNT(*) AS n_returned_items
FROM supplier
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey AND l1.l_returnflag = 'R'
WHERE NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_suppkey = s_suppkey AND l2.l_returnflag = 'N'
                    AND l2.l_quantity > 49)
GROUP BY s_suppkey, s_name
"""


@register("tpch_q21ish_blamed_suppliers", sql=_Q21ISH_SQL)
def q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's join shape on the slim schema: the same fact table used
    as a positive (join) AND negative (NOT EXISTS -> anti join) evidence
    source for the same key — suppliers with returned items and no
    never-returned items."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    li = t["lineitem"]
    returned = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("sk")
    )
    clean = li.filter(
        (F.col("l_returnflag") == "N") & (F.col("l_quantity") > 49)
    ).select(F.col("l_suppkey").alias("anti_sk"))
    s = t["supplier"].join(
        clean, F.col("anti_sk") == F.col("s_suppkey"), "left_anti"
    )
    return (
        s.join(returned, F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_returned_items"))
    )


# --- Q11 shape: HAVING against a global scalar -----------------------------

_Q11ISH_SQL = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS part_rev
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_rev AS DOUBLE) AS part_revenue
FROM rev
WHERE part_rev > (SELECT SUM(part_rev) * 0.0008 FROM rev)
"""


@register("tpch_q11ish_important_parts", sql=_Q11ISH_SQL)
def q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape: a grouped aggregate filtered by a fraction of
    its own global total (HAVING against a scalar subquery). The global
    sum re-aggregates the per-part decimals exactly, broadcasts as one
    row — the derived table is NOT recomputed twice thanks to persist."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
            ).alias("part_rev")
        )
        .transform(persist_scoped)
    )
    total = rev.agg(
        (F.sum("part_rev") * F.lit("0.0008").cast("decimal(6,4)")).alias("cutoff")
    )
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev") > F.col("cutoff"))
        .select("l_partkey", F.col("part_rev").cast("double").alias("part_revenue"))
    )


# --- F10/F11: collection marshalling under the oracle gate -----------------

_COLLECTION_SQL = """
SELECT o_custkey,
       CAST(to_json(list_sort(list(epoch_ms(o_orderdate)))) AS VARCHAR)
         AS order_ts_ms,
       CAST(to_json(list(CAST(o_orderkey AS VARCHAR)
            ORDER BY CAST(o_orderkey AS VARCHAR))) AS VARCHAR)
         AS map_keys_sorted,
       CAST(to_json(list(o_orderstatus
            ORDER BY CAST(o_orderkey AS VARCHAR))) AS VARCHAR)
         AS map_values_by_key,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


@register("cql_collection_marshalling", sql=_COLLECTION_SQL)
def cql_collection_marshalling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 (timestamps inside collections -> epoch millis,
    AbstractNativeConverter.java:305-332) and F10 (map keys stringified,
    :265-295) on aggregated per-customer collections: a sorted array of
    order timestamps and the order->status map flattened to key-sorted
    parallel arrays (engines surface MAP values incompatibly to Python,
    so the gate compares the entry lists; note the LEXICOGRAPHIC order —
    the stringified keys ARE the sort key, which is the F10 semantics).
    The arrays are rendered as JSON strings on BOTH sides so the driver's
    pandas-lexsort canonicalizer can hash the rows (raw numpy array cells
    are unhashable — observed as the round-1 `err` on this entry)."""
    o = load_table(spark, sf_dir, "orders")
    ts_ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    entries = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("o_orderkey").cast("string").alias("k"),
                F.col("o_orderstatus").alias("v"),
            )
        )
    )
    return o.groupBy("o_custkey").agg(
        F.to_json(F.sort_array(F.collect_list(ts_ms))).alias("order_ts_ms"),
        F.to_json(F.transform(entries, lambda x: x["k"])).alias("map_keys_sorted"),
        F.to_json(F.transform(entries, lambda x: x["v"])).alias("map_values_by_key"),
        F.count("*").alias("n_orders"),
    )


# --- IVF recall vs brute force (ANN evaluation) ----------------------------

_RECALL_SQL = """
WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % 50 = 0),
scored AS (
  SELECT n.vec_id, n.v, cent.cid,
         list_sum(list_transform(range(1, len(n.v)+1),
             i -> (n.v[i] - cent.cv[i]) * (n.v[i] - cent.cv[i]))) AS dist2
  FROM n CROSS JOIN cent
),
asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, v AS qv, cid AS qcid FROM asg
      WHERE vec_id % 100 = 0),
brute AS (
  SELECT qid, nid FROM (
    SELECT q.qid, m.vec_id AS nid,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
               list_dot_product(q.qv, m.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(m.v, m.v))) DESC, m.vec_id) AS rk
    FROM q JOIN n m ON m.vec_id != q.qid
  ) WHERE rk <= 5
),
ivf AS (
  SELECT qid, nid FROM (
    SELECT q.qid, m.vec_id AS nid,
           ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
               list_dot_product(q.qv, m.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) *
                sqrt(list_dot_product(m.v, m.v))) DESC, m.vec_id) AS rk
    FROM q JOIN asg m ON m.cid = q.qcid AND m.vec_id != q.qid
  ) WHERE rk <= 5
)
SELECT b.qid,
       CAST(SUM(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 5
         AS recall_at_5
FROM brute b LEFT JOIN ivf i ON i.qid = b.qid AND i.nid = b.nid
GROUP BY b.qid
"""


@register("llm_ann_ivf_recall", sql=_RECALL_SQL)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN evaluation: recall@5 of the IVF single-probe search against the
    exact brute-force top-5 — the measurement loop that tunes
    nprobe/centroid count in production. Both searches share the corpus
    pass; the comparison is a tiny join on (qid, nid)."""
    from cdc_apache_cassandra_spark.operators.vectors import (
        as_double_vec,
        cosine,
        ivf_assign,
    )
    from pyspark.sql import Window

    e = spread_scan(load_table(spark, sf_dir, "embeddings"))
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("vec"))
    cent = n.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    asg = ivf_assign(n, cent, "vec").transform(persist_scoped)
    q = asg.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv"),
        F.col("cid").alias("qcid"),
    )
    cs = cosine(F.col("qv"), F.col("nv"))
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid"))

    def topk(pairs):
        ranked = (
            pairs.filter(F.col("nid") != F.col("qid"))
            .select("qid", "nid", cs.alias("cos_sim"))
            .withColumn("rk", F.row_number().over(w))
        )
        return ranked.filter(F.col("rk") <= 5).select("qid", "nid")

    corpus = n.select(F.col("vec_id").alias("nid"), F.col("vec").alias("nv"))
    brute = topk(F.broadcast(q).crossJoin(corpus))
    members = asg.select(
        F.col("vec_id").alias("nid"), F.col("vec").alias("nv"), F.col("cid")
    )
    ivf = topk(F.broadcast(q).join(members, F.col("cid") == F.col("qcid")))
    hit = brute.join(ivf, ["qid", "nid"], "left_semi")
    per_q = brute.groupBy("qid").count().select("qid")
    hits = hit.groupBy("qid").agg(F.count("*").alias("n_hit"))
    return (
        per_q.join(hits, "qid", "left")
        .select(
            "qid",
            (F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.lit(5)).alias(
                "recall_at_5"
            ),
        )
    )


# --- column data profile (pipeline hygiene) --------------------------------

_PROFILE_SQL = """
SELECT 'l_quantity' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(l_quantity) AS n_non_null,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity)
         AS avg_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
       CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(l_discount),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(l_discount)
FROM lineitem
"""


@register("stats_numeric_profile", sql=_PROFILE_SQL)
def stats_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (min/max/exact-decimal mean/null counts) for the
    pipeline-hygiene stage — ONE scan computes all three columns' stats
    (the per-column rows are unpivoted from a single aggregate, not three
    scans; Catalyst collapses the shared subplan)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count("*").alias("n_rows"),
        *[
            x
            for c in ("l_quantity", "l_extendedprice", "l_discount")
            for x in (
                F.count(c).alias(f"nn_{c}"),
                F.min(c).cast("double").alias(f"min_{c}"),
                F.max(c).cast("double").alias(f"max_{c}"),
                (
                    F.sum(F.col(c).cast("decimal(18,2)")).cast("double")
                    / F.count(c)
                ).alias(f"avg_{c}"),
            )
        ],
    )
    stacked = agg.selectExpr(
        "stack(3, "
        + ", ".join(
            f"'{c}', n_rows, nn_{c}, min_{c}, max_{c}, avg_{c}"
            for c in ("l_quantity", "l_extendedprice", "l_discount")
        )
        + ") as (col_name, n_rows, n_non_null, min_v, max_v, avg_v)"
    )
    return stacked


# --- Golden type-conversion matrix (DataSpec under the oracle gate) --------

_CONV_SQL = """
SELECT o_orderkey,
       epoch_ms(o_orderdate) AS ts_epoch_ms,
       date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         AS date_epoch_days,
       date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         + 2147483648 AS date_cassandra_raw,
       ((o_orderkey % 256 - 128) + 256) % 256 AS tinyint_widened,
       CAST(o_orderkey % 256 - 128 AS BIGINT) AS tinyint_signed
FROM orders
"""


@register("cql_type_conversions", sql=_CONV_SQL)
def cql_type_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F5 golden conversions over real values (DataSpec.java:77-115
    equivalents): timestamp -> epoch millis, date -> epoch days and the
    Cassandra unsigned-int raw encoding (centered at 2^31), and the
    Byte.toUnsignedInt widening — each computed by the engine's
    conversion expressions (functions/conversions.py) and checked against
    independent integer arithmetic in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    signed_byte = (F.col("o_orderkey") % 256 - 128).cast("bigint")
    return o.select(
        "o_orderkey",
        # parquet stores TIMESTAMP_NTZ; session tz is pinned UTC, so the
        # cast reinterprets the same instant for unix_millis
        timestamp_to_epoch_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "ts_epoch_ms"
        ),
        date_to_epoch_days(F.col("o_orderdate").cast("date")).cast("bigint").alias(
            "date_epoch_days"
        ),
        date_to_cassandra_raw(F.col("o_orderdate").cast("date")).alias(
            "date_cassandra_raw"
        ),
        tinyint_to_unsigned_int(signed_byte).cast("bigint").alias("tinyint_widened"),
        signed_byte.alias("tinyint_signed"),
    )


# --- LATERAL correlated subquery: top-2 orders per customer -----------------

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
     LATERAL (
       SELECT o_orderkey, o_totalprice FROM orders o
       WHERE o.o_custkey = c.c_custkey
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 2
     ) t
WHERE c.c_nationkey < 5
"""


@register("join_lateral_top2_orders", sql=_LATERAL_SQL)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — the
    per-row dependent-join shape. Catalyst decorrelates it into a
    ranked window over the one orders shuffle (same physical plan as the
    hand-written row_number form — DecorrelateInnerQuery does the
    rewrite, which is exactly why the declarative form is safe at scale);
    expressed here via spark.sql because LATERAL has no DataFrame verb."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    t["customer"].createOrReplaceTempView("v_customer")
    t["orders"].createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM v_customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice FROM v_orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               LIMIT 2
             ) t
        WHERE c.c_nationkey < 5
        """
    )


# --- array aggregation: ordered per-order item arrays -----------------------

_ARRAY_AGG_SQL = """
SELECT l_orderkey,
       COUNT(*) AS n_items,
       CAST(to_json(list(l_linenumber ORDER BY l_linenumber, l_quantity))
         AS VARCHAR) AS linenumbers,
       CAST(to_json(list(CAST(l_quantity AS DOUBLE)
                         ORDER BY l_linenumber, l_quantity))
         AS VARCHAR) AS quantities
FROM lineitem
GROUP BY l_orderkey
HAVING COUNT(*) >= 5
"""


@register("agg_order_item_arrays", sql=_ARRAY_AGG_SQL)
def order_item_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation per group (the nested/array-building
    surface): collect line items into arrays SORTED BY a TOTAL key
    (linenumber alone ties — duplicates exist — so quantity breaks them;
    collect_list alone is partition-order-nondeterministic). The portable
    form is collect structs then array_sort then project, which also
    survives AQE re-partitioning. HAVING prunes groups after one
    combinable count."""
    li = load_table(spark, sf_dir, "lineitem")
    items = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("l_linenumber"),
                F.col("l_quantity").cast("double").alias("l_quantity"),
            )
        )
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_items"), items.alias("items"))
        .filter(F.col("n_items") >= 5)
        .select(
            "l_orderkey",
            "n_items",
            F.to_json(
                F.transform("items", lambda x: x["l_linenumber"])
            ).alias("linenumbers"),
            F.to_json(
                F.transform("items", lambda x: x["l_quantity"])
            ).alias("quantities"),
        )
    )


# --- UDT / tuple projection (§1.2 nested types under the gate) --------------

_UDT_SQL = """
SELECT o_orderkey,
       to_json({status: o_orderstatus, priority: o_orderpriority})
         AS order_udt_json,
       o_custkey AS index_0,
       CAST(o_totalprice AS DOUBLE) AS index_1,
       md5(o_orderstatus || '|' || o_orderpriority) AS udt_digest
FROM orders
WHERE o_orderkey % 97 = 0
"""


@register("cql_udt_tuple_projection", sql=_UDT_SQL)
def udt_tuple_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQL nested types as engine columns (SURVEY §1.2): a UDT maps to a
    named StructType — rendered to JSON here because the oracle harness
    canonicalizes Spark Rows as tuples but DuckDB structs as dicts, so
    raw struct columns can't hash-match (F13's JSON converter is exactly
    this rendering) — and a tuple maps to index_0..n fields, flattened
    (the reference's Avro tuple record layout,
    AbstractNativeConverter.java:213-215,245-263). Zero-shuffle
    projection; the digest pins struct-content agreement."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        ).alias("order_udt_json"),
        F.col("o_custkey").alias("index_0"),
        F.col("o_totalprice").cast("double").alias("index_1"),
        F.md5(
            F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority"))
        ).alias("udt_digest"),
    )


# --- entity resolution: edit-distance fuzzy match ----------------------------

_ER_MAX_DIST = 1

_ER_SQL = f"""
WITH s AS (SELECT s_suppkey, s_name, length(s_name) AS n FROM supplier)
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
       a.s_name AS name_a, b.s_name AS name_b,
       levenshtein(a.s_name, b.s_name) AS edit_dist
FROM s a JOIN s b
  ON a.n = b.n AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= {_ER_MAX_DIST}
"""


@register("er_supplier_fuzzy_match", sql=_ER_SQL)
def er_supplier_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: supplier-name pairs within
    Levenshtein {d} (typo-level variants), blocked on name length (an
    edit-distance-1 pair differs by ≤1 in length; equality blocking is
    exact here because the corpus names are fixed-width). Levenshtein is
    an exact integer in both engines. At 100 TB the block key becomes
    q-gram signatures (length alone doesn't bound block size on natural
    names) — same join, finer key.

    The fixed-width corpus makes the length block ONE hot key — the
    classic skew shape AQE's skew split cannot fix (it can't cut a
    single key), so the |block|^2 levenshtein grid would evaluate in a
    single task. operators/skew.salted_join spreads the grid over
    n_salts partitions with identical pair semantics (guide §2.5)."""
    from cdc_apache_cassandra_spark.operators.skew import salted_join

    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.length("s_name").alias("n")
    )
    a = s.select(
        F.col("s_suppkey").alias("supp_a"), F.col("s_name").alias("name_a"),
        "n",
    )
    b = s.select(
        F.col("s_suppkey").alias("supp_b"), F.col("s_name").alias("name_b"),
        "n",
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        salted_join(a, b, ["n"], n_salts=32)
        .filter(F.col("supp_a") < F.col("supp_b"))
        .filter(dist <= _ER_MAX_DIST)
        .select("supp_a", "supp_b", "name_a", "name_b", dist.alias("edit_dist"))
    )
