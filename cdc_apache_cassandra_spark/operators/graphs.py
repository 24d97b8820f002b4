"""Co-occurrence graph building blocks shared by the basket/graph queries.

The four co-purchase queries (pair lift, triangles, PageRank, BFS) all
need the same edge relation: how many orders contain both part ``u`` and
part ``v`` (``u < v``). The textbook form — ``distinct`` the (order,
part) pairs, self-join on the order key, aggregate by (u, v) — executes
FOUR exchanges at scale: the distinct's, one per self-join side (the
distinct leaves data hashed on the (order, part) composite, so the
order-keyed join re-shuffles both inputs), and the pair aggregate's.

Grouping each order's parts into a set first needs only the ONE
exchange that clusters by order (collect_set partial-aggregates
map-side), after which pair expansion is a narrow array transform and
the pair aggregate is the only other shuffle. The per-row expansion is
|basket|^2 structs — exactly the fan-out the self-join would have
produced for that order as join rows, but without shuffling them.
Baskets are domain-bounded (an order's line count), so the quadratic
term is a constant, not a scale risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def order_item_sets(
    df: DataFrame, order_col: str = "l_orderkey", item_col: str = "l_partkey"
) -> DataFrame:
    """One row per order: (order_col, ``items`` = distinct item array).
    Equivalent to SELECT DISTINCT order, item regrouped per order, in a
    single exchange (map-side partial collect_set)."""
    return df.groupBy(order_col).agg(F.collect_set(item_col).alias("items"))


def pair_counts_from_sets(sets: DataFrame) -> DataFrame:
    """(u, v, w) with u < v: the number of orders whose item set contains
    both. Narrow array expansion per order + one aggregate exchange;
    counts are exact integers, identical to the order-keyed self-join's
    ``GROUP BY u, v HAVING COUNT(*)`` relation.

    PRECONDITION (ADVICE r11): group sizes must be DOMAIN-BOUNDED — the
    expansion materializes the full |items|² struct array per row
    (including the u >= v half) before filtering, so a caller with
    unbounded sets (power-law baskets, a celebrity node's neighbor
    list) would blow per-row memory; split or cap such groups first.
    TPC-H order baskets (≈4 items) and co-purchase baskets qualify."""
    pairs = F.filter(
        F.flatten(
            F.transform(
                "items",
                lambda u: F.transform(
                    "items", lambda v: F.struct(u.alias("u"), v.alias("v"))
                ),
            )
        ),
        lambda s: s["u"] < s["v"],
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count("*").alias("w"))
    )


def order_pair_counts(
    df: DataFrame, order_col: str = "l_orderkey", item_col: str = "l_partkey"
) -> DataFrame:
    """The composed edge build: two exchanges end to end."""
    return pair_counts_from_sets(order_item_sets(df, order_col, item_col))
