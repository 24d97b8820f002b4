"""Skew mitigation: salted joins and two-phase aggregations.

AQE's skew-join split (enabled in session.tune) handles most cases at
runtime; these explicit operators cover what AQE cannot: a large-large
shuffle join with a pathological hot key, and high-cardinality aggregation
states that overwhelm a single reducer. Both preserve exact semantics —
verified by equality tests against the unsalted plans.

At 100 TB: the salt fan-out multiplies the small/replicated side by
``n_salts``; pick n_salts ~ (hot-key rows / target partition rows). The
salt column derives from a hash of the row, so the operator stays
deterministic and shuffle-stable across retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: spread each hot key over
    ``n_salts`` shuffle partitions by salting the skewed side with a
    deterministic row hash and replicating the other side once per salt.

    Semantics identical to ``skewed.join(other, key_cols, how)`` for
    inner/left joins (each skewed row meets each matching other row
    exactly once — on its own salt)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [*key_cols, "_salt"], how).drop("_salt")


def salted_agg_sum(
    df: DataFrame, key_cols: list[str], sum_col: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase sum for hot grouping keys: partial sums per (key, salt),
    then the final sum per key — the explicit form of map-side combine for
    cases where a single key's partials still overwhelm one reducer
    (e.g. decimal sums after an exploding join)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(sum_col).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(f"sum_{sum_col}"))
