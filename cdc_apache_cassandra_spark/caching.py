"""Scoped persist tracking for intra-query intermediates.

~30 registered plans persist an intermediate (posting lists, signature
tables, iterative frontiers) that several branches of the SAME returned
plan consume. A query function has no post-action hook, so a bare
``df.persist()`` would leak a CacheManager entry per call for library
callers (the r3 verdict's open item). The contract here:

- plan/operator code calls :func:`persist_scoped` instead of
  ``.persist()`` — the cache is registered in a module-level ledger;
- every entry point that owns the action releases afterwards:
  the plans registry releases the PREVIOUS query's caches before
  building the next (bounding a whole sweep to one query's worth
  without nuking caches the CALLER created — the reason this replaces
  the old blanket ``spark.catalog.clearCache()``), and bench/oracle
  harnesses release after each query's action completes;
- ``release_plan_caches()`` is idempotent and safe mid-flight
  (unpersist is a performance hint — a released cache recomputes,
  never changes results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_scoped(df: DataFrame) -> DataFrame:
    """persist() + register in the ledger for later release."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_plan_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = len(_TRACKED)
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    return n


def release_one(df: DataFrame) -> None:
    """Unpersist ``df`` now AND drop its ledger entry — for library code
    that scopes its own cache (e.g. delta_export's DV planning) but
    still wants the ledger as the crash-path backstop: without the
    removal every call would leak one already-released reference until
    some entry point sweeps the ledger."""
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass  # already swept by a release_plan_caches() in between
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session already stopped


def tracked_count() -> int:
    return len(_TRACKED)
