"""Capture .explain('formatted') evidence for the r11 optimization round.

Two kinds of plan:

1. Declared queries: the returned DataFrame's formatted plan (what the
   driver would execute) — ``python tools/explain_r11.py query <name> <out>``.
2. The merge-commit write plan: the imperative lifecycle queries
   (cdc_materialized_state and friends) run their real work inside
   merge_into/delta_export jobs, not in the returned plan — this mode
   monkeypatches merge_into to dump the formatted plan of the ``merged``
   DataFrame right before its staging write on the FIRST commit —
   ``python tools/explain_r11.py merge <single|compound> <out>``.

Plans are captured at sf0.1 with the same session confs as bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    mode, target, out = sys.argv[1], sys.argv[2], sys.argv[3]
    from cdc_apache_cassandra_spark.session import get_spark

    spark = get_spark("explain-r11")

    if mode == "query":
        from cdc_apache_cassandra_spark.plans import QUERIES

        df = QUERIES[target].fn(spark, SF_DIR)
        text = _explain_str(df)
    elif mode == "merge":
        import cdc_apache_cassandra_spark.streaming.materialize as mat

        captured: list[str] = []
        orig_write = None

        # capture the plan of the DataFrame merge_into is about to write:
        # patch DataFrameWriter.parquet once, grab the active frame's df
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        orig_parquet = None
        import pyspark.sql.classic.dataframe  # noqa: F401

        from pyspark.sql.readwriter import DataFrameWriter

        orig_parquet = DataFrameWriter.parquet

        def parquet_capture(self, path, **k):
            df = self._df
            if "__ver=" in path and not captured:
                captured.append(_explain_str(df))
            return orig_parquet(self, path, **k)

        DataFrameWriter.parquet = parquet_capture
        try:
            from pyspark.sql import functions as F

            from cdc_apache_cassandra_spark.operators.dedup import (
                dedup_mutations,
            )
            import tempfile

            if target == "single":
                from cdc_apache_cassandra_spark.sources.event_source import (
                    mutation_events,
                )

                ev = dedup_mutations(mutation_events(spark, SF_DIR)).persist()
                ev.count()  # materialize, as the lifecycle queries do
                root = tempfile.mkdtemp(prefix="explain_merge_")
                os.makedirs(f"{root}/store")
                # two commits: the second exercises the old∪batch merge path
                mat.merge_into(
                    spark, f"{root}/store",
                    ev.filter(F.pmod(F.col("position"), F.lit(2)) == 0),
                    ["pk"], n_buckets=8,
                )
                captured.clear()  # keep the MERGE (old∪batch) plan, not the first fill
                mat.merge_into(
                    spark, f"{root}/store",
                    ev.filter(F.pmod(F.col("position"), F.lit(2)) == 1),
                    ["pk"], n_buckets=8,
                )
            else:
                from cdc_apache_cassandra_spark.sources.compound_event_source import (
                    compound_events,
                )
                from cdc_apache_cassandra_spark.operators.lww import (
                    compound_reduce_bucketed,
                )

                ev = compound_events(spark, SF_DIR).persist()
                ev.count()
                root = tempfile.mkdtemp(prefix="explain_merge_c_")
                os.makedirs(f"{root}/store")
                halves = [
                    ev.filter(F.pmod(F.col("pk_p"), F.lit(2)) == i)
                    for i in (0, 1)
                ]
                mat.merge_into(
                    spark, f"{root}/store", halves[0],
                    ["pk_p", "pk_c"], n_buckets=8, bucket_cols=["pk_p"],
                    reducer=compound_reduce_bucketed, kind="compound",
                    reducer_bucketed=True,
                )
                captured.clear()
                mat.merge_into(
                    spark, f"{root}/store", halves[1],
                    ["pk_p", "pk_c"], n_buckets=8, bucket_cols=["pk_p"],
                    reducer=compound_reduce_bucketed, kind="compound",
                    reducer_bucketed=True,
                )
        finally:
            DataFrameWriter.parquet = orig_parquet
        text = captured[0] if captured else "NO PLAN CAPTURED"
    else:
        raise SystemExit(f"unknown mode {mode}")

    with open(out, "w") as f:
        f.write(text + "\n")
    n_exch = text.count("Exchange")
    print(f"wrote {out}: {len(text)} chars, {n_exch} Exchange nodes")


if __name__ == "__main__":
    main()
