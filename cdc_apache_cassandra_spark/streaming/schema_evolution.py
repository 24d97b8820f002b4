"""Schema evolution across the event stream — the reference's dynamic
schema propagation (SURVEY §4 'Schema-change live swap':
CassandraSource.java:352-402,666-698 rebuilds converters on every DDL
notification; Pulsar enforces BACKWARD-transitive compatibility).

Spark mapping (one of the few places the engine needs custom logic —
Catalyst cannot re-plan a running stream on DDL):

- `reconcile_schemas` implements the BACKWARD-compatibility check: the
  new schema may ADD nullable columns and may NOT drop columns or change
  types (a dropped column keeps flowing as nulls, like the reference's
  Avro union-null defaults).
- `align_to_schema` adapts any event DataFrame to the reconciled schema
  (missing columns -> typed nulls) so old-schema and new-schema batches
  union into ONE stream — the batch analogue of restarting the stream
  with `mergeSchema`.
- For a live stream the policy is restart-on-DDL: detect the widened
  schema (e.g. a new parquet footer / registry version), stop the query,
  and restart with the reconciled schema + the same checkpoint; offsets
  resume, state carries over (checkpoint schema-compat rules are the
  gate, like Pulsar's namespace compat config).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class IncompatibleSchemaChange(ValueError):
    """Raised when a schema change is not BACKWARD-compatible."""


def reconcile_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Merge an evolved schema into the current one under the reference's
    BACKWARD-transitive rules: additive nullable columns only; type
    changes are rejected (the reference rebuilds the Avro schema from
    table metadata — a changed CQL type is a new, incompatible schema)."""
    old_fields = {f.name: f for f in old.fields}
    merged = list(old.fields)
    for f in new.fields:
        prev = old_fields.get(f.name)
        if prev is None:
            merged.append(T.StructField(f.name, f.dataType, nullable=True))
        elif prev.dataType != f.dataType:
            raise IncompatibleSchemaChange(
                f"column {f.name!r}: {prev.dataType.simpleString()} -> "
                f"{f.dataType.simpleString()} is not BACKWARD-compatible"
            )
    return T.StructType(merged)


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto the target schema: missing columns become typed
    nulls (the Avro union{null,T} default), column order normalized.
    Extra columns not in the target are an error (reconcile first)."""
    have = {f.name: f for f in df.schema.fields}
    extra = set(have) - {f.name for f in target.fields}
    if extra:
        raise IncompatibleSchemaChange(
            f"columns {sorted(extra)} absent from the target schema; "
            "reconcile_schemas() before aligning"
        )
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def union_evolved(older: DataFrame, newer: DataFrame) -> DataFrame:
    """Union two event batches whose schemas differ by an additive,
    BACKWARD-compatible change — the testSinglePk ALTER TABLE ADD
    scenario (PulsarCassandraSourceTests.java:261-343): rows from before
    the DDL carry null for the new column."""
    merged = reconcile_schemas(older.schema, newer.schema)
    return align_to_schema(older, merged).unionByName(align_to_schema(newer, merged))
