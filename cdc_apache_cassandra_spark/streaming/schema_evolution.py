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


def _reconcile_type(name: str, old_dt: T.DataType, new_dt: T.DataType) -> T.DataType:
    """Recursive BACKWARD merge of a single column type. Additive nullable
    fields inside nested StructTypes are the UDT `ALTER TYPE ... ADD`
    scenario the reference handles via onUserDefinedTypeUpdated
    (CassandraSource.java:666-698) — adding a field to a UDT is a
    BACKWARD-compatible Avro change, so it must merge, not raise.
    Containers recurse into their element/value types; a changed leaf
    type is still rejected."""
    if old_dt == new_dt:
        return old_dt
    if isinstance(old_dt, T.StructType) and isinstance(new_dt, T.StructType):
        return reconcile_schemas(old_dt, new_dt)
    if isinstance(old_dt, T.ArrayType) and isinstance(new_dt, T.ArrayType):
        return T.ArrayType(
            _reconcile_type(f"{name}[]", old_dt.elementType, new_dt.elementType),
            old_dt.containsNull or new_dt.containsNull,
        )
    if isinstance(old_dt, T.MapType) and isinstance(new_dt, T.MapType):
        if old_dt.keyType != new_dt.keyType:
            raise IncompatibleSchemaChange(
                f"column {name!r}: map key type "
                f"{old_dt.keyType.simpleString()} -> "
                f"{new_dt.keyType.simpleString()} is not BACKWARD-compatible"
            )
        return T.MapType(
            old_dt.keyType,
            _reconcile_type(f"{name}{{}}", old_dt.valueType, new_dt.valueType),
            old_dt.valueContainsNull or new_dt.valueContainsNull,
        )
    raise IncompatibleSchemaChange(
        f"column {name!r}: {old_dt.simpleString()} -> "
        f"{new_dt.simpleString()} is not BACKWARD-compatible"
    )


def reconcile_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Merge an evolved schema into the current one under the reference's
    BACKWARD-transitive rules: additive nullable columns only (at ANY
    nesting depth — UDT field adds included); dropped columns keep
    flowing as nulls; leaf type changes are rejected (the reference
    rebuilds the Avro schema from table metadata — a changed CQL type is
    a new, incompatible schema)."""
    old_fields = {f.name: f for f in old.fields}
    merged = []
    for f in old.fields:
        nf = next((g for g in new.fields if g.name == f.name), None)
        if nf is None or nf.dataType == f.dataType:
            merged.append(f)
        else:
            merged.append(
                T.StructField(
                    f.name,
                    _reconcile_type(f.name, f.dataType, nf.dataType),
                    nullable=f.nullable or nf.nullable,
                )
            )
    for f in new.fields:
        if f.name not in old_fields:
            merged.append(T.StructField(f.name, f.dataType, nullable=True))
    return T.StructType(merged)


def _align_expr(expr: F.Column, src: T.DataType, tgt: T.DataType, name: str) -> F.Column:
    """Rewrite ``expr`` of type ``src`` into type ``tgt`` where ``tgt`` is
    a reconciled superset: nested struct fields missing from ``src``
    become typed nulls; arrays/maps recurse via transform — all plan-time
    expressions, no shuffle, no Python."""
    if src == tgt:
        return expr
    if isinstance(src, T.StructType) and isinstance(tgt, T.StructType):
        have = {f.name: f for f in src.fields}
        extra = set(have) - {f.name for f in tgt.fields}
        if extra:
            raise IncompatibleSchemaChange(
                f"struct {name!r}: fields {sorted(extra)} absent from the "
                "target schema; reconcile_schemas() before aligning"
            )
        parts = []
        for f in tgt.fields:
            if f.name in have:
                parts.append(
                    _align_expr(
                        expr[f.name], have[f.name].dataType, f.dataType,
                        f"{name}.{f.name}",
                    ).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        # preserve null-ness of the struct itself (a null UDT stays null,
        # it does not become a struct of nulls)
        return F.when(expr.isNull(), F.lit(None).cast(tgt)).otherwise(
            F.struct(*parts)
        )
    if isinstance(src, T.ArrayType) and isinstance(tgt, T.ArrayType):
        return F.transform(
            expr,
            lambda x: _align_expr(x, src.elementType, tgt.elementType, f"{name}[]"),
        )
    if isinstance(src, T.MapType) and isinstance(tgt, T.MapType):
        return F.transform_values(
            expr,
            lambda k, v: _align_expr(v, src.valueType, tgt.valueType, f"{name}{{}}"),
        )
    raise IncompatibleSchemaChange(
        f"column {name!r}: cannot align {src.simpleString()} to "
        f"{tgt.simpleString()}"
    )


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto the target schema: missing columns become typed
    nulls (the Avro union{null,T} default) at every nesting depth,
    column order normalized. Extra columns not in the target are an
    error (reconcile first)."""
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
            cols.append(
                _align_expr(F.col(f.name), have[f.name].dataType, f.dataType, f.name)
                .alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def parquet_dir_schema(spark, path: str) -> T.StructType:
    """Discover the current widest schema of a parquet event directory
    (union of all footers) — the Spark-side analogue of reading the table
    metadata the reference's schema listener is notified with."""
    return spark.read.option("mergeSchema", "true").parquet(path).schema


class DdlRestartingStream:
    """Restart-on-DDL for a logical stream — the engine-side
    implementation of the documented policy above, mirroring the
    reference's atomic ConverterAndQuery swap on schema notifications
    (CassandraSource.java:352-383,666-698).

    ``discover_schema()`` returns the source's CURRENT schema (e.g.
    ``parquet_dir_schema`` — a driver-side metadata read, never a data
    scan); ``start_query(schema)`` starts the streaming query against
    the SAME checkpoint location with the given read schema and a
    ``trigger(availableNow=True)``.

    The logical stream is a sequence of drain cycles: each ``drain()``
    first polls the source schema, reconciles it under the BACKWARD
    rules (incompatible changes raise — the stream must NOT silently
    restart onto a breaking change), swaps in the widened schema when
    the poll observed a DDL, then runs one availableNow cycle that
    terminates when the currently-available offsets are consumed.
    Because NO consumption happens between cycles, discovery always
    precedes the read of any new-schema segment — closing the race a
    stop-and-restart poll against a continuously-triggering query has
    (the old query's next micro-batch can consume a widened file with
    the narrow schema before any listener fires; the reference never
    races because schema notifications arrive on a control channel
    before the data). Offsets carry over through the shared checkpoint,
    so no event is duplicated or lost; pre-DDL rows surface the added
    columns as typed nulls.

    Scale: availableNow cycles are the recommended Structured Streaming
    pattern for periodic drains; a cycle processes whatever accumulated
    (possibly many micro-batches under maxFilesPerTrigger) and restarts
    are driver-side metadata work only.
    """

    def __init__(self, discover_schema, start_query):
        self._discover = discover_schema
        self._start = start_query
        self.schema: T.StructType = discover_schema()
        self.query = None
        self.restarts = 0

    def poll_schema(self) -> bool:
        """One listener poll: reconcile the source's current schema into
        the running one. Returns True (and widens) when a DDL was
        observed."""
        merged = reconcile_schemas(self.schema, self._discover())
        if merged == self.schema:
            return False
        self.schema = merged
        self.restarts += 1
        return True

    def drain(self) -> bool:
        """Poll for DDL, then run one availableNow cycle to completion.
        Returns True if the cycle ran with a freshly widened schema."""
        widened = self.poll_schema()
        self.query = self._start(self.schema)
        self.query.awaitTermination()
        return widened

    def run(self, poll_interval_s: float = 1.0, max_cycles: int | None = None):
        """The production loop: drain, sleep, repeat."""
        import time

        cycles = 0
        while max_cycles is None or cycles < max_cycles:
            self.drain()
            cycles += 1
            if max_cycles is None or cycles < max_cycles:
                time.sleep(poll_interval_s)

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()


def union_evolved(older: DataFrame, newer: DataFrame) -> DataFrame:
    """Union two event batches whose schemas differ by an additive,
    BACKWARD-compatible change — the testSinglePk ALTER TABLE ADD
    scenario (PulsarCassandraSourceTests.java:261-343): rows from before
    the DDL carry null for the new column."""
    merged = reconcile_schemas(older.schema, newer.schema)
    return align_to_schema(older, merged).unionByName(align_to_schema(newer, merged))
