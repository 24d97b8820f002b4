"""``cdc_store`` — the bucket store as a first-class Spark read format.

``spark.read.format("cdc_store").load(root)`` turns the manifest-pointer
merge-on-write store (streaming/materialize.py) into a scan Catalyst can
plan against directly, instead of going through the ``read_state`` /
``active_view`` helper functions. Three scan-level behaviors the helpers
can't give a declarative reader:

1. **Bucket pruning at PLANNING time** (Spark 4.1 Python DataSource
   ``pushFilters``): an equality predicate covering the store's bucket
   key (``WHERE pk = 5``, or ``pk IN (...)``) routes to the exact hash
   buckets that can hold those keys — every other bucket directory is
   never listed, opened, or scheduled. The bucket id is re-derived
   driver-side with a bit-exact Python port of Spark's ``xxhash64``
   (functions/xxhash64_py.py, parity pinned in tests), the same
   expression ``merge_into`` bucketed on. This is the reference's
   per-key ``LIMIT 1`` point read (SURVEY O2, CassandraSource.java
   single-row lookup) surfaced as ordinary SQL: at 4096 buckets over
   100 TB a point query touches ~1/4096th of the table's files. All
   filters are returned to Spark unhandled — pruning only narrows WHICH
   files are read, Spark still applies the predicate row-wise, so a
   partially-covering filter set is always correct.
2. **Tombstone semantics in the scan** (``mode`` option): ``active``
   (default) hides DELETE winners inside the reader — arrow-level filter
   per batch, the Delta ``whenMatchedDelete`` read contract;
   ``state`` exposes the raw LWW state including tombstones (the
   tombstone-vs-miss contract point reads need). ``active`` is only
   sound on plain LWW stores (manifest ``kind == "lww"``): a compound
   store's dominance rules (partition-range tombstones, static
   resolution) are read-time and CROSS-row, so the per-row op filter
   would resurrect dominated rows — exactly the bug delta_export's
   default view had for compound stores (streaming/delta_log.py
   documents it). The reader refuses ``active`` on any non-lww kind;
   scan with ``mode=state`` and apply the store's view function
   (operators.lww.compound_active_view) on top.
3. **Schema evolution without footer IO**: the manifest records the
   table-wide Spark schema at merge time (reconciled, only ever widens),
   so scan planning reads ONE json file; per-file gaps (buckets written
   before an ALTER-ADD) are nulled at read. Legacy stores without the
   recorded schema fall back to unifying live footers — O(live files)
   driver-side metadata reads, capped to stay a planning-time cost.

Everything is arrow-batched (``read`` yields RecordBatches; no per-row
Python), one InputPartition per live parquet file, so parallelism follows
the file layout like any parquet scan.

Remote stores: ``path`` may be a URI root (file://, s3://, ... — listing
and footer IO resolve through pyarrow.fs), and ``manifestUrl`` resolves
the manifest pointer through an HTTP conditional-write store — the
cross-machine reader shape for stores committed with
HttpManifestStore(mirror_local=False).

KNOWN SPARK LIMITATION (4.1, pinned in
tests/test_store_source.py::test_spark_reuses_pushdown_pruned_scan):
Spark's Python DataSource machinery caches the most recent
PUSHDOWN-planned scan per loaded relation and reuses it for later
FILTERLESS plans of the SAME DataFrame object — so
``df.filter(...).count(); df.count()`` under-counts for ANY python
source that prunes in pushFilters (reproduced with a 20-line vanilla
source; filtered re-plans are always fresh). Until Spark replans
filterless queries, either call ``load()`` per query (what every
surface in this repo does — plans, facade, point_read) or disable
pruning for a long-lived DataFrame with ``option("pushdown",
"false")``.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from cdc_apache_cassandra_spark.functions.xxhash64_py import spark_bucket

MANIFEST = "_MANIFEST.json"

_SCAN_REUSE_WARNED = False


def _warn_scan_reuse_once() -> None:
    """Surface the module-docstring Spark limitation at RUNTIME, once
    per planning process, the first time pushFilters actually prunes
    (ADVICE r10): a user holding the pruned DataFrame across a later
    FILTERLESS action would silently under-count — tell them about the
    option("pushdown", "false") escape hatch instead of burying it."""
    global _SCAN_REUSE_WARNED
    if _SCAN_REUSE_WARNED:
        return
    _SCAN_REUSE_WARNED = True
    import warnings

    warnings.warn(
        "cdc_store: pushdown pruning engaged. Known Spark 4.1 "
        "limitation: a later FILTERLESS action on the SAME DataFrame "
        "object reuses this pruned scan and under-counts — call "
        "load() per query, or disable pruning for a long-lived "
        "DataFrame with option('pushdown', 'false'). See the "
        "store_source module docstring.",
        stacklevel=2,
    )


def _load_manifest(path: str, manifest_url: str | None = None) -> dict:
    """Resolve the manifest pointer. ``manifest_url`` (scan option
    ``manifestUrl``) reads it from an HTTP conditional-write store — the
    cross-machine reader shape for stores committed with NO local mirror
    (HttpManifestStore(mirror_local=False)); otherwise the local file,
    through the pyarrow.fs seam for URI table roots."""
    if manifest_url is not None:
        from cdc_apache_cassandra_spark.streaming.object_store import (
            HttpManifestStore,
        )

        manifest, _ = HttpManifestStore(manifest_url, mirror_local=False).load(path)
        if manifest is None:
            raise ValueError(
                f"cdc_store: no manifest for {path!r} at {manifest_url!r}"
            )
        return manifest
    from cdc_apache_cassandra_spark.streaming.delta_log import _io_read_bytes

    try:
        return json.loads(_io_read_bytes(os.path.join(path, MANIFEST)))
    except FileNotFoundError:
        raise ValueError(
            f"cdc_store: no {MANIFEST} under {path!r} — not a bucket store "
            "(or no commit has published yet)"
        )


def _bucket_dirs(path: str, manifest: dict) -> dict[str, str]:
    """bucket id -> live directory, resolved through the dirs map
    (writer-unique ``__ver=<v>-<token>`` layout; legacy ``__ver=<v>``
    read via the same fallback as materialize.version_dir)."""
    dirs = manifest.get("dirs") or {}
    out = {}
    for b, ver in manifest["buckets"].items():
        vdir = dirs.get(str(ver), f"__ver={ver}")
        out[b] = os.path.join(path, vdir, f"__bucket={b}")
    return out


def _bucket_files(bucket_dir: str) -> list[str]:
    if "://" in bucket_dir:
        from cdc_apache_cassandra_spark.streaming.delta_log import _io_listdir

        return sorted(
            os.path.join(bucket_dir, n)
            for n in _io_listdir(bucket_dir)
            if n.endswith(".parquet")
        )
    return sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))


#: legacy-fallback ceiling: footer unification is a driver-side planning
#: cost, acceptable for the ≤4096-single-file-bucket layouts legacy stores
#: actually have; a store past this should run compact() once (a
#: full-coverage rewrite records the table schema in the manifest —
#: partial merges deliberately do NOT, see materialize._record_schema)
#: rather than paying unbounded plan-time IO forever
MAX_FOOTER_READS = 8192


def _spark_table_schema(path: str, manifest: dict) -> T.StructType:
    """The scan's Spark schema. Current-format stores: the manifest's
    recorded table schema (written by merge_into at commit time — ZERO
    file IO at planning). Legacy stores: unify every live footer
    (additive evolution: later files may carry columns earlier ones
    lack) — O(live files) driver-side metadata reads, refused past
    :data:`MAX_FOOTER_READS`."""
    recorded = manifest.get("schema")
    if recorded:
        return T.StructType.fromJson(json.loads(recorded))

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    dirs = _bucket_dirs(path, manifest)  # built once, not per bucket
    files = [
        f
        for b in sorted(manifest["buckets"], key=int)
        for f in _bucket_files(dirs[b])
    ]
    if len(files) > MAX_FOOTER_READS:
        raise ValueError(
            f"cdc_store: legacy store at {path!r} has {len(files)} live "
            f"files (> {MAX_FOOTER_READS}); run compact() once (a "
            "full-coverage rewrite records the table schema in the "
            "manifest) instead of unbounded plan-time footer reads"
        )
    from cdc_apache_cassandra_spark.streaming.delta_log import _io_parquet_file

    schemas, seen = [], set()
    for f in files:
        s = _io_parquet_file(f).schema_arrow
        key = tuple(zip(s.names, (str(t) for t in s.types)))
        if key not in seen:
            seen.add(key)
            schemas.append(s)
    if not schemas:
        raise ValueError(f"cdc_store: store at {path!r} has no data files")
    return from_arrow_schema(
        pa.unify_schemas(schemas, promote_options="permissive")
    )


class _FilePartition(InputPartition):
    def __init__(self, file: str, ranges: dict | None = None):
        self.file = file
        # column -> [lo, hi] closed intervals for row-group stats
        # pruning — carried ON the partition (pushFilters state is
        # per-ACTION; the reader object outlives it)
        self.ranges = ranges or {}


class StoreScanReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType, manifest: dict | None = None):
        from pyspark.sql.pandas.types import to_arrow_schema

        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_store requires a path")
        self.mode = (options.get("mode") or "active").lower()
        if self.mode not in ("active", "state"):
            raise ValueError(f"cdc_store: mode must be active|state, got {self.mode!r}")
        # one manifest load per SCAN: the DataSource passes the manifest
        # its schema() call already resolved, so schema, bucket routing
        # and kind all come from the SAME pointer read (a commit landing
        # between two loads would otherwise skew routing vs schema —
        # and over manifestUrl each load is an HTTP round trip)
        self.manifest = manifest if manifest is not None else _load_manifest(
            self.path, options.get("manifesturl")
        )
        # 'active' = per-row tombstone filter, sound ONLY for plain LWW
        # stores. Compound/custom reducers have cross-row read semantics
        # (range-tombstone dominance, static resolution) that a per-file
        # op filter cannot honor — refusing beats resurrecting dominated
        # rows. A manifest WITHOUT the marker is indistinguishable
        # (compound stores predate it too), so it is refused as well:
        # availability lost on a correct legacy-lww store beats silent
        # wrong data on a legacy-compound one. One merge_into records the
        # marker; mode='state' always works.
        kind = self.manifest.get("kind")
        if self.mode == "active" and kind != "lww":
            raise ValueError(
                f"cdc_store: store at {self.path!r} has kind={kind!r}; "
                "'active' mode (row-level op filter) would resurrect rows "
                "dominated by range tombstones on a compound store. Read "
                "mode='state' and apply the store's active view "
                "(operators.lww.compound_active_view for compound; "
                "filter op != 'DELETE' for plain LWW), or — for a legacy "
                "lww store — run one merge_into to record kind='lww'."
            )
        self.arrow_schema = to_arrow_schema(schema)
        self.spark_schema = schema
        # option("pushdown", "false"): no planning-time pruning at all —
        # the escape hatch for long-lived DataFrames hit by the Spark
        # scan-reuse limitation documented in the module docstring
        self.pushdown = (
            (options.get("pushdown") or "true").lower() != "false"
        )
        # None = no routing predicate pushed; else the only buckets that
        # can satisfy the query (set of bucket-id strings)
        self.routed: set[str] | None = None
        # column -> closed [lo, hi] interval from pushed comparison
        # predicates (None = unbounded side): evaluated WORKER-side
        # against parquet row-group footer stats in read() — a
        # writetime-range scan over a 100 TB state table reads only the
        # row groups whose stats overlap, with zero driver cost
        self.ranges: dict[str, list] = {}

    # -- planning-time pruning ------------------------------------------
    def pushFilters(self, filters):
        # Spark may re-plan the SAME reader instance for successive
        # actions on one DataFrame lineage, each with ITS OWN filter
        # set — pruning state must reset per call or filters from a
        # previous action would conjoin with (and over-prune) this one
        self.routed = None
        self.ranges = {}
        if not self.pushdown:
            return filters
        bucket_cols = self.manifest.get("bucket_cols")
        n = self.manifest["n_buckets"]
        if bucket_cols and all(c in self.spark_schema.names for c in bucket_cols):
            types = {c: self.spark_schema[c].dataType for c in bucket_cols}
            # conjunct equality candidates per bucket column: each
            # EqualTo/In contributes one candidate SET; conjunct semantics
            # mean the sets intersect (x = 5 AND x IN (5, 7) -> {5})
            eq: dict[str, list[set]] = {}
            try:
                for f in filters:
                    if isinstance(f, EqualTo) and len(f.attribute) == 1:
                        col = f.attribute[0]
                        if col in types and f.value is not None:
                            eq.setdefault(col, []).append({f.value})
                    elif isinstance(f, In) and len(f.attribute) == 1:
                        col = f.attribute[0]
                        if col in types:
                            eq.setdefault(col, []).append(
                                {v for v in f.value if v is not None}
                            )
            except TypeError:
                eq = {}  # un-hashable literal (shouldn't happen) — no routing
            # route only when EVERY bucket column is pinned by equalities
            # (the hash needs the full key)
            if all(c in eq for c in bucket_cols):
                supported = True
                # cartesian of per-column candidate values, built column
                # by column (bounded: IN lists are literal)
                tuples: list[tuple] = [()]
                for c in bucket_cols:
                    vals = set.intersection(*eq[c])
                    tuples = [t + (v,) for t in tuples for v in vals]
                    if len(tuples) > 10_000:  # refuse absurd INs
                        supported = False
                        break
                if supported:
                    try:
                        self.routed = {
                            str(
                                spark_bucket(
                                    list(t), [types[c] for c in bucket_cols], n
                                )
                            )
                            for t in tuples
                        }
                    except TypeError:
                        # a type xxhash64_py doesn't map — scan everything
                        self.routed = None
        # comparison predicates -> per-column closed intervals for
        # row-group stats pruning (read() side). Bounds are treated
        # INCLUSIVELY even for strict predicates — a boundary row group
        # is read and Spark's row-level filter drops the edge rows:
        # conservative, never lossy. Only value types whose footer
        # stats order like the data are used (numerics, date/timestamp
        # — pyarrow surfaces them as comparable Python values); a
        # TypeError at compare time keeps the row group.
        for f in filters:
            col = None
            lo = hi = None
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                col, lo = f.attribute, f.value
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                col, hi = f.attribute, f.value
            elif isinstance(f, EqualTo):
                col, lo, hi = f.attribute, f.value, f.value
            elif isinstance(f, In):
                vals = [v for v in f.value if v is not None]
                if vals:
                    try:
                        col, lo, hi = f.attribute, min(vals), max(vals)
                    except TypeError:
                        col = None
            if col is None or len(col) != 1 or (lo is None and hi is None):
                continue
            if isinstance(lo, bool) or isinstance(hi, bool):
                continue  # boolean stats are degenerate — not worth it
            iv = self.ranges.setdefault(col[0], [None, None])
            if lo is not None and (iv[0] is None or lo > iv[0]):
                iv[0] = lo
            if hi is not None and (iv[1] is None or hi < iv[1]):
                iv[1] = hi
        # every filter goes back to Spark: pruning narrows the file set,
        # row-level evaluation stays with the engine (always correct)
        if self.routed is not None or self.ranges:
            _warn_scan_reuse_once()
        return filters

    def partitions(self):
        # CONSUME the pushed pruning state: Spark calls pushFilters only
        # for actions that HAVE filters, so state left on this reader
        # would silently conjoin into the next (possibly filterless)
        # action on the same DataFrame lineage — consume-and-clear makes
        # each action's pruning exactly its own filters (an action whose
        # pushFilters was skipped scans unpruned: conservative)
        routed, self.routed = self.routed, None
        ranges, self.ranges = self.ranges, {}
        dirs = _bucket_dirs(self.path, self.manifest)
        buckets = sorted(dirs, key=int)
        if routed is not None:
            buckets = [b for b in buckets if b in routed]
        parts = [
            _FilePartition(f, ranges)
            for b in buckets
            for f in _bucket_files(dirs[b])
        ]
        # zero matching buckets (point read of an absent key): one empty
        # placeholder so the scan still yields a well-formed relation
        return parts or [_FilePartition("")]

    @staticmethod
    def _keep_row_groups(pf, ranges: dict) -> list[int] | None:
        """Row groups whose footer stats can intersect every pushed
        interval; None = read everything (no intervals). Missing or
        non-comparable stats keep the group — pruning is IO-only and
        conservative."""
        if not ranges:
            return None
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            footer_leaf_index,
        )

        md = pf.metadata
        col_idx = {col: footer_leaf_index(md, col) for col in ranges}
        keep = []
        for g in range(md.num_row_groups):
            ok = True
            for col, (lo, hi) in ranges.items():
                i = col_idx.get(col)
                if i is None:
                    continue  # pre-DDL file: typed nulls — Spark filters
                st = md.row_group(g).column(i).statistics
                if st is None or not st.has_min_max:
                    continue
                try:
                    if (hi is not None and st.min > hi) or (
                        lo is not None and st.max < lo
                    ):
                        ok = False
                        break
                except TypeError:
                    continue  # incomparable stat repr: keep the group
            if ok:
                keep.append(g)
        return keep

    def read(self, partition: _FilePartition):
        if not partition.file:
            return
        import pyarrow as pa
        import pyarrow.compute as pc

        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _io_parquet_file,
            _io_read_parquet,
        )

        if partition.ranges:
            pf = _io_parquet_file(partition.file)
            keep = self._keep_row_groups(pf, partition.ranges)
            if keep is not None and not keep:
                return  # provably no row in any pushed interval
            table = (
                pf.read() if keep is None else pf.read_row_groups(keep)
            )
        else:
            table = _io_read_parquet(partition.file)
        if self.mode == "active":
            table = table.filter(pc.not_equal(pc.field("op"), "DELETE"))
        present = set(table.column_names)
        for field in self.arrow_schema:
            if field.name not in present:
                table = table.append_column(
                    field.name, pa.nulls(table.num_rows, type=field.type)
                )
        table = table.select(self.arrow_schema.names).cast(self.arrow_schema)
        yield from table.to_batches()


class StoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_store"

    def _manifest(self) -> dict:
        cached = getattr(self, "_manifest_cache", None)
        if cached is None:
            path = self.options.get("path")
            if not path:
                raise ValueError("cdc_store requires a path")
            cached = _load_manifest(path, self.options.get("manifesturl"))
            self._manifest_cache = cached
        return cached

    def schema(self):
        return _spark_table_schema(self.options.get("path"), self._manifest())

    def reader(self, schema) -> StoreScanReader:
        return StoreScanReader(self.options, schema, manifest=self._manifest())


def register(spark) -> None:
    spark.dataSource.register(StoreDataSource)
