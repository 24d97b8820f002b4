"""``cdc_delta_changes`` — the export's change feed as a Structured
Streaming SOURCE, so a downstream engine tails the Delta log the way the
reference's connector tails the events topic
(connector/src/main/java/com/datastax/oss/cdc/CassandraSource.java:452-499:
consume → process → acknowledge cursor).

    spark.readStream.format("cdc_delta_changes")
        .option("path", <delta table>)
        .option("pkCols", "pk")            # classification key
        .option("startingVersion", 0)      # offset to tail from
                                           # (-1 = initial snapshot as inserts)
        .option("startingTimestamp", ms)   # OR: every change committed at
                                           # or after this epoch-ms time,
                                           # INCLUSIVE (delta-spark parity;
                                           # mutually exclusive; before-
                                           # earliest = snapshot replay,
                                           # after-last = tail only)
        .option("maxVersionsPerBatch", 10) # rate limit (optional)
        .option("consumerId", "train-job") # durable cursor (optional)
        .option("logStoreUrl", url)        # route the log through an HTTP
                                           # commit store (replay when the
                                           # log lives ONLY there; cursor
                                           # publication in both modes)
        .option("logStoreMirror", "true")  # match a mirror_local=True
                                           # deployment (reads stay local,
                                           # cursor commits PUT-then-mirror)
        .option("readChangeFeed", "true")  # consume the log's own
                                           # CHANGE-DATA files (spec `cdc`
                                           # actions) instead of pk-diff
                                           # classification — see below
        .load()

``readChangeFeed=true`` is delta-spark's CDF stream surface: no pkCols
needed, per-VERSION emission (a multi-version micro-batch emits every
commit's own changes — intermediate states never collapse, unlike the
pk-diff net-effect), and the output gains ``_commit_timestamp``.
Change-data files are authoritative (their commit's add/remove ignored
per spec); add-only commits synthesize inserts and remove-only commits
deletes via the BATCH surface's shared planner
(``delta_log._cdf_window_plan``), with the same loud refusals (no
``delta.enableChangeDataFeed``; a mixed commit without change-data
files). The first batch from the default ``startingVersion=-1``
bootstraps with the current snapshot as ``insert`` rows. Planning cuts
each commit's files into ≤``maxBytesPerPartition`` chunks — every file
reads independently (no join), so per-file parallelism is the natural
unit; DV masks, column mapping (name + id mode) and foreign partition
values ride the same per-file loader the pk-diff mode uses.

Offsets ARE Delta versions: a micro-batch covers the net row-level change
between two log versions, classified exactly like
``delta_log.delta_changes`` (insert / delete / update_preimage /
update_postimage + ``_commit_version``; unchanged bucket-rewrite
neighbors cancel under null-safe full-row equality). Net-effect is
per-BATCH: with ``maxVersionsPerBatch=1`` every version's own diff is
emitted; with a larger window intermediate states inside the window
collapse — the same contract Delta CDF batch reads have over a range.

Distribution: the exporter tags every ``add`` with its store bucket, and
a bucket's keys never migrate, so each bucket's (pre-file, post-file)
pair is classified INDEPENDENTLY — one InputPartition per changed
bucket, pandas/Arrow inside the partition, nothing row-sized on the
driver. Driver work per trigger is log replay (metadata-sized). Files
from foreign writers without bucket tags fall back to one GROUP (any
key may pair across them) — but any group whose file bytes exceed
``maxBytesPerPartition`` (default 512 MiB) splits into N
sub-partitions, each classifying its own key slice of both sides.
Preferred split: key RANGES cut from the adds' file-level min/max
stats — numeric values as-is; fixed-width ISO-8601 timestamp/date
strings (the form Delta stats JSON uses, and among the most common
Cassandra clustering keys) normalized to epoch micros/days, with a
max padded up by its precision gap so a millisecond-floored foreign
max can never lose rows. Each sub-partition opens only the files
overlapping its range and prunes row groups by footer stats, so
per-split IO tracks the range's bytes. When stats are missing or
free-form strings (those may be truncated — pruning on them could
lose rows), the split falls back to key-hash slices, which re-read
the group per slice (capped at 64×). Either way the union is
byte-identical to the unsplit output and no single task carries the
group.

Exact-type classification: partitions convert Arrow → pandas with
``ArrowDtype`` (int64 keys stay int64 — no float64 round-trip that would
corrupt keys past 2^53 — and null keys match null keys in the outer
merge, the null-safe join the classification needs). NaN matches Spark's
``eqNullSafe`` (NaN equals NaN) at top level AND nested inside
list/struct/map values — an unchanged NaN row cancels instead of
emitting a spurious update pair, exactly as the batch CDF path
(``delta_log.delta_changes``) classifies it.

Resume: Spark checkpoints the version offset (restart replays nothing —
pinned in tests/test_change_feed_source.py). ``consumerId`` additionally
records the consumed-through version IN the log itself after each
data-carrying batch (``delta_log.record_consumer_offset``), which is
what ``delta_log_cleanup`` retention respects — the Kafka-consumer-lag
contract. Cursor commits are txn-only log versions; the reader skips
recording after data-free ranges, so the cursor can never self-feed.
"""

from __future__ import annotations

import contextlib
import json

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

CDF_FIELDS = [
    T.StructField("_change_type", T.StringType(), True),
    T.StructField("_commit_version", T.LongType(), True),
]

#: identity-equal stand-in for float NaN inside NESTED values during the
#: pandas classification: Python's ``nan == nan`` is False, so a deep
#: comparison would see every unchanged nested NaN as a change;
#: canonicalizing to one shared object makes it equal itself (and never
#: equal real data), matching Spark eqNullSafe's NaN-equals-NaN rule.
_NAN_SENTINEL = object()

# Fixed-width ISO-8601 forms Delta stats JSON uses for timestamp/date
# min/max (delta-spark writes millisecond precision with a Z suffix; our
# own exporter matches it — delta_log._file_stats_json). Fixed width ⇒
# lexicographic order == chronological order, so the string-TRUNCATION
# hazard that forbids free-form string stats does not apply; the
# sub-second PRECISION hazard does, and _stat_key handles it by padding
# a max up by its precision gap (see below).
import re as _re

_ISO_TS_RE = _re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.(\d{3}|\d{6}))?"
    r"(Z|\+00:00)?$"
)
_ISO_DATE_RE = _re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _stat_key(v, ceil: bool = False):
    """Normalize ONE stats min/max value into the numeric key space the
    range planner cuts in: ``(number, kind)`` with kind ∈ {'num'
    (value as-is), 'ts' (epoch MICROS), 'date' (epoch DAYS)} — or None
    when the value can't soundly bound a key range. Strings are
    accepted ONLY when they match a fixed-width ISO-8601 timestamp or
    date (VERDICT r8 item 4): ISO timestamps are among the most common
    Cassandra clustering keys (SURVEY §1.2) and are exempt from the
    free-form-string refusal because fixed width makes lexicographic
    order == value order. Sub-second truncation is still real — a
    writer that FLOORS a max to milliseconds under-reports the file's
    range, so with ``ceil=True`` a parsed max is padded up by its
    precision gap (+999 µs for ms-precision, +999999 µs for
    second-precision): pruning stays conservative (may read an extra
    file, never loses a row). Mins floor naturally — already safe for
    overlap checks."""
    import datetime

    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return (v, "num")
    if not isinstance(v, str):
        return None
    if _ISO_DATE_RE.match(v):
        try:
            d = datetime.date.fromisoformat(v)
        except ValueError:
            return None
        return ((d - datetime.date(1970, 1, 1)).days, "date")
    m = _ISO_TS_RE.match(v)
    if not m:
        return None
    frac = m.group(2) or ""
    body = v[:19].replace(" ", "T")
    try:
        dt = datetime.datetime.fromisoformat(body).replace(
            tzinfo=datetime.timezone.utc
        )
    except ValueError:
        return None
    # exact integer micros via timedelta floor-div (float .timestamp()
    # truncates toward zero for pre-1970 values)
    micros = (
        dt - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    ) // datetime.timedelta(microseconds=1)
    if len(frac) == 6:
        micros += int(frac)
        pad = 0
    elif len(frac) == 3:
        micros += int(frac) * 1000
        pad = 999
    else:
        pad = 999_999
    return (micros + (pad if ceil else 0), "ts")


def _align_by_id(arr, target_type, children):
    """Arrow array restructured to ``target_type``'s STRUCT LAYOUT by
    parquet field-id matching at every struct level — the ID-mode
    resolution rule the JVM batch path applies natively
    (fieldId.read.enabled matches nested fields too). A file whose
    nested struct order differs from the logical schema (a reorder or
    mid-struct ADD COLUMN) realigns here instead of being grafted
    positionally; a logical child absent from the file reads as typed
    nulls. Scalar types keep the FILE's type (the final cast handles
    promotions); list levels rebuild zero-copy around the realigned
    values; map values stay positional (delta id-mode writers do not
    reorder map value structs in place). ``children`` is the
    MappingPlan id-tree node for this level (None = nothing nested to
    align)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_struct(arr.type) and isinstance(
        target_type, pa.StructType
    ) and children:
        by_id = {}
        for i in range(arr.type.num_fields):
            md = arr.type.field(i).metadata or {}
            fid = md.get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = i
        out, fields = [], []
        for tf in target_type:
            node = children.get(tf.name)
            src_i = by_id.get(node["id"]) if node else None
            if src_i is None:
                child = pa.nulls(len(arr), type=tf.type)
            else:
                child = _align_by_id(
                    arr.field(src_i), tf.type, (node or {}).get("children")
                )
            out.append(child)
            fields.append(pa.field(tf.name, child.type))
        return pa.StructArray.from_arrays(
            out, fields=fields, mask=arr.is_null()
        )
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        values = _align_by_id(
            arr.values,
            target_type.value_type
            if (
                pa.types.is_list(target_type)
                or pa.types.is_large_list(target_type)
            )
            else target_type,
            children,
        )
        cls = (
            pa.LargeListArray
            if pa.types.is_large_list(arr.type)
            else pa.ListArray
        )
        buffers = arr.buffers()[:2]  # [validity, offsets] — layout reused
        return pa.Array.from_buffers(
            pa.large_list(values.type)
            if pa.types.is_large_list(arr.type)
            else pa.list_(values.type),
            len(arr),
            buffers,
            children=[values],
            offset=arr.offset,
        )
    return arr


def _renamed_type(source, target):
    """``source`` arrow type with ``target``'s FIELD NAMES grafted on
    positionally wherever the shapes align (struct/list/map recursion) —
    the zero-copy ``Array.view`` target for a column-mapped file: only
    names differ between a physical parquet type and its logical form,
    so the view is metadata-only; scalar type PROMOTIONS (pre-DDL
    widenings) keep the source type here and the subsequent cast — now
    seeing matching names — handles them (or refuses loudly on a real
    shape mismatch)."""
    import pyarrow as pa

    if pa.types.is_struct(source) and pa.types.is_struct(target):
        if source.num_fields != target.num_fields:
            return source
        return pa.struct(
            [
                pa.field(
                    target.field(i).name,
                    _renamed_type(source.field(i).type, target.field(i).type),
                    nullable=source.field(i).nullable,
                )
                for i in range(source.num_fields)
            ]
        )
    if (
        pa.types.is_list(source)
        or pa.types.is_large_list(source)
    ) and (pa.types.is_list(target) or pa.types.is_large_list(target)):
        inner = _renamed_type(source.value_type, target.value_type)
        return (
            pa.large_list(inner)
            if pa.types.is_large_list(source)
            else pa.list_(inner)
        )
    if pa.types.is_map(source) and pa.types.is_map(target):
        return pa.map_(
            _renamed_type(source.key_type, target.key_type),
            _renamed_type(source.item_type, target.item_type),
        )
    return source


def _overlaps(st, lo, hi) -> bool:
    """File-vs-range overlap on a PARSED _file_stats tuple (None = no
    usable stats — keep the file, pruning must never drop data)."""
    if st is None:
        return True
    mn, mx, may_null, _ = st
    if lo is None and may_null:
        return True  # null keys belong to the first range
    return (hi is None or mn < hi) and (lo is None or mx >= lo)


def _footer_key(v, kind: str):
    """Normalize a parquet FOOTER statistics min/max (exact values —
    pyarrow decodes timestamp/date logical types to datetime objects,
    no string truncation) into the same numeric key space as
    ``_stat_key``. Returns the number, or None when the footer value's
    kind doesn't match the group's (caller must then refuse to prune
    on it)."""
    import datetime

    if isinstance(v, bool):
        return None
    if kind == "num":
        return v if isinstance(v, (int, float)) else None
    if kind == "ts":
        if not isinstance(v, datetime.datetime):
            return None
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return (
            v - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        ) // datetime.timedelta(microseconds=1)
    if kind == "date":
        if isinstance(v, datetime.datetime) or not isinstance(
            v, datetime.date
        ):
            return None
        return (v - datetime.date(1970, 1, 1)).days
    return None


@contextlib.contextmanager
def _routed_log_store(url: str | None, mirror: bool = False):
    """Temporarily resolve delta_log commits through an HTTP commit
    store (option ``logStoreUrl``). ``mirror=False`` is the reader
    shape for logs that exist ONLY in the store (no-mirror writers:
    reads resolve through the store's reader half). ``mirror=True``
    matches a ``mirror_local=True`` deployment: reads stay local, but
    cursor COMMITS still publish through the conditional PUT first and
    mirror after — a worker committing only locally would leave a hole
    in the authoritative create-only HTTP sequence. The swap is scoped
    to the call: each Python streaming source runs in its own worker
    process, so no concurrent planner shares the global."""
    if not url:
        yield
        return
    from cdc_apache_cassandra_spark.streaming.delta_log import (
        set_log_commit_store,
    )
    from cdc_apache_cassandra_spark.streaming.object_store import (
        HttpLogCommitStore,
    )

    prev = set_log_commit_store(HttpLogCommitStore(url, mirror_local=mirror))
    try:
        yield
    finally:
        set_log_commit_store(prev)


def _table_schema(
    path: str,
    log_store_url: str | None = None,
    log_store_mirror: bool = False,
) -> T.StructType:
    from cdc_apache_cassandra_spark.streaming.delta_log import _replay

    with _routed_log_store(log_store_url, log_store_mirror):
        meta = _replay(path).meta
    if meta is None:
        raise ValueError(f"cdc_delta_changes: no Delta log at {path!r}")
    return T.StructType.fromJson(json.loads(meta["schemaString"]))


class _ChangePartition(InputPartition):
    # pre/post: (absolute file path, deletionVector descriptor | None,
    # partition-values dict | None)
    # per side — read() filters DV-masked rows by file ordinal, so a
    # file re-added under a new DV classifies as exactly the newly
    # masked rows' deletes (batch-CDF parity).
    def __init__(
        self,
        pre: list[tuple],
        post: list[tuple],
        to_version: int,
        split_idx: int = 0,
        split_count: int = 1,
        key_range: tuple | None = None,
        key_kind: str = "num",
        phys: dict | None = None,
        ids: dict | None = None,
        cdc_change: str | None = None,
        commit_ts: int | None = None,
    ):
        self.pre = pre
        self.post = post
        self.to_version = to_version
        # readChangeFeed mode (None = pk-diff classification): 'cdc' =
        # the entries are CHANGE-DATA files whose rows carry their
        # stored _change_type; 'insert'/'delete' = synthesized from a
        # pure-insert / pure-delete commit, the constant IS the change
        # type. Entries live in `post`; to_version is the entries'
        # COMMIT version (not the batch end), commit_ts its monotonized
        # epoch-ms timestamp — read() stamps both onto every row.
        self.cdc_change = cdc_change
        self.commit_ts = commit_ts
        # key-hash sub-range of an oversized group: this partition
        # classifies only keys with hash(pk) % split_count == split_idx
        # (sound — classification is key-local, both sides slice alike)
        self.split_idx = split_idx
        self.split_count = split_count
        # key-RANGE sub-split (preferred over hash when add.stats carry
        # numeric min/max for the leading pk column): this partition
        # classifies keys with lo <= pk[0] < hi (None = unbounded; null
        # keys belong to the first range). pre/post are ALREADY pruned
        # to the files whose stats overlap the range, and read() prunes
        # row groups by footer stats — per-split IO tracks the range's
        # bytes instead of N× full-group re-reads (VERDICT r7 item 8).
        # key_kind names the normalized key space the bounds live in
        # ('num' = values as-is, 'ts' = epoch micros, 'date' = epoch
        # days — VERDICT r8 item 4); read() casts the pk column to the
        # same space (Arrow cast, no Python loop) before slicing.
        self.key_range = key_range
        self.key_kind = key_kind
        # logical -> PHYSICAL top-level name map when the table uses
        # column mapping (name mode); None = identity. read() selects
        # by physical name and grafts logical names back zero-copy.
        self.phys = phys
        # logical -> delta.columnMapping.id when the table uses ID-mode
        # mapping: read() resolves each FILE's column names from its
        # parquet field ids (PARQUET:field_id), physicalName fallback.
        self.ids = ids
        # rows decoded from parquet before range filtering — an
        # IN-PROCESS TEST OBSERVABLE ONLY (set by read()): under real
        # Spark execution partitions are pickled to worker processes,
        # so a driver-side reference never sees this increment. Do not
        # build driver-side metrics on it.
        self.rows_loaded = 0


class ChangeFeedStreamReader(DataSourceStreamReader):
    """Offset = {"version": last consumed Delta version}."""

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cdc_delta_changes requires option 'path'")
        # readChangeFeed: consume the log's own CHANGE-DATA files
        # (spec `cdc` actions) instead of classifying by pk-diff —
        # delta-spark's `.option("readChangeFeed","true")` stream
        # surface. No pk needed (the change rows ARE the files' rows),
        # per-VERSION emission (intermediate states never collapse),
        # and the output gains `_commit_timestamp` (delta-spark's CDF
        # column set). Synthesis/refusal rules are the batch surface's
        # own (`delta_log._cdf_window_plan` — shared code).
        self.use_cdc = (
            str(options.get("readchangefeed", "false")).lower() == "true"
        )
        pk = options.get("pkcols") or options.get("pkCols")
        if not pk:
            if not self.use_cdc:
                raise ValueError(
                    "cdc_delta_changes requires option 'pkCols' "
                    "(comma-separated primary-key columns) unless "
                    "readChangeFeed=true"
                )
            self.pk_cols = []
        else:
            self.pk_cols = [c.strip() for c in pk.split(",") if c.strip()]
        self.schema = schema
        # the TABLE schema this stream is pinned to (CDF columns are
        # ours); partitions() re-checks every planned range against it —
        # a Spark streaming source cannot widen its schema mid-stream,
        # so a widening DDL must stop the stream loudly, never silently
        # project the new columns away (reference parity:
        # connector/.../CassandraSource.java:666-698 swaps its converter
        # on onTableUpdated; the Spark idiom is restart-on-DDL)
        self._pinned_types = {
            f.name: f.dataType.json()
            for f in schema.fields
            if f.name
            not in ("_change_type", "_commit_version", "_commit_timestamp")
        }
        missing = [c for c in self.pk_cols if c not in schema.names]
        if missing:
            raise ValueError(
                f"cdc_delta_changes: pkCols {missing} not in table schema "
                f"{[f.name for f in schema.fields]}"
            )
        self.log_store_url = options.get("logstoreurl")
        self.log_store_mirror = (
            str(options.get("logstoremirror", "false")).lower() == "true"
        )
        st_ms = options.get("startingtimestamp")
        if st_ms is not None and options.get("startingversion") is not None:
            raise ValueError(
                "cdc_delta_changes: pass startingVersion OR "
                "startingTimestamp, not both"
            )
        if st_ms is not None:
            # delta-spark STREAMING parity (inclusive): emit every
            # change committed at or after the requested time — the
            # EARLIEST such version's own diff included (start offset =
            # that version - 1). A time before the earliest surviving
            # commit naturally resolves to -1 = the initial-snapshot
            # replay (canReturnEarliestCommit); a time after the last
            # commit starts at the head and tails only future commits.
            # One history read at construction — __init__ already
            # replays the head for the schema pin, so this is a
            # proportional, not a new, startup cost. Resolution rides
            # delta_log.commit_timestamps — the SAME monotonized,
            # mtime-fallback helper the batch surface uses, so foreign
            # logs (commitInfo-free commits, clock-skewed writers)
            # resolve identically on both, matching delta-spark's
            # adjusted-timestamp rule.
            from cdc_apache_cassandra_spark.streaming.delta_log import (
                commit_timestamps,
            )

            with _routed_log_store(self.log_store_url, self.log_store_mirror):
                try:
                    stamped = commit_timestamps(self.path)
                except FileNotFoundError:
                    raise FileNotFoundError(
                        f"cdc_delta_changes: no Delta log at {self.path!r}"
                    ) from None
            at_or_after = [v for v, t in stamped if t >= int(st_ms)]
            self.start_version = (
                min(at_or_after) - 1
                if at_or_after
                else max(v for v, _t in stamped)
            )
        else:
            self.start_version = int(options.get("startingversion", -1))
        mv = options.get("maxversionsperbatch")
        self.max_versions = int(mv) if mv else None
        # upper bound on the file bytes one partition classifies: groups
        # above it (a pathological bucket, or the untagged-foreign
        # fallback that would otherwise collapse to ONE partition) split
        # by key-hash range into ceil(bytes/threshold) sub-partitions.
        # Default 512 MiB — the store's documented bucket sizing keeps
        # normal buckets well under it (SCALE.md), so tagged tables
        # usually plan exactly one partition per changed bucket.
        mb = options.get("maxbytesperpartition")
        self.max_bytes = int(mb) if mb else 512 << 20
        self.consumer_id = options.get("consumerid")
        # the log version the pinned schema was read at: the DDL check
        # applies only to ranges ENDING PAST it — schema differences at
        # or before the pin are history (columns later dropped, types
        # later changed) and read under Delta's own rule: the request's
        # end-schema wins, so a restart can never wedge on them. Verify
        # the pin is actually current so the (schema(), reader()) gap
        # cannot hide a DDL: a mismatch at construction restarts clean.
        from cdc_apache_cassandra_spark.streaming.delta_log import _replay

        with _routed_log_store(self.log_store_url, self.log_store_mirror):
            head = _replay(self.path)
        self._pinned_at = head.last
        drift = self._schema_drift(head.meta)
        if drift:
            raise RuntimeError(
                f"cdc_delta_changes: the provided schema is stale for "
                f"{self.path!r} (log columns {drift} differ at version "
                f"{head.last}); re-plan the stream so it pins the "
                "current table schema"
            )
        if self.use_cdc and (
            (head.meta or {}).get("configuration") or {}
        ).get("delta.enableChangeDataFeed") != "true":
            # refuse at CONSTRUCTION, before the first batch — batch
            # parity (delta_changes_cdf raises the same way): change
            # data was never recorded for this table, so a cdc-file
            # stream would fabricate change rows
            raise ValueError(
                f"cdc_delta_changes: readChangeFeed=true but "
                f"delta.enableChangeDataFeed is not set on "
                f"{self.path!r} — change data was not recorded for "
                "this table (delta-spark's CDF stream refuses the "
                "same way); use the pk-diff mode (pkCols=...) for "
                "file-rewrite logs"
            )
        # cursor txn commits need a WRITABLE log: plain local paths,
        # file://, or a routed conditional-PUT store. Decided by scheme
        # up front — a read-only remote root would otherwise pay a full
        # remote log replay per commit cycle just to discard the result.
        self._cursor_writable = (
            self.log_store_url is not None
            or "://" not in self.path
            or self.path.startswith("file://")
        )
        # driver-side trackers: rate-limit base + data-bearing watermark.
        # _primed: the base is authoritative only once we've seen a real
        # offset (fresh run's initialOffset, or any partitions() call) —
        # on a RESTART Spark plans from its checkpoint without telling us
        # first, so an unprimed latestOffset must not cap (one unbounded
        # catch-up batch, then pacing resumes).
        self._pos = self.start_version
        self._last_data_version = self.start_version
        self._primed = False
        self._unprimed_offers = 0
        # readChangeFeed: incremental commit-timestamp cache (the
        # monotonized resolution is prefix-stable, so per-trigger cost
        # is O(new commits), not O(log size))
        self._ts_cache: dict | None = None

    # -- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        self._primed = True
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _replay,
            consumer_offset,
        )

        with _routed_log_store(self.log_store_url, self.log_store_mirror):
            last = _replay(self.path).last
        if self.max_versions is None:
            return {"version": max(self._pos, last)}
        if self._primed:
            base = self._pos
        else:
            # Spark 4.1 asks latestOffset BEFORE initialOffset on a fresh
            # run (observed; restarts replay partitions() first, which
            # primes). A capped unprimed offer is only safe when no
            # checkpoint can be ahead of our base: a recorded consumer
            # cursor means this stream ran before (the checkpoint LEADS
            # the cursor), and offering below Spark's committed offset
            # would regress the offset log — so with a cursor present the
            # first offer is UNCAPPED (one catch-up batch, then pacing
            # resumes from the primed position). Without a cursor we pace
            # from startingVersion, with a safety valve: if Spark did NOT
            # take a capped unprimed offer (no partitions() call in
            # between — the would-be-stall signature on an exotic restart
            # path), the next offer is uncapped so progress is guaranteed.
            with _routed_log_store(self.log_store_url, self.log_store_mirror):
                cursor = (
                    consumer_offset(self.path, self.consumer_id)
                    if self.consumer_id
                    else -1
                )
            if cursor >= 0 or self._unprimed_offers > 0:
                return {"version": max(self._pos, cursor, last)}
            base = self.start_version
            self._unprimed_offers += 1
        return {"version": max(base, min(last, base + self.max_versions))}

    # -- planning ----------------------------------------------------------
    def _state_at(self, version: int):
        from cdc_apache_cassandra_spark.streaming.delta_log import _replay

        with _routed_log_store(self.log_store_url, self.log_store_mirror):
            return _replay(self.path, version) if version >= 0 else None

    def _schema_drift(self, meta: dict | None) -> list[str]:
        """Column names whose presence/type in ``meta`` differs from the
        pinned stream schema (recursive via canonical type JSON) — in
        EITHER direction: new/retyped columns AND pinned columns absent
        from the new metaData. A mid-stream DROP COLUMN must stop the
        stream as loudly as an ADD: post-DDL files would otherwise read
        the dropped column as typed nulls, emitting value→null update
        pairs for every changed row — Delta CDF fails the stream on any
        schema change, and so do we."""
        if meta is None:
            return []
        new_fields = json.loads(meta["schemaString"])["fields"]
        drift = [
            f["name"]
            for f in new_fields
            if f["name"] not in self._pinned_types
            or json.dumps(f["type"], sort_keys=True)
            != json.dumps(
                json.loads(self._pinned_types[f["name"]]), sort_keys=True
            )
        ]
        present = {f["name"] for f in new_fields}
        drift += [c for c in self._pinned_types if c not in present]
        return drift

    def _check_schema(self, meta: dict | None, to_v: int) -> None:
        """Stop loudly when a range ending PAST the pin sees metaData
        that widens, retypes, or DROPS columns — a mid-STREAM DDL. Ranges ending
        at or before ``_pinned_at`` are history: their schema
        differences (columns later dropped, types later reverted) read
        under Delta's own rule — the pinned (newest) schema wins, typed
        nulls for columns a file lacks — so a restarted stream can
        never wedge on them (it re-pins at the new head and the same
        range replans as historical). Raising fails the query with a
        restart instruction; the checkpointed offset loses nothing."""
        if to_v <= self._pinned_at:
            return
        drift = self._schema_drift(meta)
        if drift:
            raise RuntimeError(
                f"cdc_delta_changes: table schema at {self.path!r} changed "
                f"after version {self._pinned_at} (new/retyped/dropped "
                f"columns at version <= {to_v}: {drift}); a streaming "
                "source cannot change its schema mid-stream — restart the "
                "stream to pick up the new schema (the checkpointed offset "
                "resumes exactly where this batch would have started; no "
                "rows are lost)"
            )

    def _entry(self, path: str, add: dict):
        """One partition entry for an add: (absolute path, DV
        descriptor, partition-values dict) — the third element None for
        unpartitioned tables, else {logical name: string value} pulled
        from add.partitionValues (physical-name keys tolerated)."""
        pv = None
        if self._part_cols:
            from cdc_apache_cassandra_spark.streaming.delta_log import (
                _partition_value_of,
            )

            pv = {
                c: _partition_value_of(add, ph, c)
                for c, ph in self._part_cols
            }
        return (path, add.get("deletionVector"), pv)

    def _setup_mapping(self, meta: dict | None) -> None:
        """Resolve the table's column-mapping + partition-column plan
        for this batch (driver-side, metadata-sized) — read() grafts
        from the resulting ``self._phys`` / ``self._ids`` /
        ``self._part_cols``. Name mode: files carry PHYSICAL names;
        stats and footers key on them, and read() grafts the logical
        names back on (zero-copy view). ID mode: per-file
        PARQUET:field_id resolution. Unknown modes refuse loudly via
        _mapping_plan — same posture as read_delta. The to-side meta
        rules: on a mapping upgrade existing columns get physicalName
        == their logical name, so pre-upgrade files read unchanged."""
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _mapping_plan,
        )

        plan = _mapping_plan(meta) if meta else None
        phys_of = plan.phys_of if plan else None
        self._phys = (
            None
            if not phys_of or all(k == v for k, v in phys_of.items())
            else phys_of
        )
        self._ids = plan.id_of if plan else None
        # foreign PARTITIONED tables: partition column values live in
        # add.partitionValues (the spec keeps them out of the parquet);
        # carry (logical, physical) pairs so each entry ships its values
        phys_all = phys_of or {}
        self._part_cols = [
            (c, phys_all.get(c, c))
            for c in ((meta or {}).get("partitionColumns") or [])
        ]

    def _cdc_partitions(self, from_v: int, to_v: int, st_to):
        """readChangeFeed planning: classify every window commit with
        the BATCH surface's shared planner (`_cdf_window_plan` — cdc
        files authoritative; pure-insert/pure-delete synthesis; loud
        refusal on a mixed commit without change-data files), then cut
        each commit's files into partitions of at most
        ``maxBytesPerPartition``. Every file reads independently (no
        pk join), so per-file parallelism is the natural unit and a
        chunk is just a task-size floor — no key splits needed.

        A first batch from ``startingVersion=-1`` (the default)
        bootstraps with the CURRENT snapshot as `insert` rows stamped
        with the batch-end version — delta-spark's CDF-stream initial
        snapshot — which also serves checkpoint-cleaned tables whose
        early commit JSONs no longer exist. Driver cost: one JSON
        parse per window commit plus the monotonized timestamp
        resolution (both metadata-sized)."""
        import os

        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _cdf_window_plan,
        )

        with _routed_log_store(self.log_store_url, self.log_store_mirror):
            ts = self._commit_ts_map()
            if from_v < 0:
                files = st_to.files if st_to else {}
                plans = [(to_v, "insert", sorted(files.items()))]
            else:
                try:
                    plans = _cdf_window_plan(self.path, from_v + 1, to_v)
                except FileNotFoundError as e:
                    # a window commit's JSON (or the pre-window state a
                    # delete synthesis needs) was checkpoint-cleaned: a
                    # stream cannot widen its own window — Spark owns
                    # the checkpointed offset — so the actionable
                    # instruction is a fresh restart
                    raise FileNotFoundError(
                        f"cdc_delta_changes[readChangeFeed]: the window "
                        f"({from_v}, {to_v}] needs log history that was "
                        "checkpoint-cleaned (this stream's offset "
                        "predates the table's retention). Restart the "
                        "stream with a fresh checkpoint — the default "
                        "startingVersion=-1 bootstraps from the current "
                        "snapshot — or raise the log retention so "
                        "consumers this far behind stay servable"
                    ) from e
        parts = []
        for v, kind, files in plans:
            if files:
                self._last_data_version = max(self._last_data_version, v)

            def make(entries, v=v, kind=kind):
                parts.append(
                    _ChangePartition(
                        [],
                        entries,
                        v,
                        phys=self._phys,
                        ids=self._ids,
                        cdc_change=kind,
                        commit_ts=ts.get(v),
                    )
                )

            chunk: list = []
            size = 0
            for rel, a in files:
                fsz = int(a.get("size") or 0)
                e = self._entry(os.path.join(self.path, rel), a)
                if fsz > self.max_bytes:
                    # ONE oversized file: split WITHIN it by row
                    # groups (no join in cdc mode, so any partition
                    # of the rows is sound) — otherwise a multi-GiB
                    # synthesized-insert/delete file would
                    # materialize whole in one task, escaping the
                    # per-partition memory bound the pk-diff mode
                    # enforces. The footer read is driver-side
                    # metadata, paid only for files over the bound.
                    if chunk:
                        make(chunk)
                        chunk, size = [], 0
                    for rgs in self._row_group_chunks(e[0]):
                        make([e + (rgs,)])
                    continue
                if chunk and size + fsz > self.max_bytes:
                    make(chunk)
                    chunk, size = [], 0
                chunk.append(e)
                size += fsz
            if chunk:
                make(chunk)
        return parts or [_ChangePartition([], [], to_v)]

    def _commit_ts_map(self) -> dict:
        """The table's monotonized commit-timestamp map, extended
        INCREMENTALLY per trigger: parsing every surviving commit per
        micro-batch would cost O(log size) per trigger on a long-lived
        stream (and that many remote GETs behind a routed store) —
        monotonization is prefix-stable, so only the NEW commits are
        parsed, continuing from the cached floor. A full recompute
        happens only when log cleanup moved the earliest surviving
        commit (the cached prefix's leading-unknown baseline would be
        stale). Callers hold the routed-store context."""
        import os as _os

        from cdc_apache_cassandra_spark.streaming.delta_log import (
            LOG_DIR,
            _log_listdir,
            commit_timestamps,
        )

        names = _log_listdir(_os.path.join(self.path, LOG_DIR))
        vs = sorted(
            int(n[: -len(".json")])
            for n in names
            if n.endswith(".json") and n[: -len(".json")].isdigit()
        )
        cache = self._ts_cache
        if vs and cache is not None and cache["earliest"] == vs[0]:
            if vs[-1] > cache["last"]:
                ext = commit_timestamps(
                    self.path, resume=(cache["last"], cache["floor"])
                )
                if ext:
                    cache["map"].update(ext)
                    cache["last"], cache["floor"] = ext[-1]
            return cache["map"]
        stamped = commit_timestamps(self.path)  # raises when no log
        self._ts_cache = {
            "earliest": vs[0] if vs else stamped[0][0],
            "last": stamped[-1][0],
            "floor": stamped[-1][1],
            "map": dict(stamped),
        }
        return self._ts_cache["map"]

    def _row_group_chunks(self, path: str) -> list[list[int]]:
        """Row-group index chunks of one oversized file, each at most
        ~``maxBytesPerPartition`` by footer ``total_byte_size``
        (uncompressed, so chunks come out conservatively small).
        Always at least one chunk; a single row group above the bound
        still gets its own chunk — a row group is the smallest
        readable unit."""
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _io_parquet_file,
        )

        md = _io_parquet_file(path).metadata
        chunks: list[list[int]] = []
        cur: list[int] = []
        cur_b = 0
        for g in range(md.num_row_groups):
            b = md.row_group(g).total_byte_size
            if cur and cur_b + b > self.max_bytes:
                chunks.append(cur)
                cur, cur_b = [], 0
            cur.append(g)
            cur_b += b
        if cur:
            chunks.append(cur)
        return chunks

    def partitions(self, start: dict, end: dict):
        from_v, to_v = start["version"], end["version"]
        self._pos = max(self._pos, from_v, to_v)
        self._primed = True
        self._unprimed_offers = 0
        if to_v <= from_v:
            return [_ChangePartition([], [], to_v)]  # empty batch placeholder
        st_to = self._state_at(to_v)
        self._check_schema(st_to.meta if st_to else None, to_v)
        if self.use_cdc:
            self._setup_mapping(st_to.meta if st_to else None)
            return self._cdc_partitions(from_v, to_v, st_to)
        st_from = self._state_at(from_v)
        meta = (st_to.meta if st_to else None) or (
            st_from.meta if st_from else None
        )
        self._setup_mapping(meta)
        f_from = st_from.files if st_from else {}
        f_to = st_to.files if st_to else {}
        # the file-diff identity is (path, dv_unique_id) — a delta-spark
        # DELETE re-adds the SAME parquet path pointed at a (new)
        # deletion vector, so a path-only diff would classify the commit
        # as data-free and silently drop the deletes (batch parity:
        # delta_log.delta_changes keys its diff identically). DV work is
        # conditional PER ADD — an add without the field keys as
        # (path, None) at one dict.get, so the common no-DV table pays
        # nothing (VERDICT r9 item 1). Deliberately NOT gated on the
        # protocol's deletionVectors flag: a spec-sloppy foreign writer
        # that attaches a DV without declaring the feature must still
        # have its deletes seen, not silently dropped
        # (test_dv_plus_mapping_compose pins the composition).
        from cdc_apache_cassandra_spark.streaming.deletion_vectors import (
            dv_unique_id,
        )

        def keyed(files: dict) -> dict:
            return {
                (
                    p,
                    dv_unique_id(dv) if (dv := a.get("deletionVector")) else None,
                ): p
                for p, a in files.items()
            }

        k_from, k_to = keyed(f_from), keyed(f_to)
        removed = sorted(set(k_from) - set(k_to), key=lambda k: k[0])
        added = sorted(set(k_to) - set(k_from), key=lambda k: k[0])
        if removed or added:
            self._last_data_version = max(self._last_data_version, to_v)
        import os

        def bucket_of(p: str, files: dict) -> str | None:
            tags = files[p].get("tags") or {}
            return tags.get("bucket")

        # group -> [pre (path, add) entries, post entries, total bytes]
        groups: dict[str | None, list] = {}
        for p, _dv in removed:
            g = groups.setdefault(bucket_of(p, f_from), [[], [], 0])
            g[0].append((os.path.join(self.path, p), f_from[p]))
            g[2] += int(f_from[p].get("size") or 0)
        for p, _dv in added:
            g = groups.setdefault(bucket_of(p, f_to), [[], [], 0])
            g[1].append((os.path.join(self.path, p), f_to[p]))
            g[2] += int(f_to[p].get("size") or 0)
        if None in groups and len(groups) > 1:
            # untagged (foreign) files can pair with ANY bucket's keys —
            # classification is only key-local if all files land together
            pre = [e for g in groups.values() for e in g[0]]
            post = [e for g in groups.values() for e in g[1]]
            size = sum(g[2] for g in groups.values())
            groups = {None: [pre, post, size]}
        parts = []
        for _, (pre_e, post_e, size) in sorted(
            groups.items(), key=lambda kv: (kv[0] is None, kv[0])
        ):
            n = min(64, max(1, -(-size // self.max_bytes))) if size else 1
            # partition entries carry the DV descriptor (read() filters
            # the masked rows out of whichever side the file is on) and,
            # for partitioned tables, the add's partition values
            pre = [self._entry(p, a) for p, a in pre_e]
            post = [self._entry(p, a) for p, a in post_e]
            if n <= 1:
                parts.append(
                    _ChangePartition(
                        pre, post, to_v, phys=self._phys, ids=self._ids
                    )
                )
                continue
            # oversized group (pathological bucket / untagged fallback).
            # Preferred split: key RANGES from the adds' file-level
            # min/max stats — each sub-partition reads ONLY the files
            # (and, in read(), only the row groups) overlapping its
            # range, so per-split IO tracks the range's bytes instead
            # of N× full-group re-reads (VERDICT r7 item 8). Sound for
            # the same reason the hash split is: both sides slice by
            # the SAME key predicate, so a key's pre and post rows land
            # together and the union is byte-identical.
            split = self._range_splits(pre_e + post_e, n)
            if split is not None:
                ranges, kind = split
                # parse each add's stats ONCE (not once per range):
                # driver-CPU on the hot planning path
                pre_s = [(p, a, self._file_stats(a)) for p, a in pre_e]
                post_s = [(p, a, self._file_stats(a)) for p, a in post_e]
                for lo, hi in ranges:
                    r_pre = [
                        self._entry(p, a)
                        for p, a, st in pre_s
                        if _overlaps(st, lo, hi)
                    ]
                    r_post = [
                        self._entry(p, a)
                        for p, a, st in post_s
                        if _overlaps(st, lo, hi)
                    ]
                    if r_pre or r_post:
                        parts.append(
                            _ChangePartition(
                                r_pre, r_post, to_v,
                                key_range=(lo, hi), key_kind=kind,
                                phys=self._phys,
                                ids=self._ids,
                            )
                        )
                continue
            # fallback (stats missing/non-numeric): key-hash split — the
            # slice happens after decode, so N× splits cost N× IO; 64
            # bounds that at two orders of magnitude parallelism.
            for i in range(n):
                parts.append(
                    _ChangePartition(
                        pre, post, to_v, i, n,
                        phys=self._phys, ids=self._ids,
                    )
                )
        return parts or [_ChangePartition([], [], to_v)]

    def _schema_kind(self) -> str | None:
        """The range-split key kind the LEADING pk column's declared
        type admits — 'num' | 'ts' | 'date' | None (not splittable:
        strings can hold anything, decimals/binary/complex have no
        normalized key space here). Stats whose parsed kind disagrees
        with the schema are refused in _range_splits."""
        schema = getattr(self, "schema", None)
        if schema is None:
            return None
        dt = schema[self.pk_cols[0]].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return "ts"
        if isinstance(dt, T.DateType):
            return "date"
        if isinstance(
            dt,
            (
                T.ByteType,
                T.ShortType,
                T.IntegerType,
                T.LongType,
                T.FloatType,
                T.DoubleType,
            ),
        ):
            return "num"
        return None

    def _file_stats(self, add: dict):
        """(min, max, may_have_nulls, kind) of the LEADING pk column
        from the add action's stats in ``_stat_key``'s normalized key
        space, or None when unusable. Free-form strings are refused
        (engines may truncate string min/max, and a truncated max
        under-reports the file's range — pruning on it would LOSE
        rows); fixed-width ISO-8601 timestamps/dates are accepted with
        the max padded up by its precision gap (VERDICT r8 item 4).
        Numeric stats are exact. Under column mapping, stats key on
        PHYSICAL names — translate."""
        phys = getattr(self, "_phys", None) or {}
        col = phys.get(self.pk_cols[0], self.pk_cols[0])
        raw = add.get("stats")
        if not raw:
            return None
        try:
            s = json.loads(raw) if isinstance(raw, str) else raw
        except (TypeError, ValueError):
            return None
        lo = _stat_key((s.get("minValues") or {}).get(col))
        hi = _stat_key((s.get("maxValues") or {}).get(col), ceil=True)
        if lo is None or hi is None or lo[1] != hi[1]:
            return None
        nc = (s.get("nullCount") or {}).get(col)
        return lo[0], hi[0], (nc is None or bool(nc)), lo[1]

    # max files whose parquet FOOTERS the planner may read to refine cut
    # points (metadata-sized IO, driver/planner-side): file-level
    # add.stats are free but give at most one cut candidate per file, so
    # a group of few huge files (the verdict-r7-item-8 shape: one
    # many-row-group file) needs row-group mins to split at all. Many-
    # file groups never need footers — their file mins already cut.
    _FOOTER_BUDGET = 16

    def _range_splits(self, entries, n: int):
        """Up to ``n`` key ranges [(lo, hi)) with None-unbounded ends,
        cut at byte quantiles over (min, bytes) units — files from the
        adds' stats, refined to ROW GROUPS from parquet footers when
        the file mins alone cannot yield enough distinct cuts. Returns
        ``(ranges, kind)`` with kind ∈ {'num','ts','date'} (the key
        space the bounds live in — read() casts the pk column to match),
        or None when ANY file of the group lacks usable stats or the
        group mixes kinds (a single opaque file could hold any key, so
        every range would have to read it and the split degenerates to
        the hash path)."""
        units: list[tuple] = []  # (min_value, bytes)
        files: list[tuple] = []  # (path, size) for footer refinement
        # the kind must MATCH the pk column's declared type — stats text
        # alone is ambiguous: a STRING column holding ISO-timestamp text
        # would otherwise parse as kind='ts' and the reader's key cast
        # (built from the real column type) would slice in a different
        # key space than the planner pruned in (row loss / type errors).
        allowed = self._schema_kind()
        if allowed is None:
            return None  # pk type is not range-splittable -> hash path
        kind = None
        for path, add in entries:
            st = self._file_stats(add)
            if st is None or st[3] != allowed:
                return None
            kind = st[3]
            units.append((st[0], int(add.get("size") or 0)))
            files.append((path, int(add.get("size") or 0)))
        if len({mn for mn, _ in units}) < n and len(files) <= self._FOOTER_BUDGET:
            refined: list[tuple] = []
            for (path, size), file_unit in zip(files, units):
                rg = self._row_group_units(path, size, kind)
                # a file whose footer can't refine keeps its file-level
                # unit — its bytes must still weight the quantiles
                refined.extend(rg if rg else [file_unit])
            units = refined
        units.sort()
        total = sum(sz for _, sz in units) or 1
        target = total / n
        cuts: list = []
        acc = 0
        for mn, sz in units:
            # a cut must be strictly inside the key space: above the
            # previous cut AND above the global min (a cut at the global
            # min yields an empty first range and one range carrying the
            # whole group — worse than the hash fallback)
            if (
                len(cuts) < n - 1
                and acc >= target * (len(cuts) + 1)
                and mn > (cuts[-1] if cuts else units[0][0])
            ):
                cuts.append(mn)
            acc += sz
        if not cuts:
            return None  # degenerate stats (e.g. all units share one min)
        bounds = [None, *cuts, None]
        return list(zip(bounds, bounds[1:])), kind

    def _row_group_units(
        self, path: str, file_size: int, kind: str = "num"
    ) -> list[tuple]:
        """(min, bytes) per row group of ``path`` from its footer; []
        when the footer or its stats are unusable (the caller then keeps
        file-level units). Metadata-sized read — the footer, not data —
        through the delta_log URI seam, so URI table roots resolve the
        same way every other footer read does."""
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _io_parquet_file,
        )

        phys = getattr(self, "_phys", None) or {}
        col = phys.get(self.pk_cols[0], self.pk_cols[0])
        try:
            md = _io_parquet_file(path).metadata
        except Exception:
            return []
        idx = next(
            (
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == col
            ),
            None,
        )
        if idx is None:
            return []
        out = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                return []
            mn = _footer_key(st.min, kind)
            if mn is None:
                return []
            # total_byte_size ~ uncompressed; proportionality is all the
            # quantile cut needs, and it never divides by file count
            out.append((mn, md.row_group(g).total_byte_size or file_size))
        return out

    def _stats_overlap(self, add: dict, lo, hi) -> bool:
        return _overlaps(self._file_stats(add), lo, hi)

    # -- execution ---------------------------------------------------------
    def read(self, partition: _ChangePartition):
        if partition.cdc_change is not None:
            return self._read_cdc(partition)
        return self._read_diff(partition)

    def _file_names(self, partition: _ChangePartition, pf) -> dict:
        """logical top-level name -> THIS file's column name. Name
        mode: the metaData's physicalName map (identical across
        files). ID mode: resolved per file from the parquet schema's
        PARQUET:field_id metadata — the spec's resolution rule (file
        column names are arbitrary under id mapping); physicalName
        is the fallback for a file written before ids were stamped."""
        if partition.ids:
            by_id = {}
            for fld in pf.schema_arrow:
                fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_id[int(fid)] = fld.name
            base = partition.phys or {}
            return {
                ln: by_id.get(node["id"], base.get(ln, ln))
                for ln, node in partition.ids.items()
            }
        return partition.phys or {}

    def _row_groups_in_range(
        self, partition: _ChangePartition, pf
    ) -> list[int] | None:
        """Row-group indexes whose footer stats can intersect this
        partition's key range; None = read everything (no range, or
        the column's stats are unusable). Exactness mirrors
        _file_stats: numeric parquet stats are exact, so a pruned
        row group provably holds no key in [lo, hi)."""
        if partition.key_range is None:
            return None
        lo, hi = partition.key_range
        md = pf.metadata
        # footers carry PHYSICAL names under column mapping; resolve
        # by full dotted path (a nested leaf sharing the bare name
        # must not be mistaken for the top-level key column)
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            footer_leaf_index,
        )

        col0 = self.pk_cols[0]
        pcol0 = self._file_names(partition, pf).get(col0, col0)
        idx = footer_leaf_index(md, pcol0)
        if idx is None:
            return None
        keep = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                keep.append(g)
                continue
            nulls = 1 if st.null_count is None else st.null_count
            if lo is None and nulls:
                keep.append(g)
                continue
            mn = _footer_key(st.min, partition.key_kind)
            mx = _footer_key(st.max, partition.key_kind)
            if mn is None or mx is None:
                keep.append(g)  # unusable stats: never prune on them
                continue
            if (hi is None or mn < hi) and (lo is None or mx >= lo):
                keep.append(g)
        return keep

    def _load_file(
        self, partition: _ChangePartition, entry, table_fields, table_schema
    ):
        """ONE add's rows as an Arrow table in the LOGICAL schema: row
        groups pruned to the partition's key range (when set), rows
        masked by the file's deletion vector filtered by FILE ordinal
        (offset-aware under row-group pruning), column-mapping physical
        names grafted back (zero-copy), foreign partition-column values
        attached from the add action, pre-DDL columns as typed nulls.
        Every data byte goes through the _io_* pyarrow seam (one cached
        filesystem client per authority — never a JVM parquet scan, and
        never pq.read_table's own per-path URI resolution). Shared by
        the pk-diff classifier and the readChangeFeed CDF path."""
        import pyarrow as pa

        from cdc_apache_cassandra_spark.streaming.delta_log import (
            _io_parquet_file,
        )

        # entries are (path, dv, pv) from _entry; the cdc mode's
        # oversized-file split appends a 4th element — the row-group
        # indexes this partition owns
        p, dv, pv, *rest = entry
        rgs = rest[0] if rest else None
        pf = _io_parquet_file(p)
        keep = (
            None
            if partition.key_range is None
            else self._row_groups_in_range(partition, pf)
        )
        if rgs is not None:
            # the split's row groups; intersect with any key-range
            # pruning (cdc mode never sets key_range today, but the
            # composition must stay sound if it ever does). keep now
            # reflects exactly the groups read, so the DV ordinal
            # offsets below stay correct.
            keep = rgs if keep is None else [g for g in keep if g in set(rgs)]
        if keep is None:
            t = pf.read()
        elif keep:
            t = pf.read_row_groups(keep)
        else:
            t = pf.schema_arrow.empty_table()
        partition.rows_loaded += t.num_rows
        if dv is not None and t.num_rows:
            # rows masked by the file's deletion vector are not
            # part of this side's logical state — filter by FILE
            # ordinal (offset by the skipped row groups' counts
            # when footer pruning kept a subset)
            import numpy as np

            from cdc_apache_cassandra_spark.streaming.delta_log import (
                _io_read_bytes,
            )
            from cdc_apache_cassandra_spark.streaming.deletion_vectors import (
                load_dv_indexes,
            )

            idx = load_dv_indexes(self.path, dv, _io_read_bytes)
            md = pf.metadata
            counts = [
                md.row_group(g).num_rows
                for g in range(md.num_row_groups)
            ]
            offsets = np.concatenate(([0], np.cumsum(counts)))
            groups = (
                range(md.num_row_groups) if keep is None else keep
            )
            positions = np.concatenate(
                [np.arange(offsets[g], offsets[g + 1]) for g in groups]
            )
            t = t.filter(pa.array(~np.isin(positions, idx)))
        present = set(t.column_names)
        arrays = []
        nm = self._file_names(partition, pf)
        for f in table_fields:
            pn = nm.get(f.name, f.name)
            if pn not in present:
                if pv and f.name in pv:
                    # PARTITION column: the value lives in the
                    # add action, not the parquet — a constant
                    # per file (string-serialized per spec;
                    # Arrow cast parses ISO dates/timestamps,
                    # numerics, booleans)
                    sval = pv[f.name]
                    arrays.append(
                        pa.nulls(t.num_rows, type=f.type)
                        if sval is None
                        else pa.array(
                            [sval] * t.num_rows, type=pa.string()
                        ).cast(f.type)
                    )
                    continue
                # pre-DDL files: typed nulls
                arrays.append(pa.nulls(t.num_rows, type=f.type))
                continue
            col = t.column(pn).combine_chunks()
            if partition.ids:
                # ID mode: realign nested structs by parquet
                # field id (the JVM path's rule) — positional
                # grafting would silently swap reordered fields
                node = partition.ids.get(f.name) or {}
                col = _align_by_id(col, f.type, node.get("children"))
                arrays.append(col)
                continue
            # name-mapped files: graft the LOGICAL names onto
            # the physical type (zero-copy, names only); type
            # promotions stay with the cast below
            nt = _renamed_type(col.type, f.type)
            arrays.append(col.view(nt) if nt != col.type else col)
        t = pa.table({f.name: a for f, a in zip(table_fields, arrays)})
        return t.cast(table_schema)

    def _read_cdc(self, partition: _ChangePartition):
        """readChangeFeed execution: every entry reads INDEPENDENTLY —
        the change rows ARE the files' rows (no pk join, no
        classification) — stamped with the partition's change type
        (the stored ``_change_type`` column for 'cdc' change-data
        files; the constant for synthesized insert/delete commits),
        ``_commit_version`` and ``_commit_timestamp``. Constants
        materialize via pa.repeat + C casts, never a Python loop."""
        if not partition.post:
            return
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(self.schema)
        meta_cols = ("_change_type", "_commit_version", "_commit_timestamp")
        table_fields = [f for f in out_schema if f.name not in meta_cols]
        load_fields = list(table_fields)
        if partition.cdc_change == "cdc" and "_change_type" not in {
            f.name for f in load_fields
        }:
            # change-data files store the literal `_change_type` string
            # column even under column mapping (spec rule; batch
            # parity: delta_log._CDF_PASSTHROUGH) — read it through
            # the same graft path, nulls if a spec-sloppy file lacks it
            # (matching the JVM scan's missing-column behavior)
            load_fields.append(pa.field("_change_type", pa.string()))
        load_schema = pa.schema(load_fields)
        ts_type = out_schema.field("_commit_timestamp").type
        for entry in partition.post:
            t = self._load_file(partition, entry, load_fields, load_schema)
            n = t.num_rows
            if not n:
                continue
            if "_change_type" not in t.column_names:
                t = t.append_column(
                    "_change_type",
                    pa.repeat(
                        pa.scalar(partition.cdc_change, pa.string()), n
                    ),
                )
            t = t.append_column(
                "_commit_version",
                pa.repeat(pa.scalar(partition.to_version, pa.int64()), n),
            )
            t = t.append_column(
                "_commit_timestamp",
                pa.repeat(pa.scalar(partition.commit_ts, pa.int64()), n)
                .cast(pa.timestamp("ms"))
                .cast(ts_type),
            )
            yield from (
                t.select(out_schema.names).cast(out_schema).to_batches()
            )

    def _read_diff(self, partition: _ChangePartition):
        if not partition.pre and not partition.post:
            return
        import pandas as pd
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(self.schema)
        table_fields = [
            f for f in out_schema
            if f.name not in ("_change_type", "_commit_version")
        ]
        table_schema = pa.schema(table_fields)
        cols = [f.name for f in table_fields]

        col0 = self.pk_cols[0]

        def key_numeric(series: pd.Series) -> pd.Series:
            """The pk column in the partition's normalized key space
            ('ts' → epoch micros, 'date' → epoch days) — a single Arrow
            cast, nulls preserved as NaN. Timestamps store epoch micros
            regardless of tz, matching _stat_key's UTC normalization."""
            if partition.key_kind == "num":
                return series
            arr = pa.chunked_array([pa.Array.from_pandas(series)])
            if pa.types.is_timestamp(arr.type):
                if arr.type.unit != "us":
                    arr = arr.cast(pa.timestamp("us", tz=arr.type.tz))
                arr = arr.cast(pa.int64())
            elif pa.types.is_date(arr.type):
                arr = arr.cast(pa.date32()).cast(pa.int32())
            # ArrowDtype keeps int64 exact (a float64 round-trip would
            # blur micros past 2^53) and nulls as pd.NA — the existing
            # masks fillna(False), so NA rows fall to the null branch
            out = arr.to_pandas(types_mapper=pd.ArrowDtype)
            out.index = series.index
            return out

        def key_slice(frame: pd.DataFrame) -> pd.DataFrame:
            """Keep only this sub-partition's key slice — range mode
            (lo <= pk[0] < hi; null keys in the first range) or hash
            mode. Both sides slice with the same predicate, so a key's
            pre and post rows always land in the same sub-partition."""
            if not len(frame):
                return frame
            if partition.key_range is not None:
                lo, hi = partition.key_range
                if lo is None and hi is None:
                    return frame
                v = key_numeric(frame[col0])
                if lo is None:
                    m = v.isna() | (v < hi).fillna(False)
                elif hi is None:
                    m = (v >= lo).fillna(False)
                else:
                    m = ((v >= lo) & (v < hi)).fillna(False)
                return frame[m]
            if partition.split_count <= 1:
                return frame
            h = pd.util.hash_pandas_object(
                frame[self.pk_cols].astype(object), index=False
            ).to_numpy()
            return frame[(h % partition.split_count) == partition.split_idx]

        def load(paths) -> pd.DataFrame:
            # per-file decode/graft/DV-filter lives in _load_file (the
            # _io_* pyarrow seam); slice PER FILE: a split partition
            # holds at most one file plus its own key slice in memory,
            # never the group
            frames = [
                key_slice(
                    self._load_file(partition, e, table_fields, table_schema)
                    .to_pandas(types_mapper=pd.ArrowDtype)
                )
                for e in paths
            ]
            if not frames:
                return pa.Table.from_pylist([], schema=table_schema).to_pandas(
                    types_mapper=pd.ArrowDtype
                )
            return pd.concat(frames, ignore_index=True)

        pre = load(partition.pre)
        post = load(partition.post)
        value_cols = [c for c in cols if c not in self.pk_cols]
        m = pre.merge(
            post,
            on=self.pk_cols,
            how="outer",
            suffixes=("__pre", "__post"),
            indicator=True,
        )
        if value_cols:
            same = None
            for c in value_cols:
                a, b = m[f"{c}__pre"], m[f"{c}__post"]
                try:
                    eq = a == b
                except Exception:
                    # nested types (struct/list/map): Arrow has no
                    # 'equal' kernel — convert through to_pylist so
                    # elements are plain dict/list/tuple (deep __eq__;
                    # astype(object) would yield np.ndarray elements for
                    # list columns, whose == raises). NaN nested inside
                    # a list/struct never equals itself under Python ==
                    # (an unchanged row would emit a spurious update
                    # pair), so canonicalize every nested NaN to one
                    # identity-equal sentinel first — matching the
                    # top-level columns, where the isna() term cancels
                    # unchanged NaNs. Bounded by the partition's rows.
                    def canon(v):
                        if isinstance(v, float) and v != v:
                            return _NAN_SENTINEL
                        if isinstance(v, list):
                            return [canon(x) for x in v]
                        if isinstance(v, tuple):
                            return tuple(canon(x) for x in v)
                        if isinstance(v, dict):
                            return {k: canon(x) for k, x in v.items()}
                        return v

                    def plain(s):
                        arr = pa.chunked_array([pa.Array.from_pandas(s)])
                        return pd.Series(
                            [canon(v) for v in arr.to_pylist()],
                            index=s.index,
                            dtype=object,
                        )

                    eq = plain(a) == plain(b)
                eq = eq.fillna(False) | (a.isna() & b.isna())
                if a.dtype.kind == "f":
                    # Spark eqNullSafe (the batch CDF path,
                    # delta_log.delta_changes) treats NaN as equal to
                    # NaN — match it, or an unchanged NaN row would
                    # emit a spurious update pair on the stream only
                    eq |= (a != a).fillna(False) & (b != b).fillna(False)
                same = eq if same is None else (same & eq)
        else:
            same = pd.Series(True, index=m.index)

        def emit(mask, side: str, change: str) -> pd.DataFrame:
            sel = m[mask]
            out = pd.DataFrame(index=sel.index)
            for c in cols:
                out[c] = sel[c] if c in self.pk_cols else sel[f"{c}__{side}"]
            out["_change_type"] = change
            return out

        parts = [
            emit(m["_merge"] == "right_only", "post", "insert"),
            emit(m["_merge"] == "left_only", "pre", "delete"),
            emit((m["_merge"] == "both") & ~same, "pre", "update_preimage"),
            emit((m["_merge"] == "both") & ~same, "post", "update_postimage"),
        ]
        out = pd.concat(parts, ignore_index=True)
        out["_commit_version"] = partition.to_version
        result = pa.Table.from_pandas(out, preserve_index=False).select(
            out_schema.names
        ).cast(out_schema)
        yield from result.to_batches()

    # -- lifecycle -----------------------------------------------------------
    def commit(self, end: dict) -> None:
        """Record the durable consumer cursor for data-carrying progress
        (cleanup retention respects it). Skipped for data-free ranges —
        a cursor commit is itself a log version, and recording it again
        would self-feed forever.

        Timing contract (same as Kafka-source offset commits): Spark
        delivers commit(N) while PLANNING batch N+1, so the cursor lags
        the last batch until the next planning cycle — and because a
        cursor commit advances the log, recording batch N itself
        triggers the (data-free) cycle that acknowledges batch N+1.
        Exactly-once resume never depends on this; the stream's own
        checkpoint does that. The cursor is the RETENTION guard."""
        if self.consumer_id is None or not self._cursor_writable:
            return
        v = end["version"]
        if v < 0 or v > self._last_data_version:
            return
        from cdc_apache_cassandra_spark.streaming.delta_log import (
            consumer_offset,
            record_consumer_offset,
        )
        from cdc_apache_cassandra_spark.streaming.materialize import (
            CommitConflict,
        )

        try:
            with _routed_log_store(self.log_store_url, self.log_store_mirror):
                if consumer_offset(self.path, self.consumer_id) < v:
                    record_consumer_offset(self.path, self.consumer_id, v)
        except CommitConflict:
            # lost every version race to a busy exporter — benign and
            # expected under concurrency; the next data-carrying commit
            # retries. No signal needed.
            pass
        except OSError as exc:
            # the routed HTTP store was transiently unreachable
            # (URLError/HTTPError are OSError subclasses) — the cursor
            # is retention bookkeeping, never the resume mechanism
            # (Spark's checkpoint is), so a missed recording must not
            # fail the stream. But a PERSISTENTLY unreachable store
            # leaves the cursor stale forever, silently blocking
            # delta_log_cleanup(respect_consumers=True) — so surface a
            # warning each time (ADVICE r8). Data reads are unaffected:
            # in mirror mode they are local, and in no-mirror mode an
            # unreachable store fails the NEXT offset/plan call loudly
            # where it belongs.
            import warnings

            warnings.warn(
                f"consumer-cursor recording skipped for "
                f"{self.consumer_id!r} at version {v} "
                f"({type(exc).__name__}: {exc}); retention cleanup "
                f"gated on this consumer will not advance until a "
                f"later commit succeeds",
                RuntimeWarning,
                stacklevel=2,
            )

    def stop(self) -> None:
        pass


class ChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_delta_changes"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("cdc_delta_changes requires option 'path'")
        fields = list(
            _table_schema(
                path,
                self.options.get("logstoreurl"),
                str(self.options.get("logstoremirror", "false")).lower()
                == "true",
            ).fields
        ) + CDF_FIELDS
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            # delta-spark's CDF stream column set additionally carries
            # the commit timestamp (the monotonized resolution — same
            # values the batch delta_changes_cdf stamps)
            fields = fields + [
                T.StructField("_commit_timestamp", T.TimestampType(), True)
            ]
        return T.StructType(fields)

    def streamReader(self, schema) -> ChangeFeedStreamReader:
        return ChangeFeedStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(ChangeFeedDataSource)
