"""Property-based invariants (hypothesis) — the convergence guarantees the
reference establishes with container chaos tests
(PulsarDualNodeTests.testUnorderedMutations): the converged state must be
invariant under event reordering, replica duplication, replay, and any
micro-batch partitioning of the stream.

Small example counts: each example round-trips through Spark.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from cdc_apache_cassandra_spark.operators.dedup import dedup_mutations
from cdc_apache_cassandra_spark.operators.lww import last_write_wins
from cdc_apache_cassandra_spark.streaming.materialize import merge_batch_lww

SCHEMA = (
    "op string, pk long, writetime long, v string, digest string, "
    "segment long, position long, node_id long"
)

#: (op, pk, writetime, segment, position) — digest derived, like the md5
#: over the mutation identity.
#: physical identity of a mutation: (pk, writetime, segment, position).
#: UNIQUE like the commitlog guarantees — (segment, position) is a byte
#: address, so two distinct mutations can never share the full tuple.
#: Without this invariant the canonical (writetime, segment, position)
#: ordering is not total and LWW/SCD2 tie-break nondeterministically
#: (hypothesis found exactly that with an op-only-differing pair).
_mutation_key = st.tuples(
    st.integers(0, 3),
    st.integers(0, 8),
    st.integers(0, 2),
    st.integers(0, 4),
)


@st.composite
def _streams(draw):
    keys = draw(
        st.lists(_mutation_key, min_size=1, max_size=12, unique=True)
    )
    ops = draw(
        st.lists(
            st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
            min_size=len(keys),
            max_size=len(keys),
        )
    )
    return [(op, pk, wt, seg, pos) for op, (pk, wt, seg, pos) in zip(ops, keys)]


streams = _streams()


def rows(muts, node_id=0):
    return [
        (
            op,
            pk,
            wt,
            f"v{pk}_{wt}_{seg}_{pos}",
            f"d|{pk}|{op}|{wt}|{seg}|{pos}",
            seg,
            pos,
            node_id,
        )
        for op, pk, wt, seg, pos in muts
    ]


def state_of(spark, data):
    df = spark.createDataFrame(data, SCHEMA)
    return {
        (r.pk): (r.op, r.writetime, r.segment, r.position, r.v)
        for r in last_write_wins(dedup_mutations(df)).collect()
    }


_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(muts=streams, seed=st.randoms())
@_SETTINGS
def test_lww_invariant_under_reorder_and_replication(spark, muts, seed):
    """Replicas (RF=2), replays, and arbitrary arrival order must not
    change the converged per-key state."""
    base = rows(muts, node_id=0)
    doubled = base + rows(muts, node_id=1) + base[: len(base) // 2]
    seed.shuffle(doubled)
    assert state_of(spark, base) == state_of(spark, doubled)


@given(muts=streams)
@_SETTINGS
def test_dedup_idempotent_and_unique(spark, muts):
    df = spark.createDataFrame(rows(muts, 0) + rows(muts, 1), SCHEMA)
    once = dedup_mutations(df)
    assert once.count() == len(muts)
    assert dedup_mutations(once.withColumn("node_id", once.pk * 0)).count() == len(muts)


@given(muts=streams, cut=st.integers(0, 12), seed=st.randoms())
@_SETTINGS
def test_materializer_invariant_under_batching(spark, muts, cut, seed):
    """Applying the stream in ANY two-batch split (any order within
    batches) converges to the same retained state as one batch."""
    data = rows(muts)
    seed.shuffle(data)
    k = min(cut, len(data))
    whole = spark.createDataFrame(data, SCHEMA)
    want = {
        (r.pk): (r.op, r.writetime) for r in merge_batch_lww(None, whole, ["pk"]).collect()
    }
    b1 = spark.createDataFrame(data[:k], SCHEMA) if k else None
    b2 = spark.createDataFrame(data[k:], SCHEMA) if k < len(data) else None
    state = None
    for b in (b1, b2):
        if b is not None:
            state = merge_batch_lww(state, b, ["pk"])
    got = {(r.pk): (r.op, r.writetime) for r in state.collect()}
    assert got == want


# --- chunker: UDTF twin agrees with the JVM plan on arbitrary text ----------

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\t"),  # words + spaces/tabs
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts)
def test_chunkers_agree_on_arbitrary_text(spark, docs):
    """Sequence+slice JVM chunking ≡ the Python UDTF chunker for ANY
    whitespace shape (empty docs, runs of separators, tab/space mix) —
    the two extension paths may never drift."""
    from collections import Counter

    from pyspark.sql import functions as F

    from cdc_apache_cassandra_spark.functions.udtf_surface import ChunkDocs
    from cdc_apache_cassandra_spark.operators.text_dedup import tokens_expr

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("prop_docs")
    spark.udtf.register("chunk_docs", ChunkDocs)
    got = Counter(
        map(
            tuple,
            spark.sql(
                "SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text "
                "FROM prop_docs d, LATERAL chunk_docs(d.text, 16, 8) c "
                "WHERE length(trim(d.text)) > 0"
            ).collect(),
        )
    )

    toks = (
        df.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", tokens_expr(F.col("text")).alias("tokens"))
    )
    n_extra = (
        F.greatest(
            F.floor((F.size("tokens") - F.lit(17)) / F.lit(8.0)).cast("bigint"),
            F.lit(-1).cast("bigint"),
        )
        + 1
    )
    spans = toks.select(
        "doc_id", "tokens",
        F.sequence(F.lit(0).cast("bigint"), n_extra).alias("ids"),
    )
    chunk = F.slice(
        F.col("tokens"), (F.col("chunk_id") * 8 + 1).cast("int"), 16
    )
    want = Counter(
        map(
            tuple,
            spans.select("doc_id", F.explode("ids").alias("chunk_id"), "tokens")
            .select(
                "doc_id",
                "chunk_id",
                F.size(chunk).alias("n_chunk_tokens"),
                F.concat_ws(" ", chunk).alias("chunk_text"),
            )
            .collect(),
        )
    )
    assert got == want


# --- SCD2 operator: temporal view consistent with LWW on any stream ---------


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(streams)
def test_scd2_consistent_with_lww_on_any_stream(spark, muts):
    """For ANY mutation stream: the SCD2 open versions equal the LWW
    winners, and each key's intervals are contiguous with exactly one
    open version."""
    from cdc_apache_cassandra_spark.operators.lww import scd2_intervals

    df = spark.createDataFrame(rows(muts), SCHEMA)
    deduped = dedup_mutations(df)
    scd2 = scd2_intervals(deduped).collect()
    lww = {
        (r.pk): (r.op, r.writetime, r.segment, r.position)
        for r in last_write_wins(dedup_mutations(df)).collect()
    }
    by_pk: dict[int, list] = {}
    for r in scd2:
        by_pk.setdefault(r.pk, []).append(r)
    assert set(by_pk) == set(lww)
    for pk, rs in by_pk.items():
        opens = [r for r in rs if r.is_current]
        assert len(opens) == 1
        o = opens[0]
        assert (o.op, o.writetime, o.segment, o.position) == lww[pk]
        rs.sort(key=lambda r: (r.valid_from, r.segment, r.position))
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from


# --- gaps & islands: Spark streaks == pure-Python reference ----------------

_day_sets = st.dictionaries(
    st.integers(0, 5),                       # user ids
    st.sets(st.integers(0, 40), min_size=1, max_size=15),  # day offsets
    min_size=1,
    max_size=4,
)


def _py_streaks(day_offsets):
    runs = []
    days = sorted(day_offsets)
    start = prev = days[0]
    for d in days[1:]:
        if d == prev + 1:
            prev = d
            continue
        runs.append((start, prev - start + 1))
        start = prev = d
    runs.append((start, prev - start + 1))
    longest = max(r[1] for r in runs)
    longest_start = min(s for s, ln in runs if ln == longest)
    return len(days), len(runs), longest, longest_start


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(users=_day_sets)
def test_streak_profile_matches_python_reference(spark, users):
    import datetime

    from cdc_apache_cassandra_spark.plans.events_deep_queries import (
        streak_profile,
    )

    epoch = datetime.date(2024, 1, 1)
    rows = [
        (uid, epoch + datetime.timedelta(days=off))
        for uid, offs in users.items()
        for off in offs
    ]
    df = spark.createDataFrame(rows, "user_id long, d date")
    got = {
        r.user_id: (r.n_active_days, r.n_streaks, r.longest_len, r.longest_start)
        for r in streak_profile(df).collect()
    }
    want = {}
    for uid, offs in users.items():
        n_days, n_runs, longest, longest_start = _py_streaks(offs)
        want[uid] = (
            n_days,
            n_runs,
            longest,
            # streak_profile emits longest_start at timestamp grain (the
            # oracle-gate canonical form for day columns)
            datetime.datetime.combine(
                epoch + datetime.timedelta(days=longest_start),
                datetime.time(),
            ),
        )
    assert got == want


# --- BPE greedy re-segmentation: run-parity == reference greedy -------------

_bpe_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8),
    min_size=1,
    max_size=6,
    unique=True,
)


@given(words=_bpe_words)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_round_matches_reference_greedy(spark, words):
    """One _bpe_round over arbitrary a/b words (the alphabet that
    maximizes self-overlapping pairs like 'aaaa', where the run-parity
    trick earns its keep) == a reference Python greedy merge."""
    import collections

    from pyspark.sql import functions as F  # noqa: F401

    from cdc_apache_cassandra_spark.plans.llm_bpe_queries import _bpe_round

    freq = {w: i + 1 for i, w in enumerate(sorted(words))}
    state = spark.createDataFrame(
        [(w, f, [c for c in w]) for w, f in freq.items()],
        "word string, freq long, syms array<string>",
    )
    best_df, next_df = _bpe_round(state)
    best_rows = best_df.collect()

    # reference: pick best pair, then greedy left-to-right merge
    pairs: collections.Counter = collections.Counter()
    for w, f in freq.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += f
    if not pairs:
        assert best_rows == []
        return
    (l, r), cnt = min(
        pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )
    assert (best_rows[0].l, best_rows[0].rt, best_rows[0].cnt) == (l, r, cnt)

    expected = {}
    for w in freq:
        syms = [c for c in w]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        expected[w] = out
    got = {row.word: list(row.syms) for row in next_df.collect()}
    assert got == expected
