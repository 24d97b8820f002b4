"""Pin the window-form BPE round (r11 optimization) against the
original join-form implementation: the greedy left-to-right
non-overlapping re-segmentation must be value-identical on adversarial
symbol runs (overlapping self-pairs, multiple runs per word, gaps,
no-match words, single-symbol words)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.llm_bpe_queries import _bpe_round


def _join_form_round(state):
    """The pre-r11 join-based round, verbatim (reference semantics)."""
    pair_structs = (
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) AS l,"
        " element_at(syms, i + 1) AS rt))"
    )
    pairs = (
        state.filter(F.size("syms") >= 2)
        .select("freq", F.explode(F.expr(pair_structs)).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.rt").alias("rt"))
        .agg(F.sum("freq").alias("cnt"))
    )
    best = pairs.orderBy(F.desc("cnt"), "l", "rt").limit(1)

    pos_structs = (
        "transform(sequence(1, size(syms)),"
        " i -> struct(i AS i, element_at(syms, i) AS sym,"
        " CASE WHEN i < size(syms) THEN element_at(syms, i + 1) END AS nxt))"
    )
    pos = state.select(
        "word", "freq", F.explode(F.expr(pos_structs)).alias("q")
    ).select("word", "freq", "q.i", "q.sym", "q.nxt")

    m = (
        pos.crossJoin(F.broadcast(best))
        .filter((F.col("sym") == F.col("l")) & (F.col("nxt") == F.col("rt")))
        .select("word", "i")
    )
    w_word = Window.partitionBy("word").orderBy("i")
    runs = m.withColumn(
        "brk",
        F.when(
            F.lag("i").over(w_word).isNull()
            | (F.col("i") - F.lag("i").over(w_word) > 1),
            1,
        ).otherwise(0),
    ).withColumn("run_id", F.sum("brk").over(w_word))
    sel = (
        runs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("word", "run_id").orderBy("i")
            ),
        )
        .filter(F.col("rn") % 2 == 1)
        .select("word", "i")
    )
    sel_here = sel.select("word", "i", F.lit(1).alias("is_sel"))
    sel_prev = sel.select(
        "word", (F.col("i") + 1).alias("i"), F.lit(1).alias("prev_sel")
    )
    reb = (
        pos.join(sel_here, ["word", "i"], "left")
        .join(sel_prev, ["word", "i"], "left")
        .filter(F.col("prev_sel").isNull())
        .select(
            "word",
            "freq",
            "i",
            F.when(F.col("is_sel") == 1, F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym2"),
        )
    )
    next_state = reb.groupBy("word", "freq").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, sym2))), x -> x.sym2)"
        ).alias("syms")
    )
    return best, next_state


_WORDS = [
    # overlapping self-pair runs: greedy keeps odd ranks per run
    "aaaa",       # run of (a,a) at 1,2,3 -> pick 1,3
    "aaaaa",      # picks 1,3 then leftover a
    "aaa",        # picks 1, leftover a
    # two runs separated by a gap
    "aabaa",
    "aabaaa",
    # no match / single symbol / two symbols
    "b",
    "ab",
    "ba",
    # matches at word end
    "baa",
    "bbaa",
    # interleaved: every other position matches
    "acacac",
]


def _state0(spark):
    rows = [(w, i + 1) for i, w in enumerate(_WORDS)]
    wf = spark.createDataFrame(rows, ["word", "freq"])
    return wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    )


def _collect_state(df):
    return sorted(
        (r["word"], r["freq"], tuple(r["syms"])) for r in df.collect()
    )


def test_window_round_matches_join_round(spark):
    state = _state0(spark)
    # two chained rounds: round 2 exercises multi-char symbols and the
    # shrunken run structure the first merge produces
    for _ in range(2):
        best_j, next_j = _join_form_round(state)
        best_w, next_w = _bpe_round(state)
        assert best_j.collect() == best_w.collect()
        got_j, got_w = _collect_state(next_j), _collect_state(next_w)
        assert got_j == got_w, f"\njoin:   {got_j}\nwindow: {got_w}"
        state = next_w.localCheckpoint(eager=False)
