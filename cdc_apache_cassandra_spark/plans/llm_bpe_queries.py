r"""BPE tokenizer TRAINING as a deterministic DataFrame program.

``llm_bpe_train_merges`` learns the first R byte-pair-encoding merge
rules from the corpus (Sennrich et al. 2016): per round, count adjacent
symbol pairs weighted by word frequency, pick the most frequent pair
(total (count DESC, left, right) tie-break), and re-segment every word
by GREEDY left-to-right non-overlapping replacement — then recount.
The greedy pass is exact in SQL via the run-parity trick: overlapping
matches can only occur at CONSECUTIVE positions (a self-overlapping
pair), so greedy = keep the odd-ranked positions inside each maximal
run of consecutive match positions (gaps-and-islands + ROW_NUMBER % 2).

The DuckDB oracle unrolls the same R rounds as generated CTE text
(:func:`bpe_cte` is the single source, mirroring kmeans_cte) — every
quantity is an integer count or a string concat, so the learned merge
table is hash-exact across engines.

Scale shape (100 TB): state is (word, freq, syms) — VOCABULARY-sized,
not corpus-sized (the corpus collapses to word frequencies in one
shuffle, exactly how production BPE trainers operate). Each round is a
pair-count aggregate (shuffle on the pair), a 1-row broadcast of the
winning rule, and a word-keyed window re-segmentation. R rounds = R
bounded passes with lineage kept shallow by the per-round localCheckpoint.

Spark gotcha encoded here: ``sequence(1, n)`` REVERSES when n < 1, so
every pair/pos expansion guards ``size(syms) >= 2`` (DuckDB's
``range(1, n)`` is simply empty — silent cross-engine divergence
otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans.registry import register
from cdc_apache_cassandra_spark.sources.registry import load_table, spread_scan

_ROUNDS = 3


def bpe_cte(rounds: int) -> str:
    """Unrolled BPE rounds as DuckDB CTE text. Expects a CTE ``state0``
    of (word, freq, syms LIST<VARCHAR>); defines pairs{r}/best{r}/
    state{r} for r in 1..rounds plus a ``report`` CTE.

    The position enumerations derive their bound from the ACTUAL max
    symbol count (``maxlen`` CTE) rather than a fixed literal — a fixed
    cap would silently drop pairs for words longer than the cap (URLs,
    hashes, compounds) while the Spark twin enumerates unbounded
    ``sequence(1, size(syms))``, making the gate fail spuriously. Symbol
    counts only shrink across merge rounds, so the state0 max bounds
    every round."""
    parts = [
        "maxlen AS (SELECT CAST(MAX(len(syms)) AS BIGINT) AS ml FROM state0)"
    ]
    for r in range(1, rounds + 1):
        prev = f"state{r - 1}"
        parts.append(f"""pairs{r} AS (
  SELECT syms[i.i] AS l, syms[i.i + 1] AS rt,
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM {prev}, (SELECT unnest(range(1, (SELECT ml FROM maxlen))) AS i) i
  WHERE i.i < len(syms)
  GROUP BY 1, 2
),
best{r} AS (
  SELECT l, rt, cnt FROM pairs{r} ORDER BY cnt DESC, l, rt LIMIT 1
),
m{r} AS (
  SELECT s.word, i.i AS i
  FROM {prev} s
  CROSS JOIN (SELECT unnest(range(1, (SELECT ml FROM maxlen))) AS i) i
  CROSS JOIN best{r} b
  WHERE i.i < len(s.syms)
    AND s.syms[i.i] = b.l AND s.syms[i.i + 1] = b.rt
),
sel{r} AS (
  SELECT word, i FROM (
    SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, run_id ORDER BY i) AS rn
    FROM (
      SELECT word, i,
             SUM(CASE WHEN prev IS NULL OR i - prev > 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY word ORDER BY i) AS run_id
      FROM (SELECT word, i,
                   lag(i) OVER (PARTITION BY word ORDER BY i) AS prev
            FROM m{r})
    )
  ) WHERE rn % 2 = 1
),
reb{r} AS (
  SELECT s.word, s.freq, i.i AS i,
         CASE WHEN sc.i IS NOT NULL THEN s.syms[i.i] || s.syms[i.i + 1]
              ELSE s.syms[i.i] END AS sym2
  FROM {prev} s
  CROSS JOIN (SELECT unnest(range(1, (SELECT ml FROM maxlen) + 1)) AS i) i
  LEFT JOIN sel{r} sc ON sc.word = s.word AND sc.i = i.i
  LEFT JOIN sel{r} sp ON sp.word = s.word AND sp.i = i.i - 1
  WHERE i.i <= len(s.syms) AND sp.i IS NULL
),
state{r} AS (
  SELECT word, freq, list(sym2 ORDER BY i) AS syms
  FROM reb{r} GROUP BY word, freq
)""")
    report_rows = ",\n".join(
        f"""  row{r} AS (
    SELECT CAST({r} AS INTEGER) AS round, b.l AS left_sym, b.rt AS right_sym,
           b.cnt AS pair_count,
           (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM state{r - 1})
             AS corpus_tokens_before,
           (SELECT CAST(SUM(freq * len(syms)) AS BIGINT) FROM state{r})
             AS corpus_tokens_after
    FROM best{r} b
  )"""
        for r in range(1, rounds + 1)
    )
    union = " UNION ALL ".join(
        f"SELECT * FROM row{r}" for r in range(1, rounds + 1)
    )
    return (
        ",\n".join(parts)
        + ",\n"
        + report_rows
        + f",\nreport AS ({union})"
    )


_BPE_SQL = rf"""
WITH wordfreq AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0)
  GROUP BY w
),
state0 AS (
  SELECT word, freq,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, i, 1)) AS syms
  FROM wordfreq
),
{bpe_cte(_ROUNDS)}
SELECT * FROM report
"""


def _bpe_round(state: DataFrame):
    """One BPE round: (state) -> (best_rule_df[1 row], next_state)."""
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

    # Greedy parity selection as pure WINDOW passes over pos (all
    # partitioned by word, so they share ONE exchange) instead of the
    # former matched-subset windows + two sort-merge joins of pos on
    # (word, i) + a re-shuffling groupBy — value-identical (pinned by
    # tests/test_bpe_round_window.py against the join form):
    #   match      true iff this position starts an occurrence of best
    #   prev_m     previous matched position (strictly before this row)
    #   brk        1 at a run start (first match, or gap > 1 from prev)
    #   run_start  the current run's first matched position
    #   is_sel     greedy pick = matches at even offset from run_start
    #              (identical to odd rank among the run's matches)
    #   prev_sel   drop the consumed right symbol (position after a pick)
    w_word = Window.partitionBy("word").orderBy("i")
    w_cum = w_word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_before = w_word.rowsBetween(Window.unboundedPreceding, -1)
    match = (
        F.col("nxt").isNotNull()
        & (F.col("sym") == F.col("l"))
        & (F.col("nxt") == F.col("rt"))
    )
    prev_m = F.max(F.when(F.col("match"), F.col("i"))).over(w_before)
    tagged = (
        pos.crossJoin(F.broadcast(best))
        .withColumn("match", match)
        .withColumn(
            "brk",
            F.when(
                F.col("match") & (prev_m.isNull() | (F.col("i") - prev_m > 1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run_start",
            F.max(F.when(F.col("brk") == 1, F.col("i"))).over(w_cum),
        )
        .withColumn(
            "is_sel",
            F.col("match") & ((F.col("i") - F.col("run_start")) % 2 == 0),
        )
        .withColumn("prev_sel", F.lag("is_sel", 1, False).over(w_word))
    )
    reb = tagged.filter(~F.col("prev_sel")).select(
        "word",
        "freq",
        "i",
        F.when(F.col("is_sel"), F.concat("sym", "nxt"))
        .otherwise(F.col("sym"))
        .alias("sym2"),
    )
    next_state = reb.groupBy("word", "freq").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(i, sym2))), x -> x.sym2)"
        ).alias("syms")
    )
    return best, next_state


def _corpus_tokens(state: DataFrame, name: str):
    return state.agg(
        F.sum(F.col("freq") * F.size("syms")).cast("long").alias(name)
    )


@register("llm_bpe_train_merges", sql=_BPE_SQL)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {R} BPE merge rules from the corpus (see module
    doc): per round the winning pair, its weighted count, and the corpus
    token total before/after applying it — the compression trajectory a
    tokenizer-training run monitors. All-integer + string concat, so the
    merge table is hash-exact against the unrolled-CTE oracle."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    tok = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    wf = tok.groupBy("word").agg(F.count("*").alias("freq"))
    state = wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    reports = []
    for r in range(1, _ROUNDS + 1):
        before = _corpus_tokens(state, "corpus_tokens_before")
        best, state = _bpe_round(state)
        state = state.localCheckpoint(eager=False)
        after = _corpus_tokens(state, "corpus_tokens_after")
        reports.append(
            best.select(
                F.lit(r).alias("round"),
                F.col("l").alias("left_sym"),
                F.col("rt").alias("right_sym"),
                F.col("cnt").alias("pair_count"),
            )
            .crossJoin(F.broadcast(before))
            .crossJoin(F.broadcast(after))
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


bpe_train_merges.__doc__ = bpe_train_merges.__doc__.replace(
    "{R}", str(_ROUNDS)
)


_BPE_APPLY_SQL = rf"""
WITH wordfreq AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0)
  GROUP BY w
),
state0 AS (
  SELECT word, freq,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, i, 1)) AS syms
  FROM wordfreq
),
{bpe_cte(_ROUNDS)},
doc_tokens AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(s.syms)) AS BIGINT) AS n_bpe_tokens,
       CAST(CAST(SUM(len(s.syms)) AS BIGINT) AS DOUBLE) / COUNT(*)
         AS fertility
FROM doc_tokens d JOIN state{_ROUNDS} s ON s.word = d.word
GROUP BY d.doc_id
"""


@register("llm_bpe_apply_fertility", sql=_BPE_APPLY_SQL)
def bpe_apply_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the {R}-rule trained tokenizer: per document, words, BPE
    tokens under the learned segmentation, and FERTILITY (tokens/word) —
    the number a tokenizer evaluation watches per language/domain slice.
    Train-then-apply in one plan: the segmentation map is
    vocabulary-sized and broadcast onto the document token stream, so
    application costs one narrow join regardless of corpus size."""
    d = spread_scan(load_table(spark, sf_dir, "documents"))
    tok = d.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    )
    wf = tok.groupBy("word").agg(F.count("*").alias("freq"))
    state = wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    for _ in range(_ROUNDS):
        _, state = _bpe_round(state)
        state = state.localCheckpoint(eager=False)
    seg = state.select("word", F.size("syms").alias("n_syms"))
    return (
        tok.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            (
                F.col("n_bpe_tokens").cast("double") / F.col("n_words")
            ).alias("fertility"),
        )
    )


bpe_apply_fertility.__doc__ = bpe_apply_fertility.__doc__.replace(
    "{R}", str(_ROUNDS)
)
