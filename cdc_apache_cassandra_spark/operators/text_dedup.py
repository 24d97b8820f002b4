"""Fuzzy text-dedup operators: shingling, MinHash signatures, LSH banding,
SimHash — the scale path for near-duplicate detection over ``documents``.

Reference parity note: the reference pipeline has only EXACT dedup (md5 of
the serialized mutation, MutationCache.java:39-46); these operators
generalize A1/A3 to near-duplicate text as a training-data pipeline needs
(BASELINE.json north star). All hashing builds on md5 so the DuckDB oracle
computes bit-identical values (see functions/hashing.py rationale).

Scale design (100 TB):
- shingling/minhash are per-row narrow transforms — whole-stage codegen,
  no shuffle, no Python.
- LSH banding explodes each doc into B band rows, then ONE shuffle on
  (band_id, band_key); bucket sizes are bounded by collision probability,
  so the follow-up candidate self-join is skew-safe.
- verified Jaccard runs only on candidate pairs (|candidates| << n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.caching import persist_scoped


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams: ['a','b','c','d'] with n=3 ->
    ['a b c', 'b c d']. Caller must guard size(tokens) >= n."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))
    )


#: Mersenne prime for the affine MinHash permutations; all arithmetic
#: stays within BIGINT (max h < 2^32, max multiplier < 2k) so Spark and
#: DuckDB agree bit-for-bit.
MINHASH_PRIME = 2**31 - 1


def shingle_hash32(shingles: Column) -> Column:
    """array<string> -> array<bigint>: uint32 from the first 8 md5 hex
    chars — ONE md5 per shingle; the k permutations are affine maps."""
    return F.transform(
        shingles,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )


def minhash_signature(shingle_hashes: Column, k: int = 12) -> Column:
    """k-permutation MinHash over pre-hashed shingles: permutation i maps
    h -> ((2i+1)*h + 12345*i + 678) mod p, signature element = min.
    One md5 per shingle (in shingle_hash32) instead of k — the classic
    affine-permutation trick; identical arithmetic in the DuckDB oracle."""
    seeds = F.sequence(F.lit(0), F.lit(k - 1))
    return F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(
                shingle_hashes,
                lambda h: (
                    ((F.lit(2) * s + 1) * h + F.lit(12345) * s + F.lit(678))
                    % F.lit(MINHASH_PRIME)
                ),
            )
        ),
    )


def lsh_band_rows(
    df: DataFrame, id_col: str, sig_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Explode a signature into (id, band_id, band_key) rows. band_key is
    md5 over the band's slice of the signature, so equal keys <=> equal
    band slices."""
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    exploded = df.select(
        F.col(id_col), F.explode(band_ids).alias("band_id"), F.col(sig_col)
    )
    band_slice = F.slice(
        F.col(sig_col), F.col("band_id") * rows_per_band + 1, rows_per_band
    )
    band_key = F.md5(
        F.concat(
            F.col("band_id").cast("string"),
            F.lit("|"),
            F.array_join(F.transform(band_slice, lambda x: x.cast("string")), ","),
        )
    )
    return exploded.select(id_col, "band_id", band_key.alias("band_key"))


def minhash_signature_rows(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    shingles_col: str = "shingles",
    k: int = 12,
) -> DataFrame:
    """(id, minhash array<bigint>) via the flat-AGGREGATE MinHash
    formulation — value-identical to ``minhash_signature`` (same affine
    permutations over the same shingle hashes, same min) but planned as
    explode -> k plain min aggregates -> array regroup, avoiding the
    nested-lambda codegen the array form costs per fresh session (the
    same trade :func:`minhash_lsh_candidates` documents; this helper is
    its signature half, shared so query-side audits don't re-pay the
    lambda compile)."""
    h = sh_df.select(
        id_col, F.explode(shingle_hash32(F.col(shingles_col))).alias("h")
    )
    sig = h.groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(2 * s + 1) * F.col("h") + F.lit(12345 * s + 678))
                % F.lit(MINHASH_PRIME)
            ).alias(f"m{s}")
            for s in range(k)
        ]
    )
    return sig.select(
        id_col, F.array(*[F.col(f"m{s}") for s in range(k)]).alias("minhash")
    )


def minhash_lsh_candidates(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    shingles_col: str = "shingles",
    k: int = 12,
    bands: int = 4,
    rows_per_band: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via the AGGREGATE MinHash formulation:
    explode shingle hashes, compute the k signature elements as k flat
    ``min`` aggregates, band via ``stack``, bucket-join.

    Semantically identical to minhash_signature + lsh_band_rows +
    candidate_pairs (same affine permutations, same banding of the same
    values — band keys encode the same tuple injectively), but the plan is
    a plain explode -> hash-aggregate -> equi-join: no nested lambda
    codegen, which costs seconds of compile time per fresh session and
    whole-stage-codegen fallbacks at depth. This is the production path;
    the array-based operators remain as the spec/reference.
    """
    h = sh_df.select(
        id_col, F.explode(shingle_hash32(F.col(shingles_col))).alias("h")
    )
    sig = h.groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(2 * s + 1) * F.col("h") + F.lit(12345 * s + 678))
                % F.lit(MINHASH_PRIME)
            ).alias(f"m{s}")
            for s in range(k)
        ]
    )
    keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(j)),
                *[F.col(f"m{j * rows_per_band + r}").cast("string")
                  for r in range(rows_per_band)],
            )
        ).alias(f"k{j}")
        for j in range(bands)
    ]
    stack = (
        f"stack({bands}, "
        + ", ".join(f"{j}, k{j}" for j in range(bands))
        + ") as (band_id, band_key)"
    )
    band_rows = sig.select(id_col, *keys).selectExpr(id_col, stack)
    return candidate_pairs(band_rows, id_col)


def candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any LSH bucket. The join key
    (band_id, band_key) is high-cardinality — shuffle is uniform."""
    a = bands_df.select(
        F.col(id_col).alias("doc_a"), "band_id", "band_key"
    )
    b = bands_df.select(
        F.col(id_col).alias("doc_b"), "band_id", "band_key"
    )
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over the near-dup candidate graph — the
    cluster stage of a dedup pipeline (keep one representative per
    component). Min-label propagation to a FIXPOINT:

        label(v) <- min(label(v), min over neighbors u of label(u))

    iterated until no label changes (driver-controlled loop; iteration
    count is bounded by the component diameter, which for near-dup
    clusters is tiny). Each iteration is one broadcast-or-shuffle join +
    aggregate — the standard large-graph CC under Spark (GraphFrames uses
    the same shape). Returns (id_col, component) where component = min id
    in the component.
    """
    # undirected: both directions; the edge list drives every iteration
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .transform(persist_scoped)
    )

    labels = nodes.select(F.col(id_col), F.col(id_col).alias("component"))
    for _ in range(max_iter):
        neighbor_min = (
            und.join(
                labels.select(
                    F.col(id_col).alias("dst"), F.col("component").alias("n_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("n_comp").alias("min_n_comp"))
            .withColumnRenamed("src", id_col)
        )
        with_old = (
            labels.join(neighbor_min, id_col, "left")
            .select(
                id_col,
                F.col("component").alias("_prev_comp"),
                F.least(
                    F.col("component"), F.coalesce(F.col("min_n_comp"), F.col("component"))
                ).alias("component"),
            )
            # localCheckpoint (eager), NOT persist: each iteration's plan
            # references `labels` twice, so without a true lineage CUT the
            # logical tree doubles per iteration — exponential plan growth
            # that OOMs the driver at plan stringification on dense graphs.
            # Checkpointing replaces the plan with a LogicalRDD leaf.
            # The PREVIOUS label rides along so the fixpoint check below
            # is a shuffle-free scan of the checkpointed partitions — the
            # old re-join of new labels against old labels cost a full
            # extra shuffle join per iteration (guide §2.4).
            .localCheckpoint()
        )
        labels = with_old.drop("_prev_comp")
        changed = with_old.agg(
            F.count(F.when(F.col("component") != F.col("_prev_comp"), True))
        ).first()[0]
        if changed == 0:
            break
    und.unpersist()
    return labels


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> tuple[DataFrame, int]:
    """Connected components by ALTERNATING large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — O(log²/loglog) rounds in the component size instead of
    min-label propagation's O(diameter) rounds, the difference that
    matters on chain-shaped components at 100 TB (VERDICT r11 item 6).

    State is a parent forest over the edge list. Per round:

      large-star: per node u, hook every STRICTLY LARGER neighbor to
      min(N(u) ∪ {u})            — emit (v, m) for v in N(u), v > u
      small-star: per node u, hook u and every smaller-or-equal
      neighbor to that minimum    — emit (v, m) for v in N(u), v <= u,
                                    plus (u, m)

    both keep every emitted edge inside the original component and
    never raise a node's reachable minimum, so at the fixpoint (edge
    set stops changing) every surviving edge is (v, root) with root =
    the component MINIMUM — the same labeling min-label converges to.
    Returns (labels, rounds): labels = (id_col, component) with
    singletons labeled by themselves, rounds = star rounds executed
    (exposed for the scale evidence; the chain-graph test pins that it
    grows logarithmically where min-label's grows linearly)."""
    def _large_star(e: DataFrame) -> DataFrame:
        # per node u over the UNDIRECTED neighborhood: hook every
        # strictly larger neighbor to m = min(N(u) ∪ {u})
        und = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).filter(F.col("src") != F.col("dst"))
        nbr = und.groupBy("src").agg(F.min("dst").alias("nmin"))
        m = F.least(F.col("src"), F.col("nmin"))
        return (
            und.join(nbr, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), m.alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            # lineage cut: the loop otherwise doubles the plan per round
            .localCheckpoint()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient each edge toward its LARGER endpoint, then hook that
        # node and all its (smaller) neighbors to the neighborhood min
        oriented = e.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        ).filter(F.col("src") != F.col("dst"))
        nbr = oriented.groupBy("src").agg(F.min("dst").alias("m"))
        hooked = (
            oriented.join(nbr, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(nbr.select("src", F.col("m").alias("dst")))
        )
        return (
            hooked.filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e))
        rounds += 1
        # converged when the edge set stops changing: the forest is then
        # a disjoint union of stars centered at each component's minimum
        if e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty():
            e = e2
            break
        e = e2
    labels = (
        nodes.select(F.col(id_col))
        .join(e.withColumnRenamed("src", id_col), id_col, "left")
        .groupBy(id_col)
        .agg(F.min(F.coalesce(F.col("dst"), F.col(id_col))).alias("component"))
    )
    return labels, rounds


def grouped_connected_components(
    edges: DataFrame,
    group_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact connected components when EVERY edge lies inside one group
    (a blocking key: the IVF cell of SemDeDup, a shard, a tenant) — the
    within-group guarantee means components never span groups, so the
    global fixpoint collapses to independent per-group problems.

    One shuffle on the group key, then union-find over each group's edge
    list in an Arrow batch (``applyInPandas``) — replacing the iterative
    min-label propagation of :func:`connected_components`, whose round
    count is the component DIAMETER (each round a join + aggregate +
    checkpoint). Returns ``(group_col, id_col, component)`` for every id
    that appears in an edge of that group; singletons (no edges) are
    absent — callers left-join (on group + id, so an id that occurs in
    several groups labels independently per group) and coalesce to the
    id, exactly as they do for the iterative operator's untouched
    labels.

    Scale: per-group state is the group's edge list — bounded by the
    same blocking-key cardinality cap that keeps the candidate-pair
    generation sub-quadratic (SemDeDup bounds cell sizes; LSH bounds
    bucket sizes). The shuffle key is the blocking key: high cardinality,
    skew-bounded by construction. The labels are identical to the
    iterative fixpoint: union-by-min-root keeps each root the minimum id
    of its merged set, so find(x) terminates at the component minimum —
    the same value min-label propagation converges to (pinned by
    test_grouped_cc_matches_iterative)."""
    import pandas as pd

    def _cc_one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(pdf[src_col].values, pdf[dst_col].values):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # union by min root
        ids = sorted(set(pdf[src_col]) | set(pdf[dst_col]))
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]] * len(ids),
                id_col: ids,
                "component": [find(int(i)) for i in ids],
            }
        )

    gtype = edges.schema[group_col].dataType.simpleString()
    return edges.groupBy(group_col).applyInPandas(
        _cc_one_group,
        schema=f"{group_col} {gtype}, {id_col} long, component long",
    )


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard over two DISTINCT-element arrays, as double."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))
    return inter / union.cast("double")


def simhash32_sql(hashes_col: str) -> str:
    """Spark-SQL expression string computing the 32-bit SimHash of an
    array<bigint> column of uint32 token hashes: bit b is set iff
    sum over tokens of (2*bit_b(hash)-1) > 0.

    Built as a SQL lambda because the shift amount is itself a lambda
    variable (the Python shiftright wrapper only takes an int)."""
    return f"""
    aggregate(
      transform(sequence(0, 31), b ->
        CASE WHEN aggregate({hashes_col}, 0L,
                            (acc, h) -> acc + 2 * (shiftright(h, b) % 2) - 1) > 0
             THEN shiftleft(1L, b) ELSE 0L END),
      0L, (acc, x) -> acc + x)
    """


def token_hash32_expr(tokens: Column) -> Column:
    """array<string> -> array<bigint>: first 8 md5 hex chars as uint32."""
    return F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
