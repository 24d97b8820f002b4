"""Vector-surface tests: multi-probe recall dominance, cross-modal join
integrity, rolling-window invariants, and the approx-vs-exact quantile
envelope (the 100 TB sketch path's accuracy contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.sources.registry import load_table

SF = "/root/testdata/sf0.01"


def q(name, spark, sf_dir=SF):
    return QUERIES[name].fn(spark, sf_dir)


def _topk_sets(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r.qid, set()).add(r.nid)
    return out


def test_multiprobe_recall_dominates_single_probe(spark):
    """nprobe=2 must recall at least as much of the exact top-k as
    nprobe=1 for every query, and strictly more in aggregate unless
    single-probe was already perfect."""
    exact = _topk_sets(q("llm_ann_cosine_topk", spark))
    single = _topk_sets(q("llm_ann_ivf_topk", spark))
    multi = _topk_sets(q("llm_ann_ivf_multiprobe", spark))
    hits_single = sum(len(exact[k] & single.get(k, set())) for k in exact)
    hits_multi = sum(len(exact[k] & multi.get(k, set())) for k in exact)
    assert hits_multi >= hits_single
    for k in exact:
        # multiprobe candidates are a superset of single-probe candidates,
        # so per-query hits can't regress
        assert len(exact[k] & multi.get(k, set())) >= len(
            exact[k] & single.get(k, set())
        ), k


def test_cross_modal_counts_bounded_by_quality_gate(spark):
    from cdc_apache_cassandra_spark.plans.vector_deep_queries import (
        _Q_MAX_CHARS,
        _Q_MIN_CHARS,
    )

    d = load_table(spark, SF, "documents")
    n_quality = d.filter(
        F.col("n_chars").between(_Q_MIN_CHARS, _Q_MAX_CHARS)
    ).count()
    total = (
        q("llm_quality_filtered_clustering", spark)
        .agg(F.sum("n_docs"))
        .first()[0]
    )
    assert total <= n_quality  # join can only drop docs without embeddings
    assert total > 0


def test_rolling_wau_bounds(spark):
    """WAU on any day is ≥ that day's DAU and ≤ the 7-day sum of DAUs."""
    ev = load_table(spark, SF, "events")
    dau = {
        r.day: r.n
        for r in ev.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in q("events_rolling_7d_distinct_users", spark).collect():
        assert r.wau >= dau[r.day]
        window_sum = sum(
            n for day, n in dau.items() if 0 <= (r.day - day).days <= 6
        )
        assert r.wau <= window_sum


def test_approx_percentile_within_envelope(spark):
    """The sketch path (approx_percentile, mergeable at 100 TB) must land
    within 1% relative error of the exact sort-based percentile it
    replaces."""
    li = load_table(spark, SF, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_ivfpq_adc_scores_consistent_with_pq(spark):
    """Where the IVFPQ and plain-PQ top-5 report the same (qid, nid)
    pair, the ADC score must be identical — the cell restriction changes
    WHICH candidates are ranked, never how a pair is scored. (Recall is
    deliberately NOT asserted monotone either way: restricting to the
    query's cell can remove false positives and so RAISE recall@5, which
    the synthetic corpus actually exhibits.)"""
    from cdc_apache_cassandra_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    pq = {
        (r.qid, r.nid): r.adc
        for r in QUERIES["llm_ann_pq_adc"].fn(spark, sf).collect()
    }
    ivfpq_rows = QUERIES["llm_ann_ivfpq_topk"].fn(spark, sf).collect()
    assert ivfpq_rows
    shared = 0
    for r in ivfpq_rows:
        if (r.qid, r.nid) in pq:
            assert pq[(r.qid, r.nid)] == r.adc, (r.qid, r.nid)
            shared += 1
    assert shared > 0  # the rankings genuinely overlap


def test_ivfpq_neighbors_share_query_cell(spark):
    """Every reported IVFPQ neighbor must sit in its query's coarse cell
    (the invariant the composite exists to enforce)."""
    from cdc_apache_cassandra_spark.plans import QUERIES
    from cdc_apache_cassandra_spark.plans.vector_deep_queries import _pq_build

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["llm_ann_ivfpq_topk"].fn(spark, sf).collect()
    assert rows
    cdist = _pq_build(spark, sf)["cdist"]
    coarse = {
        r.vec_id: r.cell
        for r in (
            cdist.groupBy("vec_id", "cid")
            .agg(F.sum("d2").cast("bigint").alias("t"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("t", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cell"))
        ).collect()
    }
    for r in rows:
        assert coarse[r.qid] == r.cell
        assert coarse[r.nid] == r.cell


def test_ann_candidate_pairs_seam_matches_banded_plan(spark):
    """operators/vectors.ann_candidate_pairs is THE default all-pairs ANN
    seam: with the banded plan's exact config it must produce the same
    candidate set (id_a, id_b, n_bands) the oracle-green
    llm_ann_srp_banded query verifies — the seam and the gate cannot
    drift apart."""
    from cdc_apache_cassandra_spark.operators.vectors import (
        ann_candidate_pairs,
        as_double_vec,
    )
    from cdc_apache_cassandra_spark.plans.analytics_extra_queries import (
        _SRPB_BANDS,
        _SRPB_BITS,
        _SRPB_PLANES,
        _srpb_signatures,
    )

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    n = e.select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    seam = ann_candidate_pairs(
        n, dim=0, bands=_SRPB_BANDS, bits=_SRPB_BITS, planes=_SRPB_PLANES
    )
    sig = _srpb_signatures(n)
    a = sig.select(F.col("vec_id").alias("id_a"), "band", "bucket")
    c = sig.select(F.col("vec_id").alias("id_b"), "band", "bucket")
    plan = (
        a.join(c, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )
    got = sorted((r.id_a, r.id_b, r.n_bands) for r in seam.collect())
    want = sorted((r.id_a, r.id_b, r.n_bands) for r in plan.collect())
    assert got == want and got, "seam must equal the gated banded plan"


def test_srp_bucket_sql_matches_column_form(spark):
    """The SQL-text SRP bucket (one JVM parse) equals the Column form
    (per-literal py4j) bit-for-bit on every vector, per band — the
    plan-construction optimization must not move a single bucket."""
    from cdc_apache_cassandra_spark.operators.vectors import (
        as_double_vec,
        gaussian_planes,
        srp_band_signatures,
        srp_bucket,
    )

    planes = gaussian_planes(16, 12, seed=11)
    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = e.select(
        "vec_id",
        as_double_vec(F.slice(F.col("embedding"), 1, 16)).alias("v"),
    )
    # Column-literal form (the old path), band by band
    want = {}
    for j in range(3):
        rows = n.select(
            "vec_id",
            srp_bucket(F.col("v"), planes[j * 4 : (j + 1) * 4]).alias("b"),
        ).collect()
        for r in rows:
            want[(r.vec_id, j)] = r.b
    # SQL-text form: the string path of srp_bucket + the banded table
    got_scalar = {
        (r.vec_id, 0): r.b
        for r in n.select(
            "vec_id", srp_bucket("v", planes[0:4]).alias("b")
        ).collect()
    }
    for k, v in got_scalar.items():
        assert want[k] == v
    got = {
        (r.vec_id, r.band): r.bucket
        for r in srp_band_signatures(n, planes, 3, 4).collect()
    }
    assert got == want
