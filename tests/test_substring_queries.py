"""Tests for the substring-dedup / corpus-LM batch
(plans/llm_substring_queries.py): exact Python reimplementations over the
smoke-SF parquet (independent of both Spark and DuckDB), plus the
plan-shape guarantees the 100-TB mandate cares about."""

from __future__ import annotations

import collections
import hashlib
import re

import pandas as pd

from cdc_apache_cassandra_spark.plans import QUERIES
from cdc_apache_cassandra_spark.plans.llm_substring_queries import (
    _K,
    _NB,
    _TOPK,
)
from tests.test_plan_shapes import plan_str

SF = "/root/testdata/sf0.001"


def q(name, spark, sf_dir=SF):
    return QUERIES[name].fn(spark, sf_dir)


def _docs(sf_dir=SF) -> list[tuple[int, list[str]]]:
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if not text.strip():
            continue
        out.append((int(doc_id), re.split(r"\s+", text.strip())))
    return out


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_span_dedup_matches_pure_python(spark):
    """Gaps-and-islands span report == an independent Python oracle."""
    gram_count: collections.Counter = collections.Counter()
    per_doc_pos: dict[int, list[int]] = {}
    per_doc_grams: dict[int, list[str]] = {}
    n_tokens: dict[int, int] = {}
    for doc_id, toks in _docs():
        if len(toks) < _K:
            continue
        n_tokens[doc_id] = len(toks)
        grams = [
            _md5(" ".join(toks[p : p + _K]))
            for p in range(len(toks) - _K + 1)
        ]
        per_doc_grams[doc_id] = grams
        gram_count.update(grams)
    expected = {}
    for doc_id, grams in per_doc_grams.items():
        dup_pos = [p for p, g in enumerate(grams) if gram_count[g] > 1]
        if not dup_pos:
            continue
        spans = []
        start = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev > _K:
                spans.append((start, prev + _K - 1))
                start = p
            prev = p
        spans.append((start, prev + _K - 1))
        dup_tokens = sum(e - s + 1 for s, e in spans)
        expected[doc_id] = (n_tokens[doc_id], len(spans), dup_tokens)

    got = {
        r.doc_id: (r.n_tokens, r.n_spans, r.dup_tokens)
        for r in q("llm_substring_span_dedup", spark).collect()
    }
    assert got == expected
    for r in q("llm_substring_span_dedup", spark).collect():
        assert 0 < r.dup_ratio <= 1.0
        assert r.dup_tokens <= r.n_tokens


def test_boilerplate_matches_pure_python(spark):
    """Top-K boilerplate coverage == an independent Python oracle."""
    doc_sets: dict[str, set[int]] = collections.defaultdict(set)
    per_doc: dict[int, list[str]] = {}
    for doc_id, toks in _docs():
        if len(toks) < _NB:
            continue
        grams = [
            _md5(" ".join(toks[p : p + _NB]))
            for p in range(len(toks) - _NB + 1)
        ]
        per_doc[doc_id] = grams
        for g in grams:
            doc_sets[g].add(doc_id)
    ranked = sorted(doc_sets.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    boiler = {g for g, _ in ranked[:_TOPK]}
    expected = {}
    for doc_id, grams in per_doc.items():
        hits = sum(1 for g in grams if g in boiler)
        expected[doc_id] = (len(grams), hits, 2 * hits < len(grams))

    got = {
        r.doc_id: (r.n_grams, r.boiler_hits, r.keep)
        for r in q("llm_boilerplate_coverage", spark).collect()
    }
    assert got == expected


def test_surprisal_matches_pure_python(spark):
    """Integer-log2 unigram surprisal == an independent Python oracle
    (bit_length(N) - bit_length(c) per token instance)."""
    vocab: collections.Counter = collections.Counter()
    toks_by_doc: dict[int, list[str]] = {}
    for doc_id, toks in _docs():
        toks_by_doc[doc_id] = toks
        vocab.update(toks)
    n = sum(vocab.values())
    expected = {}
    for doc_id, toks in toks_by_doc.items():
        total = sum(n.bit_length() - vocab[w].bit_length() for w in toks)
        expected[doc_id] = (len(toks), total)

    rows = q("llm_unigram_surprisal", spark).collect()
    got = {r.doc_id: (r.n_tokens, r.total_bits) for r in rows}
    assert got == expected
    for r in rows:
        assert abs(r.mean_bits - r.total_bits / r.n_tokens) < 1e-12


def test_surprisal_broadcasts_vocab(spark):
    """The vocab/bits side must broadcast — a sort-merge join on the token
    stream is the 100-TB regression this plan exists to avoid."""
    p = plan_str(q("llm_unigram_surprisal", spark))
    assert "BroadcastExchange" in p


def test_boilerplate_broadcasts_topk(spark):
    p = plan_str(q("llm_boilerplate_coverage", spark))
    assert "BroadcastExchange" in p


def test_dsir_matches_pure_python(spark):
    """DSIR importance scores + deterministic top-20% selection == an
    independent Python oracle (add-one-smoothed integer-log2 ratio)."""
    from cdc_apache_cassandra_spark.plans.llm_substring_queries import (
        _DSIR_KEEP_PCT,
        _DSIR_TARGET_LANG,
    )

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    corpus: collections.Counter = collections.Counter()
    target: collections.Counter = collections.Counter()
    toks_by_doc: dict[int, tuple[str, list[str]]] = {}
    for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
        if not text.strip():
            continue
        toks = re.split(r"\s+", text.strip())
        toks_by_doc[int(doc_id)] = (lang, toks)
        corpus.update(toks)
        if lang == _DSIR_TARGET_LANG:
            target.update(toks)
    nc = sum(corpus.values())
    nt = sum(target.values()) + 1
    const = nc.bit_length() - nt.bit_length()
    expected_scores = {}
    for doc_id, (lang, toks) in toks_by_doc.items():
        s = sum(
            (target.get(w, 0) + 1).bit_length() - (corpus[w] + 1).bit_length()
            for w in toks
        ) + len(toks) * const
        expected_scores[doc_id] = s
    order = sorted(expected_scores, key=lambda d: (-expected_scores[d], d))
    keep = set(order[: len(order) * _DSIR_KEEP_PCT // 100])

    rows = q("llm_dsir_importance_sample", spark).collect()
    got_scores = {r.doc_id: r.logratio_bits for r in rows}
    assert got_scores == expected_scores
    assert {r.doc_id for r in rows if r.selected} == keep


def test_bpe_matches_pure_python(spark):
    """The learned merge rules, counts, and token trajectory == an
    independent Python BPE trainer (greedy left-to-right merges)."""
    from cdc_apache_cassandra_spark.plans.llm_bpe_queries import _ROUNDS

    freq: collections.Counter = collections.Counter()
    for _, toks in _docs():
        freq.update(toks)
    state = {w: [c for c in w] for w in freq}

    def corpus_tokens():
        return sum(freq[w] * len(s) for w, s in state.items())

    expected = []
    for rnd in range(1, _ROUNDS + 1):
        pairs: collections.Counter = collections.Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        before = corpus_tokens()
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
        expected.append((rnd, l, r, cnt, before, corpus_tokens()))

    got = sorted(
        (
            r.round,
            r.left_sym,
            r.right_sym,
            r.pair_count,
            r.corpus_tokens_before,
            r.corpus_tokens_after,
        )
        for r in QUERIES["llm_bpe_train_merges"].fn(spark, SF).collect()
    )
    assert got == expected
