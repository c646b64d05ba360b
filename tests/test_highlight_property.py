"""Randomized cross-check of highlight_terms / search_min_should_match
against pure-python truth oracles (seeded, deterministic)."""

from __future__ import annotations

import random

import pytest

from search_engine_spark.operators.build import build_postings
from search_engine_spark.operators.query import search_min_should_match
from search_engine_spark.operators.textstats import highlight_terms
from tests.conftest import corpus_from_texts

VOCAB = ["alpha", "beta", "gamma", "delta", "x", "y", "z", "q1", "q2", "q3"]
TERMS = ["q1", "q2", "q3"]


def _truth_best_window(tokens: list[str], terms: list[str], w: int):
    """(window_start_1based, coverage, snippet) or None when no term hits —
    candidate spans start at hit positions, ties keep the earliest span."""
    ts = sorted(set(terms))
    starts = [i for i, t in enumerate(tokens) if t in ts]
    if not starts:
        return None
    best_p, best_c = -1, 0
    for p in starts:
        window = tokens[p : p + w]
        c = sum(1 for t in ts if t in window)
        if c > best_c:
            best_p, best_c = p, c
    win = tokens[best_p : best_p + w]
    snippet = " ".join(f"<em>{t}</em>" if t in ts else t for t in win)
    return best_p + 1, best_c, snippet


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_highlight_matches_truth_oracle(spark, seed):
    rng = random.Random(seed)
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
        for _ in range(40)
    ]
    w = rng.choice([2, 3, 5, 8])
    corpus = corpus_from_texts(spark, texts)
    got = {
        r.docId: (r.window_start, r.coverage, r.snippet)
        for r in highlight_terms(corpus, TERMS, window=w).collect()
    }
    want = {
        i: t
        for i, t in (
            (i, _truth_best_window(txt.split(), TERMS, w))
            for i, txt in enumerate(texts)
        )
        if t is not None
    }
    assert got == want


@pytest.mark.parametrize("seed", [4, 5])
def test_msm_matches_truth_oracle(spark, seed):
    rng = random.Random(seed)
    texts = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30)))
        for _ in range(50)
    ]
    corpus = corpus_from_texts(spark, texts)
    postings = build_postings(corpus, "naive")
    for m in (1, 2, 3):
        got = sorted(
            r.docId for r in search_min_should_match(postings, TERMS, m).collect()
        )
        want = sorted(
            i
            for i, txt in enumerate(texts)
            if sum(1 for t in set(TERMS) if t in txt.split()) >= m
        )
        assert got == want, f"m={m}"
