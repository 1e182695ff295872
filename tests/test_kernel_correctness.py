"""Differential correctness: kernel vs an independent textbook oracle,
mirroring the reference protocol (/root/reference/python/test/test_correctness.py:
seeded shuffle, 40 inputs vs ~20k candidates with deliberate overlap, grid
over min_score x {jaro, winkler}, abs tolerance 1e-4).

Also cross-checks against DuckDB's jaro/jaro_winkler functions, which back
the __spark_entry__ oracle_sql() queries.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from batch_jaro_winkler_spark.fixtures import make_wordlist
from batch_jaro_winkler_spark.kernel import build_model, score
from batch_jaro_winkler_spark.kernel.oracle import jaro, jaro_winkler

TOL = 1e-4


def _dataset(n_cand=4000, n_inp=25):
    words = make_wordlist(n_ascii=5000, n_cjk=500, seed=0)
    rng = random.Random(0)
    rng.shuffle(words)
    inputs = words[:n_inp]
    candidates = words[10 : 10 + n_cand]  # deliberate overlap with inputs
    return inputs, candidates


@pytest.mark.parametrize("min_score", [0.0, 0.25, 0.738])
@pytest.mark.parametrize("winkler", [False, True])
def test_differential_vs_textbook_oracle(min_score, winkler):
    inputs, candidates = _dataset()
    model = build_model(candidates)
    kwargs = (
        # reference correctness tests pass threshold=0.0 on the winkler runs
        # to match their oracle (test_correctness.py:56-60)
        dict(weight=0.1, threshold=0.0)
        if winkler
        else dict(weight=None, threshold=None)
    )
    for inp in inputs:
        idx, sc = score(model, inp, min_score=min_score, **kwargs)
        got = {candidates[int(i)]: float(s) for i, s in zip(idx, sc)}
        # oracle side: score every candidate, filter by min_score
        for cand in set(candidates):
            exp = jaro_winkler(inp, cand, 0.1, 0.0) if winkler else jaro(inp, cand)
            if exp >= min_score + TOL:
                assert cand in got, (inp, cand, exp)
            if cand in got:
                assert abs(got[cand] - exp) < TOL, (inp, cand, got[cand], exp)


def test_n_best_matches_bruteforce():
    inputs, candidates = _dataset(n_cand=2000, n_inp=10)
    model = build_model(candidates)
    for inp in inputs:
        idx, sc = score(model, inp, n_best=10, weight=None, threshold=None)
        assert len(idx) == 10
        # scores sorted desc, and equal to the 10 best brute-force scores
        assert all(sc[i] >= sc[i + 1] for i in range(len(sc) - 1))
        brute = sorted((jaro(inp, c) for c in candidates), reverse=True)[:10]
        np.testing.assert_allclose(np.sort(sc)[::-1], brute, atol=TOL)


def test_kernel_matches_duckdb():
    """DuckDB's jaro_similarity/jaro_winkler_similarity back our
    __spark_entry__ oracle SQL — verify the float64 kernel path agrees."""
    duckdb = pytest.importorskip("duckdb")
    inputs, candidates = _dataset(n_cand=1500, n_inp=12)
    con = duckdb.connect()
    model = build_model(candidates)
    for inp in inputs:
        idx, sc = score(model, inp, weight=None, threshold=None, dtype=np.float64)
        got = {candidates[int(i)]: float(s) for i, s in zip(idx, sc)}
        rows = con.execute(
            "SELECT c, jaro_similarity(c, ?) FROM (SELECT unnest(?) AS c)",
            [inp, candidates],
        ).fetchall()
        for cand, exp in rows:
            assert abs(got[cand] - exp) < TOL, (inp, cand, got[cand], exp)
