"""Property-based kernel tests (hypothesis): for arbitrary unicode inputs,
the vectorized batch kernel, the scalar pair scorer, and the independent
textbook oracle must agree — and structural invariants must hold."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from batch_jaro_winkler_spark.kernel import build_model, score, score_pair
from batch_jaro_winkler_spark.kernel.oracle import jaro, jaro_winkler

# printable BMP text incl. CJK and accents; no surrogates
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x9FFF, blacklist_categories=("Cs",)
    ),
    max_size=40,
)


@settings(max_examples=300, deadline=None)
@given(inp=_text, cands=st.lists(_text, min_size=1, max_size=8))
def test_batch_kernel_matches_oracle_jaro(inp, cands):
    model = build_model(cands)
    idx, sc = score(model, inp, weight=None, threshold=None)
    got = {}
    for i, s in zip(idx, sc):
        got.setdefault(int(i), float(s))
    for j, cand in enumerate(cands):
        exp = jaro(inp, cand)
        assert j in got, (inp, cand)  # min unset → everything emitted
        assert abs(got[j] - exp) < 1e-4, (inp, cand, got[j], exp)


@settings(max_examples=300, deadline=None)
@given(a=_text, b=_text, weight=st.sampled_from([None, 0.1, 0.2]))
def test_scalar_pair_matches_batch(a, b, weight):
    thr = None if weight is None else 0.7
    got = score_pair(a, b, weight=weight, threshold=thr)
    res = score(build_model([b]), a, weight=weight, threshold=thr)
    exp = float(res[1][0]) if len(res[0]) else 0.0
    assert got == exp, (a, b, weight, got, exp)


@settings(max_examples=200, deadline=None)
@given(a=_text, b=_text)
def test_score_bounds_symmetry_identity(a, b):
    s_ab = score_pair(a, b, weight=None, threshold=None)
    s_ba = score_pair(b, a, weight=None, threshold=None)
    assert 0.0 <= s_ab <= 1.0
    assert abs(s_ab - s_ba) < 1e-6  # jaro is symmetric
    if a:
        assert score_pair(a, a, weight=None, threshold=None) == 1.0
    # winkler bonus never decreases the score
    jw = score_pair(a, b, weight=0.1, threshold=0.0)
    assert jw >= s_ab - 1e-7


@settings(max_examples=150, deadline=None)
@given(
    inp=_text,
    cands=st.lists(_text, min_size=1, max_size=10),
    k=st.integers(min_value=1, max_value=12),
    min_score=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_nbest_and_min_score_invariants(inp, cands, k, min_score):
    model = build_model(cands)
    idx, sc = score(model, inp, min_score=min_score, n_best=k, weight=None, threshold=None)
    assert len(idx) <= k
    assert all(np.float32(s) >= np.float32(min_score) for s in sc) or min_score == 0.0
    # scores sorted desc with candidate-index tiebreak
    for i in range(len(sc) - 1):
        assert sc[i] > sc[i + 1] or (sc[i] == sc[i + 1] and idx[i] < idx[i + 1])
