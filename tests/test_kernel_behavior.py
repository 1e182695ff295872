"""Reference behavior vectors, ported from
/root/reference/python/test/test_behavior.py (the 28 golden cases).

The expectations (inputs, candidates, min_scores, n_best, expected
(candidate, score) sets) are the reference's observable contract; the code
exercising them is ours.  Results are candidate-sorted before comparison,
exactly like the reference tests (test_behavior.py:27).
"""

from __future__ import annotations

import numpy as np
import pytest

from batch_jaro_winkler_spark.kernel import build_model, score, score_strings


AS_BYTES = False


@pytest.fixture(autouse=True, params=[False, True], ids=["str", "bytes_utf16"])
def _as_bytes_mode(request):
    """Run the whole behavior suite in BOTH input modes, mirroring the
    reference's ``as_bytes`` parameterization (test_behavior.py:5-29):
    str / UTF-32 code points vs UTF-16-LE bytes with char_width=2 through
    the *_bytes API surface."""
    global AS_BYTES
    AS_BYTES = request.param
    yield
    AS_BYTES = False


def run_jaro(candidates, inp, min_score=None, n_best=None):
    """Pure-jaro helper mirroring the reference's run_jaro: weight=None,
    threshold=None (jaro_distance path, cbatch_jaro_winkler.pyx:186-190).
    In bytes mode, candidates/input go through build_exportable_model_bytes
    / jaro_distance_bytes with UTF-16-LE, and result candidates (returned
    as bytes) are decoded back for comparison — the reference's exact
    recipe."""
    if AS_BYTES:
        from batch_jaro_winkler_spark import api

        if candidates and isinstance(candidates[0], dict):
            cands = [
                {
                    "candidate": c["candidate"].encode("utf-16-le"),
                    "min_score": c["min_score"],
                }
                for c in candidates
            ]
        else:
            cands = [c.encode("utf-16-le") for c in candidates]
        rm = api.build_runtime_model(api.build_exportable_model_bytes(2, cands))
        res = api.jaro_distance_bytes(
            2, rm, inp.encode("utf-16-le"), min_score=min_score, n_best_results=n_best
        )
        res = [(c.decode("utf-16-le"), s) for c, s in res]
        res.sort(key=lambda r: r[0])
        return res
    if candidates and isinstance(candidates[0], dict):
        cands = [c["candidate"] for c in candidates]
        mins = [c["min_score"] for c in candidates]
    else:
        cands = list(candidates)
        mins = None
    res = score_strings(
        cands,
        inp,
        min_scores=mins,
        min_score=min_score,
        weight=None,
        threshold=None,
        n_best=n_best,
    )
    res.sort(key=lambda r: r[0])
    return res


CANDS = ["hélloz", "中国", "lolz", "hii"]
EXPECT = [("hii", 0.5), ("hélloz", 1.0), ("lolz", 0.75), ("中国", 0.0)]


def test_no_candidates():
    assert run_jaro([], "hi") == []


def test_no_candidates_empty_input():
    assert run_jaro([], "") == []


def test_one_empty_candidate():
    assert run_jaro([""], "hi") == [("", 0.0)]


def test_one_empty_candidate_and_input():
    assert run_jaro([""], "") == [("", 0.0)]


def test_one_perfect_match():
    assert run_jaro(["hélloz"], "hélloz") == [("hélloz", 1.0)]


def test_multiple_matches():
    assert run_jaro(CANDS, "hélloz") == EXPECT


def test_min_scores_all_ok():
    candidates = [
        {"candidate": "hélloz", "min_score": 0.9},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.7},
        {"candidate": "hii", "min_score": 0.4},
    ]
    assert run_jaro(candidates, "hélloz") == EXPECT


def test_min_scores_all_ok_exact():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.75},
        {"candidate": "hii", "min_score": 0.5},
    ]
    assert run_jaro(candidates, "hélloz") == EXPECT


def test_min_scores_some_filtered():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.500001},
    ]
    assert run_jaro(candidates, "hélloz") == [("hélloz", 1.0), ("中国", 0.0)]


def test_min_scores_all_filtered():
    candidates = [
        {"candidate": "中国", "min_score": 0.000001},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.500001},
    ]
    assert run_jaro(candidates, "hélloz") == []


def test_global_min_score_all_ok():
    assert run_jaro(CANDS, "hélloz", min_score=0.0) == EXPECT


def test_global_min_score_some_filtered():
    assert run_jaro(CANDS, "hélloz", min_score=0.5) == [
        ("hii", 0.5),
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_global_min_score_some_filtered2():
    assert run_jaro(CANDS, "hélloz", min_score=0.500001) == [
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_global_min_score_all_filtered():
    assert run_jaro(["中国", "lolz", "hii"], "hélloz", min_score=0.8) == []


def test_global_min_score_override_min_scores():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.500001},
    ]
    assert run_jaro(candidates, "hélloz", min_score=0.75) == [
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_n_best_results_zero():
    assert run_jaro(CANDS, "hélloz", n_best=0) == []


def test_n_best_results_too_big():
    assert run_jaro(CANDS, "hélloz", n_best=5) == EXPECT


def test_n_best_results_all():
    assert run_jaro(CANDS, "hélloz", n_best=4) == EXPECT


def test_n_best_results_some_filtered():
    assert run_jaro(CANDS, "hélloz", n_best=3) == [
        ("hii", 0.5),
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_n_best_results_some_filtered2():
    assert run_jaro(CANDS, "hélloz", n_best=2) == [
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_n_best_results_respect_min_scores():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.5},
    ]
    assert run_jaro(candidates, "hélloz", n_best=2) == [
        ("hii", 0.5),
        ("hélloz", 1.0),
    ]


def test_n_best_results_respect_min_scores2():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.75},
        {"candidate": "hii", "min_score": 0.5},
    ]
    assert run_jaro(candidates, "hélloz", n_best=2) == [
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_n_best_results_respect_min_score():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.5},
    ]
    assert run_jaro(candidates, "hélloz", min_score=0.75001, n_best=2) == [
        ("hélloz", 1.0)
    ]


def test_n_best_results_respect_min_score2():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.5},
    ]
    assert run_jaro(candidates, "hélloz", min_score=0.75, n_best=2) == [
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_n_best_results_respect_min_score3():
    candidates = [
        {"candidate": "hélloz", "min_score": 1.0},
        {"candidate": "中国", "min_score": 0.0},
        {"candidate": "lolz", "min_score": 0.750001},
        {"candidate": "hii", "min_score": 0.5},
    ]
    assert run_jaro(candidates, "hélloz", min_score=0.0, n_best=2) == [
        ("hélloz", 1.0),
        ("lolz", 0.75),
    ]


def test_long_candidate():
    long_candidate = "b" * (256 * 128)
    normal_candidate = "aaaaaaaaaaa"
    res = run_jaro([normal_candidate, long_candidate], normal_candidate, min_score=0.9)
    assert res == [(normal_candidate, 1.0)]


def test_long_candidate2():
    long_candidate = "b" * (256 * 128)
    normal_candidate = "aaaaaaaaaaa"
    res = run_jaro([normal_candidate, long_candidate], long_candidate, min_score=0.9)
    assert res == [(long_candidate, 1.0)]


# --- winkler-path checks beyond the reference's jaro-only behavior suite ---


def test_winkler_prefix_bonus():
    # jaro('martha','marhta') = 0.944..., prefix 3 → + 3*0.1*(1-j)
    res = score_strings(["marhta"], "martha")
    j = (6 / 6 + 6 / 6 + (6 - 1) / 6) / 3
    expected = j + 3 * 0.1 * (1 - j)
    assert res[0][0] == "marhta"
    assert abs(res[0][1] - expected) < 1e-4


def test_winkler_below_threshold_no_bonus():
    # score below threshold 0.7 → no bonus applied even with shared prefix
    res = score_strings(["abcxyzuvw"], "abcdefghi", threshold=0.99)
    res_plain = score_strings(["abcxyzuvw"], "abcdefghi", weight=None, threshold=None)
    assert abs(res[0][1] - res_plain[0][1]) < 1e-7


def test_model_reuse_across_queries():
    model = build_model(CANDS)
    for _ in range(3):  # cursors/flags must not leak across queries
        idx, sc = score(model, "hélloz", weight=None, threshold=None)
        got = sorted((CANDS[int(i)], float(s)) for i, s in zip(idx, sc))
        assert got == sorted(EXPECT)


def test_float32_dtype():
    _, sc = score(build_model(["lolz"]), "hélloz", weight=None, threshold=None)
    assert sc.dtype == np.float32


def test_score_pair_parity_with_batch_kernel():
    """score_pair must agree with the batch kernel bit-for-bit (float32)."""
    import random

    from batch_jaro_winkler_spark.kernel import score_pair
    from batch_jaro_winkler_spark.fixtures import make_wordlist

    words = make_wordlist(n_ascii=300, n_cjk=50, seed=3)
    rng = random.Random(3)
    cases = [(rng.choice(words), rng.choice(words)) for _ in range(500)]
    cases += [(w, w) for w in words[:20]] + [("", "x"), ("x", ""), ("", "")]
    for weight, threshold in [(0.1, 0.7), (None, None), (0.25, 0.0)]:
        for a, b in cases:
            got = score_pair(a, b, weight=weight, threshold=threshold)
            res = score_strings([b], a, weight=weight, threshold=threshold)
            exp = res[0][1] if res else 0.0
            assert got == exp, (a, b, weight, got, exp)


def test_bytes_char_widths_and_surrogate_units():
    """char_width 1/2/4 all work; UTF-16 astral chars count as TWO units
    (the library never decodes — surrogate halves are chars, exactly like
    the C reference), and result candidates round-trip as original bytes."""
    from batch_jaro_winkler_spark import api
    from batch_jaro_winkler_spark.kernel import build_model

    # width 1: latin-1 bytes
    cands1 = [b"hello", b"help", b"world"]
    rm1 = api.build_runtime_model(api.build_exportable_model_bytes(1, cands1))
    res1 = api.jaro_distance_bytes(1, rm1, b"hello", min_score=0.8)
    assert (b"hello", 1.0) in res1
    assert all(isinstance(c, bytes) for c, _ in res1)

    # width 4: utf-32-le bytes == the str path exactly
    cands4 = [s.encode("utf-32-le") for s in ["hélloz", "lolz"]]
    rm4 = api.build_runtime_model(api.build_exportable_model_bytes(4, cands4))
    res4 = api.jaro_distance_bytes(4, rm4, "hélloz".encode("utf-32-le"))
    by_cand = {c.decode("utf-32-le"): s for c, s in res4}
    assert by_cand["hélloz"] == 1.0 and abs(by_cand["lolz"] - 0.75) < 1e-6

    # surrogate semantics: astral char = 2 UTF-16 units, 1 UTF-32 unit
    astral = "a\U0001F389b"
    m2 = build_model([astral.encode("utf-16-le")], char_width=2)
    m4 = build_model([astral], )
    assert m2.lengths.tolist() == [4]  # a + hi-surrogate + lo-surrogate + b
    assert m4.lengths.tolist() == [3]

    # trailing partial unit is ignored (length = bytes // width)
    m_trunc = build_model([b"abcde"], char_width=2)
    assert m_trunc.lengths.tolist() == [2]

    # invalid widths rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        api.build_exportable_model_bytes(3, [b"x"])
    with _pytest.raises(ValueError):
        api.jaro_distance_bytes(5, rm1, b"x")

    # width mismatch vs the model's compile width rejects instead of
    # silently mis-decoding (results would re-encode at the model width)
    with _pytest.raises(ValueError, match="does not match the model"):
        api.jaro_distance_bytes(2, rm1, b"hi")

    # char_width=0 is the un-encoded str path (pyx:154-156): input is a
    # str and result candidates come back as str, not bytes
    rm_s = api.build_runtime_model(api.build_exportable_model(["hello", "help"]))
    res0 = api.jaro_distance_bytes(0, rm_s, "hello", min_score=0.8)
    assert ("hello", 1.0) in res0
    assert all(isinstance(c, str) for c, _ in res0)
    with _pytest.raises(ValueError):
        api.jaro_distance_bytes(0, rm_s, b"hello")
