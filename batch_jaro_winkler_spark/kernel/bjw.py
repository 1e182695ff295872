"""Batched Jaro / Jaro-Winkler scoring kernel (numpy, columnar).

A from-scratch, vectorized reimplementation of the *semantics* of the C99
reference ``dbousque/batch_jaro_winkler`` (see SURVEY.md §2): one *input*
string is scored against a pre-compiled batch of *candidate* strings that
share a single character-position inverted index, with per-candidate
``min_score`` pruning, a global ``min_score`` override, the Winkler prefix
bonus, and deterministic ``n_best`` top-k.

Semantics anchored to the reference (file:line cites into /root/reference):

* match window  = ``max(|input|,|cand|)//2``, then ``0 if <=1 else -1``
  (``lib/batch_jaro_winkler_runtime.h:311-312``);
* greedy first-unmatched-occurrence-in-window matching with a per
  (char,candidate) resume cursor (``runtime.h:323-371``);
* transpositions from the two flag sequences, halved (``runtime.h:373-398,446``);
* float32 score ``(m/|i| + m/|c| + (m-t)/m)/3`` (``runtime.h:448-452``);
* Winkler bonus iff ``weight >= 0 and score >= threshold``; prefix capped at
  ``min(4, |i|, |c|)``; ``score += l*w*(1-score)`` (``runtime.h:454-459``);
* zero-match candidates are emitted with score 0.0 iff their effective
  min_score <= 0 (``runtime.h:429-438``);
* global ``min_score`` (when set) *overrides* per-candidate min_scores;
  when unset, per-candidate min_scores apply (``runtime.h:272-274,422-424``;
  ``lib/batch_jaro_winkler.c:751``);
* required-match-count pruning derived from min_score
  (``runtime.h:288-309``, explained in reference README.md:142-160);
* ``n_best``: score-desc top-k via the reference's adaptive min_score
  ladder (``lib/batch_jaro_winkler.c:788-816``): optimistic synthetic
  thresholds (1-k/N capped 0.8, then -0.2) before the exact fallback —
  identical observable results, large constant-factor win.  Ties are
  nondeterministic in the reference (unstable qsort); we define
  (score desc, candidate index asc).

Deliberate divergences (documented, observable-behavior preserving):

* no dictionary compression of the alphabet (``c:529-610``) — raw uint32
  code points index directly; compression is a cache optimization in C,
  not a semantic;
* no input-length clamp at 256/65536 (``c:746-750``) — unreachable from the
  reference's own high-level API for UTF-32 data; callers cap document
  length via ``max_len`` instead;
* results keep original candidate order (the reference re-sorts candidates
  by (length, lex) at compile, ``c:170-171``; its own tests re-sort results,
  so the order is not part of the contract).

Everything here is pure numpy on one Arrow/pandas batch: this module is
what runs inside ``applyInPandas`` / ``mapInArrow`` on executors.  It never
touches Spark.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

__all__ = [
    "CandidateModel",
    "build_model",
    "score",
    "score_pair",
    "score_strings",
]


def _encode_utf32(strings) -> tuple[np.ndarray, np.ndarray]:
    """Encode a sequence of python strings into (codes, offsets).

    ``codes``  — concatenated uint32 code points (1 char = 1 code point,
    matching the reference Python binding's UTF-32-LE convention,
    ``python/cbatch_jaro_winkler.pyx:57,161``).
    ``offsets`` — int64 prefix offsets, len = n+1.
    """
    n = len(strings)
    lengths = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    codes = np.empty(total, dtype=np.uint32)
    if total:
        buf = "".join(strings).encode("utf-32-le")
        codes[:] = np.frombuffer(buf, dtype="<u4")
    return codes, offsets


@dataclass
class CandidateModel:
    """The 'exportable model' analog: an immutable, pickle-able columnar
    inverted character-position index over a candidate batch
    (reference: ``bjw_build_exportable_model``, ``lib/batch_jaro_winkler.c:513-627``).

    Layout (all numpy arrays):
      codes/offsets      — concatenated candidate code points + prefix offsets
      lengths            — per-candidate length in characters
      group_char         — distinct (char, cand) group keys, sorted by (char, cand)
      group_cand
      group_start/end    — slice into pos_flat per group
      pos_flat           — occurrence positions, ascending within each group
      first4             — (n,4) first-4 code points, 0-padded (winkler prefix)
      min_scores         — float32 per-candidate min_score, or None
    """

    codes: np.ndarray
    offsets: np.ndarray
    lengths: np.ndarray
    group_char: np.ndarray
    group_cand: np.ndarray
    group_start: np.ndarray
    group_end: np.ndarray
    pos_flat: np.ndarray
    first4: np.ndarray
    min_scores: np.ndarray | None
    # candidates are stored in LENGTH order (like the reference's compile
    # sort, c:170-171): internal id = length rank, orig_ids maps back.
    # Length-ordered ids make the min_score length-band a contiguous id
    # range, so every per-char index step slices instead of masking.
    orig_ids: np.ndarray | None = None

    @property
    def nb_candidates(self) -> int:
        return len(self.lengths)


def build_model(candidates, min_scores=None) -> CandidateModel:
    """Compile a candidate batch into a shared inverted index.

    ``candidates`` — sequence of str.
    ``min_scores`` — optional sequence of float, all-or-none like the
    reference (``python/cbatch_jaro_winkler.pyx:29-31``).
    """
    candidates = list(candidates)
    if min_scores is not None:
        min_scores = np.asarray(min_scores, dtype=np.float32)
        if len(min_scores) != len(candidates):
            raise ValueError("min_scores must have one entry per candidate")
        if len(min_scores) and (min_scores.min() < 0.0 or min_scores.max() > 1.0):
            raise ValueError("min_score must be >= 0.0 and <= 1.0")
    # compile-time length sort (reference c:170-171): internal ids are
    # length ranks; orig_ids maps results back to caller order
    orig_ids = np.argsort(
        np.fromiter((len(s) for s in candidates), dtype=np.int64, count=len(candidates)),
        kind="stable",
    )
    candidates = [candidates[int(i)] for i in orig_ids]
    if min_scores is not None:
        min_scores = min_scores[orig_ids]
    codes, offsets = _encode_utf32(candidates)
    n = len(candidates)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)

    total = len(codes)
    if total:
        # candidate id and in-candidate position for every character
        cand_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        pos_of = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        # sort occurrences by (char, cand, pos) — the columnar analog of the
        # reference's packed per-(char,cand) occurrence stream (c:373-394)
        order = np.lexsort((pos_of, cand_of, codes))
        s_char = codes[order]
        s_cand = cand_of[order].astype(np.int32)
        s_pos = pos_of[order].astype(np.int32)
        # group boundaries where (char, cand) changes
        newgrp = np.empty(total, dtype=bool)
        newgrp[0] = True
        np.not_equal(s_char[1:], s_char[:-1], out=newgrp[1:])
        newgrp[1:] |= s_cand[1:] != s_cand[:-1]
        group_start = np.flatnonzero(newgrp).astype(np.int64)
        group_end = np.append(group_start[1:], total).astype(np.int64)
        if total < 2**31:  # 4x less memory traffic in the hot loop
            group_start = group_start.astype(np.int32)
            group_end = group_end.astype(np.int32)
        group_char = s_char[group_start]
        group_cand = s_cand[group_start]
        pos_flat = s_pos
    else:
        group_char = np.empty(0, dtype=np.uint32)
        group_cand = np.empty(0, dtype=np.int32)
        group_start = np.empty(0, dtype=np.int32)
        group_end = np.empty(0, dtype=np.int32)
        pos_flat = np.empty(0, dtype=np.int32)

    first4 = np.zeros((n, 4), dtype=np.uint32)
    for k in range(4):
        has = lengths > k
        first4[has, k] = codes[offsets[:-1][has] + k]

    return CandidateModel(
        codes=codes,
        offsets=offsets,
        lengths=lengths,
        group_char=group_char,
        group_cand=group_cand,
        group_start=group_start,
        group_end=group_end,
        pos_flat=pos_flat,
        first4=first4,
        min_scores=min_scores,
        orig_ids=orig_ids,
    )


def _required_matches(
    cand_len: np.ndarray, input_len: int, eff_min: np.ndarray, weight: float
) -> np.ndarray:
    """Per-candidate minimum match count implied by min_score.

    Closed forms from the reference (``runtime.h:288-309``): solving the Jaro
    formula for m with t=0 (best case); the Winkler variant assumes all 4
    prefix characters match (maximum possible bonus), so the bound is
    conservative — it never prunes a candidate that could pass.
    Computed in float32 to mirror the reference's arithmetic.
    """
    L = cand_len.astype(np.float32)
    i = np.float32(input_len)
    s = eff_min.astype(np.float32)
    if weight < 0.0:
        with np.errstate(divide="ignore", invalid="ignore"):
            req = (np.float32(3.0) * s * L * i - L * i) / (L + i)
        req = np.where(L + i == 0, np.float32(0.0), req)
    else:
        w = np.float32(weight)
        bottom = -(np.float32(4.0) * L * w) - (np.float32(4.0) * i * w) + L + i
        with np.errstate(divide="ignore", invalid="ignore"):
            req = (
                np.float32(3.0) * s * L * i
                - np.float32(8.0) * w * L * i
                - L * i
            ) / bottom
        req = np.where(bottom == 0, np.maximum(L, i) + np.float32(1.0), req)
    req = np.maximum(req, np.float32(0.0))
    out = np.ceil(req).astype(np.int64)
    # empty candidates: required 0 (runtime.h:278-287)
    out[cand_len == 0] = 0
    return out


def _length_band(model: CandidateModel, input_len: int, s_floor: float, w: float):
    """Contiguous internal-id range [lo, hi) of candidates whose length can
    reach ``s_floor``: jaro <= (m/li + m/lc + 1)/3 with m = min(li, lc), so
    lc must lie in [li*(3s-2), li/(3s-2)] when s > 2/3 (with the max
    possible winkler bonus backed out first).  Internal ids are length
    ranks, so the band is a slice — the DataFrame-level corollary is the
    length prefilter in verify_pairs (SURVEY.md R1)."""
    n = model.nb_candidates
    s = float(s_floor)
    if w >= 0.0:
        denom = 1.0 - 4.0 * w
        if denom <= 1e-9:
            return 0, n
        s = (s - 4.0 * w) / denom
    f = 3.0 * s - 2.0
    if f <= 1e-9:
        return 0, n
    f = max(f - 1e-6, 1e-9)  # conservative float margin
    len_lo = int(np.floor(input_len * f))
    len_hi = int(np.ceil(input_len / f))
    lo = int(np.searchsorted(model.lengths, len_lo, side="left"))
    hi = int(np.searchsorted(model.lengths, len_hi, side="right"))
    return lo, hi


def _score_pass(
    model: CandidateModel,
    in_codes_all: np.ndarray,
    input_len: int,
    eff_min: np.ndarray,
    w: float,
    thr: float,
    dtype,
) -> tuple[np.ndarray, np.ndarray]:
    """One full scoring pass (internal candidate ids)."""
    n = model.nb_candidates
    lengths = model.lengths

    # --- pruning bounds (O9) + length band (R1) ---
    required = _required_matches(lengths, input_len, eff_min, w).astype(np.int32)
    search_range = np.maximum(lengths, input_len) // 2
    search_range = np.where(search_range <= 1, 0, search_range - 1).astype(np.int32)
    band_lo, band_hi = _length_band(
        model, input_len, float(eff_min.min()) if n else 0.0, w
    )

    # --- match finding (O10): loop over input chars, vectorized over the
    # char's (char,candidate) occurrence groups, sliced to the band ---
    m = np.zeros(n, dtype=np.int32)
    match_cand: list[np.ndarray] = []
    match_char: list[np.ndarray] = []
    match_pos: list[np.ndarray] = []
    if input_len and len(model.group_char) and band_lo < band_hi:
        prunable = bool(required.max() > 0) if n else False
        cur = model.group_start.copy()
        gchar = model.group_char
        gcand = model.group_cand
        full_band = band_lo == 0 and band_hi == n
        for i in range(input_len):
            ch = in_codes_all[i]
            g0 = np.searchsorted(gchar, ch, side="left")
            g1 = np.searchsorted(gchar, ch, side="right")
            if g0 == g1:
                continue
            if not full_band:
                # group_cand ascending within the char segment: band slice
                g0 = g0 + int(np.searchsorted(gcand[g0:g1], band_lo, side="left"))
                g1 = g0 + int(np.searchsorted(gcand[g0:g1], band_hi, side="left"))
                if g0 == g1:
                    continue
            g = np.arange(g0, g1, dtype=np.int32)
            cands = gcand[g0:g1]
            if prunable:  # early abandon (runtime.h:348-349)
                alive = m[cands] + np.int32(input_len - i) >= required[cands]
                g = g[alive]
                if not len(g):
                    continue
                cands = cands[alive]
            end = model.group_end[g]
            low = i - search_range[cands]
            high = i + search_range[cands]
            # advance resume cursors past dead (below-window) occurrences
            while True:
                c = cur[g]
                adv = (c < end) & (model.pos_flat[np.minimum(c, len(model.pos_flat) - 1)] < low)
                if not adv.any():
                    break
                cur[g[adv]] = c[adv] + 1
            c = cur[g]
            ok = c < end
            pos = model.pos_flat[np.minimum(c, len(model.pos_flat) - 1)]
            hit = ok & (pos <= high)
            if hit.any():
                hg = g[hit]
                hc = cands[hit]
                m[hc] += 1
                cur[hg] += 1
                match_cand.append(hc)
                match_char.append(np.full(len(hc), ch, dtype=np.uint32))
                match_pos.append(pos[hit])

    # --- transpositions (O11) ---
    t = np.zeros(n, dtype=np.int64)
    if match_cand:
        mc = np.concatenate(match_cand)
        mch = np.concatenate(match_char)
        mp = np.concatenate(match_pos)
        # append order is input-position order; stable sort groups by candidate
        by_i = np.argsort(mc, kind="stable")
        by_pos = np.lexsort((mp, mc))
        diff = mch[by_i] != mch[by_pos]
        np.add.at(t, mc[by_i][diff], 1)
        t //= 2

    # --- score (O12) + winkler bonus (O13), reference operation order ---
    passing = m >= required
    matched = passing & (m > 0)
    idx = np.flatnonzero(matched)
    fm = m[idx].astype(dtype)
    fl = lengths[idx].astype(dtype)
    ft = t[idx].astype(dtype)
    sc = (fm / dtype(input_len) + fm / fl + (fm - ft) / fm) / dtype(3.0)
    if w >= 0.0:
        boost = sc >= dtype(thr)
        if boost.any():
            plen = np.minimum(np.minimum(lengths[idx], input_len), 4)
            in4 = np.zeros(4, dtype=np.uint32)
            in4[: min(4, input_len)] = in_codes_all[:4]
            eq = model.first4[idx] == in4[None, :]
            # common prefix length: cumulative AND over the first 4 chars
            run = np.cumprod(eq, axis=1)
            pl = np.minimum(run.sum(axis=1), plen).astype(dtype)
            sc = np.where(
                boost, sc + pl * dtype(w) * (dtype(1.0) - sc), sc
            )
    keep = sc >= eff_min[idx]
    idx = idx[keep]
    sc = sc[keep]

    # --- zero-match emission (runtime.h:429-438) ---
    zm = np.flatnonzero(passing & (m == 0) & (eff_min <= 0.0))
    if len(zm):
        all_idx = np.concatenate([idx, zm])
        all_sc = np.concatenate([sc, np.zeros(len(zm), dtype=dtype)])
        order = np.argsort(all_idx, kind="stable")
        idx, sc = all_idx[order], all_sc[order]
    return idx, sc


def score(
    model: CandidateModel,
    input_str: str,
    *,
    min_score: float | None = None,
    weight: float | None = 0.1,
    threshold: float | None = 0.7,
    n_best: int | None = None,
    dtype=np.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """Score ``input_str`` against every candidate in ``model``.

    Returns ``(candidate_indices, scores)`` in the caller's original
    candidate order (or score-desc, index-asc when ``n_best`` is set) —
    only candidates surviving the min_score / n_best filters.  ``dtype``
    selects the arithmetic width: float32 matches the C reference
    bit-for-bit at its own 1e-4 tolerance; float64 matches external
    double-precision oracles (e.g. DuckDB's ``jaro_winkler_similarity``).

    ``n_best`` uses the reference's adaptive min_score ladder
    (lib/batch_jaro_winkler.c:788-816): optimistic synthetic thresholds
    first (1 - k/N capped at 0.8, then -0.2), falling back to the exact
    min_score — identical observable results, large constant-factor win.

    Argument validation mirrors ``python/cbatch_jaro_winkler.pyx:134-152``.
    """
    if min_score is not None and not 0.0 <= min_score <= 1.0:
        raise ValueError("min_score must be >= 0.0 and <= 1.0")
    if weight is not None and not 0.0 <= weight <= 0.25:
        raise ValueError("weight must be >= 0.0 and <= 0.25")
    if threshold is not None and not 0.0 <= threshold <= 1.0:
        raise ValueError("threshold must be >= 0.0 and <= 1.0")
    if n_best is not None and n_best < 0:
        raise ValueError("n_best_results must be >= 0")
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    if n_best == 0:  # binding-level: 0 means "no results" (pyx:143-144)
        return empty
    n = model.nb_candidates
    if n == 0:
        return empty

    w = -1.0 if weight is None else float(weight)
    thr = -1.0 if threshold is None else float(threshold)

    # --- effective per-candidate min_score (O14 precedence, c:751) ---
    if min_score is None:
        if model.min_scores is not None:
            eff_base = model.min_scores.astype(dtype)
        else:
            eff_base = np.zeros(n, dtype=dtype)
    else:
        eff_base = np.full(n, dtype(min_score))

    in_codes_all, _ = _encode_utf32([input_str])
    input_len = len(in_codes_all)

    if n_best is None:
        idx, sc = _score_pass(model, in_codes_all, input_len, eff_base, w, thr, dtype)
    else:
        k = min(n_best, n)
        # reference ladder (c:788-816): base value -1 when min_score unset
        base_val = -1.0 if min_score is None else float(min_score)
        t0 = min(1.0 - k / n, 0.8)
        t1 = t0 - 0.2
        tries = [t for t in (t0, t1) if t > base_val]
        tries.append(base_val)
        idx = sc = None
        for t_val in tries:
            eff = np.maximum(eff_base, dtype(t_val)) if t_val > 0 else eff_base
            idx, sc = _score_pass(model, in_codes_all, input_len, eff, w, thr, dtype)
            if len(idx) >= k:
                break
        order = np.lexsort((idx, -sc))[: min(k, len(idx))]
        idx, sc = idx[order], sc[order]

    # map internal length-rank ids back to the caller's candidate order
    if model.orig_ids is not None and len(idx):
        idx = model.orig_ids[idx]
        if n_best is None:
            order = np.argsort(idx, kind="stable")
            idx, sc = idx[order], sc[order]
        else:
            # re-apply the deterministic tie-break on ORIGINAL ids
            order = np.lexsort((idx, -sc))
            idx, sc = idx[order], sc[order]
    return idx, sc


def score_pair(a: str, b: str, *, weight=0.1, threshold=0.7, dtype=np.float32) -> float:
    """Single-pair Jaro/Jaro-Winkler with the exact batch-kernel semantics
    (same greedy cursor matching as runtime.h:323-371, same float32 formula
    and Winkler bonus order) but scalar-optimized: for 1:1 pair
    verification the batch kernel's vectorized char loop pays numpy
    per-op overhead on length-1 vectors — this path is ~15x faster there.
    Parity with ``score`` is enforced by tests/test_kernel_behavior.py."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return float(dtype(0.0))
    w0 = -1.0 if weight is None else weight
    if w0 >= 0.0:
        # reference quirk preserved (runtime.h:297-301): when the winkler
        # required-matches denominator is zero (exactly weight == 0.25),
        # required_nb_matches is set unsatisfiably high → no result
        bottom = (
            -(np.float32(4.0) * np.float32(lb) * np.float32(w0))
            - (np.float32(4.0) * np.float32(la) * np.float32(w0))
            + np.float32(lb)
            + np.float32(la)
        )
        if bottom == np.float32(0.0):
            return float(dtype(0.0))
    r = max(la, lb) // 2
    r = 0 if r <= 1 else r - 1
    occ: dict[str, list[int]] = {}
    for j, c in enumerate(b):
        occ.setdefault(c, []).append(j)
    cur: dict[str, int] = {}
    a_chars: list[str] = []      # matched input chars, input order
    b_matches: list[tuple[int, str]] = []  # (pos, char), appended per match
    for i, c in enumerate(a):
        lst = occ.get(c)
        if lst is None:
            continue
        k = cur.get(c, 0)
        n = len(lst)
        lo = i - r
        while k < n and lst[k] < lo:
            k += 1
        if k < n and lst[k] <= i + r:
            a_chars.append(c)
            b_matches.append((lst[k], c))
            k += 1
        cur[c] = k
    m = len(a_chars)
    if m == 0:
        return float(dtype(0.0))
    b_matches.sort()
    t = sum(ca != cb for ca, (_, cb) in zip(a_chars, b_matches)) // 2
    fm = dtype(m)
    sc = (fm / dtype(la) + fm / dtype(lb) + (fm - dtype(t)) / fm) / dtype(3.0)
    w = -1.0 if weight is None else weight
    thr = -1.0 if threshold is None else threshold
    if w >= 0.0 and sc >= dtype(thr):
        plen = min(4, la, lb)
        pl = 0
        while pl < plen and a[pl] == b[pl]:
            pl += 1
        sc = sc + dtype(pl) * dtype(w) * (dtype(1.0) - sc)
    return float(sc)


def score_strings(
    candidates,
    input_str: str,
    *,
    min_scores=None,
    min_score=None,
    weight=0.1,
    threshold=0.7,
    n_best=None,
    dtype=np.float32,
):
    """Convenience one-shot: returns [(candidate, score)] like the reference
    Python binding (``python/cbatch_jaro_winkler.pyx:128``)."""
    model = build_model(candidates, min_scores=min_scores)
    idx, sc = score(
        model,
        input_str,
        min_score=min_score,
        weight=weight,
        threshold=threshold,
        n_best=n_best,
        dtype=dtype,
    )
    cand_list = list(candidates)
    return [(cand_list[int(i)], float(s)) for i, s in zip(idx, sc)]
