"""Reference-shaped public API (semantic mirror of the 6-function surface in
/root/reference/python/cbatch_jaro_winkler.pyx — see SURVEY.md §2.3).

The reference's flow is: compile candidates once into an immutable
*exportable model* (bytes, storable anywhere), instantiate a *runtime model*
per process/thread, then run many queries against it.  Here the exportable
model is a versioned plain-data layout over the
:class:`~batch_jaro_winkler_spark.kernel.CandidateModel` numpy buffers
(kernel/serialize.py — mirroring the reference's own plain binary model
layout, lib/batch_jaro_winkler.c:460-486; a model blob loaded from shared
storage must never be able to execute code, so pickle is NOT accepted
here), the runtime model is the validated parsed object, and queries are
the vectorized kernel.  ``nb_runtime_threads`` is accepted for signature
compatibility; parallelism in this engine comes from Spark partitions
(SURVEY.md O16), not in-process threads.
"""

from __future__ import annotations

from batch_jaro_winkler_spark.kernel import CandidateModel, build_model, score
from batch_jaro_winkler_spark.kernel.serialize import (
    model_from_bytes,
    model_to_bytes,
)

__all__ = [
    "build_exportable_model",
    "build_exportable_model_bytes",
    "build_runtime_model",
    "jaro_winkler_distance",
    "jaro_winkler_distance_bytes",
    "jaro_distance",
    "jaro_distance_bytes",
]


def _split_candidates(candidates):
    """Accept the reference's two input shapes (pyx:29-31): ['a', 'b'] or
    [{'candidate': ..., 'min_score': ...}] (min_score all-or-none)."""
    candidates = list(candidates)
    if candidates and isinstance(candidates[0], dict):
        if not all(isinstance(c, dict) and "min_score" in c for c in candidates):
            raise ValueError("min_score must be provided for all candidates or none")
        return [c["candidate"] for c in candidates], [
            c["min_score"] for c in candidates
        ]
    if any(isinstance(c, dict) for c in candidates):
        raise ValueError("min_score must be provided for all candidates or none")
    return candidates, None


def build_exportable_model(candidates, nb_runtime_threads: int = 1) -> bytes:
    """Compile candidates to an immutable bytes blob (storable in RAM, disk,
    S3, or a BinaryType column — reference README.md:85)."""
    return build_exportable_model_bytes(0, candidates, nb_runtime_threads)


def build_exportable_model_bytes(
    char_width: int, candidates, nb_runtime_threads: int = 1
) -> bytes:
    """The reference's encoded-input shape (pyx:32-77): candidates are
    byte strings of fixed-width little-endian code units; lengths in chars
    = bytes // char_width (UTF-16 surrogate halves count separately —
    the library never decodes).  ``char_width = 0`` means un-encoded str
    candidates (the plain build_exportable_model path)."""
    if nb_runtime_threads < 1:
        raise ValueError("nb_runtime_threads must be > 0")
    if char_width not in (0, 1, 2, 4):
        raise ValueError("char_width must be 1, 2 or 4")
    cands, mins = _split_candidates(candidates)
    model = build_model(
        cands, min_scores=mins, char_width=char_width or None
    )
    return model_to_bytes(model)


def build_runtime_model(exportable_model: bytes) -> CandidateModel:
    """Parse + validate a plain-data exportable model blob.  Rejects
    non-conforming bytes (including pickles) with ValueError — the blob is
    attacker-shaped by design (stored in RAM/disk/DB/S3, reference
    README.md:85), so it must never reach a code-executing loader."""
    return model_from_bytes(exportable_model)


_UNIT_OUT_DTYPE = {1: "<u1", 2: "<u2", 4: "<u4"}


def _distance(
    runtime_model, inp, min_score, weight, threshold, n_best_results,
    bytes_out: bool = False,
):
    import numpy as np

    idx, sc = score(
        runtime_model,
        inp,
        min_score=min_score,
        weight=weight,
        threshold=threshold,
        n_best=n_best_results,
    )
    # score() returns ORIGINAL candidate ids; the model's buffers are in
    # internal (length-sorted) order — map back before decoding
    if runtime_model.orig_ids is not None:
        inv = np.empty(len(runtime_model.orig_ids), dtype=np.int64)
        inv[runtime_model.orig_ids] = np.arange(len(runtime_model.orig_ids))
    else:
        inv = None
    off, codes = runtime_model.offsets, runtime_model.codes
    out = []
    for i, s in zip(idx, sc):
        j = int(inv[int(i)]) if inv is not None else int(i)
        units = codes[off[j] : off[j + 1]]
        if bytes_out:
            # re-encode to the model's original unit width (pyx:120-127):
            # units round-trip exactly (width-1/2 values fit their width)
            cand = units.astype(
                _UNIT_OUT_DTYPE[runtime_model.char_width]
            ).tobytes()
        else:
            cand = units.tobytes().decode("utf-32-le")
        out.append((cand, float(s)))
    return out


def jaro_winkler_distance(
    runtime_model: CandidateModel,
    inp: str,
    min_score=None,
    weight=0.1,
    threshold=0.7,
    n_best_results=None,
):
    """[(candidate, score)] — defaults mirror cbatch_jaro_winkler.pyx:134."""
    return _distance(runtime_model, inp, min_score, weight, threshold, n_best_results)


def jaro_distance(runtime_model: CandidateModel, inp: str, min_score=None, n_best_results=None):
    """Pure Jaro: weight/threshold unset (pyx:186-190)."""
    return _distance(runtime_model, inp, min_score, None, None, n_best_results)


def _decode_encoded_input(char_width: int, runtime_model, inp):
    """``char_width = 0`` is the un-encoded str path (pyx:154-156: the
    reference treats 0 as "input is a str", internally UCS4).  Non-zero
    widths must match the width the model was compiled with — a mismatch
    would silently mis-decode the input while results re-encode at the
    model's width, so it raises instead."""
    from batch_jaro_winkler_spark.kernel import units_from_bytes

    if char_width == 0:
        if not isinstance(inp, str):
            raise ValueError("char_width 0 requires a str input")
        return inp, False
    if char_width not in (1, 2, 4):
        raise ValueError("char_width must be 1, 2 or 4")
    if char_width != runtime_model.char_width:
        raise ValueError(
            f"char_width {char_width} does not match the model's "
            f"char_width {runtime_model.char_width}"
        )
    return units_from_bytes(inp, char_width), True


def jaro_winkler_distance_bytes(
    char_width: int,
    runtime_model: CandidateModel,
    inp,
    min_score=None,
    weight=0.1,
    threshold=0.7,
    n_best_results=None,
):
    """Encoded-input twin of jaro_winkler_distance (pyx:134-181): ``inp``
    is bytes of fixed-width code units, results return candidates as the
    original encoded bytes."""
    units, encoded = _decode_encoded_input(char_width, runtime_model, inp)
    return _distance(
        runtime_model, units, min_score, weight, threshold, n_best_results,
        bytes_out=encoded,
    )


def jaro_distance_bytes(
    char_width: int,
    runtime_model: CandidateModel,
    inp,
    min_score=None,
    n_best_results=None,
):
    """Pure-Jaro encoded twin (pyx:183-184)."""
    units, encoded = _decode_encoded_input(char_width, runtime_model, inp)
    return _distance(
        runtime_model, units, min_score, None, None, n_best_results,
        bytes_out=encoded,
    )
