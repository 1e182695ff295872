"""Substring dedup: winnowed rolling-hash fingerprints + verification.

Catches verbatim long-substring duplication that shingle-MinHash misses
(SURVEY.md §7 step 8): a document embedding a >=200-char copy of another
document shares their character-level fingerprints even when the
surrounding text makes whole-doc similarity low.

Design (winnowing, Schleimer/Wilkerson/Aiken SIGMOD'03 — PAPERS.md):

* per doc, Rabin-Karp rolling hashes of every ``gram_chars``-char window of
  the normalized text — O(n) via the rolling recurrence, vectorized in
  numpy inside ``mapInPandas`` (no shuffle);
* winnowing picks the minimum hash in every ``winnow_window``-wide window
  of positions → fingerprint density 2/(w+1), position-robust;
* shuffle only (fingerprint, doc_id, pos): groupBy fingerprint → candidate
  pairs (same capped policy as LSH);
* verify: join texts, extend the seed match around the fingerprinted
  offsets in pandas, keep pairs whose true common substring reaches
  ``min_substring_chars``.

This replaces a distributed suffix array: equivalent detection power for
fixed-length-seed verbatim duplication at a fraction of the shuffle cost
(a suffix array would shuffle every suffix; winnowing ships 2/(w+1) of the
positions).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from batch_jaro_winkler_spark.functions.text import normalize_text
from batch_jaro_winkler_spark.operators.config import DedupConfig

__all__ = ["fingerprints", "fingerprint_pairs", "substring_edges"]

_BASE = np.uint64(1000003)
_OFFS = np.uint64(1469598103934665603)


def _rolling_hashes(codes: np.ndarray, k: int) -> np.ndarray:
    """Rabin-Karp hashes of every k-window over uint32 code points, uint64
    wraparound arithmetic: h[i] = sum_{j<k} c[i+j] * BASE^(k-1-j)."""
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    c = codes.astype(np.uint64)
    # Fully vectorized (no O(n) python scan): since BASE is odd it is
    # invertible mod 2^64, so with weighted[j] = c[j] * BASE^(-j) and
    # csum = cumsum(weighted), every window hash is
    #   h[i] = BASE^(i+k-1) * (csum[i+k-1] - csum[i-1])
    #        = sum_{j<k} c[i+j] * BASE^(k-1-j)   (all arithmetic mod 2^64)
    with np.errstate(over="ignore"):
        powers = np.empty(n, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, _BASE, dtype=np.uint64), out=powers[1:])
        binv = np.uint64(pow(int(_BASE), -1, 1 << 64))
        binv_pows = np.empty(n, dtype=np.uint64)
        binv_pows[0] = np.uint64(1)
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, binv, dtype=np.uint64), out=binv_pows[1:])
        csum = np.cumsum(c * binv_pows, dtype=np.uint64)
        window_sums = csum[k - 1 :].copy()
        window_sums[1:] -= csum[: n - k]
        h = window_sums * powers[k - 1 : n]
    return h


def fingerprints(
    docs: DataFrame, cfg: DedupConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, fp, pos): winnowed fingerprints with char offsets."""
    k = cfg.gram_chars
    w = cfg.winnow_window
    prepped = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
    )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_fp, out_pos = [], [], []
            for doc_id, norm in zip(pdf["doc_id"], pdf["norm"]):
                codes = np.frombuffer(norm.encode("utf-32-le"), dtype="<u4")
                h = _rolling_hashes(codes, k)
                if len(h) == 0:
                    continue
                if len(h) <= w:
                    sel = np.array([int(np.argmin(h))])
                else:
                    # winnowing: min position of each w-window, deduped
                    win = np.lib.stride_tricks.sliding_window_view(h, w)
                    sel = np.unique(win.argmin(axis=1) + np.arange(len(h) - w + 1))
                out_id.append(np.full(len(sel), doc_id, dtype=np.int64))
                out_fp.append(h[sel].view(np.int64))
                out_pos.append(sel.astype(np.int32))
            if out_id:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(out_id),
                        "fp": np.concatenate(out_fp),
                        "pos": np.concatenate(out_pos),
                    }
                )

    return prepped.mapInPandas(fp, schema="doc_id long, fp long, pos int")


def fingerprint_pairs(fps: DataFrame, cfg: DedupConfig) -> DataFrame:
    """fingerprints → candidate (a, b, pos_a, pos_b): docs sharing a
    fingerprint, capped per bucket like LSH pair-gen."""
    cap = cfg.allpairs_cap

    def gen(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"a": [], "b": [], "pos_a": [], "pos_b": []}
            ).astype({"a": np.int64, "b": np.int64, "pos_a": np.int32, "pos_b": np.int32})
        if n > cap:  # hot fingerprint (boilerplate): chain neighbors
            ids = pdf["doc_id"].to_numpy(np.int64)
            pos = pdf["pos"].to_numpy(np.int32)
            return pd.DataFrame(
                {"a": ids[:-1], "b": ids[1:], "pos_a": pos[:-1], "pos_b": pos[1:]}
            )
        ids = pdf["doc_id"].to_numpy(np.int64)
        pos = pdf["pos"].to_numpy(np.int32)
        ai, bi = np.triu_indices(n, k=1)
        return pd.DataFrame(
            {"a": ids[ai], "b": ids[bi], "pos_a": pos[ai], "pos_b": pos[bi]}
        )

    pairs = fps.groupBy("fp").applyInPandas(
        gen, schema="a long, b long, pos_a int, pos_b int"
    )
    # keep one seed offset pair per (a,b) — the earliest
    return pairs.groupBy("a", "b").agg(
        F.min(F.struct("pos_a", "pos_b")).alias("seed")
    ).select("a", "b", F.col("seed.pos_a"), F.col("seed.pos_b"))


def substring_edges(
    docs: DataFrame, cfg: DedupConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """End-to-end substring stage → verified edges (a, b, match_len) where a
    verbatim common substring of >= cfg.min_substring_chars normalized chars
    exists around a shared fingerprint."""
    fps = fingerprints(docs, cfg, id_col, text_col)
    cand = fingerprint_pairs(fps, cfg)
    norm = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
    )
    ta = norm.select(F.col("doc_id").alias("a"), F.col("norm").alias("norm_a"))
    tb = norm.select(F.col("doc_id").alias("b"), F.col("norm").alias("norm_b"))
    joined = cand.join(ta, "a").join(tb, "b")
    k = cfg.gram_chars
    min_len = cfg.min_substring_chars

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"a": [], "b": [], "match_len": []}
            for r in pdf.itertuples(index=False):
                sa, sb = r.norm_a, r.norm_b
                pa, pb = int(r.pos_a), int(r.pos_b)
                if sa[pa : pa + k] != sb[pb : pb + k]:
                    continue  # hash collision
                lo = 0
                while pa - lo > 0 and pb - lo > 0 and sa[pa - lo - 1] == sb[pb - lo - 1]:
                    lo += 1
                hi = k
                while (
                    pa + hi < len(sa) and pb + hi < len(sb) and sa[pa + hi] == sb[pb + hi]
                ):
                    hi += 1
                total = lo + hi
                if total >= min_len:
                    rows["a"].append(r.a)
                    rows["b"].append(r.b)
                    rows["match_len"].append(total)
            yield pd.DataFrame(rows).astype(
                {"a": np.int64, "b": np.int64, "match_len": np.int32}
            )

    return joined.mapInPandas(verify, schema="a long, b long, match_len int")
