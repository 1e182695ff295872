"""Substring dedup: winnowed rolling-hash fingerprints + verification.

Catches verbatim long-substring duplication that shingle-MinHash misses
(SURVEY.md §7 step 8): a document embedding a >=200-char copy of another
document shares their character-level fingerprints even when the
surrounding text makes whole-doc similarity low.

Design (content-defined sampling, the rsync/CDC family; cf. winnowing,
Schleimer/Wilkerson/Aiken SIGMOD'03 — PAPERS.md):

* per doc, Rabin-Karp rolling hashes of every ``gram_chars``-char window of
  the normalized text — O(n) via a fully vectorized modular-inverse
  prefix trick inside ``mapInPandas`` (no shuffle);
* mod-sampling keeps positions with ``hash % fp_mod == 0`` → density
  1/fp_mod, position-robust and content-deterministic (both copies of a
  substring select the same grams); a >=200-char verbatim overlap is
  missed with probability (1-1/fp_mod)^151 ≈ 0.8%;
* shuffle only (fingerprint, doc_id, pos): groupBy fingerprint → candidate
  pairs (same capped two-path policy as LSH);
* verify: broadcast-join bounded text slices around the seed offsets,
  vectorized first-mismatch extension in pandas, keep pairs reaching
  ``min_substring_chars``.

This replaces a distributed suffix array: equivalent detection power for
fixed-length-seed verbatim duplication at a fraction of the shuffle cost
(a suffix array would shuffle every suffix; sampling ships 1/fp_mod of the
positions, and only id+hash+offset — never the text).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from batch_jaro_winkler_spark.functions.text import normalize_pandas
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
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_normalized: bool = False,
) -> DataFrame:
    """→ (doc_id, fp, pos): winnowed fingerprints with char offsets into the
    normalized text."""
    k = cfg.gram_chars
    mask = np.uint64(cfg.fp_mod - 1)
    prepped = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("norm"),
    )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not pre_normalized:
                pdf = pdf.assign(norm=normalize_pandas(pdf["norm"]))
            out_id, out_fp, out_pos = [], [], []
            for doc_id, norm in zip(pdf["doc_id"], pdf["norm"]):
                codes = np.frombuffer(norm.encode("utf-32-le"), dtype="<u4")
                h = _rolling_hashes(codes, k)
                if len(h) == 0:
                    continue
                sel = np.flatnonzero((h & mask) == np.uint64(0))
                if len(sel) == 0:
                    # guarantee >=1 fingerprint per doc (whole-doc dups of
                    # short texts must still collide)
                    sel = np.array([int(np.argmin(h))])
                else:
                    # one row per distinct (fp, doc): earliest occurrence —
                    # keeps the downstream shuffle (fp, doc, pos)-unique
                    _, first = np.unique(h[sel], return_index=True)
                    sel = sel[np.sort(first)]
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
    fingerprint.  Same two-path policy as LSH pair-gen: normal
    fingerprints pair via a JVM self-equi-join; hot fingerprints
    (boilerplate shared by thousands of docs) chain neighbors linearly
    through a grouped-map touching only those few groups."""
    cap = cfg.allpairs_cap
    # fps rows are (fp, doc)-unique by construction, so a fingerprint's
    # member count is a count over a window keyed the same way the rows
    # already shuffle (optimization round 7, guide §2.4 — the same
    # one-exchange rewrite as exact_dup_groups): the previous
    # aggregate+join paid a second pass over the fps relation, and the
    # map-side partial agg bought nothing because (fp, doc)-unique rows
    # barely collapse within a partition.  Singleton fingerprints (the
    # overwhelming majority) are dropped by the filter right after the
    # one exchange.
    w = Window.partitionBy("fp")
    sized = (
        fps.withColumn("n_members", F.count(F.lit(1)).over(w))
        .where(F.col("n_members") >= 2)
        .localCheckpoint(eager=False)
    )

    small = sized.where(F.col("n_members") <= cap)
    left = small.select(
        "fp", F.col("doc_id").alias("a"), F.col("pos").alias("pos_a")
    )
    right = small.select(
        "fp", F.col("doc_id").alias("b"), F.col("pos").alias("pos_b")
    )
    small_pairs = left.join(right, "fp").where(F.col("a") < F.col("b")).select(
        "a", "b", "pos_a", "pos_b"
    )

    hot = sized.where(F.col("n_members") > cap)

    def gen(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(np.int64)
        pos = pdf["pos"].to_numpy(np.int32)
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": [], "b": [], "pos_a": [], "pos_b": []}
            ).astype({"a": np.int64, "b": np.int64, "pos_a": np.int32, "pos_b": np.int32})
        return pd.DataFrame(
            {"a": ids[:-1], "b": ids[1:], "pos_a": pos[:-1], "pos_b": pos[1:]}
        )

    hot_pairs = hot.groupBy("fp").applyInPandas(
        gen, schema="a long, b long, pos_a int, pos_b int"
    )

    pairs = small_pairs.union(hot_pairs)
    # keep one seed offset pair per (a,b) — the earliest
    return pairs.groupBy("a", "b").agg(
        F.min(F.struct("pos_a", "pos_b")).alias("seed")
    ).select("a", "b", F.col("seed.pos_a"), F.col("seed.pos_b"))


def substring_edges(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_normalized: bool = False,
    fps: DataFrame | None = None,
    pair_filter=None,
) -> DataFrame:
    """End-to-end substring stage → verified edges (a, b, match_len) where a
    verbatim common substring of >= cfg.min_substring_chars normalized chars
    exists around a shared fingerprint.

    ``fps`` — optionally reuse a precomputed/persisted fingerprint table
    (columns fp, doc_id, pos) instead of recomputing; ``pair_filter`` —
    optional callable(DataFrame[a,b,pos_a,pos_b]) -> DataFrame applied to
    the candidate pairs before verification (incremental mode restricts to
    pairs touching new docs)."""
    if fps is None:
        fps = fingerprints(docs, cfg, id_col, text_col, pre_normalized)
    cand = fingerprint_pairs(fps, cfg)
    if pair_filter is not None:
        cand = pair_filter(cand)
    k = cfg.gram_chars
    min_len = cfg.min_substring_chars
    # verification decides `common substring >= min_len`, so each side only
    # needs min_len chars of context around its seed offset — ship bounded
    # slices through BROADCAST joins instead of shuffling full documents
    # (at web scale the pair list is millions of rows; the documents are
    # hundreds of TB — never shuffle the big side for a verify)
    cap = min_len + k
    if pre_normalized:
        norm = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("norm"),
        )
    else:
        from collections.abc import Iterator as _It

        raw = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("norm"),
        )

        def _norm(batches):
            for pdf in batches:
                yield pdf.assign(norm=normalize_pandas(pdf["norm"]))

        norm = raw.mapInPandas(_norm, schema="doc_id long, norm string")
    cand = cand.localCheckpoint(eager=False)
    # slice side a: broadcast the (a, pos_a) keys over the documents scan,
    # keep [pos_a - cap, pos_a + cap + k) plus the local seed offset
    start_a = F.greatest(F.col("pos_a") - cap, F.lit(0))
    with_a = (
        norm.join(
            cand.select("a", "pos_a", "b", "pos_b"),
            norm.doc_id == F.col("a"),
        )
        .select(
            "a",
            "b",
            "pos_b",
            F.substring(
                F.col("norm"), start_a + 1, F.lit(2 * cap + k)
            ).alias("slice_a"),
            (F.col("pos_a") - start_a).alias("loc_a"),
        )
    )
    start_b = F.greatest(F.col("pos_b") - cap, F.lit(0))
    joined = (
        norm.join(with_a, norm.doc_id == F.col("b"))
        .select(
            "a",
            "b",
            "slice_a",
            "loc_a",
            F.substring(
                F.col("norm"), start_b + 1, F.lit(2 * cap + k)
            ).alias("slice_b"),
            (F.col("pos_b") - start_b).alias("loc_b"),
        )
    )

    def _extend(sa: np.ndarray, sb: np.ndarray, pa: int, pb: int) -> int:
        """Length of the common substring around the aligned seed at
        (pa, pb) — vectorized first-mismatch search on code-point arrays."""
        back = min(pa, pb)
        if back:
            neq = sa[pa - back : pa][::-1] != sb[pb - back : pb][::-1]
            lo = int(np.argmax(neq)) if neq.any() else back
        else:
            lo = 0
        fwd = min(len(sa) - pa, len(sb) - pb)
        if fwd:
            neq = sa[pa : pa + fwd] != sb[pb : pb + fwd]
            hi = int(np.argmax(neq)) if neq.any() else fwd
        else:
            hi = 0
        return lo + hi

    W = 2 * cap + k

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            loc_a = pdf["loc_a"].to_numpy(np.int64)
            loc_b = pdf["loc_b"].to_numpy(np.int64)
            out_a: list = []
            out_b: list = []
            out_len: list = []
            # common case (seed not clipped by a document start): both
            # seeds sit at column `cap`, so the whole batch verifies as two
            # padded (n, W) code-point matrices — right-padding slice_a
            # with \x00 and slice_b with \x01 makes true-end-of-slice a
            # guaranteed mismatch, which is exactly the _extend boundary
            common = (loc_a == cap) & (loc_b == cap)
            ci = np.flatnonzero(common)
            if len(ci):
                sa = pdf["slice_a"].to_numpy()[ci]
                sb = pdf["slice_b"].to_numpy()[ci]
                A = np.frombuffer(
                    "".join(s.ljust(W, "\x00") for s in sa).encode("utf-32-le"),
                    dtype="<u4",
                ).reshape(len(ci), W)
                B = np.frombuffer(
                    "".join(s.ljust(W, "\x01") for s in sb).encode("utf-32-le"),
                    dtype="<u4",
                ).reshape(len(ci), W)
                eq = A == B
                seed_ok = eq[:, cap : cap + k].all(axis=1)
                left = eq[:, cap - 1 :: -1]
                lo = np.argmin(left, axis=1)
                lo = np.where(left.all(axis=1), cap, lo)
                right = eq[:, cap:]
                hi = np.argmin(right, axis=1)
                hi = np.where(right.all(axis=1), W - cap, hi)
                total = lo + hi
                keep = (total >= min_len) & seed_ok
                if keep.any():
                    sel = ci[keep]
                    out_a.append(pdf["a"].to_numpy(np.int64)[sel])
                    out_b.append(pdf["b"].to_numpy(np.int64)[sel])
                    out_len.append(total[keep].astype(np.int32))
            # rare edge rows (seed within `cap` chars of a doc start):
            # exact scalar extension
            ei = np.flatnonzero(~common)
            if len(ei):
                e_a, e_b, e_len = [], [], []
                sub = pdf.iloc[ei]
                for r in sub.itertuples(index=False):
                    sa1 = np.frombuffer(r.slice_a.encode("utf-32-le"), dtype="<u4")
                    sb1 = np.frombuffer(r.slice_b.encode("utf-32-le"), dtype="<u4")
                    pa, pb = int(r.loc_a), int(r.loc_b)
                    total1 = _extend(sa1, sb1, pa, pb)
                    if total1 >= min_len and np.array_equal(
                        sa1[pa : pa + k], sb1[pb : pb + k]
                    ):
                        e_a.append(r.a)
                        e_b.append(r.b)
                        e_len.append(total1)
                if e_a:
                    out_a.append(np.asarray(e_a, dtype=np.int64))
                    out_b.append(np.asarray(e_b, dtype=np.int64))
                    out_len.append(np.asarray(e_len, dtype=np.int32))
            if out_a:
                yield pd.DataFrame(
                    {
                        "a": np.concatenate(out_a),
                        "b": np.concatenate(out_b),
                        "match_len": np.concatenate(out_len),
                    }
                )
            else:
                yield pd.DataFrame(
                    {"a": [], "b": [], "match_len": []}
                ).astype({"a": np.int64, "b": np.int64, "match_len": np.int32})

    return joined.mapInPandas(verify, schema="a long, b long, match_len int")
