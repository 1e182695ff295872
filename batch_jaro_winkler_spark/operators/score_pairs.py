"""DataFrame-level batched Jaro-Winkler scoring (the kernel's Spark face).

Two operators:

* :func:`verify_pairs` — score candidate pairs (a, b) from LSH against the
  reference-semantics kernel and keep edges with ``score >= min_score``.
  The scale shape: two sort-merge equi-joins to attach texts (Catalyst
  handles join strategy; AQE handles skew), then a grouped-map keyed on the
  left doc so every group scores *one* input against a shared candidate
  batch — exactly the reference's batch query model (one compiled model,
  many candidates, SURVEY.md §3 entry point 2).
* :func:`score_topk` — rank a small probe set against a large candidate
  corpus: candidates are iterated per Arrow batch with ONE compiled model
  per batch scoring all probes (model reuse amortized across the batch,
  mirroring the reference's compile-once-query-many design), partial top-k
  per batch, final top-k via a window — Spark's TakeOrderedAndProject
  replaces the reference's top-k retry ladder (SURVEY.md O15/R4).

A cheap Catalyst-side length-band prefilter (the DataFrame corollary of the
reference's required-matches pruning, SURVEY.md R1) drops pairs whose
length ratio already bounds the score below min_score, before any Python
runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from batch_jaro_winkler_spark.kernel import build_model, score, score_pair_batch
from batch_jaro_winkler_spark.operators.config import DedupConfig

__all__ = ["verify_pairs", "score_topk"]


def verify_pairs(
    pairs: DataFrame,
    docs_text: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "jw_text",
) -> DataFrame:
    """pairs[a, b] x docs_text[id_col, text_col] → edges[a, b, score]
    with score >= cfg.jw_min_score (reference kernel semantics, float32)."""
    ta = docs_text.select(
        F.col(id_col).alias("a"), F.col(text_col).alias("text_a")
    )
    tb = docs_text.select(
        F.col(id_col).alias("b"), F.col(text_col).alias("text_b")
    )
    joined = pairs.join(ta, "a").join(tb, "b")

    # Catalyst-side length-band prune (R1 corollary): in pure-jaro mode the
    # score is bounded by (lo/la + lo/lb + 1)/3
    if cfg.jw_weight is None:
        la = F.length("text_a").cast("double")
        lb = F.length("text_b").cast("double")
        lo = F.least(la, lb)
        joined = joined.where(
            (la == 0) | (lb == 0) | ((lo / la + lo / lb + 1.0) / 3.0 >= cfg.jw_min_score)
        )

    min_score = cfg.jw_min_score
    weight = cfg.jw_weight
    threshold = cfg.jw_threshold

    # No shuffle: pairs are grouped locally by the left text, one compiled
    # kernel model per local group.  Pairs are independent, so any physical
    # distribution is correct — grouping only amortizes the model.
    # groups below this size use the scalar pair scorer — the vectorized
    # kernel's per-char numpy ops only pay off with enough candidates
    batch_cutover = 8
    # Optimization round 7 (guide §4.5 analog): coalesce the partition's
    # Arrow batches before scoring, so (1) a text_a whose pairs straddle
    # batch boundaries is grouped ONCE, and (2) the distinct-text-pair
    # memo below sees the whole partition.  Bounded so per-task memory
    # stays ~tens of MB at 256-char texts.
    coalesce_rows = 100_000

    def _score_pdf(pdf: pd.DataFrame) -> pd.DataFrame | None:
        # a dedup corpus scores many IDENTICAL (text_a, text_b) pairs
        # (exact-duplicate groups explode into cliques): the score is a
        # pure function of the texts, so score each distinct text pair
        # once and fan results back out — row-identical output
        # null text matches nothing: drop such pairs up front — a NaN key
        # would factorize to code -1 and corrupt the last distinct slot
        valid = pdf["text_a"].notna() & pdf["text_b"].notna()
        if not valid.all():
            pdf = pdf[valid].reset_index(drop=True)
        if not len(pdf):
            return None
        # injective pair key with NO string concatenation (optimization
        # round 7): factorize each text column once (hashes the original
        # strings in place), then factorize the combined int code —
        # (code_a, code_b) identifies the text pair exactly
        ca, _ = pd.factorize(pdf["text_a"], sort=False)
        cb, _ = pd.factorize(pdf["text_b"], sort=False)
        codes, _ = pd.factorize(
            ca.astype(np.int64) * (int(cb.max()) + 1) + cb, sort=False
        )
        n_distinct = int(codes.max()) + 1 if len(codes) else 0
        first = np.zeros(n_distinct, dtype=np.int64)
        first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1, dtype=np.int64)
        distinct = pdf.iloc[first].reset_index(drop=True)
        # kernel-side min_score pruning stays on: non-survivors keep the
        # below-threshold sentinel and are filtered with their clones
        ds = np.full(n_distinct, -1.0, dtype=np.float32)
        # groups below the cutover go through the vectorized PAIRWISE
        # kernel in ONE call (optimization round 7): no per-group pandas
        # iteration, no per-pair interpreter loop.  Groups at/above the
        # cutover amortize a compiled model + kernel-side min_score
        # pruning instead.
        gsz = distinct.groupby("text_a", sort=False)["text_b"].transform("size")
        small = (gsz < batch_cutover).to_numpy()
        if small.any():
            spos = np.flatnonzero(small)
            ds[spos] = score_pair_batch(
                distinct["text_a"].iloc[spos].tolist(),
                distinct["text_b"].iloc[spos].tolist(),
                weight=weight,
                threshold=threshold,
            )
        if not small.all():
            for inp, grp in distinct[~small].groupby("text_a", sort=False):
                gpos = grp.index.to_numpy(np.int64)  # positions in `distinct`
                model = build_model(grp["text_b"].tolist())
                idx, sc = score(
                    model, inp, min_score=min_score, weight=weight, threshold=threshold
                )
                if len(idx):
                    ds[gpos[np.asarray(idx, dtype=np.int64)]] = sc
        full = ds[codes]
        keep = full >= np.float32(min_score)
        if not keep.any():
            return None
        sel = np.flatnonzero(keep)
        return pd.DataFrame(
            {
                "a": pdf["a"].to_numpy(np.int64)[sel],
                "b": pdf["b"].to_numpy(np.int64)[sel],
                "score": full[sel],
            }
        )

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: list[pd.DataFrame] = []
        n_pending = 0
        for pdf in batches:
            pending.append(pdf)
            n_pending += len(pdf)
            if n_pending >= coalesce_rows:
                out = _score_pdf(
                    pending[0] if len(pending) == 1 else
                    pd.concat(pending, ignore_index=True)
                )
                if out is not None:
                    yield out
                pending, n_pending = [], 0
        if pending:
            out = _score_pdf(
                pending[0] if len(pending) == 1 else
                pd.concat(pending, ignore_index=True)
            )
            if out is not None:
                yield out

    return joined.select("a", "b", "text_a", "text_b").mapInPandas(
        score_batches, schema="a long, b long, score float"
    )


def score_topk(
    probes: DataFrame,
    candidates: DataFrame,
    k: int | None,
    *,
    min_score: float | None = None,
    weight: float | None = 0.1,
    threshold: float | None = 0.7,
    probe_id: str = "probe_id",
    probe_text: str = "probe_text",
    cand_id: str = "cand_id",
    cand_text: str = "cand_text",
    dtype=np.float32,
    max_probes: int = 100_000,
    cand_transform=None,
) -> DataFrame:
    """Per-probe top-k over a candidate corpus.

    The probe set (small) is broadcast-joined onto every candidate
    partition; each Arrow batch compiles ONE candidate model and scores all
    probes against it (per-batch partial top-k), then a window takes the
    global top-k per probe.  Deterministic tie-break (score desc, cand_id
    asc) per SURVEY.md O15.

    The probe frame is collected to the driver and broadcast with the
    closure — correct only for genuinely small probe sets, so the size is
    guarded by ``max_probes`` (error, not silent collect-the-world).  A
    probe set too large to broadcast is a pair-scoring problem: route it
    through :func:`verify_pairs` on LSH candidates instead.

    ``k=None`` — "all matches" mode (optimization round 7): emit every
    candidate passing ``min_score`` with NO ranking.  Callers that only
    want the thresholded pair relation (jw_topk's k=500000, jw_pairs)
    previously paid a full window sort of every scored row for a rank
    filter that could never drop anything; with ``k=None`` the kernel
    skips the n_best ladder (plain scan at min_score — same scores) and
    the window exchange+sort disappears from the plan.

    ``cand_transform`` — optional pandas ``Series -> Series`` applied to
    the candidate text inside the scoring pass (optimization round 7):
    callers whose candidate text is a *derived* expression (e.g. a
    normalized prefix) can ship the raw column and fuse the derivation
    into the Arrow batch, where CPython regex is ~40x faster than the
    java.util.regex projection the JVM would run (guide §4).  The
    transform must be byte-identical to the JVM expression it replaces —
    callers are responsible for that equivalence (the normalize twins in
    functions.text are the proven pair)."""
    # one job: the guard reads at most max_probes+1 rows of the same
    # collect the happy path needs anyway (no separate count over the
    # probe lineage)
    rows = probes.select(probe_id, probe_text).limit(max_probes + 1).collect()
    if len(rows) > max_probes:
        raise ValueError(
            f"score_topk probe set exceeds max_probes={max_probes}; "
            "collecting it to the driver would not scale — use "
            "verify_pairs over LSH candidate pairs for large probe sets"
        )
    probe_rows = [(r[0], r[1]) for r in rows]
    # compile-once-query-many wants LARGE candidate batches: coalesce the
    # partition's Arrow batches before building the shared model, so each
    # partition compiles ~one model regardless of arrow batch sizing
    coalesce_rows = 100_000

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: list[pd.DataFrame] = []
        n_pending = 0

        def flush():
            pdf = pending[0] if len(pending) == 1 else pd.concat(pending)
            ctext = pdf[cand_text]
            if cand_transform is not None:
                ctext = cand_transform(ctext)
            model = build_model(ctext.tolist())
            out_p, out_c, out_s = [], [], []
            for pid, ptext in probe_rows:
                idx, sc = score(
                    model,
                    ptext,
                    min_score=min_score,
                    weight=weight,
                    threshold=threshold,
                    n_best=k,
                    dtype=dtype,
                )
                out_p.extend([pid] * len(idx))
                out_c.extend(pdf[cand_id].iloc[np.asarray(idx, dtype=np.int64)])
                out_s.extend(sc.astype(np.float64))
            return pd.DataFrame(
                {"probe_id": out_p, "cand_id": out_c, "score": out_s}
            )

        for pdf in batches:
            pending.append(pdf)
            n_pending += len(pdf)
            if n_pending >= coalesce_rows:
                yield flush()
                pending, n_pending = [], 0
        if pending:
            yield flush()

    partial = candidates.select(cand_id, cand_text).mapInPandas(
        per_batch, schema="probe_id long, cand_id long, score double"
    )
    if k is None:
        return partial
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("score"), F.asc("cand_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )
