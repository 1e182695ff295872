"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_bruteforce` — exact top-k by cosine, entirely JVM-side
  (``zip_with``/``aggregate`` dot products + window top-k).  The baseline
  and the oracle-checkable path.
* :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH (sign of
  projections → bucket key), candidates only join within a bucket (with
  multi-probe via several independent tables), then exact re-rank.  At 10^12
  rows the brute-force cross join is impossible; hyperplane LSH keeps the
  join selective while the final exact re-rank keeps precision.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from batch_jaro_winkler_spark.functions.vectors import cosine, dot, l2_norm
from batch_jaro_winkler_spark.operators.partitioning import widen_scan

__all__ = [
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "embedding_dup_pairs_lsh",
    "hyperplane_buckets",
    "bucket_key_arrays",
    "ivf_assign",
]


def cosine_topk_bruteforce(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact per-probe top-k: broadcast the (small) probe side across the
    corpus, JVM-side cosine, window top-k with deterministic tie-break."""
    crossed = corpus.join(F.broadcast(probes))
    scored = crossed.select(
        F.col(probe_id),
        F.col(vec_id),
        cosine(F.col(probe_vec), F.col(vec)).alias("cos"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos"), F.asc(vec_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id, vec_id, "cos", "rank")
    )


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Append (table_id, bucket) keys: sign-pattern of ``n_planes`` random
    projections per table.  Vectorized matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    cols = df.columns
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:  # np.stack raises on an empty Arrow batch
                continue
            mat = np.stack(pdf[vec_col].to_numpy())  # (n, dim)
            out = []
            for t in range(n_tables):
                signs = (mat @ planes[t].T) > 0  # (n, n_planes)
                bucket = (signs.astype(np.uint64) * weights).sum(axis=1)
                out.append(
                    pdf.assign(
                        table_id=np.int32(t), **{out_col: bucket.view(np.int64)}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += f", table_id int, {out_col} long"
    return df.mapInPandas(bucketize, schema=schema)


def bucket_key_arrays(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    out_col: str = "buckets",
) -> DataFrame:
    """→ (id_col, out_col array<long> of length ``n_tables``): the same
    per-table hyperplane bucket keys as :func:`hyperplane_buckets` (same
    planes RNG, same per-table ``mat @ planes[t].T`` sign computation —
    bit-identical keys), but WITHOUT the n_tables× row expansion: each
    vector crosses the Arrow boundary once and never leaves Python, so the
    n_tables memberships cost one small array column instead of n_tables
    copies of the embedding (guide §2.3: shuffle keys, not payloads)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:  # np.stack raises on an empty Arrow batch
                continue
            mat = np.stack(pdf[vec_col].to_numpy())  # (n, dim)
            cols = np.empty((len(pdf), n_tables), dtype=np.int64)
            for t in range(n_tables):
                signs = (mat @ planes[t].T) > 0  # (n, n_planes)
                cols[:, t] = (
                    (signs.astype(np.uint64) * weights).sum(axis=1).view(np.int64)
                )
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(cols)})

    # preserve the caller's id type (hyperplane_buckets was type-agnostic)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        keys, schema=f"{id_col} {id_type}, {out_col} array<long>"
    )


def embedding_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    vec_id: str = "vec_id",
    vec: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 8,
    seed: int = 42,
    bucket_cap: int = 100_000,
    target_bucket: int = 64,
) -> DataFrame:
    """→ (a, b, cos) embedding near-dup pairs with cosine >= threshold,
    candidate generation restricted to hyperplane-LSH bucket co-members —
    the scale path that replaces the O(n²) all-pairs cross join.

    Join work per table is Σ bucket_size², so ``n_planes`` sizes the
    buckets (≈ n/2^planes rows each) and ``n_tables`` buys recall:
    per-table collision p = (1 - θ/π)^planes, overall 1-(1-p)^tables.
    ``n_planes=None`` (default) auto-sizes to ⌈log2(n / target_bucket)⌉
    — a fixed plane count tuned at one corpus size grows the per-bucket
    join quadratically at the next (one count job pays for it).  More
    planes trade recall at LOW thresholds for bounded join work; in the
    true near-dup regime (cos ≥ 0.9) recall stays high (see the pytest
    gate).  ``bucket_cap`` drops runaway buckets (duplicate-constant
    embeddings) instead of letting one key quadratically dominate.

    Plan shape (optimization round 7, guide §2.3/§8 "shuffle keys, not
    payloads"): bucket memberships are (id, table, bucket) rows from ONE
    array-typed mapInPandas pass — the embedding itself never enters the
    pair-generation joins or the cross-table dedup, which previously
    shuffled and sort-aggregated two 64-float vectors per candidate pair.
    Vectors are re-attached per UNIQUE surviving pair by two equi-joins
    against the corpus (Catalyst broadcasts the corpus side when small),
    and the L2 norms are computed once per vector instead of once per
    pair — bit-identical cosine (same dot / norm expression trees)."""
    if n_planes is None:
        import math

        n = corpus.count()
        n_planes = min(24, max(4, math.ceil(math.log2(max(n, 1) / target_bucket + 1))))
    src = widen_scan(corpus.select(vec_id, vec))
    # memberships: ids + bucket keys only, lazily checkpointed so the
    # sizes aggregate and the self-join share ONE bucketize pass instead
    # of recomputing the Python stage per consumer (4 scans before)
    m = (
        bucket_key_arrays(src, vec_id, vec, dim, n_planes, n_tables, seed)
        .select(vec_id, F.posexplode("buckets").alias("table_id", "bucket"))
        .localCheckpoint(eager=False)
    )
    sizes = (
        m.groupBy("table_id", "bucket")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .where((F.col("bsz") > 1) & (F.col("bsz") <= bucket_cap))
    )
    keyed = m.join(sizes, ["table_id", "bucket"], "left_semi")
    left = keyed.select("table_id", "bucket", F.col(vec_id).alias("a"))
    right = keyed.select("table_id", "bucket", F.col(vec_id).alias("b"))
    cand = (
        left.join(right, ["table_id", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])  # dedupe ACROSS tables: 16-byte rows
    )
    va = corpus.select(
        F.col(vec_id).alias("a"),
        F.col(vec).alias("va"),
        l2_norm(F.col(vec)).alias("na"),
    )
    vb = corpus.select(
        F.col(vec_id).alias("b"),
        F.col(vec).alias("vb"),
        l2_norm(F.col(vec)).alias("nb"),
    )
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot(F.col("va"), F.col("vb")) / den).otherwise(F.lit(0.0))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", cos.alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    n_probe: int = 1,
    out_col: str = "cell",
) -> DataFrame:
    """Append the ``n_probe`` nearest-centroid cell ids per row (one output
    row per (row, cell)).  ``centroids`` must be L2-normalized; nearness is
    by cosine, computed as one matmul per Arrow batch — no shuffle, no
    per-row Python."""
    cn = np.ascontiguousarray(centroids, dtype=np.float32)
    cols = df.columns

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:  # np.stack raises on an empty Arrow batch
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            sims = mat @ cn.T  # |v| is constant per row → argmax == cosine
            if n_probe == 1:
                cells = sims.argmax(axis=1)[:, None]
            else:
                p = min(n_probe, sims.shape[1])
                cells = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            reps = cells.shape[1]
            out = pdf.loc[pdf.index.repeat(reps)].reset_index(drop=True)
            out[out_col] = cells.reshape(-1).astype(np.int32)
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(assign, schema=schema + f", {out_col} int")


def cosine_topk_ivf(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 64,
    n_probe: int = 8,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    vec_id: str = "vec_id",
    vec: str = "embedding",
    max_probes: int = 1_000_000,
    rank_round: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed into inverted
    lists by nearest centroid (one cell per vector); each probe searches
    its ``n_probe`` nearest cells with an exact cosine re-rank.

    Centroids are a deterministic hash-ordered sample of corpus vectors
    (collected once — n_centroids × dim floats, trivially broadcastable);
    a k-means refinement would slot in here at scale without changing the
    plan shape.  Join work per probe ≈ corpus × n_probe / n_centroids,
    the classic IVF trade (vs hyperplane LSH's table/plane dials)."""
    sample = (
        corpus.select(vec_id, vec)
        .orderBy(F.xxhash64(F.col(vec_id)))
        .limit(n_centroids)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec], dtype=np.float32) for r in sample])
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    # guard scans at most max_probes+1 rows instead of counting the full
    # probe lineage eagerly
    if probes.limit(max_probes + 1).count() > max_probes:
        raise ValueError(
            f"cosine_topk_ivf probe set exceeds max_probes={max_probes}; "
            "the probe side is broadcast — for probe sets this large, "
            "bucket both sides (cosine_topk_lsh) instead"
        )
    cb = ivf_assign(widen_scan(corpus.select(vec_id, vec)), vec, cents, n_probe=1)
    pb = ivf_assign(probes.select(probe_id, probe_vec), probe_vec, cents, n_probe=n_probe)
    cand = (
        cb.join(F.broadcast(pb), "cell")
        .select(probe_id, vec_id, probe_vec, vec)
        .dropDuplicates([probe_id, vec_id])
    )
    scored = cand.select(
        F.col(probe_id), F.col(vec_id), cosine(F.col(probe_vec), F.col(vec)).alias("cos")
    )
    # rank_round: rank by the rounded cosine (id tie-break) so the ordering
    # is reproducible across engines — float ranking at full precision is
    # not a stable cross-engine contract
    rank_key = F.round("cos", rank_round) if rank_round is not None else F.col("cos")
    w = Window.partitionBy(probe_id).orderBy(F.desc(rank_key), F.asc(vec_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id, vec_id, "cos", "rank")
    )


def cosine_topk_lsh(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    probe_id: str = "probe_id",
    probe_vec: str = "probe_vec",
    vec_id: str = "vec_id",
    vec: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate per-probe top-k: candidates share a hyperplane bucket in
    at least one table; exact cosine re-rank on the candidate set only."""
    pb = hyperplane_buckets(
        probes.select(probe_id, probe_vec), probe_vec, dim, n_planes, n_tables, seed
    )
    cb = hyperplane_buckets(
        corpus.select(vec_id, vec), vec, dim, n_planes, n_tables, seed
    )
    cand = (
        cb.join(F.broadcast(pb), ["table_id", "bucket"])
        .select(probe_id, vec_id, probe_vec, vec)
        .dropDuplicates([probe_id, vec_id])
    )
    scored = cand.select(
        F.col(probe_id), F.col(vec_id), cosine(F.col(probe_vec), F.col(vec)).alias("cos")
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos"), F.asc(vec_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id, vec_id, "cos", "rank")
    )
