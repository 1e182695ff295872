"""Signature stage: k-shingle MinHash + LSH band hashes + SimHash per doc.

The 100 TB-scale design (SURVEY.md §7 step 4): this stage is embarrassingly
parallel — a single ``mapInPandas`` pass with ZERO shuffles.  Tokenization
happens JVM-side (built-in functions, codegen); only the hash math crosses
the Arrow boundary, vectorized in numpy (never per-row Python, per
BASELINE.json input_hint).

Hashing scheme (fast path):
* shingle base hash: ``pandas.util.hash_array`` (SipHash-derived, fixed key,
  deterministic across runs/machines — required for resumability and the
  driver's value-hash checks);
* MinHash permutations: multiply-shift ``h_i = a_i * h + b_i (mod 2^64)``
  with odd ``a_i`` drawn from a seeded RNG — each is a bijection of Z_2^64,
  a standard approximate min-wise family;
* band hash: FNV-1a fold of the band's row values;
* SimHash: per-bit votes over shingle hashes, packed to int64.

The reference analog is O1/O4 model compilation (lib/batch_jaro_winkler.c:
513-627): compile once, query many — here the signature table is the
compiled artifact, checkpointed and reused by every downstream stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from batch_jaro_winkler_spark.functions.text import normalize_text, tokens
from batch_jaro_winkler_spark.operators.config import DedupConfig

__all__ = ["compute_signatures", "minhash_params", "band_fold"]

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def band_fold(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """FNV-1a fold of each band's rows → (bands,) uint64."""
    acc = np.full(bands, _FNV_OFFSET, dtype=np.uint64)
    band_rows = sig.reshape(bands, rows)
    for r in range(rows):
        acc = (acc ^ band_rows[:, r]) * _FNV_PRIME
    # mix in the band index so identical row-chunks in different bands
    # don't collide into one bucket key
    acc = (acc ^ np.arange(bands, dtype=np.uint64)) * _FNV_PRIME
    return acc


def _shingle_hashes(toks: list, k: int) -> np.ndarray:
    n = len(toks)
    if n < k:
        # short doc: fall back to whole-doc shingle so tiny docs still hash
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        shingles = np.array([" ".join(toks)], dtype=object)
    else:
        shingles = np.array(
            [" ".join(toks[i : i + k]) for i in range(n - k + 1)], dtype=object
        )
    return pd.util.hash_array(shingles).astype(np.uint64)


def compute_signatures(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs[id_col, text_col] → [doc_id, n_tokens, minhash, band_hashes,
    simhash, jw_text] with no shuffle (narrow map only)."""
    num_perm, bands, rows = cfg.num_perm, cfg.bands, cfg.rows_per_band
    k = cfg.shingle_k
    seed = cfg.seed
    max_jw = cfg.max_jw_len

    prepped = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
        F.substring(normalize_text(F.col(text_col)), 1, max_jw).alias("jw_text"),
    )

    a_params, b_params = minhash_params(num_perm, seed)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out_min = np.empty((len(pdf), num_perm), dtype=np.int64)
            out_band = np.empty((len(pdf), bands), dtype=np.int64)
            out_sim = np.empty(len(pdf), dtype=np.uint64)
            for i, toks in enumerate(pdf["toks"]):
                h = _shingle_hashes(list(toks), k)
                if len(h) == 0:
                    out_min[i] = -1
                    out_band[i] = -1
                    out_sim[i] = 0
                    continue
                with np.errstate(over="ignore"):
                    # (n_shingles, num_perm) multiply-shift, uint64 wraparound
                    table = h[:, None] * a_params[None, :] + b_params[None, :]
                sig = table.min(axis=0)
                out_min[i] = sig.view(np.int64)
                out_band[i] = band_fold(sig, bands, rows).view(np.int64)
                bits = (h[:, None] >> bit_idx[None, :]) & np.uint64(1)
                votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
                packed = np.where(votes > 0, np.uint64(1) << bit_idx, np.uint64(0))
                out_sim[i] = packed.sum(dtype=np.uint64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["toks"].map(len).astype(np.int32),
                    "minhash": list(out_min),
                    "band_hashes": list(out_band),
                    "simhash": out_sim.view(np.int64),
                    "jw_text": pdf["jw_text"],
                }
            )

    schema = (
        "doc_id long, n_tokens int, minhash array<long>, "
        "band_hashes array<long>, simhash long, jw_text string"
    )
    return prepped.mapInPandas(compute, schema=schema)
