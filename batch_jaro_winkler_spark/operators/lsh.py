"""LSH banding → candidate-pair generation (the only big shuffle in the
dedup pipeline, so this is where the scale design concentrates).

Scale design (SURVEY.md §7 step 5, R8):

* ``posexplode`` the per-doc band-hash array → (band_id, band_hash, doc_id):
  bands× row inflation, but only 3 small columns, all JVM-side.
* one hash-shuffle on the composite bucket key (band_id, band_hash); AQE
  coalesces small partitions, and skew is bounded *structurally*: inside
  each bucket, pair generation is capped.  Web-scale band buckets follow a
  power law — a bucket of a million near-identical pages must NOT emit
  10^12 pairs.  Buckets up to ``allpairs_cap`` emit all pairs; larger
  buckets sort members by an independent hash of their MinHash signature
  and chain each member to its next ``neighbor_window`` neighbors — linear
  in bucket size while keeping the bucket connected, which is all
  connected-components needs for correct clusters.
* pair dedup across bands is a ``groupBy(a, b)`` (map-side partial agg),
  which also yields ``n_bands`` (band-agreement count, a cheap similarity
  prior usable as a pre-verify filter).

The reference analog: a band bucket is this engine's 'candidate batch' —
the unit the batched JW kernel compiles one shared index for (SURVEY.md §1
data model row 1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from batch_jaro_winkler_spark.operators.config import DedupConfig

__all__ = ["band_buckets", "candidate_pairs"]


def band_buckets(signatures: DataFrame) -> DataFrame:
    """signatures → (band_id, band_hash, doc_id, sort_key); empty docs are
    dropped (their sentinel band hashes would otherwise form one giant
    cross-product bucket)."""
    return (
        signatures.where(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "sort_key",
            F.posexplode("band_hashes").alias("band_id", "band_hash"),
        )
        .select("band_id", "band_hash", "doc_id", "sort_key")
    )


def candidate_pairs(buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """buckets → distinct (a, b, n_bands) with a < b.

    Two-path pair generation sized for web-scale bucket skew:

    * buckets with 2..allpairs_cap members (the overwhelming majority) pair
      via a JVM self-equi-join on the bucket key — whole-stage codegen, no
      Python; output is quadratic per bucket but bounded by the cap;
    * hot buckets (> cap; power-law tail) go through a grouped-map that
      sorts members by a signature-derived key and chains each to its next
      ``neighbor_window`` neighbors — linear in bucket size, preserving
      bucket connectivity for connected components.

    A final groupBy(a, b) dedups across bands and counts band agreement
    (map-side partial aggregation).
    """
    cap = cfg.allpairs_cap
    window = cfg.neighbor_window

    # the dominant wide shuffle is the bucket-count aggregate (map-side
    # partial agg over small rows); singleton buckets — the overwhelming
    # majority — are dropped BEFORE any join, so the members-of-shared-
    # buckets relation is proportional to actual duplication.  AQE picks
    # broadcast when that side is small and shuffle-join when it isn't.
    counts = buckets.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("n_members")
    ).where(F.col("n_members") >= 2)
    sized = buckets.join(
        counts, ["band_id", "band_hash"]
    ).localCheckpoint(eager=False)

    small = sized.where(F.col("n_members") <= cap)
    left = small.select("band_id", "band_hash", F.col("doc_id").alias("a"))
    right = small.select("band_id", "band_hash", F.col("doc_id").alias("b"))
    small_pairs = left.join(right, ["band_id", "band_hash"]).where(
        F.col("a") < F.col("b")
    ).select("a", "b")

    # --- hot buckets: SALTED skew splitting (explicit, north_rule R8) ---
    # A mega-bucket (millions of near-identical pages sharing one band
    # hash) must neither emit quadratic pairs nor serialize into one task.
    # Salt = the high bits of sort_key (a MinHash value, uniform), so each
    # salt subgroup is a CONTIGUOUS range of the bucket's sort order:
    # chaining inside subgroups + one boundary link between adjacent salts
    # preserves the bucket's connectivity for connected components while
    # the shuffle key becomes (band, salt) — skew bounded by 2^salt_bits.
    salt_bits = 4
    hot = sized.where(F.col("n_members") > cap).withColumn(
        "salt",
        F.shiftrightunsigned(F.col("sort_key"), 64 - salt_bits).cast("int"),
    )

    def gen(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # unsigned sort order, consistent with the unsigned salt ranges
        order = np.lexsort(
            (
                pdf["doc_id"].to_numpy(np.int64),
                pdf["sort_key"].to_numpy(np.int64).view(np.uint64),
            )
        )
        ids = pdf["doc_id"].to_numpy(np.int64)[order]
        chunks_a, chunks_b = [], []
        for w in range(1, window + 1):
            if len(ids) > w:
                chunks_a.append(ids[:-w])
                chunks_b.append(ids[w:])
        if not chunks_a:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        a = np.concatenate(chunks_a)
        b = np.concatenate(chunks_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]})

    hot_pairs = hot.groupBy("band_id", "band_hash", "salt").applyInPandas(
        gen, schema="a long, b long"
    )

    # boundary links: adjacent salt subgroups of the same bucket are
    # adjacent sort ranges — link last(s) with first(s+1) (tiny relation:
    # one row per (bucket, salt))
    ends = hot.groupBy("band_id", "band_hash", "salt").agg(
        F.min(F.struct("sort_key", "doc_id")).alias("first"),
        F.max(F.struct("sort_key", "doc_id")).alias("last"),
    )
    w_salt = Window.partitionBy("band_id", "band_hash").orderBy("salt")
    boundary = (
        ends.withColumn("next_first", F.lead("first").over(w_salt))
        .where(F.col("next_first").isNotNull())
        .select(
            F.least(F.col("last.doc_id"), F.col("next_first.doc_id")).alias("a"),
            F.greatest(F.col("last.doc_id"), F.col("next_first.doc_id")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )

    pairs = small_pairs.union(hot_pairs).union(boundary)
    return pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_bands"))
