"""The end-to-end near-duplicate detection + clustering pipeline
(BASELINE.json north_rule), as checkpointed stages:

  documents
    → extract        html→text invariant check (byte-identical per url)
    → signatures     MinHash + LSH band hashes + SimHash   [no shuffle]
    → cand_pairs     LSH banding + capped pair-gen         [1 shuffle + agg]
    → jw_edges       batched Jaro-Winkler verification     [2 joins + grouped map]
    → sub_edges      winnowed fingerprint substring dedup  [1 shuffle + verify]
    → clusters       large-star/small-star CC over all edges

Every stage writes an atomic parquet+manifest checkpoint keyed by the
config hash (sources/catalog.py), so a killed run resumes from the last
completed stage and a config change invalidates exactly the affected
suffix of the DAG.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from batch_jaro_winkler_spark.operators.config import DedupConfig
from batch_jaro_winkler_spark.operators.connected_components import connected_components
from batch_jaro_winkler_spark.operators.fingerprint_dedup import substring_edges
from batch_jaro_winkler_spark.operators.lsh import band_buckets, candidate_pairs
from batch_jaro_winkler_spark.operators.score_pairs import verify_pairs
from batch_jaro_winkler_spark.operators.signatures import compute_signatures
from batch_jaro_winkler_spark.sources.catalog import Catalog

__all__ = ["DedupPipeline", "extract_text"]


def extract_text(docs: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """Deterministic html→text extraction (strip tags, decode entities,
    collapse whitespace) with built-in functions only.  Satisfies the
    input_hint per-row invariant: byte-identical extracted text per url for
    identical html bytes — it is a pure column expression."""
    raw = F.col(html_col).cast("string")
    no_tags = F.regexp_replace(raw, "<[^>]*>", " ")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(no_tags, "&amp;", "&"), "&lt;", "<"
        ),
        "&gt;",
        ">",
    )
    return docs.withColumn(out_col, F.trim(F.regexp_replace(decoded, "\\s+", " ")))


@dataclass
class StageResult:
    name: str
    rows: int
    cached: bool
    wall_sec: float


class DedupPipeline:
    def __init__(self, spark: SparkSession, cfg: DedupConfig, checkpoint_root: str):
        self.spark = spark
        self.cfg = cfg
        self.catalog = Catalog(spark, checkpoint_root)
        self.metrics: list[StageResult] = []

    def _stage(self, name: str, compute) -> DataFrame:
        t0 = time.time()
        df, cached = self.catalog.load_or_compute(name, self.cfg.config_hash(), compute)
        rows = self.catalog.manifest(name)["rows"]
        self.metrics.append(StageResult(name, rows, cached, round(time.time() - t0, 3)))
        return df

    def run(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        with_substring_stage: bool = True,
    ) -> DataFrame:
        """docs[id_col, text_col, ...] → (doc_id, cluster_id) total assignment."""
        cfg = self.cfg
        docs = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))
        # fan the map stages out to cluster width: small local inputs arrive
        # as one split; at web scale the source is already thousands of
        # partitions and this coalesces nothing (cheap round-robin shuffle)
        parallelism = self.spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < parallelism:
            docs = docs.repartition(parallelism)

        # normalize ONCE (pandas regex — far faster than java.util.regex)
        # and checkpoint; every downstream stage consumes `norm`
        def _normalize():
            from batch_jaro_winkler_spark.functions.text import normalize_pandas

            def go(batches):
                for pdf in batches:
                    yield pdf.assign(norm=normalize_pandas(pdf["text"]))[
                        ["doc_id", "norm"]
                    ]

            return docs.mapInPandas(go, schema="doc_id long, norm string")

        norm_docs = self._stage("normalized", _normalize)

        signatures = self._stage(
            "signatures",
            lambda: compute_signatures(
                norm_docs, cfg, "doc_id", "norm", pre_normalized=True
            ),
        )
        pairs = self._stage(
            "cand_pairs", lambda: candidate_pairs(band_buckets(signatures), cfg)
        )
        jw_edges = self._stage(
            "jw_edges",
            lambda: verify_pairs(
                pairs.select("a", "b"), signatures, cfg, "doc_id", "jw_text"
            ),
        )
        if with_substring_stage:
            sub_edges = self._stage(
                "sub_edges",
                lambda: substring_edges(
                    norm_docs, cfg, "doc_id", "norm", pre_normalized=True
                ).select("a", "b"),
            )
            edges = jw_edges.select("a", "b").union(sub_edges.select("a", "b"))
        else:
            edges = jw_edges.select("a", "b")
        clusters = self._stage(
            "clusters",
            lambda: connected_components(edges, cfg, all_nodes=docs.select("doc_id")),
        )
        return clusters
