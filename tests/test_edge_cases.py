"""Edge-case hardening: degenerate corpora through every pipeline stage
(empty, single doc, all-empty texts, unicode-only, all-identical), plus a
medium-scale (20k-doc) recall gate — the 600-doc gate can hide
configuration regressions that only show at realistic bucket sizes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_jaro_winkler_spark.fixtures import make_corpus
from batch_jaro_winkler_spark.operators.config import DedupConfig
from batch_jaro_winkler_spark.pipeline import DedupPipeline


def _run(spark, tmp_path_factory, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pipe = DedupPipeline(
        spark, DedupConfig(), str(tmp_path_factory.mktemp("edge"))
    )
    return pipe.run(docs, "doc_id", "text")


def test_single_doc(spark, tmp_path_factory):
    out = _run(spark, tmp_path_factory, [(1, "just one document here")]).collect()
    assert [(r["doc_id"], r["cluster_id"]) for r in out] == [(1, 1)]


def test_empty_and_whitespace_texts(spark, tmp_path_factory):
    rows = [(1, ""), (2, "   "), (3, "real content words here"), (4, "")]
    out = {r["doc_id"]: r["cluster_id"] for r in _run(spark, tmp_path_factory, rows).collect()}
    # empty docs are never clustered together (no signatures), all assigned
    assert out == {1: 1, 2: 2, 3: 3, 4: 4}


def test_all_identical_docs(spark, tmp_path_factory):
    text = "identical content repeated across every single document " * 5
    rows = [(i, text) for i in range(10)]
    out = {r["doc_id"]: r["cluster_id"] for r in _run(spark, tmp_path_factory, rows).collect()}
    assert set(out.values()) == {0}  # one cluster, min-id representative


def test_unicode_only_docs(spark, tmp_path_factory):
    base = "中国 人民 共和 国家 语言 文字 处理 系统 测试 文档 " * 8
    rows = [
        (1, base),
        (2, base + "扩展 内容"),
        (3, "こんにちは 世界 " * 20),  # outside the normalize ranges → mostly stripped
        (4, "été àçcénts über " * 20),
    ]
    out = {r["doc_id"]: r["cluster_id"] for r in _run(spark, tmp_path_factory, rows).collect()}
    assert out[1] == out[2] == 1  # CJK near-dups cluster
    assert len(out) == 4


@pytest.mark.slow
def test_recall_at_20k(spark, tmp_path_factory):
    corpus = make_corpus(n_rows=20_000, seed=99)
    rows = [(i, r["text"]) for i, r in enumerate(corpus.rows)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pipe = DedupPipeline(spark, DedupConfig(), str(tmp_path_factory.mktemp("r20k")))
    clusters = pipe.run(docs, "doc_id", "text").cache()
    a = clusters.select(F.col("doc_id").alias("a"), "cluster_id")
    b = clusters.select(F.col("doc_id").alias("b"), "cluster_id")
    got = {
        (r["a"], r["b"])
        for r in a.join(b, "cluster_id").where(F.col("a") < F.col("b")).collect()
    }
    truth = corpus.true_pairs
    recall = len(truth & got) / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} at 20k docs"
    all_truth = truth | corpus.substring_pairs
    precision = 1 - len(got - all_truth) / max(1, len(got))
    assert precision >= 0.95, f"precision {precision:.4f} at 20k docs"
