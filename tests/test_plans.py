"""Physical-plan regression gates (SURVEY.md §4): fail when a change
silently degrades a plan property that matters at 100 TB — lost filter
pushdown, lost column pruning, a broadcast join falling back to
sort-merge on a dimension table, top-k losing TakeOrderedAndProject, or a
row-at-a-time Python UDF sneaking into any plan."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from batch_jaro_winkler_spark.plans import plan_markers

ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_row_at_a_time_python(spark, sf01_dir, name):
    m = plan_markers(entry_mod.queries()[name](spark, sf01_dir))
    assert m["BatchEvalPython"] == 0, f"{name} uses a row-at-a-time Python UDF"


def test_scan_pruning_and_pushdown(spark, sf01_dir):
    m = plan_markers(entry_mod.queries()["rel_q1"](spark, sf01_dir))
    # 5 of lineitem's 11 columns read; no full-width scan
    assert any("l_quantity" in s and "l_orderkey" not in s for s in m["read_schemas"])

    m = plan_markers(entry_mod.queries()["rel_nation_revenue"](spark, sf01_dir))
    assert any("IsNotNull" in f for f in m["pushed_filters"])  # join-key pushdown
    assert m["BroadcastHashJoin"] >= 2  # nation + customer side broadcast
    assert m["SortMergeJoin"] == 0


def test_topk_compiles_to_take_ordered(spark, sf01_dir):
    m = plan_markers(entry_mod.queries()["rel_top10_orders"](spark, sf01_dir))
    assert m["TakeOrderedAndProject"] >= 1
    assert m["Exchange"] == 0  # global top-k needs no full sort shuffle


# the declared small-scale oracles / exact baselines are the ONLY plans
# allowed an all-pairs or broadcast-nested-loop join; every scale-path
# query must stay bucketed.  ann_cosine_topk is the exact brute-force
# baseline by design: its nested-loop side is the broadcast probe set
# (tiny), the scale paths are the LSH and IVF variants.
_ORACLE_ONLY_CROSS = {
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "jw_pairs",
    "ann_cosine_topk",
}


@pytest.mark.parametrize(
    "name", [q for q in ALL_QUERIES if q not in _ORACLE_ONLY_CROSS]
)
def test_no_unbucketed_cross_join(spark, sf01_dir, name):
    m = plan_markers(entry_mod.queries()[name](spark, sf01_dir))
    assert m["CartesianProduct"] == 0 and m["BroadcastNestedLoopJoin"] == 0, (
        f"{name} contains an unbucketed cross join"
    )


def test_signature_stage_shuffle_free(spark, sf01_dir):
    from batch_jaro_winkler_spark.operators.config import DedupConfig
    from batch_jaro_winkler_spark.operators.signatures import compute_signatures

    docs = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    m = plan_markers(compute_signatures(docs, DedupConfig(), "doc_id", "text"))
    assert m["Exchange"] == 0  # narrow map only: zero shuffles
    assert m["MapInPandas"] >= 1


def test_jw_verify_shuffle_free_python_side(spark, sf01_dir):
    """verify_pairs adds no repartition of its own: python scoring runs on
    whatever partitioning the joins produce."""
    from batch_jaro_winkler_spark.operators.config import DedupConfig
    from batch_jaro_winkler_spark.operators.score_pairs import verify_pairs

    pairs = spark.createDataFrame([(0, 1)], "a long, b long")
    docs = spark.createDataFrame(
        [(0, "aaa"), (1, "aab")], "doc_id long, jw_text string"
    )
    m = plan_markers(verify_pairs(pairs, docs, DedupConfig()))
    assert m["MapInPandas"] >= 1
    assert m["BatchEvalPython"] == 0
