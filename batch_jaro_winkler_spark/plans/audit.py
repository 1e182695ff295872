"""Physical-plan auditing: the engine's ``explain("formatted")`` toolkit.

Every operator in this engine has an intended physical shape (SURVEY.md §4)
— filters reach the parquet scan, scans prune columns, small sides
broadcast, top-k compiles to TakeOrderedAndProject, Python appears only in
the vectorized Arrow operators.  ``plan_markers`` extracts the relevant
plan features so tests/test_plans.py can fail when a code change silently
degrades a plan (e.g. a lost pushdown turning a 2-column scan into a
full-width read at 100 TB).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["explain_formatted", "plan_markers"]

_MARKERS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "TakeOrderedAndProject",
    "Exchange",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",  # row-at-a-time python UDF — should NEVER appear
    "CartesianProduct",  # unbucketed all-pairs — only small-scale oracles
    "BroadcastNestedLoopJoin",
    "HashAggregate",
    "WholeStageCodegen",
]


def explain_formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def plan_markers(df: DataFrame) -> dict:
    """→ {marker: count, 'pushed_filters': [...], 'read_schemas': [...]}"""
    plan = explain_formatted(df)
    out: dict = {m: plan.count(m) for m in _MARKERS}
    out["pushed_filters"] = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    out["read_schemas"] = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    return out
