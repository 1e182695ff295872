from batch_jaro_winkler_spark.plans.audit import explain_formatted, plan_markers

__all__ = ["explain_formatted", "plan_markers"]
