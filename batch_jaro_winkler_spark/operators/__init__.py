from batch_jaro_winkler_spark.operators.config import DedupConfig

__all__ = ["DedupConfig"]
