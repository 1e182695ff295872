from batch_jaro_winkler_spark.functions import hashing, text, vectors

__all__ = ["text", "hashing", "vectors"]
