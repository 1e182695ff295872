from batch_jaro_winkler_spark.sources.catalog import Catalog

__all__ = ["Catalog"]
