from hama_spark.operators.joins import composite_join, override_join

__all__ = ["composite_join", "override_join"]
