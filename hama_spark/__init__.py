"""hama_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Hama (BSP / Pregel / BSP-ML).

Reference semantics: apache/hama @ /root/reference (see SURVEY.md).
Architecture: Spark DataFrame / SQL / Catalyst — NOT a port of the
reference's BSP runtime. A Hama superstep maps to one shuffle round of
an iterative driver loop (see ``hama_spark.plans.pregel``).
"""

from hama_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
