from hama_spark.plans.pregel import PregelContext, pregel
from hama_spark.plans.superstep import run_supersteps

__all__ = ["pregel", "PregelContext", "run_supersteps"]
