from hama_spark.functions.distance import cosine_distance, euclidean_distance
from hama_spark.functions.sketches import (
    approx_distinct,
    approx_group_profile,
    approx_quantiles,
    exact_group_quantiles,
)
from hama_spark.functions.linalg import (
    vec_abs,
    vec_add,
    vec_divide,
    vec_dot,
    vec_max,
    vec_min,
    vec_multiply,
    vec_pow,
    vec_scale,
    vec_slice,
    vec_sqrt,
    vec_subtract,
    vec_sum,
)

__all__ = [
    "euclidean_distance",
    "cosine_distance",
    "vec_add",
    "vec_subtract",
    "vec_multiply",
    "vec_divide",
    "vec_scale",
    "vec_dot",
    "vec_pow",
    "vec_sqrt",
    "vec_abs",
    "vec_sum",
    "vec_max",
    "vec_min",
    "vec_slice",
    "approx_distinct",
    "approx_quantiles",
    "approx_group_profile",
    "exact_group_quantiles",
]
