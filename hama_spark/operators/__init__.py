from hama_spark.operators.anomaly import (
    hourly_counts,
    robust_zscores,
    seasonal_baseline,
    seasonal_outliers,
    stream_seasonal_outliers,
)
from hama_spark.operators.bucketing import co_located_join, write_bucketed
from hama_spark.operators.join_expr import parse_join_expr
from hama_spark.operators.joins import composite_join, override_join
from hama_spark.operators.incremental import (
    agg_state,
    apply_changelog,
    merge_agg_states,
    retract_state,
    scd2_asof_join,
    scd2_history,
    state_metrics,
)
from hama_spark.operators.linkage import (
    blocked_fuzzy_pairs,
    entity_clusters,
    fuzzy_join,
    sorted_neighborhood_pairs,
)
from hama_spark.operators.skew import (
    join_explosion_report,
    salted_agg,
    salted_join,
    skew_report,
)

__all__ = [
    "hourly_counts",
    "seasonal_baseline",
    "seasonal_outliers",
    "stream_seasonal_outliers",
    "robust_zscores",
    "composite_join",
    "override_join",
    "parse_join_expr",
    "write_bucketed",
    "co_located_join",
    "salted_join",
    "salted_agg",
    "skew_report",
    "join_explosion_report",
    "blocked_fuzzy_pairs",
    "entity_clusters",
    "fuzzy_join",
    "sorted_neighborhood_pairs",
    "agg_state",
    "apply_changelog",
    "scd2_asof_join",
    "scd2_history",
    "merge_agg_states",
    "retract_state",
    "state_metrics",
]
