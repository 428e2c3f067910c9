from hama_spark.streaming.events import (
    dedup_events_within,
    enrich_events,
    event_transitions,
    parse_props,
    rollup_event_counts,
    running_user_totals,
    sessionize,
    sessionize_stateful,
    sliding_event_stats,
    stream_dedup_within,
    stream_interval_join,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "sliding_event_stats",
    "sessionize",
    "sessionize_stateful",
    "running_user_totals",
    "enrich_events",
    "parse_props",
    "dedup_events_within",
    "stream_dedup_within",
    "stream_interval_join",
    "rollup_event_counts",
    "event_transitions",
]
