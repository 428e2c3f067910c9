from hama_spark.streaming.events import (
    running_user_totals,
    sessionize,
    sessionize_stateful,
    sliding_event_stats,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "sliding_event_stats",
    "sessionize",
    "sessionize_stateful",
    "running_user_totals",
]
