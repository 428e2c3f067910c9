from hama_spark.streaming.events import (
    running_user_totals,
    sessionize,
    sliding_event_stats,
    windowed_event_stats,
)

__all__ = [
    "windowed_event_stats",
    "sliding_event_stats",
    "sessionize",
    "running_user_totals",
]
