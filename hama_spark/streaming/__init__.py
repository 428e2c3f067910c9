from hama_spark.streaming.events import (
    running_user_totals,
    sessionize,
    windowed_event_stats,
)

__all__ = ["windowed_event_stats", "sessionize", "running_user_totals"]
