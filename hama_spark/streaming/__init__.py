from hama_spark.streaming.events import sessionize, windowed_event_stats

__all__ = ["windowed_event_stats", "sessionize"]
