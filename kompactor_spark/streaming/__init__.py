"""Structured Streaming jobs (SURVEY §2.B X1-X5)."""

from kompactor_spark.streaming.jobs import (
    sliding_counts,
    session_counts,
    stateful_dedup,
    tumbling_counts,
)

__all__ = ["tumbling_counts", "sliding_counts", "session_counts", "stateful_dedup"]
