"""Structured Streaming ingestion into the series lake."""

from carbonapi_spark.streaming.ingest import (
    events_stream_to_series, parse_carbon_lines, stream_summarize,
)

__all__ = ["parse_carbon_lines", "events_stream_to_series", "stream_summarize"]
