"""Structured Streaming integration for the CDC engine."""

from dbp_etl_spark.streaming.microbatch import CHANGES_SCHEMA, run_stream  # noqa: F401
from dbp_etl_spark.streaming.stateful import (  # noqa: F401
    running_user_totals_stream,
    windowed_event_counts_stream,
)
