"""Structured Streaming integration for the CDC engine."""

from dbp_etl_spark.streaming.microbatch import (  # noqa: F401
    CHANGES_SCHEMA,
    deduped_changes_stream,
    run_scd2_stream,
    run_stream,
)
from dbp_etl_spark.streaming.joins import interval_join_streams  # noqa: F401
from dbp_etl_spark.streaming.stateful import (  # noqa: F401
    running_user_totals_stream,
    windowed_event_counts_stream,
)
