"""Structured Streaming integration for the CDC engine."""

from dbp_etl_spark.streaming.microbatch import CHANGES_SCHEMA, run_stream  # noqa: F401
