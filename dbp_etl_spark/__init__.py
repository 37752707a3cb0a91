"""dbp_etl_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the query & data-processing capabilities of the reference
ETL (faithcomesbyhearing/dbp-etl, a single-process Python batch loader)
as an idiomatic Spark engine:

* binlog/WAL-style change-event tail -> lake-table MERGE upsert
  (reference analog: the per-fileset read-state -> diff -> transactional
  apply loop, /root/reference/load/UpdateDBPFilesetTables.py)
* exactly-once idempotent commits keyed by batch id
  (reference analog: one SQL transaction per fileset,
  /root/reference/load/SQLBatchExec.py:168-213)
* per-microbatch latest-timestamp-wins dedup with salted skew handling
  (reference analog: /root/reference/load/FilenameReducer.py:73-120)
* vectorized pandas/Arrow row transforms (html->text, lang tagging)
  (reference analog: sofria-cli subprocess,
  /root/reference/load/UpdateDBPTextFilesets.py:60-89)
* schema evolution, checkpoint resume, per-partition lineage/metrics
  (reference analogs: evolving upsert attr lists, run_history/run_batch)

Everything here is built only on public Apache Spark / PySpark APIs.
"""

__version__ = "0.1.0"
