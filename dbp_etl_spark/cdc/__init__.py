"""CDC engine: change-event dedup, MERGE apply, microbatch runner."""

from dbp_etl_spark.cdc.dedup import dedup_latest  # noqa: F401
from dbp_etl_spark.cdc.merge import MergeResult, merge_batch, snapshot_batch  # noqa: F401
from dbp_etl_spark.cdc.generator import generate_changes  # noqa: F401
from dbp_etl_spark.cdc.runner import AuditFailed, CDCRunner, DriftError  # noqa: F401
from dbp_etl_spark.cdc.replicate import SyncResult, TableReplicator  # noqa: F401
from dbp_etl_spark.cdc.multisource import merge_tails, source_order  # noqa: F401
