"""Lake-table storage layer: snapshot manifests over Parquet.

A minimal Iceberg-style copy-on-write table format implemented with
public PySpark + Parquet only (the sandbox image carries no
Iceberg/Delta jars). Provides: atomic snapshot commits, an idempotent
batch-id commit ledger, bucket(key) partitioning with file-level
pruning, column-id-based schema evolution (add / rename / widen)
without data rewrite, and time travel over snapshot history.
"""

from dbp_etl_spark.lake.table import (  # noqa: F401
    ConstraintViolation,
    LakeTable,
    SnapshotExpired,
)
from dbp_etl_spark.lake.schema import ColumnSpec, TableSchema  # noqa: F401
from dbp_etl_spark.lake.txn import TxnAborted, TxnCoordinator  # noqa: F401
