"""Source/sink helpers for the formats the reference ingests."""

from dbp_etl_spark.sources.binlog_formats import (  # noqa: F401
    canal_envelope_schema,
    from_canal,
    from_maxwell,
    maxwell_envelope_schema,
)
from dbp_etl_spark.sources.debezium import (  # noqa: F401
    debezium_envelope_schema,
    from_debezium,
)
from dbp_etl_spark.sources.warc import (  # noqa: F401
    encode_warc,
    parse_warc,
    read_warc,
)
from dbp_etl_spark.sources.readers import (  # noqa: F401
    read_binary_files,
    read_change_csv,
    read_change_json,
    write_change_csv,
)
