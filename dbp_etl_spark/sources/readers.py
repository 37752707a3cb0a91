"""Typed readers/writers for the engine's exchange formats.

Reference analogs:
* S1/S2 directory & object-store scans capturing (name, size, mtime) —
  /root/reference/load/InputFileset.py:218-256 — mapped to Spark's
  binaryFile source (path, modificationTime, length, content);
* S5 accepted/duplicate/quarantine CSVs with a fixed header —
  /root/reference/load/FilenameReducer.py:183-196 (write),
  /root/reference/load/UpdateDBPFilesetTables.py:207-211 (read);
* F12 JSON event payloads — /root/reference/load/AWSTranscoder.py:50-88.

All readers take explicit schemas (never inferSchema in a pipeline —
inference is a full extra pass and is nondeterministic under dirty
data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGE_CSV_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html_b64", T.StringType()),  # CSV cannot carry raw bytes
        T.StructField("op", T.StringType()),
        T.StructField("batch_id", T.LongType()),
    ]
)


def read_change_csv(spark: SparkSession, path: str) -> DataFrame:
    """Change events from CSV (payload base64-encoded in transit)."""
    df = spark.read.csv(path, header=True, schema=CHANGE_CSV_SCHEMA)
    # tolerate chunked base64 (some encoders wrap at 76 chars)
    return df.select(
        "url",
        "warc_ts",
        F.unbase64(F.regexp_replace("html_b64", r"[\r\n ]", "")).alias("html"),
        "op",
        "batch_id",
    )


def write_change_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Inverse of read_change_csv; binary payload -> base64 column."""
    (
        df.select(
            "url",
            "warc_ts",
            # Spark's base64() may emit MIME-chunked output (a \r\n
            # every 76 chars) depending on the legacy-chunking conf —
            # normalize to single-line so the CSV stays one row per event
            F.regexp_replace(F.base64("html"), r"[\r\n]", "").alias("html_b64"),
            "op",
            "batch_id",
        )
        .write.mode(mode)
        .csv(path, header=True)
    )


def read_change_json(spark: SparkSession, path: str) -> DataFrame:
    """Change events from JSON lines (same base64 payload convention)."""
    df = spark.read.json(path, schema=CHANGE_CSV_SCHEMA)
    return df.select(
        "url",
        "warc_ts",
        F.unbase64(F.regexp_replace("html_b64", r"[\r\n ]", "")).alias("html"),
        "op",
        "batch_id",
    )


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Raw-file scan: (path, modificationTime, length, content) — the
    engine's analog of the reference's landing-directory scan. The
    file's mtime becomes the event time; the path becomes the key."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("insert").alias("op"),
        F.col("length").alias("n_bytes"),
    )


XML_DIM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("region", T.LongType()),
        T.StructField("note", T.StringType()),
    ]
)


def read_xml_dim(
    spark: SparkSession,
    path: str,
    row_tag: str = "record",
    schema: T.StructType = XML_DIM_SCHEMA,
) -> DataFrame:
    """S4 — XML metadata dimension source (reference: the LPTS XML
    extract, /root/reference/load/LPTSExtractReader.py:15-48).

    Spark 4 bundles the XML data source natively, so parsing stays
    JVM-side (no Python in the loop). Schema is explicit per module
    convention — the reference's dim is a fixed contract, not a guess.
    """
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )


def parse_xml_column(df: DataFrame, xml_col: str, ddl_schema: str) -> DataFrame:
    """Parse an XML-string column into a struct via built-in from_xml
    (for XML payloads embedded in change events rather than files)."""
    return df.withColumn("_parsed", F.from_xml(F.col(xml_col), ddl_schema))
