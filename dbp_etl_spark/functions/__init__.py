"""Scalar / vectorized functions: extraction, language ID, text stats."""

from dbp_etl_spark.functions.extract import (  # noqa: F401
    extract_text_py,
    extract_text_udf,
    detect_lang_py,
    detect_lang_udf,
)
