"""Golden tests for the extraction / lang UDFs.

Mirrors the reference's golden-expectation parser tests
(/root/reference/load/TestFilenameParser.py) and the byte-identical
contract from FIXTURES.md §7: the pandas-UDF output must equal the
pure-Python oracle byte-for-byte, across partitionings.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.functions.extract import (
    detect_lang_py,
    detect_lang_udf,
    extract_text_py,
    extract_text_udf,
)

GOLDEN = [
    (b"<html><body><p>Hello world</p></body></html>", "Hello world"),
    (b"<p>a</p><p>b</p>", "a\nb"),
    (b"plain ascii no tags", "plain ascii no tags"),
    # multi-byte UTF-8 + NFC normalization trap (é -> \xe9)
    ("<p>café née</p>".encode(), "café née"),
    # entities, quotes, backslashes (escaping analog)
    (b"<p>&quot;a&quot; &amp; \\ &#39;b&#39;</p>", '"a" & \\ \'b\''),
    # \r stripping (reference .replace('\r',''))
    (b"line1\r\nline2\rstill2", "line1\nline2still2"),
    # script/style/comment removal
    (b"<script>var x = '<p>no</p>';</script><style>p{}</style><!-- c -->kept", "kept"),
    # whitespace collapse, empty-line drop
    (b"<div>  a   b  </div>\n\n\n<div>   </div><div>c</div>", "a b\nc"),
    # block closers become newlines
    (b"<h1>T</h1><li>x</li><li>y</li><br>z", "T\nx\ny\nz"),
    # empty / whitespace-only
    (b"", ""),
    (b"   \n  \t ", ""),
    # invalid UTF-8 -> U+FFFD replacement, still deterministic
    (b"ok \xff\xfe bad", "ok �� bad"),
]


@pytest.mark.parametrize("html,expected", GOLDEN)
def test_extract_oracle(html, expected):
    assert extract_text_py(html) == expected


def test_extract_oracle_null():
    assert extract_text_py(None) is None


def test_extract_udf_matches_oracle_bytes(spark):
    rows = [(i, h) for i, (h, _) in enumerate(GOLDEN)] + [(len(GOLDEN), None)]
    df = spark.createDataFrame(rows, "i long, html binary").repartition(5)
    got = {
        r["i"]: r["text"]
        for r in df.withColumn("text", extract_text_udf(F.col("html"))).collect()
    }
    for i, (h, expected) in enumerate(GOLDEN):
        assert got[i] == expected, f"case {i}: {got[i]!r} != {expected!r}"
        assert got[i].encode() == expected.encode()
    assert got[len(GOLDEN)] is None


def test_detect_lang():
    assert detect_lang_py("the cat is on the mat and it is happy") == "en"
    assert detect_lang_py("der Hund ist in dem Haus und die Katze auch") == "de"
    assert detect_lang_py("le chat est dans la maison et les chiens aussi") == "fr"
    assert detect_lang_py("el gato es de la casa y los perros son buenos") == "es"
    assert detect_lang_py("zzz qqq xxx www yyy") == "und"
    assert detect_lang_py("") == "und"
    assert detect_lang_py(None) is None


def test_detect_lang_udf_matches(spark):
    texts = [
        "the cat is on the mat and it is happy",
        "der Hund ist in dem Haus und die Katze auch",
        "zzz qqq",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["l"] for r in df.withColumn("l", detect_lang_udf(F.col("t"))).collect()}
    for i, t in enumerate(texts):
        assert got[i] == detect_lang_py(t)


def test_determinism_across_batch_shapes():
    # same inputs through pandas map in different chunkings -> same bytes
    h = "<p>café née &amp; x</p>".encode()
    s1 = pd.Series([h] * 100).map(extract_text_py)
    s2 = pd.Series([h]).map(extract_text_py)
    assert set(s1) == set(s2)


def test_detect_lang_expr_matches_udf(spark):
    """The JVM-expression language id must agree with the pandas-UDF
    classifier (same votes, tie-break, und floor) on edge cases."""
    from pyspark.sql import functions as F

    from dbp_etl_spark.functions.extract import detect_lang_expr, detect_lang_py

    texts = [
        "the quick brown fox is on the hill and it was there",
        "der hund und die katze sind in dem haus mit der maus",
        "le chat et le chien sont dans la maison avec les enfants",
        "el perro y el gato en la casa con los niños para su madre",
        "zzz qqq xxx www",      # no stopwords -> und
        "",                     # no tokens -> und
        "the der le el",        # 4-way tie at 25% each -> first code wins
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["l"] for r in df.select(detect_lang_expr(F.col("text")).alias("l")).collect()]
    want = [detect_lang_py(t) for t in texts]
    assert got == want
