"""Unit tests: the Spark column expressions in functions.strings must agree
with the independent pure-Python oracle on tricky lines (FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdftableextractor_spark import oracle
from pdftableextractor_spark.functions.strings import (
    is_boilerplate_col,
    is_footnote_col,
    normalize_text_col,
)

LINES = [
    "Revenue grew 25% in Q4¹ compared to prior year.",
    "Net income² was $10.5 million (1) as reported [2].",
    "Total *** adjusted ** figures * here",
    "42",
    "  17  ",
    "(1) Note: figures based on unaudited results for the period.",
    "(1) short",  # marker but not enough content → not footnote
    "[2] Source: company filings, see page 12 for details.",
    "3. See the disclaimer in section 4 regarding statements.",
    "3. Plain numbered list item with no keyword match at all",
    "* Excludes one-time charges pursuant to the plan.",
    "Note 2: includes deferred revenue in accordance with GAAP.",
    "Source: management estimates, refers to fiscal 2024.",
    "See appendix 3 for the reconciliation of measures.",
    "NOTE: CAPS footnote includes important disclaimer text.",
    "Seeing growth in all segments this quarter.",  # 'see ' needs the space
    "Home | About | Contact | Careers",
    "© 2024 Example Corp. All rights reserved.",
    "Privacy Policy",
    "privacy policy",
    "Terms of Service",
    "A normal sentence | with one pipe only.",
    "",
    "   ",
    "⁴⁵⁶",
    "word⁴⁵⁶tail",
]


def test_normalize_matches_oracle(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["text"])
    got = [
        r["n"]
        for r in df.select(normalize_text_col(F.col("text")).alias("n")).collect()
    ]
    assert got == [oracle.normalize(l) for l in LINES]


def test_footnote_predicate_matches_oracle(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["text"])
    got = [
        bool(r["f"])
        for r in df.select(is_footnote_col(F.col("text")).alias("f")).collect()
    ]
    assert got == [oracle.is_footnote(l) for l in LINES]
    # sanity on specific semantics
    assert oracle.is_footnote("(1) Note: figures based on unaudited results.")
    assert not oracle.is_footnote("(1) short")
    assert not oracle.is_footnote("Seeing growth in all segments this quarter.")


def test_boilerplate_predicate_matches_oracle(spark):
    df = spark.createDataFrame([(l,) for l in LINES], ["text"])
    got = [
        bool(r["b"])
        for r in df.select(is_boilerplate_col(F.col("text")).alias("b")).collect()
    ]
    assert got == [oracle.is_boiler(l) for l in LINES]


def test_normalize_semantics():
    assert oracle.normalize("abc¹²³ def(1) g[2] h***") == "abc def g h"
    assert oracle.normalize("42") == ""
    assert oracle.normalize("  a   b\t c ") == "a b c"
