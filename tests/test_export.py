"""Dynamic-schema export tests (P10/S10/S11): key union, reference column
ordering, '' fill, quoted CSV round-trip."""

from __future__ import annotations

import csv
import glob

from pdftableextractor_spark.operators.export import (
    key_union_pivot,
    union_keys,
    write_csv,
)


def _mapdf(spark):
    rows = [
        ({"Category": "Revenue", "Value 1": "10", "Value 10": "x"},),
        ({"Category": "Margin", "Value 2": "7", "zeta": "z"},),
        ({"alpha": "a"},),
    ]
    return spark.createDataFrame(rows, "data map<string,string>")


def test_union_keys_reference_ordering(spark):
    df = _mapdf(spark)
    assert union_keys(df) == [
        "Category",
        "Value 1",
        "Value 2",
        "Value 10",  # numeric, not lexicographic (export_utils.py:40-46)
        "alpha",
        "zeta",
    ]


def test_key_union_pivot_fills_empty(spark):
    out = key_union_pivot(_mapdf(spark)).collect()
    assert out[0]["Value 2"] == ""
    assert out[1]["Category"] == "Margin"
    assert out[2]["alpha"] == "a"
    assert out[2]["Category"] == ""


def test_csv_roundtrip_quote_all(spark, tmp_path):
    df = spark.createDataFrame(
        [({"Category": 'He said "hi"', "Value 1": "a,b"},)],
        "data map<string,string>",
    )
    path = str(tmp_path / "csv")
    write_csv(df, path)
    headers, data = [], []
    for f in sorted(glob.glob(f"{path}/part-*.csv")):
        with open(f, newline="") as fh:
            rows = list(csv.reader(fh))
        if rows:
            headers.append(rows[0])
            data.extend(rows[1:])
    assert all(h == ["Category", "Value 1"] for h in headers)
    assert data == [['He said "hi"', "a,b"]]
