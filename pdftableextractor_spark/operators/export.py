"""Export sinks: dynamic-schema table → header-union CSV/JSON (SURVEY.md
S9-S11, P10).

The reference's export path takes rows with per-row varying column sets and
computes the union of all columns, ordering 'Category' first and 'Value N'
numerically (export_utils.py:34-50; the JS CSV exporter repeats it at
static/script.js:993-999). Here the dynamic row is a ``map<string,string>``
column; the key union is one tiny aggregation (schema-sized, driver-safe)
and the pivot is a static projection, so the actual export stays fully
distributed (`df.write.csv/json`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_keys(df: DataFrame, map_col: str = "data") -> list[str]:
    """Union of map keys across all rows, reference ordering: 'Category'
    first, then 'Value N' by N, then the rest alphabetically."""
    rows = (
        df.select(F.explode(F.map_keys(F.col(map_col))).alias("k"))
        .distinct()
        .collect()
    )
    keys = {r["k"] for r in rows}

    def sort_key(k: str):
        if k == "Category":
            return (0, 0, "")
        m = re.fullmatch(r"Value (\d+)", k)
        if m:
            return (1, int(m.group(1)), "")
        return (2, 0, k)

    return sorted(keys, key=sort_key)


def key_union_pivot(df: DataFrame, map_col: str = "data") -> DataFrame:
    """map<string,string> rows → one column per union key (missing → '')."""
    keys = union_keys(df, map_col)
    return df.select(
        *[
            F.coalesce(
                F.try_element_at(F.col(map_col), F.lit(k)), F.lit("")
            ).alias(k)
            for k in keys
        ]
    )


def write_csv(df: DataFrame, path: str, map_col: str | None = "data") -> None:
    """Header-union CSV with full quoting (script.js:987-1020 semantics)."""
    out = key_union_pivot(df, map_col) if map_col else df
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        # RFC-4180 doubled quotes, matching the reference's '"'→'""'
        # (static/script.js:1006); Spark's default is backslash-escape
        .option("escape", '"')
        .csv(path)
    )


def write_json(df: DataFrame, path: str, map_col: str | None = "data") -> None:
    out = key_union_pivot(df, map_col) if map_col else df
    out.write.mode("overwrite").json(path)
