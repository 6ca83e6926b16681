"""Round-7 close-out preflight: the driver's sf0.01 correctness gate,
mimicked exactly (rowcount + column names + order-insensitive canonical
values) for ALL 75 query/oracle pairs."""

from __future__ import annotations

import math
import os
import sys

import duckdb

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else f"{v:.9g}"
            elif isinstance(v, bool):
                v = str(v)
            elif v is None:
                v = "NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> None:
    from pdftableextractor_spark.session import build_session

    spark = build_session(app_name="oracle-sf001", master="local[32]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    bad = []
    for name in sorted(oracles):
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
            assert sorted(scols) == sorted(dcols), "column names differ"
            assert len(srows) == len(drows), (
                f"rowcount spark={len(srows)} duckdb={len(drows)}"
            )
            assert _canon(srows, scols) == _canon(drows, dcols), (
                "value mismatch"
            )
            print(f"PASS {name} ({len(srows)} rows)", flush=True)
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:200]))
            print(f"FAIL {name}: {e}", flush=True)
    print(f"done: {len(oracles) - len(bad)}/{len(oracles)} green")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
