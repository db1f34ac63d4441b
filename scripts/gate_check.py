"""Local simulation of the driver correctness gate: run every
__spark_entry__.queries() entry at a given SF and compare rows/schema/values
against oracle_sql() in DuckDB (sorted-by-name columns, like the driver).

Usage: python scripts/gate_check.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    results, n_fail = {}, 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in oracles:
            results[name] = {"spark_rows": len(sdf), "err": "no_oracle"}
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"oracle: {e}"}
            n_fail += 1
            continue
        s, o = norm(sdf), norm(odf)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        values = False
        if rows and schema:
            values = True
            for c in s.columns:
                a, b = s[c], o[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    ok = np.allclose(
                        a.astype(float), b.astype(float), atol=1e-9, equal_nan=True
                    )
                else:
                    ok = a.astype(str).tolist() == b.astype(str).tolist()
                if not ok:
                    values = False
                    break
        results[name] = {
            "rows": rows, "schema": schema, "values": values,
            "spark_rows": len(s), "oracle_rows": len(o),
        }
        if not (rows and schema and values):
            n_fail += 1
    print(json.dumps(results, indent=1))
    ok = sum(1 for r in results.values() if r.get("values"))
    no = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    print(f"\n{ok} value-match, {no} no_oracle, {n_fail} FAIL of {len(qs)}", file=sys.stderr)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
