"""Local emulation of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` that has an
``oracle_sql()`` twin, via Spark AND DuckDB on the same parquet tables,
then compares with the strictest plausible canonicalization:

- columns sorted by name (the driver's documented behavior),
- rows sorted by all columns,
- value hash = sha256 over the repr of every cell (so a dtype difference
  -- Decimal vs float64 vs int64 -- fails, exactly like round 1's driver).

Usage::

    python scripts/oracle_compare.py [sf_dir] [query ...]

Defaults: /root/testdata/sf0.01, all oracled queries.
"""

from __future__ import annotations

import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row:
            h.update(repr(v).encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle_compare")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    report: dict[str, dict] = {}
    failed = []
    for name, fn in qs.items():
        if name not in oracles or (only and name not in only):
            continue
        sdf = canon(fn(spark, sf_dir).toPandas())
        odf = canon(con.sql(oracles[name]).df())
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        sh, oh = value_hash(sdf), value_hash(odf)
        ok = rows and schema and sh == oh
        report[name] = {
            "rows_match": rows, "schema_match": schema, "hash_match": sh == oh,
            "spark_rows": len(sdf), "oracle_rows": len(odf),
            "spark_dtypes": {c: str(t) for c, t in sdf.dtypes.items()},
            "oracle_dtypes": {c: str(t) for c, t in odf.dtypes.items()},
        }
        if not ok:
            failed.append(name)
            # show the first differing cells to make the fix obvious
            if rows and schema:
                for i in range(min(len(sdf), 3)):
                    for c in sdf.columns:
                        a, b = sdf.iloc[i][c], odf.iloc[i][c]
                        if repr(a) != repr(b):
                            report[name].setdefault("examples", []).append(
                                {"row": i, "col": c, "spark": repr(a), "oracle": repr(b)}
                            )
        print(f"{'OK ' if ok else 'FAIL'} {name}: rows={rows} schema={schema} hash={sh == oh}")
    print(json.dumps({k: v for k, v in report.items() if k in failed}, indent=2))
    print(f"\n{len(report) - len(failed)}/{len(report)} hash-green; failed: {failed}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
