"""Local mirror of the driver's correctness gate: run each queries() entry
and its oracle_sql() twin, compare row count, column names, and
order-insensitive values. Runnable directly for fast iteration:

    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

from hnsw_vector_db_spark.sources.parquet import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = _canon(spark_pdf), _canon(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            for i, (a, b) in enumerate(zip(sv, dv)):
                af = isinstance(a, float) and isinstance(b, float)
                if af and math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    problems.append(
                        f"col {c} row {i}: spark={a!r} duck={b!r}"
                    )
                    break
    return problems


def run_one(spark, con, name: str, fn, sql: str | None, sf_dir: str):
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        return spark_pdf, None, ["(rows-only)"] if len(spark_pdf) == 0 else []
    duck_pdf = con.execute(sql).fetchdf()
    return spark_pdf, duck_pdf, compare(spark_pdf, duck_pdf)


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from hnsw_vector_db_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-harness")
    con = duck_con(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf, duck_pdf, problems = run_one(
                spark, con, name, fn, oracles.get(name), sf_dir
            )
            dt = time.time() - t0
            if problems:
                failures += 1
                print(f"FAIL {name} ({dt:.1f}s): rows={len(spark_pdf)}")
                for p in problems[:5]:
                    print(f"   {p}")
            else:
                kind = "oracle" if name in oracles else "rows-only"
                print(f"ok   {name} ({dt:.1f}s, {len(spark_pdf)} rows, {kind})")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{failures} failures / {len(only) or len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
