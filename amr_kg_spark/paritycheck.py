"""Local stand-in for the driver's DuckDB oracle comparison.

Runs each ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same parquet dir, then compares row count, column-name
set, and the order-insensitive multiset of value-normalized rows. Used by
tests (sf0.001, fast) so oracle drift is caught before the driver runs.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: object) -> object:
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ms: dict = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        ms[key] = ms.get(key, 0) + 1
    return ms


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(oracle_sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
    sm = _rows_to_multiset(s_cols, s_rows)
    om = _rows_to_multiset(o_cols, o_rows)
    if sm != om:
        only_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
        only_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
        problems.append(
            f"{name}: value multiset differs; spark-extra~{only_s} oracle-extra~{only_o}"
        )
    return problems


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    out: dict[str, list[str]] = {}
    for name, fn in queries.items():
        if names and name not in names:
            continue
        if name not in oracles:
            out[name] = []  # rows-only query; driver does a weaker check
            continue
        try:
            out[name] = compare(name, fn(spark, sf_dir), oracles[name], sf_dir)
        except Exception as e:  # noqa: BLE001
            out[name] = [f"{name}: EXCEPTION {e}"]
    return out


if __name__ == "__main__":
    import sys

    from amr_kg_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark()
    results = run_all(spark, sf, names)
    bad = 0
    for n, probs in sorted(results.items()):
        status = "OK" if not probs else "FAIL"
        if probs:
            bad += 1
        print(f"[{status}] {n}")
        for p in probs:
            print("   ", p[:500])
    print(f"{len(results) - bad}/{len(results)} queries match")
    spark.stop()
    sys.exit(1 if bad else 0)
