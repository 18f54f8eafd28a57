"""Local mirror of the driver's DuckDB oracle gate (sf0.001 for speed)."""

from __future__ import annotations

from amr_kg_spark.paritycheck import run_all

from tests.conftest import SF_SMALL


def test_all_queries_match_oracles(spark):
    results = run_all(spark, SF_SMALL)
    failures = {n: p for n, p in results.items() if p}
    assert not failures, f"oracle mismatches: {failures}"
