from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["subj", "subj_curie", "pred", "obj", "obj_curie"]
    rows = df.collect()
    assert len(rows) > 0
    preds = {r["pred"] for r in rows}
    assert {"testedAgainst", "hasActivity", "resistantTo", "studiedAt"} <= preds


def test_every_query_has_callable_signature(spark):
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    oracles = entrymod.oracle_sql()
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
