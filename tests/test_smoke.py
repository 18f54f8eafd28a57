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


def test_stable_checkpoint_reliable_switch(spark, tmp_path):
    """With a checkpoint dir + spark.amr.reliableCheckpoint=true,
    stable_checkpoint writes a RELIABLE checkpoint (survives executor
    loss on a cluster); default stays localCheckpoint. Conf restored so
    the shared session is unaffected."""
    import os

    from amr_kg_spark.session import RELIABLE_CHECKPOINT_CONF, stable_checkpoint

    df = spark.range(100)
    local = stable_checkpoint(df)
    assert local.count() == 100

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        reliable = stable_checkpoint(spark.range(50))
        assert reliable.count() == 50
        ckpt_files = []
        for root, _, files in os.walk(str(tmp_path / "ckpt")):
            ckpt_files.extend(files)
        assert ckpt_files, "reliable checkpoint must write to the ckpt dir"
    finally:
        spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")


def test_registry_has_exactly_50_fully_oracled_queries():
    """The driver verifies only the first 50 registry entries; every entry
    must have a value oracle (rows-only checks are strictly weaker). Any
    new query must displace or merge into an existing one."""
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert len(q) == 50, f"registry must stay at 50, got {len(q)}"
    assert set(q) == set(o), f"missing oracles: {set(q) - set(o)}"
