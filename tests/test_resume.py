"""Checkpoint/resume + lineage (SURVEY §5 test 4): kill after stage k,
resume, identical triple set; lineage rows recorded per partition."""

from __future__ import annotations

import tempfile

from amr_kg_spark.fixtures import synth_transcripts
from amr_kg_spark.lineage import StageRunner
from amr_kg_spark.pipeline import run_pipeline


def _triple_set(d):
    return {(r.subj, r.pred, r.obj) for r in d["triples"].collect()}


def test_resume_after_partial_run_yields_identical_triples(spark):
    t = synth_transcripts(spark, n_turns=2000, n_convs=50)
    with tempfile.TemporaryDirectory() as w1, tempfile.TemporaryDirectory() as w2:
        full = run_pipeline(spark, t, w1, run_id="full")
        expected = _triple_set(full)

        # simulate a crash: run only the first stages, then "resume"
        partial = StageRunner(spark, w2, run_id="crashed")
        from amr_kg_spark.operators.mentions import detect_mentions
        from amr_kg_spark.operators.triples import cooccurrence_pairs

        partial.run(
            "mentions",
            lambda: detect_mentions(t).select(
                "conv_id", "turn_idx", "text", "mentions"
            ),
        )
        partial.run(
            "pairs",
            lambda: cooccurrence_pairs(
                spark.read.parquet(f"{w2}/stages/mentions")
            ),
        )
        assert partial.is_committed("pairs")
        assert not partial.is_committed("triples")

        resumed = run_pipeline(spark, t, w2, run_id="resumed")
        assert _triple_set(resumed) == expected

        # committed stages were NOT recomputed on resume: lineage for
        # 'mentions'/'pairs' carries only the crashed run's id
        lin = resumed["lineage"].collect()
        by_stage = {}
        for r in lin:
            by_stage.setdefault(r.stage, set()).add(r.run_id)
        assert by_stage["mentions"] == {"crashed"}
        assert by_stage["pairs"] == {"crashed"}
        assert by_stage["triples"] == {"resumed"}


def test_lineage_partition_counts_sum_to_rows(spark):
    t = synth_transcripts(spark, n_turns=1000, n_convs=20)
    with tempfile.TemporaryDirectory() as w:
        d = run_pipeline(spark, t, w, run_id="r1")
        lin = d["lineage"]
        got = {
            r.stage: r.total
            for r in lin.groupBy("stage").sum("rows").withColumnRenamed("sum(rows)", "total").collect()
        }
        assert got["triples"] == d["triples"].count()
        assert got["nodes"] == d["nodes"].count()
        m = {r.stage: r.rows_per_sec for r in d["metrics"].collect()}
        assert all(v is not None for v in m.values())


def test_pipeline_with_canonicalization_stage(spark):
    t = synth_transcripts(spark, n_turns=600, n_convs=15)
    with tempfile.TemporaryDirectory() as w:
        d = run_pipeline(spark, t, w, run_id="canon", canonicalize=True)
        # clean vocabulary -> canonicalization is an identity pass
        assert d["nodes"].count() > 0
        assert {"canonical_id", "label", "name", "curie", "props", "merged_from"} <= set(
            d["nodes"].columns
        )
        assert d["nodes"].filter("merged_from > 1").count() == 0
        assert d["edges"].count() > 0
