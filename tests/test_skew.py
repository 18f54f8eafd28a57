"""Hot-key skew (SURVEY §5 test 5): one conv_id holds ~30% of all turns.
The salted reconstruction must bound per-reducer group size while
preserving the ordering invariant, and the pipeline must complete."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from amr_kg_spark.fixtures import synth_transcripts
from amr_kg_spark.operators.reconstruct import (
    conversation_text,
    conversation_text_salted,
)
from amr_kg_spark.pipeline import run_pipeline


def test_hot_key_salted_equals_plain(spark):
    t = synth_transcripts(spark, n_turns=5000, n_convs=40, hot_frac=0.3)
    hot_turns = t.filter(F.col("conv_id") == "hot").count()
    assert hot_turns >= 1400  # the skew actually exists

    plain = {r.conv_id: r.conv_text for r in conversation_text(t).collect()}
    salted = {
        r.conv_id: r.conv_text
        for r in conversation_text_salted(t, bucket_size=128).collect()
    }
    assert plain == salted


def test_salting_bounds_group_size(spark):
    t = synth_transcripts(spark, n_turns=5000, n_convs=40, hot_frac=0.3)
    bucketed = t.withColumn(
        "turn_bucket", F.floor(F.col("turn_idx") / 128).cast("int")
    )
    max_group = (
        bucketed.groupBy("conv_id", "turn_bucket").count().agg(F.max("count")).first()[0]
    )
    assert max_group <= 128  # no reducer sees more than a bucket of the hot conv


def test_pipeline_completes_under_skew(spark):
    t = synth_transcripts(spark, n_turns=4000, n_convs=30, hot_frac=0.4)
    with tempfile.TemporaryDirectory() as w:
        d = run_pipeline(spark, t, w, run_id="skew")
        assert d["triples"].count() > 0
        preds = {r.pred for r in d["triples"].select("pred").distinct().collect()}
        assert {"testedAgainst", "resistantTo", "hasActivity"} <= preds
