"""Conversation reconstruction invariants (BASELINE input_hint):
per-turn text equality under stable turn ordering, incl. the skew-safe
salted variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from amr_kg_spark.operators.reconstruct import (
    conversation_text,
    conversation_text_salted,
    ordered_turns,
)
from amr_kg_spark.transcripts import derive_transcripts

from tests.conftest import SF_SMALL


def test_turn_ordering_invariant(spark):
    t = derive_transcripts(spark, SF_SMALL)
    ot = ordered_turns(t)
    # contiguous turn_idx per conv => turn_seq == turn_idx + 1 everywhere
    bad = ot.filter(F.col("turn_seq") != F.col("turn_idx") + 1).count()
    assert bad == 0


def test_per_turn_text_equality_roundtrip(spark):
    t = derive_transcripts(spark, SF_SMALL)
    # shuffle hard, then reconstruct: texts must come back identical per turn
    shuffled = t.repartition(16, "text")
    orig = {(r.conv_id, r.turn_idx): r.text for r in t.collect()}
    back = {(r.conv_id, r.turn_idx): r.text for r in ordered_turns(shuffled).collect()}
    assert orig == back


def test_salted_reconstruction_equals_plain(spark):
    t = derive_transcripts(spark, SF_SMALL)
    plain = {r.conv_id: (r.conv_text, r.n_turns) for r in conversation_text(t).collect()}
    # tiny bucket size forces multiple segments per conversation
    salted = {
        r.conv_id: (r.conv_text, r.n_turns)
        for r in conversation_text_salted(t, bucket_size=2).collect()
    }
    assert plain == salted
