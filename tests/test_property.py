"""Property-based tests (hypothesis) for the detector semantics and the
reconstruction invariant. Spark-touching properties keep max_examples low;
pure-Python detector properties run broadly."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from amr_kg_spark.operators.mentions import compile_detectors

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
TERMS = st.lists(
    st.text(alphabet="ABCDEFGH", min_size=2, max_size=6),
    min_size=1, max_size=5, unique=True,
)


@settings(max_examples=200, deadline=None)
@given(terms=TERMS, filler=st.lists(WORD, min_size=0, max_size=10))
def test_planted_terms_are_always_found(terms, filler):
    """Any vocabulary term planted with space boundaries is detected."""
    dets = compile_detectors({"x": terms})
    text = " ".join(filler[: len(filler) // 2] + [terms[0]] + filler[len(filler) // 2:])
    found = [m.group(0) for m in dets["x"].finditer(text)]
    assert terms[0] in found


@settings(max_examples=200, deadline=None)
@given(terms=TERMS, text=st.text(alphabet="abcdefghij ", max_size=60))
def test_no_false_positives_on_disjoint_alphabet(terms, text):
    """Lowercase-only text can never match uppercase-only vocabulary."""
    dets = compile_detectors({"x": terms})
    assert list(dets["x"].finditer(text)) == []


@settings(max_examples=100, deadline=None)
@given(
    prefix=st.text(alphabet="ABC", min_size=2, max_size=4),
    suffix=st.text(alphabet="DEF", min_size=1, max_size=3),
)
def test_longest_match_wins_property(prefix, suffix):
    """When one term extends another, the longer term is the match."""
    short, long_ = prefix, f"{prefix} {suffix}"
    dets = compile_detectors({"x": [short, long_]})
    found = [m.group(0) for m in dets["x"].finditer(f"zz {long_} zz")]
    assert found == [long_]


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(st.floats(min_value=0.1, max_value=999.9), min_size=1, max_size=4))
def test_activity_values_roundtrip(vals):
    dets = compile_detectors({})
    text = " and ".join(f"{round(v, 1)} nM" for v in vals)
    found = [m.group(0) for m in dets["activity"].finditer(text)]
    assert found == [f"{round(v, 1)} nM" for v in vals]


def test_reconstruction_invariant_under_random_order(spark):
    """Spark property: any permutation of turn arrival order reconstructs
    identical conversation text (checked via random repartitions)."""
    from amr_kg_spark.fixtures import synth_transcripts
    from amr_kg_spark.operators.reconstruct import conversation_text

    t = synth_transcripts(spark, n_turns=500, n_convs=20)
    baseline = {r.conv_id: r.conv_text for r in conversation_text(t).collect()}
    for seed_col in ("text", "role", "ts"):
        shuffled = t.repartition(13, seed_col)
        got = {r.conv_id: r.conv_text for r in conversation_text(shuffled).collect()}
        assert got == baseline
