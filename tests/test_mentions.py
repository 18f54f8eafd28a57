"""Unit tests for the gazetteer/pattern mention detector semantics."""

from __future__ import annotations

from amr_kg_spark.operators.mentions import compile_detectors


def _find(dets, cls, text):
    return [m.group(0) for m in dets[cls].finditer(text)]


def test_longest_match_wins_for_strains():
    dets = compile_detectors(
        {"pathogen": ["Escherichia coli", "Escherichia coli K12"]}
    )
    assert _find(dets, "pathogen", "seen Escherichia coli K12 today") == [
        "Escherichia coli K12"
    ]
    assert _find(dets, "pathogen", "plain Escherichia coli here") == [
        "Escherichia coli"
    ]


def test_word_boundaries():
    dets = compile_detectors({"compound": ["Meropenem"]})
    assert _find(dets, "compound", "xMeropenem Meropenemy Meropenem.") == [
        "Meropenem"
    ]
    assert _find(dets, "compound", "(Meropenem)") == ["Meropenem"]


def test_activity_value_pattern():
    dets = compile_detectors({})
    assert _find(dets, "activity", "MIC 12.5 nM and 7 uM and 3 ug/mL") == [
        "12.5 nM",
        "7 uM",
        "3 ug/mL",
    ]
    # no unit, no match; letter-adjacent digits don't fire
    assert _find(dets, "activity", "K12 strain at 37C") == []


def test_classes_are_independent():
    dets = compile_detectors({"a": ["alpha beta"], "b": ["beta"]})
    assert _find(dets, "a", "alpha beta") == ["alpha beta"]
    assert _find(dets, "b", "alpha beta") == ["beta"]
