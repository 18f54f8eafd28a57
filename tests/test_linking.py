"""Entity-linking operators: exact broadcast joins, priority fallback,
strain normalization, and MinHash-LSH fuzzy linking (SURVEY J1/J2/J5/J7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amr_kg_spark.operators.linking import (
    fuzzy_link,
    link_compounds,
    link_pathogens,
    normalize_strains,
    vocab_tables,
)


def test_priority_fallback_chain(spark):
    v = vocab_tables(spark)
    mentions = spark.createDataFrame(
        [("Ciprofloxacin",), ("Colistin",), ("Linezolid",), ("Tigecycline",),
         ("NotACompound",)],
        "mention string",
    )
    got = {r.mention: r.curie for r in link_compounds(mentions, v["compound"]).collect()}
    assert got == {
        "Ciprofloxacin": "chembl:CHEMBL8",      # chembl beats pubchem/spark/dc
        "Colistin": "pubchem:5311054",           # pubchem-only
        "Linezolid": "spark:SPK-303",            # spark-only
        "Tigecycline": "drug.central:2673",      # drugcentral-only
    }  # unlinkable mention dropped (reference 'continue')


def test_strain_normalization(spark):
    v = vocab_tables(spark)
    mentions = spark.createDataFrame(
        [("Escherichia coli K12",), ("Escherichia coli",), ("Novel bug",)],
        "mention string",
    )
    norm = {r.mention: (r.canonical, r.is_strain) for r in
            normalize_strains(mentions, v["strain_alias"]).collect()}
    assert norm["Escherichia coli K12"] == ("Escherichia coli", True)
    assert norm["Escherichia coli"] == ("Escherichia coli", False)
    assert norm["Novel bug"] == ("Novel bug", False)

    linked = {r.mention: r.curie for r in
              link_pathogens(mentions, v["pathogen"], v["strain_alias"]).collect()}
    assert linked == {
        "Escherichia coli K12": "ncbitaxon:562",
        "Escherichia coli": "ncbitaxon:562",
    }


def test_fuzzy_link_matches_dirty_mentions(spark):
    v = vocab_tables(spark)
    dirty = spark.createDataFrame(
        [("ciprofloxacin",), ("Meropenem ",), ("VANCOMYCIN",), ("mero penem",),
         ("totally unrelated string",)],
        "mention string",
    )
    got = fuzzy_link(dirty, v["compound"], threshold=0.55).collect()
    matched = {(r.mention, r.matched_name) for r in got}
    assert ("ciprofloxacin", "Ciprofloxacin") in matched
    assert ("Meropenem ", "Meropenem") in matched
    assert ("VANCOMYCIN", "Vancomycin") in matched
    assert ("mero penem", "Meropenem") in matched
    assert not any(m == "totally unrelated string" for m, _ in matched)
