"""Triple extraction + node/edge/triple materialization.

Edge families are the transcript-domain analogues of the reference's
relation builders (reference src/relations.py):

- compound -testedAgainst-> pathogen   (ASSAY IN, src/relations.py:119-125)
- pathogen -resistantTo-> compound     (strain-resistantTo-drug per north_star;
                                        gate = 'resistant to' marker in turn)
- compound -hasActivity-> value        (MIC/pChEMBL props, src/relations.py:117,
                                        src/mic-script.py:116 HAS_pIC50)
- compound -studiedAt-> institution    (WORKS_AT family, src/relations.py:33)

Scale design: co-occurrence pairs are built INSIDE each turn's mention
array with Catalyst higher-order functions (filter/transform/flatten) —
zero shuffle, no self-join of the exploded mention table. Linking joins
are broadcast. The only shuffles in the whole KG build are the final
dropDuplicates on nodes and any explicit repartition before write.

Node identity is deterministic ``xxhash64(label, name)`` — stable across
resume/checkpoint (monotonically_increasing_id is forbidden, SURVEY §1.2).
The undirected triple export reproduces the reference's Cypher
``Match (n)-[r]-(m)`` (src/amr.py:337-349): every edge appears in both
directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import vocab
from .linking import vocab_tables
from .mentions import detect_mentions

RESISTANCE_MARKER = " resistant to "


def _cls_array(cls: str) -> F.Column:
    """Distinct mention strings of one class, from the mentions array.

    One ``F.expr`` (JVM-parsed) instead of Python-lambda HOFs: identical
    expression tree, but built in a single py4j call — query CONSTRUCTION
    is driver-side Python and the lambda form cost ~0.17 s per
    kg_triples/kg_nodes call in round-8 profiling (guide §1: the bench
    times construction + planning + execution)."""
    return F.expr(
        "array_distinct(transform(filter(mentions, "
        f"m -> m.entity_class = '{cls}'), m -> m.mention))"
    )


def cooccurrence_pairs(with_mentions: DataFrame) -> DataFrame:
    """Per-turn (subj_mention, pred, obj_mention) pairs — no shuffle.

    Pair construction is a per-row array cartesian (flatten∘transform),
    evaluated inside the scan stage; returns one row per pair. The
    expressions are single ``F.expr`` strings (see :func:`_cls_array`).
    """
    def cross(a: str, b: str, pred: str, swap: bool = False) -> str:
        subj, obj = ("y", "x") if swap else ("x", "y")
        return (
            f"flatten(transform({a}, x -> transform({b}, y -> "
            f"named_struct('subj_mention', {subj}, 'pred', '{pred}', "
            f"'obj_mention', {obj}))))"
        )

    df = with_mentions.withColumn("compounds", _cls_array("compound")) \
        .withColumn("pathogens", _cls_array("pathogen")) \
        .withColumn("activities", _cls_array("activity")) \
        .withColumn("institutions", _cls_array("institution")) \
        .withColumn("is_resistant", F.col("text").contains(RESISTANCE_MARKER))

    pairs = F.expr(
        "concat("
        "CASE WHEN is_resistant THEN "
        + cross("compounds", "pathogens", "resistantTo", swap=True)
        + " ELSE "
        + cross("compounds", "pathogens", "testedAgainst")
        + " END, "
        + cross("compounds", "activities", "hasActivity")
        + ", "
        + cross("compounds", "institutions", "studiedAt")
        + ")"
    )
    return (
        df.withColumn("pair", F.explode(pairs))
        .select(
            "conv_id",
            "turn_idx",
            F.col("pair.subj_mention").alias("subj_mention"),
            F.col("pair.pred").alias("pred"),
            F.col("pair.obj_mention").alias("obj_mention"),
        )
    )


def _entity_resolution_rows() -> list[tuple[str, str, str, str]]:
    """(mention, label, canonical name, curie) rows from the controlled
    vocabularies — strain normalization (J2) and the compound id priority
    chain (J5, chembl > pubchem > spark > drug.central) baked in."""
    p = vocab.CURIE_PREFIX
    taxon = dict(vocab.PATHOGENS)
    rows: list[tuple[str, str, str, str]] = []
    for name, tax in vocab.PATHOGENS:
        rows.append((name, "Pathogen", name, p["ncbitaxon"] + tax))
    for alias, canon in vocab.STRAIN_ALIASES:
        rows.append((alias, "Pathogen", canon, p["ncbitaxon"] + taxon[canon]))
    for pref, chembl, pubchem, spark_id, dc in vocab.COMPOUNDS:
        curie = (
            (p["chembl"] + chembl)
            if chembl
            else (p["pubchem"] + pubchem)
            if pubchem
            else (p["spark"] + spark_id)
            if spark_id
            else (p["drugcentral"] + dc)
            if dc
            else None
        )
        rows.append((pref, "Compound", pref, curie))
    for _, inst, _, _ in vocab.INSTITUTES:
        rows.append((inst, "Institution", inst, p["institute"] + inst.lower()))
    return rows


def _entity_resolution(spark: SparkSession) -> DataFrame:
    """Broadcast dimension: mention -> (label, canonical name, curie).

    Encodes strain normalization (J2) and the compound id priority chain
    (J5, chembl > pubchem > spark > drug.central)."""
    v = vocab_tables(spark)
    p = vocab.CURIE_PREFIX

    pathogens = (
        v["pathogen"]
        .select(
            F.col("pathogen").alias("mention"),
            F.lit("Pathogen").alias("label"),
            F.col("pathogen").alias("name"),
            F.concat(F.lit(p["ncbitaxon"]), F.col("ncbitaxon")).alias("curie"),
        )
    )
    strains = (
        v["strain_alias"]
        .join(v["pathogen"], F.col("canonical") == F.col("pathogen"), "left")
        .select(
            F.col("alias").alias("mention"),
            F.lit("Pathogen").alias("label"),
            F.col("canonical").alias("name"),
            F.concat(F.lit(p["ncbitaxon"]), F.col("ncbitaxon")).alias("curie"),
        )
    )
    compounds = v["compound"].select(
        F.col("pref_name").alias("mention"),
        F.lit("Compound").alias("label"),
        F.col("pref_name").alias("name"),
        F.coalesce(
            F.concat(F.lit(p["chembl"]), F.col("chembl_id")),
            F.concat(F.lit(p["pubchem"]), F.col("pubchem_id")),
            F.concat(F.lit(p["spark"]), F.col("spark_id")),
            F.concat(F.lit(p["drugcentral"]), F.col("drugcentral_id")),
        ).alias("curie"),
    )
    institutes = v["institute"].select(
        F.col("institute").alias("mention"),
        F.lit("Institution").alias("label"),
        F.col("institute").alias("name"),
        F.concat(F.lit(p["institute"]), F.lower(F.col("institute"))).alias("curie"),
    )
    return pathogens.unionByName(strains).unionByName(compounds).unionByName(institutes)


def resolve_pairs(
    spark: SparkSession, pairs: DataFrame, literal_map_max: int = 10_000
) -> DataFrame:
    """Resolve both endpoints; activity values resolve to themselves
    (label Activity, no curie).

    Physical strategy: for dimension vocabularies up to ``literal_map_max``
    entries the lookup is a literal ``create_map`` expression — it stays
    inside whole-stage codegen with ZERO joins/exchanges on the fact side
    (measured ~3x faster than the broadcast hash join at 300k turns).
    Larger vocabularies fall back to broadcast hash joins.
    """
    rows = _entity_resolution_rows()
    if len(rows) <= literal_map_max:
        # ONE JVM-parsed map literal instead of 4*len(rows) py4j column
        # constructions: the F.lit/F.struct/F.create_map form cost ~0.22 s
        # of driver-side Python per query CONSTRUCTION (round-8
        # profiling); the SQL string builds in microseconds and parses
        # JVM-side to the identical constant-folded map.
        def q(s: str) -> str:
            return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

        kv = []
        for mention, label, name, curie in rows:
            c = q(curie) if curie is not None else "CAST(NULL AS STRING)"
            kv.append(
                f"{q(mention)}, named_struct('label', {q(label)}, "
                f"'name', {q(name)}, 'curie', {c})"
            )
        lookup = F.expr("map(" + ", ".join(kv) + ")")

        def side(df: DataFrame, col: str, out: str) -> DataFrame:
            hit = lookup[F.col(col)]
            return (
                df.withColumn(f"{out}_label", F.coalesce(hit["label"], F.lit("Activity")))
                .withColumn(f"{out}_curie", hit["curie"])
                .withColumn(out, F.coalesce(hit["name"], F.col(col)))
            )

        resolved = side(side(pairs, "subj_mention", "subj"), "obj_mention", "obj")
    else:
        dim = F.broadcast(_entity_resolution(spark))

        def side(df: DataFrame, col: str, out: str) -> DataFrame:
            d = dim.select(
                F.col("mention").alias(f"_{out}_mention"),
                F.col("label").alias(f"{out}_label"),
                F.col("name").alias(f"_{out}_name"),
                F.col("curie").alias(f"{out}_curie"),
            )
            df = df.join(d, F.col(col) == F.col(f"_{out}_mention"), "left")
            return (
                df.withColumn(
                    f"{out}_label", F.coalesce(f"{out}_label", F.lit("Activity"))
                )
                .withColumn(out, F.coalesce(f"_{out}_name", F.col(col)))
                .drop(f"_{out}_mention", f"_{out}_name")
            )

        resolved = side(side(pairs, "subj_mention", "subj"), "obj_mention", "obj")

    return resolved.select(
        "conv_id", "turn_idx",
        "subj", "subj_label", "subj_curie",
        "pred",
        "obj", "obj_label", "obj_curie",
    )


def build_nodes(resolved: DataFrame) -> DataFrame:
    """Distinct typed nodes with deterministic ids (A1/A4 dedup).

    Both endpoints come out of ONE pass (explode of a two-struct array):
    the former subj/obj union evaluated the entire upstream pipeline —
    transcripts derivation + the Arrow mention UDF — once per branch
    (round-9; same multiset of rows, so the distinct output is
    identical: curie is functionally dependent on (label, name))."""
    both = resolved.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("subj_label").alias("label"),
                    F.col("subj").alias("name"),
                    F.col("subj_curie").alias("curie"),
                ),
                F.struct(
                    F.col("obj_label").alias("label"),
                    F.col("obj").alias("name"),
                    F.col("obj_curie").alias("curie"),
                ),
            )
        ).alias("n")
    )
    return (
        both.select("n.label", "n.name", "n.curie")
        .dropDuplicates(["label", "name"])
        .withColumn("node_id", F.xxhash64("label", "name"))
        .withColumn("props", F.create_map(F.lit("source"), F.lit("transcripts")))
        .select("node_id", "label", "name", "curie", "props")
    )


def build_edges(resolved: DataFrame) -> DataFrame:
    """Multi-edges (one per co-occurrence event), props carry provenance —
    MapType because the reference emits dynamic property keys
    (src/relations.py:208-209)."""
    return resolved.select(
        F.xxhash64("subj_label", "subj").alias("src_id"),
        F.xxhash64("obj_label", "obj").alias("dst_id"),
        F.col("pred").alias("rel_type"),
        F.create_map(
            F.lit("conv_id"), F.col("conv_id"),
            F.lit("turn_idx"), F.col("turn_idx").cast("string"),
        ).alias("props"),
    )


def build_triples(resolved: DataFrame) -> DataFrame:
    """Distinct (subj, pred, obj) triple table — the parity surface."""
    return resolved.select(
        "subj", "subj_curie", "pred", "obj", "obj_curie"
    ).dropDuplicates(["subj", "pred", "obj"])


def export_undirected(triples: DataFrame) -> DataFrame:
    """Reference's undirected Cypher export (src/amr.py:344): each triple in
    both directions.

    One pass (explode of a two-struct array) instead of a fwd/rev union:
    the union form evaluated the whole triple-extraction subtree — the
    distinct aggregation and everything below it — once per branch
    (round-9; same output multiset, order-insensitive surface)."""
    return triples.select(
        F.explode(
            F.array(
                F.struct(
                    "subj", "subj_curie", "pred", "obj", "obj_curie"
                ),
                F.struct(
                    F.col("obj").alias("subj"),
                    F.col("obj_curie").alias("subj_curie"),
                    F.col("pred").alias("pred"),
                    F.col("subj").alias("obj"),
                    F.col("subj_curie").alias("obj_curie"),
                ),
            )
        ).alias("t")
    ).select("t.subj", "t.subj_curie", "t.pred", "t.obj", "t.obj_curie")


def extract_triples(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """transcripts -> distinct triples (the flagship path)."""
    with_mentions = detect_mentions(transcripts)
    pairs = cooccurrence_pairs(with_mentions)
    return build_triples(resolve_pairs(spark, pairs))
