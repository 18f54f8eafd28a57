"""Loaders for the reference repo's REAL input files (read-only at
/root/reference/data) into the reference-shaped frames that
:mod:`amr_kg_spark.refgraph` consumes — the id->name mapping layer the
reference applies in ``map_data`` (src/amr.py:21-70), done Spark-first
with broadcast lookup joins (the S3/J1 operator surface on real data).

Quirk reproduced deliberately: the reference builds its pathogen mapping
dict WITHOUT an index column (src/amr.py:47-52), so person.pathogen_N ids
are resolved POSITIONALLY (0-based row order), not by a 1-based id.
Verified against the published dump: 0-based matches all 73 WORKS_WITH
pairs, 1-based matches 5.

Encoding note: person.csv contains UTF-8 bytes of U+FFFD (already-mangled
names); the reference reads it as ISO-8859-1 (constants.py ENCODING),
yielding the 'ï¿½' mojibake, while the published dump carries the plain
U+FFFD. :func:`fix_mojibake` normalizes the first form to the second so
name-level comparisons are byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.files import read_csv

REF_DATA = "/root/reference/data"


def fix_mojibake(s: str | None) -> str | None:
    """latin1->utf8 roundtrip where decodable (ï¿½ -> U+FFFD etc.)."""
    if s is None:
        return None
    try:
        return s.encode("latin-1").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return s


def _lookup(
    df: DataFrame, col: str, dim: DataFrame, key: str, val: str
) -> DataFrame:
    """Replace ``col``'s id values with the dim's name values via a
    broadcast left join (the reference's dict .map())."""
    d = dim.select(F.col(key).alias("__k"), F.col(val).alias("__v"))
    return (
        df.join(F.broadcast(d), df[col] == F.col("__k"), "left")
        .withColumn(col, F.col("__v"))
        .drop("__k", "__v")
    )


def load_reference_base_inputs(
    spark: SparkSession, data_dir: str = REF_DATA
) -> dict[str, DataFrame]:
    """The five base tables (person mapped, institute, project, pathogen,
    skill) from the real files, shaped for refgraph's builders."""
    amr = f"{data_dir}/AMR"
    institute = read_csv(spark, f"{amr}/institute.csv")
    project = read_csv(spark, f"{amr}/project.csv")
    pathogen = read_csv(spark, f"{amr}/pathogen.csv")
    skill = read_csv(spark, f"{amr}/skill.csv").select(
        "id", "category", "skill", "definition"
    )
    person = read_csv(spark, f"{amr}/person.csv")

    # id -> name maps (institute/project/skill are 1-based id files)
    person = _lookup(person, "institute", institute, "id", "institute")
    for c in ("project_1", "project_2"):
        person = _lookup(person, c, project, "id", "project")
    for c in ("skill_1", "skill_2", "skill_3", "skill_4"):
        person = _lookup(person, c, skill, "id", "skill")
    # pathogen: POSITIONAL 0-based (reference quirk, see module docstring)
    from pyspark.sql import Window

    pathogen_pos = pathogen.withColumn(
        "__pos",
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
        - F.lit(1),
    ).select(F.col("__pos").cast("string").alias("id"), "pathogen")
    # NOTE: row order of a small single-file CSV scan is the file order;
    # good enough for the read-only reference fixture this loader targets.
    for c in ("pathogen_1", "pathogen_2", "pathogen_3"):
        person = _lookup(person, c, pathogen_pos, "id", "pathogen")

    return {
        "person": person.select(
            "contact", "email", "orcid", "institute", "project_1",
            "project_2", "pathogen_1", "pathogen_2", "pathogen_3",
            "skill_1", "skill_2", "skill_3", "skill_4",
        ),
        "institute": institute,
        "project": project,
        "pathogen": pathogen,
        "skill": skill,
    }


def build_base_graph(spark: SparkSession, data_dir: str = REF_DATA):
    """Nodes + name-level triples for the base subgraph (Person/Institute/
    Project/Pathogen/Skill families) from the REAL reference inputs."""
    from .refgraph import (
        base_edges,
        institute_nodes,
        institute_supervises_edges,
        pathogen_nodes,
        person_nodes,
        project_nodes,
        skill_includes_edges,
        skill_nodes,
    )

    t = load_reference_base_inputs(spark, data_dir)
    nodes = (
        person_nodes(t["person"])
        .unionByName(institute_nodes(t["institute"]))
        .unionByName(project_nodes(t["project"]))
        .unionByName(pathogen_nodes(t["pathogen"]))
        .unionByName(skill_nodes(t["skill"]))
        .dropDuplicates(["label", "key"])
    )
    edges = (
        base_edges(t["person"])
        .unionByName(skill_includes_edges(t["skill"]))
        .unionByName(institute_supervises_edges(t["institute"], t["project"]))
        # edge-instance distinct: the reference graph holds ONE relationship
        # per identical (start, type, end) — e.g. two person rows sharing
        # (institute, project_1) yield one SUPERVISES edge in the published
        # dump (138 rows, not 145), verified byte-level in
        # test_dump_bytes_base_families
        .dropDuplicates()
    )
    src = nodes.select(
        F.col("label").alias("src_label"),
        F.col("key").alias("src_key"),
        F.col("name").alias("subj"),
    )
    dst = nodes.select(
        F.col("label").alias("dst_label"),
        F.col("key").alias("dst_key"),
        F.col("name").alias("obj"),
    )
    triples = (
        edges.join(src, ["src_label", "src_key"])
        .join(dst, ["dst_label", "dst_key"])
        .select("subj", F.col("rel").alias("pred"), "obj")
        .dropDuplicates()
    )
    return {"nodes": nodes, "edges": edges, "triples": triples}


BASE_EDGE_TYPES = {
    "WORKS_AT",
    "IS_INVOLVED_IN",
    "SUPERVISES",
    "HAS_SKILL",
    "WORKS_WITH",
    "INCLUDES",
}


def load_dump_base_triples(path: str = f"{REF_DATA}/dump/v1.0.csv") -> set:
    """Name-level (subj, rel, obj) triples of the base families from the
    reference's published golden dump (driver-side: the dump is a 2.5k-row
    curated artifact)."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    hdr = rows[0]
    ix = {c: i for i, c in enumerate(hdr)}
    nodes = {
        r[ix["_id"]]: r[ix["name"]] or r[ix["Name"]]
        for r in rows[1:]
        if r[ix["_labels"]]
    }
    out = set()
    for r in rows[1:]:
        if r[ix["_labels"]] or r[ix["_type"]] not in BASE_EDGE_TYPES:
            continue
        s, t, o = (
            nodes[r[ix["_start"]]],
            r[ix["_type"]],
            nodes[r[ix["_end"]]],
        )
        # dump-version artifact: the published dump carries INCLUDES as
        # skill -> group, while the current reference source creates
        # group -> skill (src/amr.py:295 'Relationship(skill_class_node,
        # INCLUDES, skill_node)') — the direction this engine mirrors.
        # Normalize the old dump to the current semantics.
        if t == "INCLUDES":
            s, o = o, s
        out.add((s, t, o))
    return out


def load_reference_mic(
    spark: SparkSession, data_dir: str = REF_DATA
) -> DataFrame:
    """The mic frame refgraph expects (pref_name, chembl_id,
    standard_relation, standard_type, strain, assay_id, mic_val), derived
    from the REAL ``MIC/mic-data.tsv`` — the raw ChEMBL export whose
    distinct (NAME, Molecule ChEMBL ID) pairs are exactly the published
    dump's ChEMBL ingestion input (775/775 name overlap, zero extras; the
    repo's ``data_dump_31.tsv`` intermediate is absent). mic_val =
    standard_value + standard_units string concat (src/amr.py:393-396)."""
    from .sources.files import read_tsv

    mic = read_tsv(spark, f"{data_dir}/MIC/mic-data.tsv")
    return mic.select(
        F.col("NAME").alias("pref_name"),
        F.col("Molecule ChEMBL ID").alias("chembl_id"),
        F.col("Standard Relation").alias("standard_relation"),
        F.col("Standard Type").alias("standard_type"),
        F.col("strain").alias("strain"),
        F.col("Assay ChEMBL ID").alias("assay_id"),
        F.concat("Standard Value", "Standard Units").alias("mic_val"),
    )


def build_chembl_assay_triples(
    spark: SparkSession, data_dir: str = REF_DATA
) -> DataFrame:
    """Name-level Pathogen -ASSAY IN-> ChEMBL triples from the real mic
    export (the dump's largest edge family: 1009 of 1498 edges)."""
    from .refgraph import chembl_assay_edges, chembl_nodes, pathogen_nodes

    pathogen = read_csv(spark, f"{data_dir}/AMR/pathogen.csv")
    mic = load_reference_mic(spark, data_dir)
    chembl = chembl_nodes(mic, pathogen)
    pkeys = pathogen_nodes(pathogen).select(F.col("key").alias("pkey"))
    edges = chembl_assay_edges(mic, pkeys)
    dst = chembl.select(
        F.col("key").alias("dst_key"), F.col("name").alias("obj")
    )
    return (
        edges.join(dst, ["dst_key"])
        .select(
            F.col("src_key").alias("subj"),
            F.col("rel").alias("pred"),
            "obj",
        )
        .dropDuplicates()
    )


def load_dump_chembl_assay_triples(
    path: str = f"{REF_DATA}/dump/v1.0.csv",
) -> set:
    """Distinct Pathogen->ChEMBL ASSAY-IN triples from the published dump,
    LOWERCASED obj names: the dump predates the current source's
    ``name.title()`` on ChEMBL display names (src/sources.py:44-46), so
    names compare case-insensitively. Pathogen->SPARK/PubChem assay edges
    (53 of 1062) are out of scope: their endpoints are named by live
    PubChem REST lookups the sandbox cannot replay."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    hdr = rows[0]
    ix = {c: i for i, c in enumerate(hdr)}
    nodes = {
        r[ix["_id"]]: (r[ix["_labels"]], r[ix["name"]] or r[ix["Name"]])
        for r in rows[1:]
        if r[ix["_labels"]]
    }
    out = set()
    for r in rows[1:]:
        if r[ix["_labels"]] or r[ix["_type"]] != "ASSAY IN":
            continue
        (slbl, sname) = nodes[r[ix["_start"]]]
        (dlbl, dname) = nodes[r[ix["_end"]]]
        if dlbl != ":ChEMBL":
            continue
        out.add((sname, "ASSAY IN", (dname or "").lower()))
    return out


def load_reference_spark_tsv(
    spark: SparkSession, data_dir: str = REF_DATA
) -> DataFrame:
    """The SPARK frame refgraph expects, from the REAL
    ``SPARK/processed_mic_data.tsv`` (src/amr.py:398-407: dtype=str +
    drop_duplicates)."""
    from .sources.files import read_tsv

    t = read_tsv(spark, f"{data_dir}/SPARK/processed_mic_data.tsv")
    return t.select(
        F.col("Compound Name").alias("spark_id"),
        F.col("SMILES").alias("smiles"),
        F.col("PubMed ID").alias("pubmed_id"),
        F.col("Curated & Transformed MIC Data: MIC (in microM) (microM)").alias(
            "mic_val"
        ),
        F.col("Curated & Transformed MIC Data: Species").alias("specie"),
        F.col("Curated & Transformed MIC Data: DOI").alias("doi"),
        F.col("pubchem").alias("pubchem_id"),
        F.col("chembl").alias("chembl_id"),
    ).dropDuplicates()


def load_offline_pubchem_alias(
    spark: SparkSession, path: str | None = None
) -> DataFrame:
    """The pre-materialized PubChem alias table — SURVEY's prescription
    for the REST half of entity naming: the reference names some nodes via
    LIVE pubchempy calls (src/sources.py:105 ``synonyms[0]`` for
    chembl+pubchem rows, :117 ``iupac_name`` for pubchem-only rows,
    :166-175 DrugCentral). At 100 TB that is a broadcast-joined offline
    vocabulary snapshot refreshed out-of-band, never a per-row REST call.

    This snapshot (``data/pubchem_alias_snapshot.csv``, 16 rows) is
    DERIVED FROM THE PUBLISHED DUMP's own node rows — the REST vocabulary
    exactly as of the dump date, declared as such: ``synonym`` comes from
    dump ChEMBL nodes carrying a PubChem ID prop, ``iupac_name`` from dump
    PubChem nodes. Production swaps the file for a real PubChem bulk
    extract; the join path is identical."""
    if path is None:
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "pubchem_alias_snapshot.csv",
        )
    return (
        spark.read.option("header", True).csv(path)
        .select("pubchem_id", "synonym", "iupac_name")
    )


def build_spark_assay_triples(
    spark: SparkSession,
    data_dir: str = REF_DATA,
    alias: DataFrame | None = None,
) -> DataFrame:
    """Pathogen -ASSAY IN-> {SPARK | ChEMBL | PubChem} triples from the
    real SPARK export, naming REST-dependent endpoints through the OFFLINE
    alias snapshot (broadcast-joined inside spark_source_nodes — the J7
    REST half done as a vocabulary table, src/sources.py:105,117).
    Identity per family: SPARK endpoints by spark_id (dump SPARK nodes
    carry no name), ChEMBL endpoints by lowercased name (synonym when the
    alias provides one, chembl id otherwise), PubChem endpoints by IUPAC
    name."""
    from .refgraph import (
        chembl_nodes,
        pathogen_nodes,
        spark_assay_edges,
        spark_source_nodes,
    )

    pathogen = read_csv(spark, f"{data_dir}/AMR/pathogen.csv")
    mic = load_reference_mic(spark, data_dir)
    spark_tsv = load_reference_spark_tsv(spark, data_dir)
    if alias is None:
        alias = load_offline_pubchem_alias(spark)
    chembl = chembl_nodes(mic, pathogen)
    branch = spark_source_nodes(spark_tsv, pathogen, chembl, alias)
    nodes = (
        branch["SPARK"]
        .unionByName(branch["ChEMBL_new"])
        .unionByName(branch["PubChem"])
        .unionByName(chembl)
    )
    pkeys = pathogen_nodes(pathogen).select(F.col("key").alias("pkey"))
    edges = spark_assay_edges(spark_tsv, pkeys, nodes)
    name_by_key = nodes.select(
        F.col("label").alias("dst_label"),
        F.col("key").alias("dst_key"),
        F.col("name").alias("dst_name"),
    ).dropDuplicates(["dst_label", "dst_key"])
    return (
        edges.join(F.broadcast(name_by_key), ["dst_label", "dst_key"], "left")
        .select(
            F.col("src_key").alias("subj"),
            F.col("rel").alias("pred"),
            F.when(F.col("dst_label") == "SPARK", F.col("dst_key"))
            .when(F.col("dst_label") == "PubChem", F.col("dst_name"))
            .otherwise(F.lower("dst_key"))
            .alias("obj"),
            "dst_label",
        )
        .dropDuplicates()
    )


def load_dump_spark_assay_triples(
    path: str = f"{REF_DATA}/dump/v1.0.csv",
) -> set:
    """Distinct Pathogen->{SPARK|ChEMBL|PubChem} ASSAY-IN triples from the
    dump, with the same identities as :func:`build_spark_assay_triples`
    (SPARK endpoint = its 'SPARK ID' prop; ChEMBL endpoint = lowercased
    name; PubChem endpoint = its REST-era IUPAC name, reproducible offline
    via the vendored alias snapshot)."""
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    hdr = rows[0]
    ix = {c: i for i, c in enumerate(hdr)}
    nodes = {}
    for r in rows[1:]:
        if r[ix["_labels"]]:
            nodes[r[ix["_id"]]] = (
                r[ix["_labels"]],
                r[ix["name"]] or r[ix["Name"]],
                r[ix["SPARK ID"]],
            )
    out = set()
    for r in rows[1:]:
        if r[ix["_labels"]] or r[ix["_type"]] != "ASSAY IN":
            continue
        slbl, sname, _ = nodes[r[ix["_start"]]]
        dlbl, dname, dspark = nodes[r[ix["_end"]]]
        if dlbl == ":SPARK":
            out.add((sname, "ASSAY IN", dspark, "SPARK"))
        elif dlbl == ":ChEMBL":
            out.add((sname, "ASSAY IN", (dname or "").lower(), "ChEMBL"))
        elif dlbl == ":PubChem":
            out.add((sname, "ASSAY IN", dname, "PubChem"))
    return out
