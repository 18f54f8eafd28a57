"""Reference-parity KG build: the AMR-KG construction semantics, Spark-first.

Reproduces, as declarative DataFrame ops, exactly what the reference
pipeline emits from its curated inputs (node registries, edge families, and
the undirected triple export) so that triple agreement can be scored
(north_rule: P/R >= 0.95). Every rule cites the reference line it mirrors.

Inputs are reference-shaped DataFrames (FIXTURES.md):
  person(contact,email,orcid,institute,project_1,project_2,pathogen_1..3,
         skill_1..4)            [names already mapped, like map_data
                                 src/amr.py:21-70]
  institute(id,institute,link,projects)
  project(id,project)
  pathogen(pathogen,ncbitaxon)
  skill(id,category,skill,definition)
  mic(pref_name,chembl_id,standard_relation,standard_type,strain,assay_id,
      mic_val)                  [mic_val pre-concatenated, src/amr.py:396]
  spark_tsv(spark_id,smiles,pubmed_id,mic_val,specie,doi,pubchem_id,
      chembl_id)
  drugcentral(drug_name,struct_id,act_value,act_unit,act_type,source,
      organism)
  pubchem_alias(pubchem_id,synonym,iupac_name)   [pre-materialized stand-in
      for the reference's per-row pubchempy REST calls,
      src/sources.py:105,117,166 — SURVEY J7]
  name_to_cid(drug_name,pubchem_id)              [get_compounds(name) stand-in]

Known reference quirks intentionally normalized (SURVEY §7): the
missing-colon curie ``'chembl'+id`` (src/sources.py:111) is emitted as
``chembl:<id>``; tests note the divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .vocab import sql_values  # noqa: F401  (fixture helpers reuse)


def props_map(**pairs: F.Column) -> F.Column:
    """Property map with the reference's 'only if notna' insertion rule
    (src/amr.py:106-115 etc.): null-valued entries are dropped so the map
    holds exactly the keys the reference would have set on the py2neo Node."""
    keys = F.array(*[F.lit(k) for k in pairs])
    vals = F.array(*[v.cast("string") for v in pairs.values()])
    return F.map_filter(F.map_from_arrays(keys, vals), lambda _, v: v.isNotNull())


# ---------------------------------------------------------------------------
# node tables — one (label, key, name, curie, props) frame per registry
# ---------------------------------------------------------------------------

def person_nodes(person: DataFrame) -> DataFrame:
    """src/amr.py:105-118 — keyed by name; name/email/orcid props only if
    notna."""
    return person.select(
        F.lit("Person").alias("label"),
        F.col("contact").alias("key"),
        F.col("contact").alias("name"),
        F.lit(None).cast("string").alias("curie"),
        props_map(
            name=F.col("contact"), email=F.col("email"), orcid=F.col("orcid")
        ).alias("props"),
    ).dropDuplicates(["key"])


def institute_nodes(institute: DataFrame) -> DataFrame:
    """src/amr.py:128-138 — skipped entirely when name is null; the
    reference sets 'link' unguarded inside the notna(name) branch (a NaN
    link becomes a null property); we keep the map null-free."""
    return (
        institute.filter(F.col("institute").isNotNull())
        .select(
            F.lit("Institute").alias("label"),
            F.col("institute").alias("key"),
            F.col("institute").alias("name"),
            F.lit(None).cast("string").alias("curie"),
            props_map(name=F.col("institute"), link=F.col("link")).alias("props"),
        )
        .dropDuplicates(["key"])
    )


def project_nodes(project: DataFrame) -> DataFrame:
    """src/amr.py:149-160 — curie = 'imi:' + lower(name); link = the IMI
    factsheet URL built from the lowered name."""
    curie = F.concat(F.lit("imi:"), F.lower("project"))
    link = F.concat(
        F.lit("https://www.imi.europa.eu/projects-results/project-factsheets/"),
        F.lower("project"),
    )
    return (
        project.filter(F.col("project").isNotNull())
        .select(
            F.lit("Project").alias("label"),
            F.col("project").alias("key"),
            F.col("project").alias("name"),
            curie.alias("curie"),
            props_map(name=F.col("project"), curie=curie, link=link).alias("props"),
        )
        .dropDuplicates(["key"])
    )


def pathogen_nodes(pathogen: DataFrame) -> DataFrame:
    """src/amr.py:179-189 — keyed by (unsplit) pathogen name; info = the
    NCBI taxonomy browser URL."""
    curie = F.concat(F.lit("ncbitaxon:"), F.col("ncbitaxon"))
    info = F.concat(
        F.lit(
            "https://www.ncbi.nlm.nih.gov/Taxonomy/Browser/wwwtax.cgi?mode=Info&id="
        ),
        F.col("ncbitaxon"),
    )
    return (
        pathogen.filter(F.col("pathogen").isNotNull())
        .select(
            F.lit("Pathogen").alias("label"),
            F.col("pathogen").alias("key"),
            F.col("pathogen").alias("name"),
            curie.alias("curie"),
            props_map(name=F.col("pathogen"), curie=curie, info=info).alias("props"),
        )
        .dropDuplicates(["key"])
    )


def skill_nodes(skill: DataFrame) -> DataFrame:
    """src/amr.py:200-220 — skills ∪ {category+'_group'} (A3); definition
    carried for skills that have one (skill_def dict; group nodes have none
    unless a skill shares the group's name)."""
    base = skill.select(F.col("skill").alias("key")).union(
        skill.select(F.concat(F.col("category"), F.lit("_group")).alias("key"))
    ).distinct().filter(F.col("key").isNotNull())
    # skill -> definition (dict comprehension keeps the LAST notna definition
    # per skill; deterministic stand-in: max())
    defs = (
        skill.filter(F.col("definition").isNotNull())
        .groupBy("skill")
        .agg(F.max("definition").alias("definition"))
        .withColumnRenamed("skill", "dkey")
    )
    return (
        base.join(F.broadcast(defs), base["key"] == defs["dkey"], "left")
        .select(
            F.lit("Skill").alias("label"),
            "key",
            F.col("key").alias("name"),
            F.lit(None).cast("string").alias("curie"),
            props_map(name=F.col("key"), definition=F.col("definition")).alias(
                "props"
            ),
        )
    )


def interested_pathogens(pathogen: DataFrame) -> DataFrame:
    """Split-flatten of the pathogen column (src/amr.py:171-177)."""
    return (
        pathogen.filter(F.col("pathogen").isNotNull())
        .select(F.explode(F.split("pathogen", ", ")).alias("p"))
        .distinct()
    )


def chembl_nodes(mic: DataFrame, pathogen: DataFrame) -> DataFrame:
    """src/sources.py:13-49 — semi-filter on interested pathogens, distinct
    (pref_name, chembl_id), keyed by RAW pref_name, display name = title();
    duplicate keys resolve last-wins (dict insert, A4)."""
    ip = interested_pathogens(pathogen)
    rows = (
        mic.join(F.broadcast(ip), mic["strain"] == ip["p"], "left_semi")
        .select("pref_name", "chembl_id")
        .dropDuplicates()
    )
    # last-wins per key (dict overwrite, A4). The reference's "last" is
    # input order; deterministic Spark needs an order-independent tie-break:
    # max chembl_id wins (fixtures keep one id per name, so this only
    # guards pathological inputs).
    w = Window.partitionBy("pref_name").orderBy(
        F.col("chembl_id").desc_nulls_last()
    )
    dedup = rows.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    name = F.when(
        F.col("pref_name").isNotNull(), F.initcap(F.lower("pref_name"))
    )
    curie = F.when(
        F.col("chembl_id").isNotNull(),
        F.concat(F.lit("chembl:"), F.col("chembl_id")),
    )
    info = F.when(
        F.col("chembl_id").isNotNull(),
        F.concat(
            F.lit("https://www.ebi.ac.uk/chembl/compound_report_card/"),
            F.col("chembl_id"),
            F.lit("/"),
        ),
    )
    return dedup.select(
        F.lit("ChEMBL").alias("label"),
        F.col("pref_name").alias("key"),
        name.alias("name"),
        curie.alias("curie"),
        props_map(name=name, curie=curie, info=info).alias("props"),
    )


def spark_source_nodes(
    spark_tsv: DataFrame, pathogen: DataFrame, chembl: DataFrame,
    pubchem_alias: DataFrame,
) -> dict[str, DataFrame]:
    """src/sources.py:52-127 — three-way branch per distinct SPARK row:
    no ids -> SPARK node (first-wins); chembl id -> merge into existing
    ChEMBL node (props only; name/curie unchanged) or new ChEMBL node named
    synonym/chembl_id; else PubChem node keyed by pubchem id (first-wins),
    named by IUPAC alias."""
    ip = interested_pathogens(pathogen)
    rows = (
        spark_tsv.join(F.broadcast(ip), spark_tsv["specie"] == ip["p"], "left_semi")
        .select("spark_id", "smiles", "pubchem_id", "chembl_id")
        .dropDuplicates()
        .withColumn("pubchem_id", F.split("pubchem_id", r"\.")[0])  # :87-88
    )
    alias = F.broadcast(pubchem_alias)

    no_ids = rows.filter(
        F.col("chembl_id").isNull() & F.col("pubchem_id").isNull()
    )
    spark_nodes = (
        no_ids.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("spark_id").orderBy(F.col("smiles").asc_nulls_last())
            ),
        )
        .filter(F.col("rn") == 1)  # first-wins :91-92
        .select(
            F.lit("SPARK").alias("label"),
            F.col("spark_id").alias("key"),
            F.lit(None).cast("string").alias("name"),  # no name prop :97
            F.concat(F.lit("spark:"), F.col("spark_id")).alias("curie"),
            props_map(
                SMILES=F.col("smiles"),
                curie=F.concat(F.lit("spark:"), F.col("spark_id")),
            ).alias("props"),
        )
    )

    with_chembl = rows.filter(F.col("chembl_id").isNotNull())
    known = chembl.select(F.col("curie").alias("kc")).filter(
        F.col("kc").isNotNull()
    ).withColumn("kid", F.regexp_replace("kc", "^chembl:", ""))
    # rows whose chembl_id is NOT already a ChEMBL node -> new node :110-114;
    # props: SMILES?, Spark ID, PubChem ID + pubchem info when pubchem_id
    # notna, then the chembl curie/info overwrite (dict insert order :99-113)
    pub_curie = F.when(
        F.col("pubchem_id").isNotNull(),
        F.concat(F.lit("pubchem:"), F.col("pubchem_id")),
    )
    chembl_info = F.concat(
        F.lit("https://www.ebi.ac.uk/chembl/compound_report_card/"),
        F.col("chembl_id"),
        F.lit("/"),
    )
    new_chembl = (
        with_chembl.join(
            F.broadcast(known), with_chembl["chembl_id"] == known["kid"], "left_anti"
        )
        .join(alias, "pubchem_id", "left")
        .withColumn("nm", F.coalesce(F.col("synonym"), F.col("chembl_id")))  # :105,85
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("nm").orderBy(F.col("spark_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)  # dict overwrite per name: last row wins
        .select(
            F.lit("ChEMBL").alias("label"),
            F.col("nm").alias("key"),
            F.col("nm").alias("name"),
            F.concat(F.lit("chembl:"), F.col("chembl_id")).alias("curie"),  # :111 normalized
            props_map(
                SMILES=F.col("smiles"),
                **{
                    "Spark ID": F.concat(F.lit("spark:"), F.col("spark_id")),
                    "PubChem ID": pub_curie,
                },
                curie=F.concat(F.lit("chembl:"), F.col("chembl_id")),
                info=chembl_info,
                name=F.col("nm"),
            ).alias("props"),
        )
    )

    pubchem_only = rows.filter(
        F.col("chembl_id").isNull() & F.col("pubchem_id").isNotNull()
    )
    pubchem_nodes = (
        pubchem_only.join(alias, "pubchem_id", "left")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("pubchem_id").orderBy(F.col("spark_id").asc())
            ),
        )
        .filter(F.col("rn") == 1)  # first-wins :119-120
        .select(
            F.lit("PubChem").alias("label"),
            F.col("pubchem_id").alias("key"),
            F.col("iupac_name").alias("name"),  # :117
            F.concat(F.lit("pubchem:"), F.col("pubchem_id")).alias("curie"),
            props_map(
                SMILES=F.col("smiles"),
                **{"Spark ID": F.concat(F.lit("spark:"), F.col("spark_id"))},
                name=F.col("iupac_name"),
                curie=F.concat(F.lit("pubchem:"), F.col("pubchem_id")),
                info=F.concat(
                    F.lit("https://pubchem.ncbi.nlm.nih.gov/compound/"),
                    F.col("pubchem_id"),
                ),
            ).alias("props"),
        )
    )

    # merge branch (:106-109): rows whose chembl_id IS a known ChEMBL node
    # update that node's props in place. The reference registers ChEMBL
    # nodes under the RAW pref_name but looks the merge target up by the
    # TITLE-CASED name (chembl_to_node_map stores name.title()), so the
    # merge only lands when the two coincide — we reproduce exactly that by
    # joining the graft on the title-cased key; last row per key wins.
    grafts = (
        with_chembl.join(
            F.broadcast(known), with_chembl["chembl_id"] == known["kid"], "left_semi"
        )
        .join(alias, "pubchem_id", "left")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("chembl_id").orderBy(F.col("spark_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("chembl_id").alias("graft_chembl_id"),
            props_map(
                SMILES=F.col("smiles"),
                **{
                    "Spark ID": F.concat(F.lit("spark:"), F.col("spark_id")),
                    "PubChem ID": pub_curie,
                },
                info=F.when(
                    F.col("pubchem_id").isNotNull(),
                    F.concat(
                        F.lit("https://pubchem.ncbi.nlm.nih.gov/compound/"),
                        F.col("pubchem_id"),
                    ),
                ),
            ).alias("graft_props"),
        )
    )
    return {
        "SPARK": spark_nodes,
        "ChEMBL_new": new_chembl,
        "PubChem": pubchem_nodes,
        "ChEMBL_graft": grafts,
    }


def drugcentral_nodes(
    drugcentral: DataFrame, strain_alias_keys: DataFrame, name_to_cid: DataFrame,
    pubchem_alias: DataFrame,
) -> dict[str, DataFrame]:
    """src/sources.py:130-184 — organism ∈ PATHOGEN_MAPPER keys, distinct
    (drug_name, struct_id); alias-table lookup replaces get_compounds():
    hit -> PubChem node keyed by STRUCT_ID(!), miss -> DrugCentral node."""
    rows = (
        drugcentral.join(
            F.broadcast(strain_alias_keys),
            drugcentral["organism"] == strain_alias_keys["alias"],
            "left_semi",
        )
        .select("drug_name", "struct_id")
        .dropDuplicates()
    )
    looked = rows.join(F.broadcast(name_to_cid), "drug_name", "left")
    hits = (
        looked.filter(F.col("pubchem_id").isNotNull())
        .join(F.broadcast(pubchem_alias), "pubchem_id", "left")
        .select(
            F.lit("PubChem").alias("label"),
            F.col("struct_id").alias("key"),  # keyed by drug_central id :177
            F.col("synonym").alias("name"),  # synonyms[0] :175
            F.concat(F.lit("pubchem:"), F.col("pubchem_id")).alias("curie"),
            props_map(
                curie=F.concat(F.lit("pubchem:"), F.col("pubchem_id")),
                info=F.concat(
                    F.lit("https://pubchem.ncbi.nlm.nih.gov/compound/"),
                    F.col("pubchem_id"),
                ),
                **{
                    "DrugCentral ID": F.concat(
                        F.lit("drug.central:"), F.col("struct_id")
                    )
                },
                name=F.col("synonym"),
            ).alias("props"),
        )
        .dropDuplicates(["key"])
    )
    misses = (
        looked.filter(F.col("pubchem_id").isNull())
        .select(
            F.lit("DrugCentral").alias("label"),
            F.col("struct_id").alias("key"),
            F.col("drug_name").alias("name"),
            F.concat(F.lit("drug.central:"), F.col("struct_id")).alias("curie"),
            props_map(
                curie=F.concat(F.lit("drug.central:"), F.col("struct_id")),
                info=F.concat(
                    F.lit("https://drugcentral.org/drugcard/"), F.col("struct_id")
                ),
                name=F.col("drug_name"),
            ).alias("props"),
        )
        .dropDuplicates(["key"])
    )
    return {"PubChem_dc": hits, "DrugCentral": misses}


# ---------------------------------------------------------------------------
# edges — (src_label, src_key, rel, dst_label, dst_key) + props
# ---------------------------------------------------------------------------

def base_edges(person: DataFrame) -> DataFrame:
    """src/relations.py:12-88 — per person row: WORKS_AT, IS_INVOLVED_IN
    (project_2 suppressed when == project_1), institute SUPERVISES
    project_1, HAS_SKILL over skill_1..3 with equality suppression
    (skill_4 is destructured but never used by the reference), WORKS_WITH
    over pathogen_1..3 with equality suppression."""
    p = person

    def e(src_label, src_col, rel, dst_label, dst_col, cond=None):
        df = p if cond is None else p.filter(cond)
        return df.select(
            F.lit(src_label).alias("src_label"),
            F.col(src_col).alias("src_key"),
            F.lit(rel).alias("rel"),
            F.lit(dst_label).alias("dst_label"),
            F.col(dst_col).alias("dst_key"),
        )

    c = F.col
    edges = [
        e("Person", "contact", "WORKS_AT", "Institute", "institute"),
        e("Person", "contact", "IS_INVOLVED_IN", "Project", "project_1",
          c("project_1").isNotNull()),
        e("Institute", "institute", "SUPERVISES", "Project", "project_1",
          c("project_1").isNotNull()),
        e("Person", "contact", "IS_INVOLVED_IN", "Project", "project_2",
          c("project_2").isNotNull()
          & ~(c("project_2").eqNullSafe(c("project_1")))),
        e("Person", "contact", "HAS_SKILL", "Skill", "skill_1",
          c("skill_1").isNotNull()),
        e("Person", "contact", "HAS_SKILL", "Skill", "skill_2",
          c("skill_2").isNotNull() & ~c("skill_2").eqNullSafe(c("skill_1"))),
        e("Person", "contact", "HAS_SKILL", "Skill", "skill_3",
          c("skill_3").isNotNull()
          & ~c("skill_3").eqNullSafe(c("skill_1"))
          & ~c("skill_3").eqNullSafe(c("skill_2"))),
        e("Person", "contact", "WORKS_WITH", "Pathogen", "pathogen_1",
          c("pathogen_1").isNotNull()),
        e("Person", "contact", "WORKS_WITH", "Pathogen", "pathogen_2",
          c("pathogen_2").isNotNull() & ~c("pathogen_2").eqNullSafe(c("pathogen_1"))),
        e("Person", "contact", "WORKS_WITH", "Pathogen", "pathogen_3",
          c("pathogen_3").isNotNull()
          & ~c("pathogen_3").eqNullSafe(c("pathogen_1"))
          & ~c("pathogen_3").eqNullSafe(c("pathogen_2"))),
    ]
    out = edges[0]
    for x in edges[1:]:
        out = out.unionByName(x)
    return out


def chembl_assay_edges(mic: DataFrame, pathogen_keys: DataFrame) -> DataFrame:
    """src/relations.py:91-125 — Pathogen -ASSAY IN-> ChEMBL[pref_name];
    skipped when strain isn't a Pathogen node key or when both mic_val and
    standard_relation are null."""
    gated = mic.join(
        F.broadcast(pathogen_keys), mic["strain"] == pathogen_keys["pkey"], "left_semi"
    ).filter(~(F.col("mic_val").isNull() & F.col("standard_relation").isNull()))
    return gated.select(
        F.lit("Pathogen").alias("src_label"),
        F.col("strain").alias("src_key"),
        F.lit("ASSAY IN").alias("rel"),
        F.lit("ChEMBL").alias("dst_label"),
        F.col("pref_name").alias("dst_key"),
    )


def spark_assay_edges(
    spark_tsv: DataFrame, pathogen_keys: DataFrame, nodes: DataFrame
) -> DataFrame:
    """src/relations.py:128-174 — Pathogen -ASSAY IN-> resolved chem node;
    resolution = SPARK[spark_id] -> ChEMBL[chembl_id] (only nodes whose KEY
    is the raw chembl id, i.e. the synonym-less new nodes) ->
    PubChem[pubchem_id]; unresolved rows dropped (nested KeyError ->
    continue)."""
    rows = spark_tsv.join(
        F.broadcast(pathogen_keys),
        spark_tsv["specie"] == pathogen_keys["pkey"],
        "left_semi",
    ).withColumn("pubchem_norm", F.split("pubchem_id", r"\.")[0])

    def keyset(label: str, out: str) -> DataFrame:
        return nodes.filter(F.col("label") == label).select(
            F.col("key").alias(out)
        ).distinct()

    sk = keyset("SPARK", "k_spark")
    ck = keyset("ChEMBL", "k_chembl")
    pk = keyset("PubChem", "k_pubchem")
    r = (
        rows.join(F.broadcast(sk), rows["spark_id"] == sk["k_spark"], "left")
        .join(F.broadcast(ck), rows["chembl_id"] == ck["k_chembl"], "left")
        .join(F.broadcast(pk), F.col("pubchem_norm") == pk["k_pubchem"], "left")
    )
    # the reference tries ChEMBL only when chembl_id is notna, else PubChem
    resolved = r.withColumn(
        "dst_label",
        F.when(F.col("k_spark").isNotNull(), F.lit("SPARK"))
        .when(F.col("chembl_id").isNotNull() & F.col("k_chembl").isNotNull(), F.lit("ChEMBL"))
        .when(F.col("chembl_id").isNull() & F.col("k_pubchem").isNotNull(), F.lit("PubChem")),
    ).withColumn(
        "dst_key",
        F.when(F.col("k_spark").isNotNull(), F.col("spark_id"))
        .when(F.col("chembl_id").isNotNull(), F.col("k_chembl"))
        .otherwise(F.col("k_pubchem")),
    ).filter(F.col("dst_label").isNotNull())
    return resolved.select(
        F.lit("Pathogen").alias("src_label"),
        F.col("specie").alias("src_key"),
        F.lit("ASSAY IN").alias("rel"),
        "dst_label",
        "dst_key",
    )


def drugcentral_assay_edges(
    drugcentral: DataFrame, strain_alias: DataFrame, pathogen_keys: DataFrame,
    nodes: DataFrame,
) -> DataFrame:
    """src/relations.py:177-220 — organism normalized via PATHOGEN_MAPPER
    (J2), gate on Pathogen keys, chem = PubChem[struct_id] ->
    DrugCentral[struct_id] -> skip."""
    mapped = drugcentral.join(
        F.broadcast(strain_alias),
        drugcentral["organism"] == strain_alias["alias"],
        "left",
    ).withColumn("pathogen", F.col("canonical"))
    gated = mapped.join(
        F.broadcast(pathogen_keys),
        mapped["pathogen"] == pathogen_keys["pkey"],
        "left_semi",
    )

    pk = nodes.filter(F.col("label") == "PubChem").select(
        F.col("key").alias("k_pub")
    ).distinct()
    dk = nodes.filter(F.col("label") == "DrugCentral").select(
        F.col("key").alias("k_dc")
    ).distinct()
    r = (
        gated.join(F.broadcast(pk), gated["struct_id"] == pk["k_pub"], "left")
        .join(F.broadcast(dk), gated["struct_id"] == dk["k_dc"], "left")
        .withColumn(
            "dst_label",
            F.when(F.col("k_pub").isNotNull(), F.lit("PubChem"))
            .when(F.col("k_dc").isNotNull(), F.lit("DrugCentral")),
        )
        .filter(F.col("dst_label").isNotNull())
    )
    return r.select(
        F.lit("Pathogen").alias("src_label"),
        F.col("pathogen").alias("src_key"),
        F.lit("ASSAY IN").alias("rel"),
        "dst_label",
        F.col("struct_id").alias("dst_key"),
    )


def skill_includes_edges(skill: DataFrame) -> DataFrame:
    """src/amr.py:278-297 — category_group INCLUDES skill, every row."""
    return skill.select(
        F.lit("Skill").alias("src_label"),
        F.concat(F.col("category"), F.lit("_group")).alias("src_key"),
        F.lit("INCLUDES").alias("rel"),
        F.lit("Skill").alias("dst_label"),
        F.col("skill").alias("dst_key"),
    )


def institute_supervises_edges(
    institute: DataFrame, project: DataFrame
) -> DataFrame:
    """src/amr.py:300-334 — institute SUPERVISES project for each id in the
    comma-joined projects column (split+explode, F6)."""
    exploded = institute.select(
        "institute", F.explode(F.split("projects", ",")).alias("pid")
    ).filter(F.col("pid") != "")
    pj = project.select(
        F.col("id").cast("int").alias("pid_i"), F.col("project").alias("pname")
    )
    return (
        exploded.join(
            F.broadcast(pj), exploded["pid"].cast("int") == pj["pid_i"], "inner"
        )
        .select(
            F.lit("Institute").alias("src_label"),
            F.col("institute").alias("src_key"),
            F.lit("SUPERVISES").alias("rel"),
            F.lit("Project").alias("dst_label"),
            F.col("pname").alias("dst_key"),
        )
    )


# ---------------------------------------------------------------------------
# assembly + undirected triple export (src/amr.py:337-349)
# ---------------------------------------------------------------------------

def build_reference_graph(
    person: DataFrame,
    institute: DataFrame,
    project: DataFrame,
    pathogen: DataFrame,
    skill: DataFrame,
    mic: DataFrame,
    spark_tsv: DataFrame,
    drugcentral: DataFrame,
    pubchem_alias: DataFrame,
    name_to_cid: DataFrame,
    strain_alias: DataFrame,
) -> dict[str, DataFrame]:
    """Full reference-semantics KG: returns nodes, edges, triples (directed,
    distinct) and the undirected export."""
    chembl = chembl_nodes(mic, pathogen)
    spark_branch = spark_source_nodes(spark_tsv, pathogen, chembl, pubchem_alias)
    dc_branch = drugcentral_nodes(
        drugcentral, strain_alias.select(F.col("alias")), name_to_cid, pubchem_alias
    )
    nodes = (
        person_nodes(person)
        .unionByName(institute_nodes(institute))
        .unionByName(project_nodes(project))
        .unionByName(pathogen_nodes(pathogen))
        .unionByName(skill_nodes(skill))
        .unionByName(chembl)
        .unionByName(spark_branch["SPARK"])
        .unionByName(spark_branch["ChEMBL_new"])
        .unionByName(spark_branch["PubChem"])
        .unionByName(dc_branch["PubChem_dc"])
        .unionByName(dc_branch["DrugCentral"])
        .dropDuplicates(["label", "key"])
    )

    # SPARK->ChEMBL property merge (src/sources.py:106-109): rows whose
    # chembl_id is already a ChEMBL node update that node's props in place
    # (Node.update == last-wins dict update, A4). The reference looks the
    # target up by the TITLE-CASED name in a RAW-name-keyed dict, so the
    # graft lands only where the two coincide — reproduced by joining on
    # the node's title name.
    id_to_title = chembl.filter(F.col("curie").isNotNull()).select(
        F.regexp_replace("curie", "^chembl:", "").alias("gid"),
        F.col("name").alias("target_key"),
    )
    # two raw pref_names can title-case to the same target_key; the
    # reference's dict holds ONE winner per key (last assignment wins), so
    # dedup the graft frame deterministically — without this the left join
    # below would duplicate the matched node row, breaking the
    # one-row-per-(label,key) invariant of the preceding dropDuplicates
    graft = (
        spark_branch["ChEMBL_graft"]
        .join(
            F.broadcast(id_to_title),
            F.col("graft_chembl_id") == F.col("gid"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("target_key").orderBy(F.col("gid").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("target_key", "graft_props")
    )
    nodes = (
        nodes.join(
            F.broadcast(graft),
            (nodes["label"] == "ChEMBL") & (nodes["key"] == graft["target_key"]),
            "left",
        )
        .select(
            "label",
            "key",
            "name",
            "curie",
            F.when(
                F.col("graft_props").isNotNull(),
                F.map_concat(
                    F.map_filter(
                        "props",
                        lambda k, _: ~F.map_contains_key(F.col("graft_props"), k),
                    ),
                    F.col("graft_props"),
                ),
            )
            .otherwise(F.col("props"))
            .alias("props"),
        )
    )

    pathogen_keys = pathogen_nodes(pathogen).select(F.col("key").alias("pkey"))
    edges = (
        base_edges(person)
        .unionByName(chembl_assay_edges(mic, pathogen_keys))
        .unionByName(spark_assay_edges(spark_tsv, pathogen_keys, nodes))
        .unionByName(
            drugcentral_assay_edges(drugcentral, strain_alias, pathogen_keys, nodes)
        )
        .unionByName(skill_includes_edges(skill))
        .unionByName(institute_supervises_edges(institute, project))
    )

    src_n = nodes.select(
        F.col("label").alias("src_label"),
        F.col("key").alias("src_key"),
        F.col("name").alias("subj"),
        F.col("curie").alias("subj_curie"),
    )
    dst_n = nodes.select(
        F.col("label").alias("dst_label"),
        F.col("key").alias("dst_key"),
        F.col("name").alias("obj"),
        F.col("curie").alias("obj_curie"),
    )
    triples = (
        edges.join(src_n, ["src_label", "src_key"])
        .join(dst_n, ["dst_label", "dst_key"])
        .select("subj", "subj_curie", F.col("rel").alias("pred"), "obj", "obj_curie")
        .dropDuplicates()
    )
    undirected = triples.unionByName(
        triples.select(
            F.col("obj").alias("subj"),
            F.col("obj_curie").alias("subj_curie"),
            "pred",
            F.col("subj").alias("obj"),
            F.col("subj_curie").alias("obj_curie"),
        )
    ).dropDuplicates()
    return {"nodes": nodes, "edges": edges, "triples": triples, "undirected": undirected}


# ---------------------------------------------------------------------------
# the standalone MIC subgraph ('micdata' db, src/mic-script.py:16-129)
# ---------------------------------------------------------------------------

def mic_graph(mic_doc: DataFrame) -> dict[str, DataFrame]:
    """Replays the mic-script build: node families Bacteria / Chemical /
    IC50 / Journal / Year and the per-row edge MULTISET (tx.create per
    dataframe row, no dedup — src/mic-script.py:90-129).

    mic_doc columns (all string, pandas dtype=str):
      strain, chembl_id, name, pic50, assay_id, journal, year

    Reference semantics mirrored:
    - Chemical nodes from distinct (chembl_id, name) pairs keyed by NAME;
      dict overwrite per name = last pair wins (:33-47). The reference's
      'last' is input order; deterministic surrogate: max chembl_id.
    - Journal nodes from pre-fillna uniques with NaN -> 'Assay test'
      (:60-61); the fillna on the data happens AFTER node creation (:166),
      so every row emits FOUND_IN and the 'Assay test' node exists exactly
      when some row has a null journal.
    - Year nodes only for notna years, and their property key is 'year',
      not 'name' (:75-82).
    - ASSAY_IN only when assay_id notna (with the assay_info URL prop,
      :104-111); HAS_pIC50 / IN_YEAR only when the value is notna. The
      reference also creates an IC50 node for a NaN pIC50 (:50-57); it is
      unreachable by any edge and is not materialized here.
    """
    bacteria = mic_doc.select(F.col("strain").alias("key")).distinct().select(
        F.lit("Bacteria").alias("label"),
        "key",
        F.col("key").alias("name"),
        F.lit(None).cast("string").alias("curie"),
        props_map(name=F.col("key")).alias("props"),
    )
    w = Window.partitionBy("name").orderBy(F.col("chembl_id").desc_nulls_last())
    chemical = (
        mic_doc.select("chembl_id", "name")
        .dropDuplicates()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.lit("Chemical").alias("label"),
            F.col("name").alias("key"),
            "name",
            F.lit(None).cast("string").alias("curie"),
            props_map(
                chembl=F.when(
                    F.col("chembl_id").isNotNull(),
                    F.concat(
                        F.lit("https://www.ebi.ac.uk/chembl/compound_report_card/"),
                        F.col("chembl_id"),
                        F.lit("/"),
                    ),
                ),
                name=F.col("name"),
            ).alias("props"),
        )
    )
    ic50 = (
        mic_doc.filter(F.col("pic50").isNotNull())
        .select(F.col("pic50").alias("key"))
        .distinct()
        .select(
            F.lit("IC50").alias("label"),
            "key",
            F.col("key").alias("name"),
            F.lit(None).cast("string").alias("curie"),
            props_map(name=F.col("key")).alias("props"),
        )
    )
    journal = (
        mic_doc.select(F.coalesce("journal", F.lit("Assay test")).alias("key"))
        .distinct()
        .select(
            F.lit("Journal").alias("label"),
            "key",
            F.col("key").alias("name"),
            F.lit(None).cast("string").alias("curie"),
            props_map(name=F.col("key")).alias("props"),
        )
    )
    year = (
        mic_doc.filter(F.col("year").isNotNull())
        .select(F.col("year").alias("key"))
        .distinct()
        .select(
            F.lit("Year").alias("label"),
            "key",
            F.col("key").alias("name"),  # display name; the stored prop is 'year'
            F.lit(None).cast("string").alias("curie"),
            props_map(year=F.col("key")).alias("props"),
        )
    )
    nodes = (
        bacteria.unionByName(chemical)
        .unionByName(ic50)
        .unionByName(journal)
        .unionByName(year)
    )

    no_props = F.create_map().cast("map<string,string>")

    def edge(src_label, src_key, rel, dst_label, dst_key, cond, props):
        return mic_doc.filter(cond).select(
            F.lit(src_label).alias("src_label"),
            src_key.alias("src_key"),
            F.lit(rel).alias("rel"),
            F.lit(dst_label).alias("dst_label"),
            dst_key.alias("dst_key"),
            props.alias("props"),
        )

    edges = (
        edge(
            "Bacteria",
            F.col("strain"),
            "ASSAY_IN",
            "Chemical",
            F.col("name"),
            F.col("assay_id").isNotNull(),
            props_map(
                assay_info=F.concat(
                    F.lit("https://www.ebi.ac.uk/chembl/assay_report_card/"),
                    F.col("assay_id"),
                    F.lit("/"),
                )
            ),
        )
        .unionByName(
            edge(
                "Chemical",
                F.col("name"),
                "HAS_pIC50",
                "IC50",
                F.col("pic50"),
                F.col("pic50").isNotNull(),
                no_props,
            )
        )
        .unionByName(
            edge(
                "Chemical",
                F.col("name"),
                "FOUND_IN",
                "Journal",
                F.coalesce("journal", F.lit("Assay test")),
                F.lit(True),
                no_props,
            )
        )
        .unionByName(
            edge(
                "Chemical",
                F.col("name"),
                "IN_YEAR",
                "Year",
                F.col("year"),
                F.col("year").isNotNull(),
                no_props,
            )
        )
    )

    src_n = nodes.select(
        F.col("label").alias("src_label"),
        F.col("key").alias("src_key"),
        F.col("name").alias("subj"),
    )
    dst_n = nodes.select(
        F.col("label").alias("dst_label"),
        F.col("key").alias("dst_key"),
        F.col("name").alias("obj"),
    )
    # MULTISET of (subj, pred, obj): joins on total node keys, no dedup
    triples = (
        edges.join(src_n, ["src_label", "src_key"])
        .join(dst_n, ["dst_label", "dst_key"])
        .select("subj", F.col("rel").alias("pred"), "obj")
    )
    return {"nodes": nodes, "edges": edges, "triples": triples}


# ---------------------------------------------------------------------------
# golden-dump export (S8 format: the reference's APOC-style ragged CSV,
# /root/reference/data/dump/v1.0.csv:1 — node rows then edge rows in ONE
# file, node property columns + _start/_end/_type edge columns)
# ---------------------------------------------------------------------------

DUMP_EDGE_PROPS = ["ChEMBL Assay", "DOI", "Literature", "MIC"]


def graph_dump(
    nodes: DataFrame,
    edges: DataFrame,
    edge_prop_cols: list[str] | None = None,
    prop_keys: list[str] | None = None,
    ids: DataFrame | None = None,
) -> DataFrame:
    """The dump as ONE DataFrame in the reference's column discipline:

      _id,_labels,<node prop cols...>,_start,_end,_type,<edge prop cols...>

    - node rows: ``_id`` (dense, deterministic by (label, key) order),
      ``_labels`` = ``:Label``, one column per property key (union over
      the graph, case-sensitively sorted like the reference header), edge
      columns null;
    - edge rows: node columns null, ``_start``/``_end`` resolved to node
      ids, ``_type`` = rel, edge property columns (from an optional
      ``props`` map on the edges frame; the base graph's edges carry
      none, matching empty cells).

    The dense id needs a global row_number — a single-partition sort.
    That is the right call HERE: the dump is a compatibility artifact
    over the curated graph dimensions (thousands of rows); the 100 TB
    fact tables leave through the table/parquet sinks, never this one.
    """
    if prop_keys is None:
        prop_keys = sorted(
            {
                r[0]
                for r in nodes.select(
                    F.explode(F.map_keys("props")).alias("k")
                ).distinct().collect()
            }
            | {"name"}
        )
    eprops = edge_prop_cols or DUMP_EDGE_PROPS

    if ids is not None:
        # caller-supplied (label, key, _id) — e.g. the published dump's own
        # id assignment for byte-level diffs against it
        ided = nodes.join(ids, ["label", "key"])
    else:
        w = Window.orderBy("label", "key")
        ided = nodes.withColumn("_id", F.row_number().over(w) - F.lit(1))

    node_rows = ided.select(
        F.col("_id").cast("string").alias("_id"),
        F.concat(F.lit(":"), F.col("label")).alias("_labels"),
        *[
            (
                F.coalesce(F.element_at("props", k), F.col("name"))
                if k == "name"
                else F.element_at("props", F.lit(k))
            ).alias(k)
            for k in prop_keys
        ],
        F.lit(None).cast("string").alias("_start"),
        F.lit(None).cast("string").alias("_end"),
        F.lit(None).cast("string").alias("_type"),
        *[F.lit(None).cast("string").alias(c) for c in eprops],
        F.lit(0).alias("_kind"),
        F.col("label").alias("_s1"),
        F.col("key").alias("_s2"),
    )

    ids = ided.select("label", "key", "_id")
    has_eprops = "props" in edges.columns
    edge_rows = (
        edges.join(
            ids.select(
                F.col("label").alias("src_label"),
                F.col("key").alias("src_key"),
                F.col("_id").alias("_start_id"),
            ),
            ["src_label", "src_key"],
        )
        .join(
            ids.select(
                F.col("label").alias("dst_label"),
                F.col("key").alias("dst_key"),
                F.col("_id").alias("_end_id"),
            ),
            ["dst_label", "dst_key"],
        )
        .select(
            F.lit(None).cast("string").alias("_id"),
            F.lit(None).cast("string").alias("_labels"),
            *[F.lit(None).cast("string").alias(k) for k in prop_keys],
            F.col("_start_id").cast("string").alias("_start"),
            F.col("_end_id").cast("string").alias("_end"),
            F.col("rel").alias("_type"),
            *[
                (
                    F.element_at("props", F.lit(c))
                    if has_eprops
                    else F.lit(None).cast("string")
                ).alias(c)
                for c in eprops
            ],
            F.lit(1).alias("_kind"),
            F.col("rel").alias("_s1"),
            F.concat_ws(
                "->", F.col("_start_id").cast("string"),
                F.col("_end_id").cast("string")
            ).alias("_s2"),
        )
    )
    return (
        node_rows.unionByName(edge_rows)
        .orderBy("_kind", "_s1", "_s2")
        .drop("_kind", "_s1", "_s2")
    )


def write_graph_dump(
    nodes: DataFrame, edges: DataFrame, out_dir: str
) -> None:
    """Write the dump as one header'd CSV file (coalesce(1): the golden
    dump is by definition a single diffable file)."""
    (
        graph_dump(nodes, edges)
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("emptyValue", "")
        .csv(out_dir)
    )


def apoc_dump_lines(
    nodes: DataFrame,
    edges: DataFrame,
    prop_keys: list[str],
    edge_prop_cols: list[str] | None = None,
    ids: DataFrame | None = None,
) -> DataFrame:
    """Render the graph into the reference dump's EXACT byte format
    (data/dump/v1.0.csv) — one ``line`` string per row, Catalyst only.
    Cells are built positionally from the ``props`` map, so the dump's
    case-colliding ``Name``/``name`` columns need no case-sensitive
    resolver.

    APOC's quoting convention (verified byte-for-byte against every base
    row of the published dump in test_realdump_parity): a cell is either
    QUOTED (non-null, ``"`` doubled, even when empty) or BARE-EMPTY
    (null), and which of the two applies is decided by the ROW KIND, not
    the value — node rows quote ``_id``, ``_labels`` and every node
    property column and leave the edge columns bare; edge rows leave the
    node columns bare and quote ``_start``/``_end``/``_type`` and every
    edge property column.

    ``ids``: optional (label, key, _id) assignment (e.g. the published
    dump's own ids for byte diffs); defaults to graph_dump's dense
    row_number ids."""
    eprops = edge_prop_cols or DUMP_EDGE_PROPS

    def q(c):
        return F.concat(
            F.lit('"'),
            F.regexp_replace(F.coalesce(c, F.lit("")), '"', '""'),
            F.lit('"'),
        )

    bare = F.lit("")
    if ids is None:
        w = Window.orderBy("label", "key")
        ids = nodes.select("label", "key").withColumn(
            "_id", (F.row_number().over(w) - F.lit(1)).cast("string")
        )
    ided = nodes.join(ids, ["label", "key"])

    def prop_cell(k):
        v = F.element_at("props", F.lit(k))
        if k == "name":
            v = F.coalesce(v, F.col("name"))
        return q(v)

    node_lines = ided.select(
        F.concat_ws(
            ",",
            q(F.col("_id")),
            q(F.concat(F.lit(":"), F.col("label"))),
            *[prop_cell(k) for k in prop_keys],
            *([bare] * (3 + len(eprops))),
        ).alias("line")
    )

    has_eprops = "props" in edges.columns
    edge_lines = (
        edges.join(
            ids.select(
                F.col("label").alias("src_label"),
                F.col("key").alias("src_key"),
                F.col("_id").alias("_start_id"),
            ),
            ["src_label", "src_key"],
        )
        .join(
            ids.select(
                F.col("label").alias("dst_label"),
                F.col("key").alias("dst_key"),
                F.col("_id").alias("_end_id"),
            ),
            ["dst_label", "dst_key"],
        )
        .select(
            F.concat_ws(
                ",",
                *([bare] * (2 + len(prop_keys))),
                q(F.col("_start_id")),
                q(F.col("_end_id")),
                q(F.col("rel")),
                *[
                    q(
                        F.element_at("props", F.lit(c))
                        if has_eprops
                        else F.lit(None).cast("string")
                    )
                    for c in eprops
                ],
            ).alias("line")
        )
    )
    return node_lines.unionByName(edge_lines)
