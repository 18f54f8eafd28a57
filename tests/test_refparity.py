"""Reference triple-parity (north_rule: P/R >= 0.95).

A fresh dict-based Python oracle replays the reference's control flow
(/root/reference/src/amr.py, sources.py, relations.py — reimplemented, not
copied) over reference-shaped fixtures; the Spark refgraph build must emit
the same distinct triple set. Fixtures exercise: null columns, in-row
duplicate suppression, the comma-joined pathogen entry (split for the
'interested' filter but unsplit as node key), last-wins/first-wins
registries, the SPARK id fallback chain, the DrugCentral alias-mapping +
name->CID lookup branch, and multi-id compounds.

Known intentional divergence: the reference emits a malformed curie
'chembl<ID>' on one branch (src/sources.py:111); both oracle and engine
normalize it to 'chembl:<ID>'.
"""

from __future__ import annotations

import pytest

# ---------------------------------------------------------------------------
# reference-shaped fixtures
# ---------------------------------------------------------------------------

PERSON = [
    # contact, email, orcid, institute, project_1, project_2, p1, p2, p3, s1..s4
    ("Ana Ruiz", "a@x.de", "0-1", "Inst A", "PROJ-X", "PROJ-Y",
     "Escherichia coli", "Klebsiella pneumoniae", None,
     "Microbiology", "Genomics", "Microbiology", "Chemistry"),
    ("Ben Cho", None, None, "Inst B", "PROJ-X", "PROJ-X",   # project_2 == project_1
     "Escherichia coli", "Escherichia coli", "Pseudomonas aeruginosa",
     "Genomics", "Genomics", None, None),
    ("Cy Dee", "c@x.de", None, "Inst A", None, None, None, None, None,
     None, None, None, None),
]
INSTITUTE = [
    ("1", "Inst A", "http://a", "1,2"),
    ("2", "Inst B", "http://b", "2"),
]
PROJECT = [("1", "PROJ-X"), ("2", "PROJ-Y")]
PATHOGEN = [
    ("Escherichia coli", "562"),
    ("Klebsiella pneumoniae", "573"),
    ("Pseudomonas aeruginosa", "287"),
    ("Shigella sp., Shigella flexneri", "620"),  # comma entry: split for the
    # interested filter, UNSPLIT as Pathogen node key (src/amr.py:171-189)
]
SKILL = [
    ("1", "Wet Lab", "Microbiology", "def1"),
    ("2", "Dry Lab", "Genomics", None),
    ("3", "Wet Lab", "Chemistry", "def3"),
]
MIC = [
    # pref_name, chembl_id, standard_relation, standard_type, strain, assay_id, mic_val
    ("Cipro", "CH1", "=", "MIC", "Escherichia coli", "A1", "5nM"),
    ("Cipro", "CH1", ">", "MIC", "Klebsiella pneumoniae", "A2", "7nM"),
    ("Mero", "CH2", None, "MIC", "Escherichia coli", "A3", None),  # both-null skip
    ("Vanco", "CH3", "=", "MIC", "Shigella flexneri", "A4", "9nM"),  # interested
    # (via split) so the ChEMBL node exists, but strain is not a Pathogen
    # node key -> node yes, edge no
    ("Dapto", "CH4", "=", "MIC", "Unrelated bug", "A5", "1nM"),  # filtered out
]
SPARK_TSV = [
    # spark_id, smiles, pubmed_id, mic_val, specie, doi, pubchem_id, chembl_id
    ("S1", "C1=C", "p1", "3", "Escherichia coli", "d1", None, None),     # SPARK node
    ("S1", "C1=C", "p2", "4", "Escherichia coli", "d2", None, None),     # dup spark_id (first-wins)
    ("S2", None, None, "5", "Klebsiella pneumoniae", None, "111.0", None),  # PubChem node
    ("S3", "CC", "p3", "6", "Pseudomonas aeruginosa", None, "222.0", "CH1"),  # merge into existing ChEMBL (props only)
    ("S4", "CO", None, "7", "Escherichia coli", None, "333.0", "CH9"),   # new ChEMBL keyed by synonym
    ("S5", None, None, "8", "Klebsiella pneumoniae", None, None, "CH8"),  # new ChEMBL keyed by chembl_id
    ("S6", None, None, "9", "Unrelated bug", None, None, None),          # filtered out
]
DRUGCENTRAL = [
    # drug_name, struct_id, act_value, act_unit, act_type, source, organism
    ("colistin", "900", "2", "uM", "MIC", "src1", "Escherichia coli K12"),  # alias-mapped; name->cid hit
    ("olddrug", "901", "3", "uM", "IC50", None, "Pseudomonas aeruginosa"),  # name->cid miss -> DrugCentral node
    ("nodrug", "902", "1", "uM", "MIC", None, "Weird organism"),            # not in mapper -> dropped
]
PUBCHEM_ALIAS = [
    ("111", "Compound-111-Syn", "iupac-111"),
    ("222", "Compound-222-Syn", "iupac-222"),
    ("333", "Compound-333-Syn", "iupac-333"),
    ("555", "Colistin-Syn", "iupac-555"),
]
NAME_TO_CID = [("colistin", "555")]
STRAIN_ALIAS = [
    ("Escherichia coli K12", "Escherichia coli"),
    ("Pseudomonas aeruginosa", "Pseudomonas aeruginosa"),
]


# ---------------------------------------------------------------------------
# pure-Python oracle (fresh reimplementation of the reference control flow)
# ---------------------------------------------------------------------------

def oracle_graph() -> tuple[dict, set]:
    """Returns ({(label, key): (name, curie, props_dict)}, triple set)."""
    nodes: dict[str, dict[str, tuple]] = {
        k: {} for k in
        ("Person", "Institute", "Project", "Pathogen", "Skill",
         "ChEMBL", "SPARK", "PubChem", "DrugCentral")
    }
    edges: list[tuple] = []  # (label, key, rel, label, key)

    def put(label, key, name, curie, props=None):
        nodes[label][key] = (name, curie, props or {})

    def clean(d):
        return {k: v for k, v in d.items() if v is not None}

    for contact, email, orcid, *_ in PERSON:
        put("Person", contact, contact, None,
            clean({"name": contact, "email": email, "orcid": orcid}))
    for _, inst, link, _ in INSTITUTE:
        put("Institute", inst, inst, None, clean({"name": inst, "link": link}))
    for _, proj in PROJECT:
        curie = "imi:" + proj.lower()
        put("Project", proj, proj, curie, {
            "name": proj, "curie": curie,
            "link": "https://www.imi.europa.eu/projects-results/project-factsheets/"
                    + proj.lower()})
    interested = set()
    for pname, taxon in PATHOGEN:
        interested.update(pname.split(", "))
        put("Pathogen", pname, pname, "ncbitaxon:" + taxon, {
            "name": pname, "curie": "ncbitaxon:" + taxon,
            "info": "https://www.ncbi.nlm.nih.gov/Taxonomy/Browser/wwwtax.cgi"
                    "?mode=Info&id=" + taxon})
    skill_def = {s[2]: s[3] for s in SKILL if s[3] is not None}
    skills = {s[2] for s in SKILL} | {s[1] + "_group" for s in SKILL}
    for s in skills:
        props = {"name": s}
        if s in skill_def:
            props["definition"] = skill_def[s]
        put("Skill", s, s, None, props)

    # add_chembl: interested-filtered distinct (pref_name, chembl_id)
    chembl_ids_known = set()
    seen = set()
    for pref, chid, _, _, strain, _, _ in MIC:
        if strain not in interested or (pref, chid) in seen:
            continue
        seen.add((pref, chid))
        put("ChEMBL", pref, pref.title(), "chembl:" + chid, {
            "name": pref.title(), "curie": "chembl:" + chid,
            "info": f"https://www.ebi.ac.uk/chembl/compound_report_card/{chid}/"})
        chembl_ids_known.add(chid)

    alias = {a[0]: a for a in PUBCHEM_ALIAS}
    # add_spark
    seen = set()
    for sid, smiles, _, _, specie, _, pub, chid in SPARK_TSV:
        if specie not in interested:
            continue
        row = (sid, smiles, pub, chid)
        if row in seen:
            continue
        seen.add(row)
        pub = pub.split(".")[0] if pub else None
        if chid is None and pub is None:
            if sid in nodes["SPARK"]:
                continue
            put("SPARK", sid, None, "spark:" + sid,
                clean({"SMILES": smiles, "curie": "spark:" + sid}))
        elif chid is not None:
            graft = clean({
                "SMILES": smiles,
                "Spark ID": "spark:" + sid,
                "PubChem ID": "pubchem:" + pub if pub else None,
                "info": f"https://pubchem.ncbi.nlm.nih.gov/compound/{pub}"
                if pub else None,
            })
            if chid in chembl_ids_known:
                # Node.update via the TITLE-cased lookup (src/sources.py:106-109)
                # — lands only when the registered raw key IS the title name
                target = next(
                    (k for k, v in nodes["ChEMBL"].items()
                     if v[1] == "chembl:" + chid and k == v[0]), None
                )
                if target is not None:
                    n, c, p = nodes["ChEMBL"][target]
                    p = dict(p)
                    p.update(graft)
                    nodes["ChEMBL"][target] = (n, c, p)
            else:
                name = alias[pub][1] if pub else chid
                graft["curie"] = "chembl:" + chid  # reference emits 'chembl'+id
                graft["info"] = (
                    f"https://www.ebi.ac.uk/chembl/compound_report_card/{chid}/"
                )
                graft["name"] = name
                put("ChEMBL", name, name, "chembl:" + chid, graft)
        else:
            if pub in nodes["PubChem"]:
                continue
            put("PubChem", pub, alias[pub][2], "pubchem:" + pub, clean({
                "SMILES": smiles, "Spark ID": "spark:" + sid,
                "name": alias[pub][2], "curie": "pubchem:" + pub,
                "info": f"https://pubchem.ncbi.nlm.nih.gov/compound/{pub}"}))

    # add_drug_central
    mapper = dict(STRAIN_ALIAS)
    n2c = dict(NAME_TO_CID)
    seen = set()
    for dname, struct, _, _, _, _, org in DRUGCENTRAL:
        if org not in mapper or (dname, struct) in seen:
            continue
        seen.add((dname, struct))
        cid = n2c.get(dname)
        if cid:
            put("PubChem", struct, alias[cid][1], "pubchem:" + cid, {
                "curie": "pubchem:" + cid,
                "info": f"https://pubchem.ncbi.nlm.nih.gov/compound/{cid}",
                "DrugCentral ID": "drug.central:" + struct,
                "name": alias[cid][1]})
        else:
            put("DrugCentral", struct, dname, "drug.central:" + struct, {
                "curie": "drug.central:" + struct,
                "info": f"https://drugcentral.org/drugcard/{struct}",
                "name": dname})

    # base edges
    for (contact, _, _, inst, p1, p2, g1, g2, g3, s1, s2, s3, _s4) in PERSON:
        edges.append(("Person", contact, "WORKS_AT", "Institute", inst))
        if p1 is not None:
            edges.append(("Person", contact, "IS_INVOLVED_IN", "Project", p1))
            edges.append(("Institute", inst, "SUPERVISES", "Project", p1))
        if p2 is not None and p2 != p1:
            edges.append(("Person", contact, "IS_INVOLVED_IN", "Project", p2))
        if s1 is not None:
            edges.append(("Person", contact, "HAS_SKILL", "Skill", s1))
        if s2 is not None and s2 != s1:
            edges.append(("Person", contact, "HAS_SKILL", "Skill", s2))
        if s3 is not None and s3 != s2 and s3 != s1:
            edges.append(("Person", contact, "HAS_SKILL", "Skill", s3))
        if g1 is not None:
            edges.append(("Person", contact, "WORKS_WITH", "Pathogen", g1))
        if g2 is not None and g2 != g1:
            edges.append(("Person", contact, "WORKS_WITH", "Pathogen", g2))
        if g3 is not None and g3 != g1 and g3 != g2:
            edges.append(("Person", contact, "WORKS_WITH", "Pathogen", g3))

    # chembl assay edges
    for pref, chid, rel, _, strain, aid, mic_val in MIC:
        if strain not in nodes["Pathogen"]:
            continue
        if mic_val is None and rel is None:
            continue
        edges.append(("Pathogen", strain, "ASSAY IN", "ChEMBL", pref))

    # spark assay edges (fallback chain)
    for sid, _, _, _, specie, _, pub, chid in SPARK_TSV:
        if specie not in nodes["Pathogen"]:
            continue
        pubn = pub.split(".")[0] if pub else None
        if sid in nodes["SPARK"]:
            dst = ("SPARK", sid)
        elif chid is not None and chid in nodes["ChEMBL"]:
            dst = ("ChEMBL", chid)
        elif chid is None and pubn in nodes["PubChem"]:
            dst = ("PubChem", pubn)
        else:
            continue
        edges.append(("Pathogen", specie, "ASSAY IN", *dst))

    # drugcentral assay edges
    for dname, struct, _, _, _, _, org in DRUGCENTRAL:
        canon = mapper.get(org)
        if canon not in nodes["Pathogen"]:
            continue
        if struct in nodes["PubChem"]:
            dst = ("PubChem", struct)
        elif struct in nodes["DrugCentral"]:
            dst = ("DrugCentral", struct)
        else:
            continue
        edges.append(("Pathogen", canon, "ASSAY IN", *dst))

    # skill INCLUDES + institute SUPERVISES
    for _, cat, sk, _ in SKILL:
        edges.append(("Skill", cat + "_group", "INCLUDES", "Skill", sk))
    pmap = {pid: pname for pid, pname in PROJECT}
    for _, inst, _, projects in INSTITUTE:
        for pid in projects.split(","):
            if pid:
                edges.append(("Institute", inst, "SUPERVISES", "Project", pmap[pid]))

    triples = set()
    for sl, sk_, rel, dl, dk in edges:
        sn, sc, _ = nodes[sl][sk_]
        on, oc, _ = nodes[dl][dk]
        triples.add((sn, sc, rel, on, oc))
    flat_nodes = {
        (label, key): v for label, d in nodes.items() for key, v in d.items()
    }
    return flat_nodes, triples


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_inputs(spark):
    mk = spark.createDataFrame
    return {
        "person": mk(PERSON, "contact string, email string, orcid string, "
                     "institute string, project_1 string, project_2 string, "
                     "pathogen_1 string, pathogen_2 string, pathogen_3 string, "
                     "skill_1 string, skill_2 string, skill_3 string, skill_4 string"),
        "institute": mk(INSTITUTE, "id string, institute string, link string, projects string"),
        "project": mk(PROJECT, "id string, project string"),
        "pathogen": mk(PATHOGEN, "pathogen string, ncbitaxon string"),
        "skill": mk(SKILL, "id string, category string, skill string, definition string"),
        "mic": mk(MIC, "pref_name string, chembl_id string, standard_relation string, "
                  "standard_type string, strain string, assay_id string, mic_val string"),
        "spark_tsv": mk(SPARK_TSV, "spark_id string, smiles string, pubmed_id string, "
                        "mic_val string, specie string, doi string, pubchem_id string, "
                        "chembl_id string"),
        "drugcentral": mk(DRUGCENTRAL, "drug_name string, struct_id string, act_value string, "
                          "act_unit string, act_type string, source string, organism string"),
        "pubchem_alias": mk(PUBCHEM_ALIAS, "pubchem_id string, synonym string, iupac_name string"),
        "name_to_cid": mk(NAME_TO_CID, "drug_name string, pubchem_id string"),
        "strain_alias": mk(STRAIN_ALIAS, "alias string, canonical string"),
    }


def test_reference_triple_parity(spark, ref_inputs):
    from amr_kg_spark.refgraph import build_reference_graph

    out = build_reference_graph(**ref_inputs)
    got = {
        (r.subj, r.subj_curie, r.pred, r.obj, r.obj_curie)
        for r in out["triples"].collect()
    }
    _, expected = oracle_graph()
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    assert precision >= 0.95 and recall >= 0.95, (
        f"P={precision:.3f} R={recall:.3f}\n"
        f"spark-only={sorted(got - expected)[:10]}\n"
        f"oracle-only={sorted(expected - got)[:10]}"
    )
    # at this fixture size agreement should be exact
    assert got == expected


def test_undirected_export_doubles_triples(spark, ref_inputs):
    from amr_kg_spark.refgraph import build_reference_graph

    out = build_reference_graph(**ref_inputs)
    n_dir = out["triples"].count()
    n_undir = out["undirected"].count()
    assert n_dir < n_undir <= 2 * n_dir  # palindromic triples collapse


def test_reference_node_props_parity(spark, ref_inputs):
    """S8 dump-format parity: every node carries the reference's property
    map (email/orcid/SMILES/definition/links/curies, only-if-notna), incl.
    the SPARK->ChEMBL in-place property merge (src/sources.py:106-109)."""
    from amr_kg_spark.refgraph import build_reference_graph

    out = build_reference_graph(**ref_inputs)
    got = {
        (r.label, r.key): dict(r.props) for r in out["nodes"].collect()
    }
    expected_nodes, _ = oracle_graph()
    expected = {lk: props for lk, (_, _, props) in expected_nodes.items()}
    assert set(got) == set(expected), (
        f"node keys differ: spark-only={sorted(set(got) - set(expected))[:6]} "
        f"oracle-only={sorted(set(expected) - set(got))[:6]}"
    )
    diffs = {
        lk: (got[lk], expected[lk]) for lk in expected if got[lk] != expected[lk]
    }
    assert not diffs, f"prop mismatches: {dict(list(diffs.items())[:4])}"


# ---------------------------------------------------------------------------
# the standalone mic-script subgraph ('micdata' db)
# ---------------------------------------------------------------------------

MIC_DOC = [
    # strain, chembl_id, name, pic50, assay_id, journal, year
    ("Escherichia coli", "C1", "DrugA", "7,4", "A1", "Nature", "2019"),
    # same name, different id (Chemical dict overwrite), null pic50/journal/year
    ("Escherichia coli", "C2", "DrugA", None, "A2", None, None),
    # null assay -> no ASSAY_IN edge
    ("Klebsiella pneumoniae", "C3", "DrugB", "5,0", None, "Nature", "2019"),
    # exact duplicate row -> duplicate edges (tx.create per row, multiset!)
    ("Klebsiella pneumoniae", "C3", "DrugB", "5,0", None, "Nature", "2019"),
    ("Escherichia coli", None, "DrugC", "6,1", "A3", None, "2020"),
]


def mic_oracle():
    """Replays /root/reference/src/mic-script.py:16-129 imperatively."""
    from collections import Counter

    triples = Counter()
    for strain, chid, name, pic50, assay, journal, year in MIC_DOC:
        journal = journal if journal is not None else "Assay test"  # :166
        if assay is not None:
            triples[(strain, "ASSAY_IN", name)] += 1
        if pic50 is not None:
            triples[(name, "HAS_pIC50", pic50)] += 1
        triples[(name, "FOUND_IN", journal)] += 1  # post-fillna: every row
        if year is not None:
            triples[(name, "IN_YEAR", year)] += 1
    return triples


def test_mic_script_subgraph_parity(spark):
    from collections import Counter

    from amr_kg_spark.refgraph import mic_graph

    mic_doc = spark.createDataFrame(
        MIC_DOC,
        "strain string, chembl_id string, name string, pic50 string, "
        "assay_id string, journal string, year string",
    )
    out = mic_graph(mic_doc)
    got = Counter((r.subj, r.pred, r.obj) for r in out["triples"].collect())
    assert got == mic_oracle()

    nodes = {(r.label, r.key): dict(r.props) for r in out["nodes"].collect()}
    # Chemical dict-overwrite: DrugA's chembl prop comes from the later row
    assert nodes[("Chemical", "DrugA")]["chembl"].endswith("/C2/")
    # Journal fillna node exists; Year node carries 'year', not 'name'
    assert ("Journal", "Assay test") in nodes
    assert nodes[("Year", "2019")] == {"year": "2019"}
    # null-chembl chemical has only the name prop
    assert nodes[("Chemical", "DrugC")] == {"name": "DrugC"}


def test_graph_dump_structural_parity(spark, ref_inputs, tmp_path):
    """S8 golden-dump FORMAT: the exported CSV must have the reference
    dump's ragged structure (/root/reference/data/dump/v1.0.csv:1) — one
    file, header = _id,_labels,<props...>,_start,_end,_type,<edge props>,
    node rows then edge rows, mutually-exclusive column groups, edge
    endpoints resolving to node ids — and round-trip to the same graph."""
    import csv
    import glob

    from amr_kg_spark.refgraph import build_reference_graph, write_graph_dump

    out = build_reference_graph(**ref_inputs)
    d = str(tmp_path / "dump")
    write_graph_dump(out["nodes"], out["edges"], d)

    files = glob.glob(f"{d}/part-*.csv")
    assert len(files) == 1, "golden dump must be a single diffable file"
    with open(files[0], newline="") as f:
        rows = list(csv.reader(f))
    hdr, body = rows[0], rows[1:]

    # header discipline
    assert hdr[0] == "_id" and hdr[1] == "_labels"
    i_start = hdr.index("_start")
    assert hdr[i_start : i_start + 3] == ["_start", "_end", "_type"]
    assert set(hdr[i_start + 3 :]) == {"ChEMBL Assay", "DOI", "Literature", "MIC"}
    assert "name" in hdr[2:i_start]

    def val(r, c):
        return r[hdr.index(c)]

    node_rows = [r for r in body if val(r, "_labels")]
    edge_rows = [r for r in body if not val(r, "_labels")]
    # ragged discipline: node rows carry no edge cols, edge rows no node cols
    assert all(not val(r, "_type") and not val(r, "_start") for r in node_rows)
    assert all(not val(r, "_id") for r in edge_rows)
    assert all(val(r, "_start") and val(r, "_end") and val(r, "_type") for r in edge_rows)
    # nodes first, then edges (the reference file layout)
    kinds = [bool(val(r, "_labels")) for r in body]
    assert kinds == sorted(kinds, reverse=True)

    # counts + label/type multisets match the graph
    assert len(node_rows) == out["nodes"].count()
    assert len(edge_rows) == out["edges"].count()
    import collections
    got_labels = collections.Counter(val(r, "_labels") for r in node_rows)
    want_labels = collections.Counter(
        ":" + r.label for r in out["nodes"].collect()
    )
    assert got_labels == want_labels
    got_types = collections.Counter(val(r, "_type") for r in edge_rows)
    want_types = collections.Counter(r.rel for r in out["edges"].collect())
    assert got_types == want_types

    # every endpoint resolves to an emitted node id
    ids = {val(r, "_id") for r in node_rows}
    assert all(
        val(r, "_start") in ids and val(r, "_end") in ids for r in edge_rows
    )

    # props land in their columns: at least one Person row carries email
    persons = [r for r in node_rows if val(r, "_labels") == ":Person"]
    assert persons and any(val(r, "email") for r in persons)
    # (not all: the reference dump also carries name-less node rows)
    assert any(val(r, "name") for r in node_rows)
