"""Canonicalization: connected components over a similarity graph.

Duplicate node variants (case/whitespace/hyphen spellings, multi-source
ids) are merged by: (1) building similarity pairs (exact-normalized match
or MinHash-LSH fuzzy pairs, operators/linking.py), (2) running connected
components over the pair graph, (3) electing the canonical id = min(node_id)
per component, (4) merging properties by source priority — reproducing the
reference's per-label upsert policies (last-wins src/sources.py:46,
first-wins src/sources.py:91-92,119-120) as explicit ORDER BY choices.

CC is a hand-rolled driver loop of joins (hash-to-min label propagation,
cf. Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
— the same family as GraphFrames' implementation, without the dependency):
each iteration every node takes the min label among itself and its
neighbors. Iterations = graph diameter, which for near-dup clusters is tiny
(2-4). Each iteration localCheckpoints to cut the lineage (mandatory: plan
growth is exponential otherwise) and the loop stops on a converged AQE-
counted delta. At 10^12-turn scale the edge table is pre-partitioned on
``src`` so every iteration's join reuses the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import stable_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label propagation CC. Input: undirected edge list (any orientation).
    Output: (node, component) with component = min node id reachable."""
    # The oriented edge list is materialized ONCE and the symmetrized
    # view is a lazy union over the checkpoint: written as
    # union(select(src,dst), select(dst,src)) over the raw `edges`, the
    # whole upstream pair-building plan (candidate join + exact rerank
    # for near-dup graphs) appears in BOTH union branches and executes
    # twice. No distinct() on the union either: a duplicate edge only
    # feeds the min-aggregate a redundant row (idempotent), while the
    # distinct costs a full shuffle + aggregate of the EDGE TABLE — the
    # largest frame a CC call touches — before the loop even starts
    # (callers' pair lists are `id_a < id_b`-oriented, so the two
    # orientations cannot collide anyway).
    e = stable_checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # label init = the first propagation hop, for free: the node list
    # needs a distinct() — an aggregate on the same key — so aggregating
    # min(neighbor) instead of merely deduplicating seeds every label at
    # least(node, min direct neighbor). Identical fixpoint (monotone
    # min-propagation), one fewer loop iteration for every graph whose
    # diameter the free hop covers (near-dup pair/star clusters converge
    # in the INIT, leaving the loop only the no-change confirmation).
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.col("a"), F.min("b")).alias("component"))
    ).transform(stable_checkpoint)

    for _ in range(max_iter):
        # (1) min over direct neighbors — one hop of propagation
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # hop is materialized so the EDGE-sized join+aggregate above runs
        # once per iteration: left lazy, it is re-evaluated by both sides
        # of the pointer-jumping self-join below (the same multi-consumer
        # pattern as the minhash/span-dedup checkpoints). Convergence is
        # read off this SAME materialization, BEFORE pointer jumping:
        # labels decrease monotonically (new <= hop <= prev pointwise), so
        # hop == prev is exactly the iteration where the old post-jump
        # check fired — and at the one-hop fixpoint every label equals its
        # component minimum (labels are constant across a component and
        # the min node labels itself), making the jump the identity. The
        # confirming final iteration therefore skips the self-join
        # entirely, and non-final iterations trade a node-sized
        # materialization for an edge-sized re-evaluation.
        hop = (
            labels.join(
                neighbor_min, labels["node"] == F.col("node2"), "left"
            ).select(
                "node",
                F.col("component").alias("prev"),
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        ).transform(stable_checkpoint)
        changed = (
            hop.filter(F.col("component") != F.col("prev")).limit(1).count()
        )
        if changed == 0:
            labels = hop.select("node", "component")
            break
        # (2) pointer jumping: component := label(component) — doubles the
        # propagation distance each iteration (O(log diameter) total).
        parent = hop.select(
            F.col("node").alias("pnode"), F.col("component").alias("pcomp")
        )
        labels = (
            hop.join(parent, hop["component"] == parent["pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("pcomp", F.col("component"))
                ).alias("component"),
            )
        ).transform(stable_checkpoint)
    return labels


def canonicalize_nodes(
    nodes: DataFrame,
    similarity_pairs: DataFrame,
    id_col: str = "node_id",
    cc: DataFrame | None = None,
) -> DataFrame:
    """Merge duplicate nodes: canonical id = component min; properties merged
    with ``map_concat`` in ascending priority order so the highest-priority
    source wins key collisions (the reference's A4 last-wins dict update).

    nodes must carry a ``priority`` int column (lower = higher priority,
    e.g. chembl=0 < pubchem=1 < spark=2 < drugcentral=3) and a ``props``
    map column; rows without a similarity partner stay singleton components.
    ``cc`` (node, component) may be passed in when the caller already ran
    connected components over the same pairs — the iterative CC loop is the
    most expensive stage of canonicalization and must run exactly once.
    """
    if cc is None:
        cc = connected_components(similarity_pairs, "src", "dst")
    with_comp = nodes.join(
        cc, nodes[id_col] == cc["node"], "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))

    # order rows within a component by DESCENDING priority value so that the
    # highest-priority source's props land LAST in map_concat (last-wins)
    merged = (
        with_comp.groupBy("component")
        .agg(
            F.min(F.struct("priority", id_col, "label", "name", "curie")).alias("best"),
            F.aggregate(
                F.reverse(
                    F.array_sort(
                        F.collect_list(F.struct("priority", id_col, "props")),
                        # comparator on scalar fields only: structs holding
                        # maps have no natural ordering in Spark
                        lambda l, r: F.when(l["priority"] < r["priority"], -1)
                        .when(l["priority"] > r["priority"], 1)
                        .when(l[id_col] < r[id_col], -1)
                        .when(l[id_col] > r[id_col], 1)
                        .otherwise(0)
                        .cast("int"),
                    )
                ),
                F.create_map().cast("map<string,string>"),
                lambda acc, s: F.map_concat(
                    F.map_filter(acc, lambda k, _: ~F.map_contains_key(s["props"], k)),
                    s["props"],
                ),
            ).alias("props"),
            F.count("*").cast("long").alias("merged_from"),
        )
        .select(
            "component",
            F.col("best")[id_col].alias("canonical_id"),
            F.col("best.label").alias("label"),
            F.col("best.name").alias("name"),
            F.col("best.curie").alias("curie"),
            "props",
            "merged_from",
        )
    )
    return merged


def rewrite_edges(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Repoint edge endpoints at canonical ids via two broadcast-able joins
    (mapping: node -> canonical_id)."""
    m_src = mapping.select(
        F.col("node").alias("_s"), F.col("component").alias("_cs")
    )
    m_dst = mapping.select(
        F.col("node").alias("_d"), F.col("component").alias("_cd")
    )
    return (
        edges.join(m_src, edges["src_id"] == F.col("_s"), "left")
        .join(m_dst, edges["dst_id"] == F.col("_d"), "left")
        .select(
            F.coalesce("_cs", F.col("src_id")).alias("src_id"),
            F.coalesce("_cd", F.col("dst_id")).alias("dst_id"),
            "rel_type",
            "props",
        )
    )


# default source-priority per label: the reference's id-priority chain
# (chembl > pubchem > spark > drug.central, src/relations.py:146-155,198-204)
DEFAULT_LABEL_PRIORITY = {
    "ChEMBL": 0,
    "PubChem": 1,
    "SPARK": 2,
    "DrugCentral": 3,
    "Compound": 0,
}

# labels allowed to merge with each other (entity-type groups)
DEFAULT_LABEL_GROUPS = {
    "ChEMBL": "compound",
    "PubChem": "compound",
    "SPARK": "compound",
    "DrugCentral": "compound",
    "Compound": "compound",
    "Pathogen": "pathogen",
    "Institution": "institution",
    "Institute": "institution",
}


def canonicalize_kg(
    nodes: DataFrame,
    edges: DataFrame,
    max_dist: float = 0.35,
    label_priority: dict[str, int] | None = None,
    label_groups: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Full KG canonicalization (north_star): similarity self-join on node
    names (char-3-gram MinHash-LSH blocking — candidate pairs ~linear, the
    'salted self-join' scale path), restricted to nodes of the same entity
    group; connected components; canonical node election by source
    priority; edges repointed at canonical ids.

    nodes: (node_id, label, name, curie, props); edges: (src_id, dst_id,
    rel_type, props). Returns {nodes, edges, mapping}.
    """
    from .dedup import char_ngram_lsh_pairs

    prio = label_priority or DEFAULT_LABEL_PRIORITY
    groups = label_groups or DEFAULT_LABEL_GROUPS

    grp_map = F.create_map(
        *[x for k, v in groups.items() for x in (F.lit(k), F.lit(v))]
    )
    prio_map = F.create_map(
        *[x for k, v in prio.items() for x in (F.lit(k), F.lit(v))]
    )
    # only labels with an explicit entity group are mergeable — literal-
    # valued labels (Activity "3.5 nM" vs "6.5 nM") must never fuzzy-merge
    named = (
        nodes.filter(F.col("name").isNotNull())
        .withColumn("grp", grp_map[F.col("label")])
        .filter(F.col("grp").isNotNull())
    )
    # candidate pairs via LSH (recall filter), then an EXACT char-n-gram
    # Jaccard rerank (precision gate: approxSimilarityJoin's estimated
    # distance can admit pairs whose true similarity is below threshold),
    # then the group gate (same entity type only)
    from .linking import char_ngrams_expr

    cand = char_ngram_lsh_pairs(
        named.select(F.col("node_id"), F.col("name")), "node_id", "name",
        max_dist=max_dist,
    )
    grams = named.select(
        F.col("node_id").alias("nid"),
        F.expr(char_ngrams_expr("name")).alias("ng"),
        F.col("grp").alias("g"),
    )
    ga = grams.select(F.col("nid").alias("id_a"), F.col("ng").alias("ng_a"), F.col("g").alias("g_a"))
    gb = grams.select(F.col("nid").alias("id_b"), F.col("ng").alias("ng_b"), F.col("g").alias("g_b"))
    inter = F.size(F.array_intersect("ng_a", "ng_b"))
    union = F.size("ng_a") + F.size("ng_b") - inter
    pairs = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .filter(F.col("g_a") == F.col("g_b"))
        .filter(inter / union >= F.lit(1.0 - max_dist))
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )

    with_prio = nodes.withColumn(
        "priority", F.coalesce(prio_map[F.col("label")], F.lit(9)).cast("int")
    ).withColumn(
        "props",
        F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
    )
    # CC runs exactly ONCE per canonicalization: the labels feed both the
    # canonical-node election and the edge-rewrite mapping. localCheckpoint
    # inside connected_components materializes the similarity pairs, so the
    # LSH self-join above is also evaluated exactly once.
    cc = connected_components(pairs, "src", "dst")
    canonical = canonicalize_nodes(with_prio, pairs, id_col="node_id", cc=cc)

    # node -> canonical_id mapping (MUST use the elected canonical id, not
    # the component min — edges and nodes have to agree on identity)
    mapping = cc.join(
        canonical.select("component", "canonical_id"), "component"
    ).select("node", F.col("canonical_id").alias("component"))
    new_edges = rewrite_edges(edges, mapping)
    return {
        "nodes": canonical.drop("component"),
        "edges": new_edges,
        "mapping": mapping.withColumnRenamed("component", "canonical_id"),
    }
