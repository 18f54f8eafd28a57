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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label propagation CC. Input: undirected edge list (any orientation).
    Output: (node, component) with component = min node id reachable."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iter):
        # (1) min over direct neighbors — one hop of propagation
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        hop = labels.join(
            neighbor_min, labels["node"] == F.col("node2"), "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
        )
        # (2) pointer jumping: component := label(component) — doubles the
        # propagation distance each iteration (O(log diameter) total)
        parent = hop.select(
            F.col("node").alias("pnode"), F.col("component").alias("pcomp")
        )
        new_labels = (
            hop.join(parent, hop["component"] == parent["pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("pcomp", F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize_nodes(
    nodes: DataFrame,
    similarity_pairs: DataFrame,
    id_col: str = "node_id",
) -> DataFrame:
    """Merge duplicate nodes: canonical id = component min; properties merged
    with ``map_concat`` in ascending priority order so the highest-priority
    source wins key collisions (the reference's A4 last-wins dict update).

    nodes must carry a ``priority`` int column (lower = higher priority,
    e.g. chembl=0 < pubchem=1 < spark=2 < drugcentral=3) and a ``props``
    map column; rows without a similarity partner stay singleton components.
    """
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
