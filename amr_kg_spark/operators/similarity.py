"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector —
  a single scan with a Catalyst-only cosine expression; the correctness
  baseline and perfectly scan-parallel (no shuffle except the final top-k).
- ``rhp_ann_topk``: random-hyperplane-LSH bucketed ANN — signs against R
  random hyperplanes give a b-bit signature; candidates share the
  signature bucket (multi-probe via hamming-1 neighbors optional), then
  exact rerank within candidates. The 100 TB path: the bucket join is a
  hash join on the signature, never |corpus| x |queries|.
- ``ivf_topk``: inverted-file ANN — a KMeans coarse quantizer
  (pyspark.ml) assigns every vector a cluster id; a query scans only the
  ``n_probe`` clusters whose centroids are nearest. At scale the cluster
  id is the table's partition key, so probing is partition pruning: a
  query reads n_probe/n_clusters of the corpus from disk.
- ``cosine_topk_join`` / ``ivf_topk_join``: the BATCH siblings — top-k
  for every row of a query set in one pass. Exact (deliberate broadcast
  nested-loop: the |Q| x |C| product IS exact batch kNN) and ANN
  (per-query probe selection in Catalyst, broadcast hash join on the
  cluster id — never |Q| x |C|).
- ``quantize_embeddings`` / ``dequantize_embeddings``: symmetric int8 —
  a 4x storage/shuffle/broadcast cut at ~1e-2 cosine error (tested),
  composable with both joins.

Hyperplanes are generated from a seeded RNG on the driver and shipped as
literals (they are tiny: R x dim floats).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(x: F.Column) -> F.Column:
    return F.sqrt(_dot(x, x))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id."""
    from ..session import fan_out

    emb = fan_out(emb)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return _topk_by_cosine(
        emb.select(F.col(id_col).alias("vec_id"), cos.alias("_cos")), k
    )


def _topk_by_cosine(scored: DataFrame, k: int) -> DataFrame:
    """Top-k on the UNROUNDED cosine (tie-break vec_id), rounding only for
    display — the oracle SQL orders by the unrounded expression, so rounding
    before the sort could flip the k-boundary on 6dp ties."""
    return (
        scored.orderBy(F.col("_cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cosine"))
    )


def rhp_signature(vec_col: str, hyperplanes: np.ndarray) -> F.Column:
    """b-bit random-hyperplane signature as a long (b <= 62)."""
    sig = F.lit(0).cast("long")
    for i, h in enumerate(hyperplanes):
        plane = F.array(*[F.lit(float(v)) for v in h])
        bit = F.when(_dot(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + F.shiftleft(bit.cast("long"), i)
    return sig


def make_hyperplanes(dim: int, bits: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def fit_ivf(
    emb: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float = 1.0,
):
    """Fit the IVF coarse quantizer (KMeans) and return (model, assigned)
    where ``assigned`` is the corpus with a ``cluster`` column. At 100 TB:
    fit on a sample (``fit_fraction``), assign the full corpus, and write
    the table partitioned by ``cluster`` so probes prune partitions."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ..session import fan_out

    emb = fan_out(emb)
    feats = emb.withColumn("__features", array_to_vector(F.col(vec_col)))
    fit_df = feats if fit_fraction >= 1.0 else feats.sample(fit_fraction, seed)
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="__features", predictionCol="cluster"
    ).fit(fit_df)
    assigned = model.transform(feats).drop("__features")
    return model, assigned


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    model_and_assigned=None,
) -> DataFrame:
    """IVF ANN top-k: scan only the n_probe clusters nearest the query (by
    centroid distance, computed on the driver — centroids are tiny), exact
    cosine rerank within them. Pass ``model_and_assigned`` (from
    :func:`fit_ivf`) to amortize the quantizer across queries — the
    production pattern, where assignment happens once at ingest."""
    if model_and_assigned is None:
        model_and_assigned = fit_ivf(emb, n_clusters, vec_col, seed)
    model, assigned = model_and_assigned

    q = np.asarray(query_vec, dtype=float)
    centers = model.clusterCenters()
    dists = [float(np.linalg.norm(q - np.asarray(c))) for c in centers]
    probes = sorted(range(len(centers)), key=lambda i: dists[i])[:n_probe]

    cands = assigned.filter(F.col("cluster").isin(probes))
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), qcol) / (_norm(F.col(vec_col)) * _norm(qcol))
    return _topk_by_cosine(
        cands.select(F.col(id_col).alias("vec_id"), cos.alias("_cos")), k
    )


def assign_fixed_centroids(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Assign every vector to its nearest fixed centroid — pure Catalyst
    (argmin over literal centroid arrays via array_min on (dist, cid)
    structs; struct ordering compares fields left-to-right so ties break on
    the smaller cid). This is the production IVF pattern: the quantizer is
    pretrained, assignment happens at ingest, and the cluster id becomes
    the table's partition key."""

    def l2sq(c: list[float]) -> F.Column:
        carr = F.array(*[F.lit(float(v)) for v in c])
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                carr,
                lambda p, q: (p.cast("double") - q) * (p.cast("double") - q),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    best = F.array_min(
        F.array(
            *[
                F.struct(l2sq(c).alias("d"), F.lit(int(cid)).alias("cid"))
                for cid, c in centroids
            ]
        )
    )
    return emb.withColumn(out, best["cid"])


def ivf_topk_pretrained(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN with a FIXED (pretrained) coarse quantizer: Catalyst
    assignment (:func:`assign_fixed_centroids`), driver-side probe
    selection over the tiny centroid list, exact cosine rerank inside the
    probed clusters. Unlike :func:`ivf_topk` (KMeans-fitted), every step
    is deterministic and replicable in ANSI SQL, so the driver oracle can
    value-check the bucketing, probing and rerank."""
    from ..session import fan_out

    emb = fan_out(emb)
    q = np.asarray(query_vec, dtype=float)
    scored = sorted(
        (float(np.sum((q - np.asarray(c, dtype=float)) ** 2)), int(cid))
        for cid, c in centroids
    )
    probes = [cid for _, cid in scored[:n_probe]]

    assigned = assign_fixed_centroids(emb, centroids, vec_col)
    cands = assigned.filter(F.col("cluster").isin(probes))
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), qcol) / (_norm(F.col(vec_col)) * _norm(qcol))
    return _topk_by_cosine(
        cands.select(F.col(id_col).alias("vec_id"), cos.alias("_cos")), k
    )


def rhp_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 10,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidates = vectors whose RHP signature is within
    hamming distance 1 of the query's, then exact cosine rerank.

    On a cluster the signature column is precomputed/persisted with the
    corpus so queries touch only matching buckets (partition pruning by
    signature).
    """
    from ..session import fan_out

    emb = fan_out(emb)
    dim = len(query_vec)
    planes = make_hyperplanes(dim, bits, seed)
    qv = np.asarray(query_vec, dtype=float)
    qsig = 0
    for i, h in enumerate(planes):
        if float(np.dot(qv, h)) >= 0:
            qsig |= 1 << i
    probe_sigs = [qsig] + [qsig ^ (1 << i) for i in range(bits)]

    sigged = emb.withColumn("sig", rhp_signature(vec_col, planes))
    cands = sigged.filter(F.col("sig").isin(probe_sigs))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return _topk_by_cosine(
        cands.select(F.col(id_col).alias("vec_id"), cos.alias("_cos")), k
    )


def write_ivf_table(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a cluster-partitioned table — the
    ingest-time half of IVF at scale: assignment happens once, the cluster
    id becomes the physical partition key, and every probe afterwards is
    PARTITION PRUNING (the scan reads n_probe/n_clusters of the corpus
    from disk; asserted on the plan in tests/test_plans.py)."""
    assign_fixed_centroids(emb, centroids, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(path)


def ivf_table_topk(
    spark,
    path: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Query the materialized IVF table: pick the n_probe nearest centroids
    on the driver (centroid list is tiny), scan ONLY their partitions,
    exact cosine rerank."""
    q = np.asarray(query_vec, dtype=float)
    scored = sorted(
        (float(np.sum((q - np.asarray(c, dtype=float)) ** 2)), int(cid))
        for cid, c in centroids
    )
    probes = [cid for _, cid in scored[:n_probe]]
    cands = spark.read.parquet(path).filter(F.col("cluster").isin(probes))
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), qcol) / (_norm(F.col(vec_col)) * _norm(qcol))
    return _topk_by_cosine(
        cands.select(F.col(id_col).alias("vec_id"), cos.alias("_cos")), k
    )


def cosine_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch k-NN JOIN: exact top-k corpus neighbors by cosine for EVERY
    query row — the set-valued sibling of ``cosine_topk`` (embedding-dedup
    audits, cluster assignment, retrieval-eval harnesses all want the
    whole query set at once, not a driver loop over single queries).

    Scale shape: the query side of a k-NN join is orders of magnitude
    smaller than the corpus, so it is BROADCAST and the corpus scans
    exactly once, computing all query dots per corpus row inside the scan
    stage (a broadcast nested-loop join — the |Q| x |C| product is the
    definition of exact k-NN, not an accident; cap |Q| per run and batch,
    or switch to the LSH/IVF operators when approximation is acceptable).
    The only exchange is the per-query top-k window over k x |Q| rows.
    Deterministic tie-break on corpus id.

    Zero-norm vectors (cosine undefined, 0/0 -> NULL) are filtered from
    BOTH sides before scoring: a NULL cosine sorts last under desc but
    would still occupy top-k rank slots on a small corpus, and oracle
    engines disagree on NULL placement — so degenerate vectors simply
    never rank, matching the exact-kNN contract."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
    ).filter(_norm(F.col("__qv")) > 0)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")
    ).filter(_norm(F.col("__cv")) > 0)
    cos = _dot(F.col("__cv"), F.col("__qv")) / (
        _norm(F.col("__cv")) * _norm(F.col("__qv"))
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", cos.alias("_cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "vec_id", F.round("_cos", 6).alias("cosine"), 
            F.col("__rn").alias("rank"),
        )
    )


def quantize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max(|x|)/127``,
    ``q = round(x/scale)`` — a 4x storage/shuffle cut for a 100 TB
    embedding table at ~1e-2 cosine error (tested bound). Catalyst-only
    (two array passes per row, no UDF); all-zero vectors get scale 0 and
    an all-zero code (dequantizes exactly)."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    amax = F.array_max(F.transform(x, F.abs))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    q = F.when(
        F.col(scale_col) > 0,
        F.transform(
            x, lambda v: F.round(v / F.col(scale_col)).cast("tinyint")
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0).cast("tinyint")))
    return emb.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_embeddings(
    emb: DataFrame,
    q_col: str = "embedding_q8",
    scale_col: str = "q8_scale",
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x ≈ q * scale``."""
    return emb.withColumn(
        out_col,
        F.transform(
            F.col(q_col), lambda v: v.cast("double") * F.col(scale_col)
        ),
    )


def ivf_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch IVF ANN JOIN: approximate top-k corpus neighbors for EVERY
    query row — the ANN sibling of :func:`cosine_topk_join` (which is
    exact but reads the whole corpus per batch). Completes the operator
    symmetry: single-query exact/ANN (``cosine_topk`` / ``ivf_topk*``)
    and batch exact (``cosine_topk_join``) already exist.

    Per query, the ``n_probe`` nearest centroids are selected IN CATALYST
    (centroids are tiny driver literals: sort an array of (l2-dist, cid)
    structs, slice, explode — no driver loop, so the query side can be a
    full DataFrame, not one literal vector); the corpus carries its
    cluster id (``assign_fixed_centroids``, or a pre-materialized
    cluster-partitioned table); candidates meet on an EQUI join on
    ``cluster`` and exact cosine reranks within them.

    Scale shape: the query side (|Q| x n_probe rows) broadcasts; the
    corpus scans ONCE and each row meets only the queries probing its
    cluster — a broadcast hash join on a long key, never |Q| x |C|. With
    the corpus written partitioned by cluster, the same join becomes
    partition-pruned I/O. Zero-norm vectors are filtered on both sides
    (cosine undefined), matching ``cosine_topk_join``. Deterministic:
    centroid ties break on cid (struct ordering), rank ties on corpus id.
    """
    from pyspark.sql import Window

    def l2sq(c: list[float], col: F.Column) -> F.Column:
        carr = F.array(*[F.lit(float(v)) for v in c])
        return F.aggregate(
            F.zip_with(
                col, carr, lambda p, q: (p.cast("double") - q) * (p.cast("double") - q)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    probe_structs = F.array(
        *[
            F.struct(
                l2sq(c, F.col("__qv")).alias("d"), F.lit(int(cid)).alias("cid")
            )
            for cid, c in centroids
        ]
    )
    probes = F.transform(
        # sort_array = array_sort minus the interpreted comparator (the
        # literal centroid structs are never NULL; NaN ordering identical)
        F.slice(F.sort_array(probe_structs), 1, n_probe), lambda s: s["cid"]
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
        .filter(_norm(F.col("__qv")) > 0)
        .select("query_id", "__qv", F.explode(probes).alias("cluster"))
    )
    c = (
        assign_fixed_centroids(corpus, centroids, vec_col)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("__cv"),
            "cluster",
        )
        .filter(_norm(F.col("__cv")) > 0)
    )
    cos = _dot(F.col("__cv"), F.col("__qv")) / (
        _norm(F.col("__cv")) * _norm(F.col("__qv"))
    )
    scored = c.join(F.broadcast(q), "cluster").select(
        "query_id", "vec_id", cos.alias("_cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "vec_id", F.round("_cos", 6).alias("cosine"),
            F.col("__rn").alias("rank"),
        )
    )
