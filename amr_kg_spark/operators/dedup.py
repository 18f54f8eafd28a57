"""Deduplication operators for large-scale training-data pipelines.

Four families, each with a different cost/recall point:

- exact:      hash groupBy on the full text — one shuffle, exact.
- n-gram Jaccard: exact set-similarity via an inverted shingle index —
  a join on shared shingles, so cost ~ sum(posting-list^2), not |docs|^2.
- MinHash-LSH: approximate Jaccard with banding (pyspark.ml MinHashLSH) —
  the 100 TB path; candidate pairs ~ linear in corpus size.
- SimHash:    64->32-bit locality-sensitive fingerprint from md5 token
  hashes — fully expressible in Catalyst (and in the DuckDB oracle),
  hamming-bucketable for near-dup blocking.

All tokenization is lower-cased word splitting (``\\W+``) shared with the
oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\W+"


def tokens_col(text_col: str = "text") -> F.Column:
    """Non-empty lowercase word tokens."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != ""
    )


def word_shingles(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct n-word shingles (space-joined) — pure Catalyst.

    NOTE: inline form — the token split is re-evaluated per shingle inside
    the lambda (O(len^2)). Prefer :func:`with_word_shingles`, which
    materializes the token array first (measured 10x faster at sf0.1)."""
    toks = tokens_col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def with_word_shingles(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    out: str = "shingles",
    hashed: bool = False,
) -> DataFrame:
    """Append a distinct word-shingle array column, materializing the token
    array in its own projection first so Catalyst binds a reference inside
    the shingle lambda instead of re-splitting the text per element.
    ``hashed=True`` emits xxhash64(shingle) longs (cheaper downstream)."""
    tmp = "__toks"
    step = df.withColumn(tmp, tokens_col(text_col))

    def mk(i: F.Column) -> F.Column:
        s = F.array_join(F.slice(F.col(tmp), i, n), " ")
        return F.xxhash64(s) if hashed else s

    sh = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(tmp) - F.lit(n - 1), F.lit(1))
            ),
            mk,
        )
    )
    return step.withColumn(out, sh).drop(tmp)


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep the first row (by order_col) per duplicate group (A5 policy)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard-similar pairs via inverted shingle index.

    shuffle plan: explode shingles -> self-join on shingle (co-occurrence
    counts) -> join per-doc sizes -> filter. At scale, hot shingles are the
    skew risk: drop shingles whose document frequency exceeds a cap (they
    contribute little discrimination and quadratic pairs).
    """
    # shingles are hashed to 64-bit BEFORE the self-join: the shuffle moves
    # (long, long) pairs instead of multi-word strings (~5-10x less payload);
    # a 2^-64 collision merges two shingles — immaterial for Jaccard.
    sh = with_word_shingles(docs, text_col, n, out="__sh", hashed=True).select(
        F.col(id_col).alias("id"), F.explode("__sh").alias("sh")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    # anti-skew: cap posting-list length (rare at these SFs, vital at 100 TB)
    df_cap = sh.groupBy("sh").agg(F.count("*").alias("df")).filter(F.col("df") <= 1000)
    sh = sh.join(F.broadcast(df_cap.select("sh")), "sh", "left_semi")

    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    max_dist: float = 0.5,
) -> DataFrame:
    """Approximate Jaccard pairs via MinHash banding (the 100 TB path)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    base = with_word_shingles(docs, text_col, n, out="shingles").select(
        F.col(id_col).alias("id"), "shingles"
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(base)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_dist, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("est_jaccard"),
        )
    )


def char_ngram_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hash_tables: int = 8,
    max_dist: float = 0.5,
) -> DataFrame:
    """MinHash-LSH similar pairs on CHARACTER n-grams — the right granularity
    for short strings (entity names), where word shingles degenerate.
    Used by KG canonicalization for the similarity self-join."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from .linking import char_ngrams_expr

    base = df.select(
        F.col(id_col).alias("id"), F.expr(char_ngrams_expr(text_col, n)).alias("grams")
    ).filter(F.size("grams") > 0)
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(base)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, max_dist, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round(F.lit(1.0) - F.col("dist"), 6).alias("est_jaccard"),
        )
    )


def simhash32(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash from md5 token hashes — Catalyst-only, oracle-checkable.

    Token hash = first 8 hex chars of md5(token) as an unsigned 32-bit int;
    per-bit vote = sum over tokens of (+1 if bit set else -1); fingerprint
    bit = 1 iff vote > 0. Distinct tokens (set semantics) so the oracle's
    relational formulation matches.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    votes = (
        toks.select(
            "id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit")
        )
        .withColumn(
            "vote",
            F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1),
        )
    )
    bits = (
        votes.groupBy("id", "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn("bitval", F.when(F.col("v") > 0, 1).otherwise(0))
    )
    return (
        bits.groupBy("id")
        .agg(
            F.sum(F.expr("shiftleft(CAST(bitval AS BIGINT), bit)")).alias("simhash")
        )
        .select(F.col("id").alias("doc_id"), "simhash")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked to avoid |n|^2.

    Blocking on ``block_col`` (cluster/partition key) keeps the self-join
    linear-ish; pass None for the exact brute-force (test scale only).
    Cosine = zip_with dot / norms, all Catalyst.
    """
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    joined = a.join(b, on="blk" if block_col else None) if block_col else a.crossJoin(b)
    joined = joined.filter(F.col("id_a") < F.col("id_b"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("v_a"), F.col("v_b")) / (
        F.sqrt(dot(F.col("v_a"), F.col("v_a"))) * F.sqrt(dot(F.col("v_b"), F.col("v_b")))
    )
    return (
        joined.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def minhash_pairs_native(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Catalyst-native MinHash banding — no pyspark.ml, no Python.

    signature_i = min over shingle-hashes h of xxhash64(h, i)  (k per doc)
    band_j      = xxhash64(sig[j*r+1..j*r+r]),  r = k/bands
    candidates  = docs sharing any (band_j, hash) bucket (self-join)
    output      = candidates reranked with EXACT shingle-set Jaccard
                  (array_intersect on the per-doc shingle-hash arrays),
                  filtered to >= threshold.

    Same recall profile as MinHashLSH.approxSimilarityJoin with
    numHashTables=bands, but the whole plan stays in whole-stage codegen;
    candidate pairs are exact-verified so false positives never surface.
    """
    r = num_hashes // bands
    base = with_word_shingles(docs, text_col, n, out="hs", hashed=True).select(
        F.col(id_col).alias("id"), "hs"
    ).filter(F.size("hs") > 0)

    sig = base.withColumn(
        "sig",
        F.array(
            *[
                F.array_min(F.transform(F.col("hs"), lambda h, i=i: F.xxhash64(h, F.lit(i))))
                for i in range(num_hashes)
            ]
        ),
    )
    # the banding self-join moves ONLY (id, band, bh) — the shingle arrays
    # rejoin afterwards for the (few) surviving candidate pairs
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", j * r + i + 1) for i in range(r)]
                        ).alias("bh"),
                    )
                    for j in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    a = banded.select(F.col("id").alias("id_a"), "band", "bh")
    b = banded.select(F.col("id").alias("id_b"), "band", "bh")
    cands = (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    hs = base.select("id", "hs")
    cands = cands.join(
        hs.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
    ).join(hs.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cands.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
