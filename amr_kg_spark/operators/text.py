"""Text-analysis operators for training-data pipelines.

All Catalyst-only (no UDFs): token counting, quality scoring, heuristic
language ID, and rolling-hash document fingerprinting. Each has a matching
DuckDB-SQL formulation in queries/datapipe.py so the driver verifies values,
not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

# tiny per-language stopword gazetteers for the heuristic language id
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "la", "les", "et", "est"],
}


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace/punct token count + a BPE-ish subword estimate
    (chars/4 is the common fast proxy for byte-pair token counts)."""
    toks = tokens_col(text_col)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("long").alias("est_bpe_tokens"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality heuristics: length, mean word length, stopword ratio,
    non-alphanumeric ratio, all-caps-word ratio. Score = weighted blend,
    rounded for cross-engine comparability."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_nonalnum = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", "")
    )
    mean_wordlen = F.when(n_tok > 0, F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_nonalnum / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.3
    )
    return docs.select(
        "doc_id",
        F.col(text_col).alias("text"),
        n_tok.alias("n_tokens"),
        F.round(mean_wordlen, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    ).drop("text")


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count stopword hits per language, argmax with
    deterministic tie-break on language code; 'und' when nothing hits."""
    toks = tokens_col(text_col)
    scores = []
    for lang in sorted(STOPWORDS):
        arr = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct orders by first field (hits) then lang — ties pick
    # the LAST lang alphabetically under max; invert lang for determinism
    best = F.array_max(F.array(*scores))
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].alias("stopword_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over n-word shingles (one stable
    representative hash per document; equal fingerprints => near-identical
    prefix content). Tokens are materialized first so the split isn't
    re-evaluated per shingle (see dedup.with_word_shingles)."""
    step = docs.withColumn("__toks", tokens_col(text_col))
    shingles = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("__toks") - F.lit(n - 1), F.lit(1))
        ),
        lambda i: F.md5(F.array_join(F.slice(F.col("__toks"), i, n), " ")),
    )
    return step.select("doc_id", F.array_min(shingles).alias("fingerprint"))


def repetition_signals(
    docs: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Gopher-style within-document repetition signals — Catalyst-only:

    - ``dup_ngram_ratio``: 1 - distinct/total n-gram shingles (0 = no
      repeated n-gram; near 1 = boilerplate loops);
    - ``dup_token_ratio``: 1 - distinct/total tokens;
    - ``top_token_ratio``: share of the single most frequent token.

    Standard pre-training quality gates (Rae et al., Gopher appendix A):
    documents over thresholds on these are template/spam artifacts.
    """
    from .dedup import tokens_col

    toks = tokens_col(text_col)
    t = "__t"
    step = docs.withColumn(t, toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(F.col(t), i, n), " "),
    )
    g = "__g"
    step = step.withColumn(g, grams)
    ntok = F.size(t)
    # most-frequent-token count via aggregate over the distinct tokens
    top = F.array_max(
        F.transform(
            F.array_distinct(F.col(t)),
            lambda w: F.size(F.filter(F.col(t), lambda x: x == w)),
        )
    )
    return step.select(
        "doc_id",
        F.when(
            F.size(g) > 0,
            F.round(1.0 - F.size(F.array_distinct(g)) / F.size(g), 6),
        ).otherwise(F.lit(0.0)).alias("dup_ngram_ratio"),
        F.when(
            ntok > 0,
            F.round(1.0 - F.size(F.array_distinct(t)) / ntok, 6),
        ).otherwise(F.lit(0.0)).alias("dup_token_ratio"),
        F.when(ntok > 0, F.round(top / ntok, 6))
        .otherwise(F.lit(0.0))
        .alias("top_token_ratio"),
    )
