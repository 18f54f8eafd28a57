"""Corpus-preparation operators for training-data pipelines — the steps
between raw crawl and tokenizer: normalization, PII scrubbing, sequence
packing, deterministic sampling. All Catalyst-only (no UDFs); each has a
DuckDB cross-check in tests/test_textprep.py (same rigor as the driver's
oracle gate; the 50-slot registry is full, so these verify in pytest).

Scale shape: normalize/scrub are pure projections (zero shuffles);
packing is one repartition + one window pass over the chosen order;
sampling is a filter on a deterministic hash (pushable, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Standard pre-tokenization cleanup, one projection:

    - control characters (C0 except \\t \\n, DEL) stripped;
    - all unicode whitespace runs collapsed to one ASCII space;
    - leading/trailing whitespace trimmed.

    (Full NFC unicode normalization needs an ICU UDF — out of scope for
    the JVM-only path; the common-crawl-style cleanups above are the ones
    that change dedup/token statistics.)"""
    cleaned = F.regexp_replace(
        F.col(text_col), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
    )
    collapsed = F.regexp_replace(cleaned, r"\s+", " ")
    return docs.withColumn(out_col, F.trim(collapsed))


# the standard scrub patterns a release pipeline applies before training;
# ordered — earlier patterns must not produce text later ones re-match
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def scrub_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Replace common PII shapes (emails, IPv4s, phone-like digit runs)
    with typed placeholders, and count replacements per kind — the audit
    columns (``n_email``/``n_ipv4``/``n_phone``) a compliance review needs.
    One projection, chained regexp_replace, zero shuffles."""
    out = docs
    col = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        out = out.withColumn(f"n_{name}", n)
        col = F.regexp_replace(col, pat, token)
    return out.withColumn(out_col, col)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    order_col: str | None = None,
    num_bins: int | None = None,
) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated into a
    contiguous token stream in a deterministic order and the stream is
    chunked into fixed ``budget``-token training sequences. Each document
    row gains:

    - ``pack_bin``: which independent stream it belongs to;
    - ``seq_id``: the sequence containing its FIRST token (globally
      unique: ``bin * 2^40 + ordinal``);
    - ``seq_offset``: the document's token offset inside that sequence
      (long documents simply continue into the following sequences, as
      in standard concat-then-chunk pre-training prep).

    Distribution: one global stream would serialize the cumulative sum,
    so the corpus is split into ``num_bins`` deterministic streams
    (``xxhash64(id) % bins``) and each is chunked independently via one
    window pass — one hash exchange + one sort, no driver loop, no UDF.
    Waste is at most one partial tail sequence per bin, negligible for
    budget << bin tokens. The closed form (``seq = floor(cum_before /
    budget)``, ``offset = cum_before % budget``) is exact and is
    cross-checked against DuckDB window SQL in tests."""
    bins = num_bins or docs.sparkSession.sparkContext.defaultParallelism
    binned = docs.withColumn(
        "pack_bin", F.pmod(F.xxhash64(F.col(id_col)), F.lit(bins))
    )
    order = order_col or id_col
    w = (
        Window.partitionBy("pack_bin")
        .orderBy(F.col(order), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return (
        binned.withColumn("__cb", cum_before)
        .withColumn(
            "seq_id",
            F.col("pack_bin") * F.lit(1 << 40)
            + F.floor(F.col("__cb") / F.lit(budget)),
        )
        .withColumn("seq_offset", F.col("__cb") % F.lit(budget))
        .drop("__cb")
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the low 30 bits
    of ``xxhash64(id, seed)`` fall under ``fraction * 2^30`` for its
    stratum. Unlike ``df.sample``, the decision is a pure function of the
    id — stable across retries, resumes and cluster sizes (the property a
    reproducible training mix needs) — and the filter is a scan-side
    predicate: no shuffle, no state. Strata absent from ``fractions``
    are dropped (fraction 0)."""
    m = 1 << 30
    mapping = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(v))]
    )
    frac = F.coalesce(mapping[F.col(stratum_col)], F.lit(0.0))
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
    return docs.filter(bucket < (frac * m).cast("long"))
