"""spark-submit entry point for pre-training corpus quality filtering:

    spark-submit --master <cluster> --py-files /tmp/amr_kg_spark.zip \
        jobs/filter_corpus.py --input <documents parquet> \
        --output <kept parquet> [--rejects <dir>] \
        [--min-tokens 5] [--max-dup-ngram 0.6] [--max-top-token 0.5] \
        [--min-quality 0.2] [--lang en,de]

Composes the Catalyst-only text operators (token counts, quality score,
language id, Gopher-style repetition signals) into one single-pass filter
plan — every signal is a projection over the same scan, no UDFs, no
shuffles until the write. Rows failing any gate can be side-channeled to
``--rejects`` with a ``reject_reason`` column (the audit trail a data
pipeline needs when a filter deletes 30% of a crawl).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--rejects", default=None)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-dup-ngram", type=float, default=0.6)
    ap.add_argument("--max-top-token", type=float, default=0.5)
    ap.add_argument("--min-quality", type=float, default=0.2)
    ap.add_argument("--lang", default=None, help="comma list; default: any")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("filter-corpus").getOrCreate()

    from amr_kg_spark.operators.text import corpus_filter

    docs = spark.read.parquet(args.input)
    # one projection over one scan: corpus_filter composes every signal as
    # a column expression — NO self-joins (the round-3 version joined three
    # derived frames back on doc_id, i.e. four scans + three shuffles of
    # the full corpus at 100 TB). Plan-asserted join-free in test_plans.py.
    langs = (
        [x.strip() for x in args.lang.split(",") if x.strip()]
        if args.lang
        else None
    )
    sig = corpus_filter(
        docs,
        min_tokens=args.min_tokens,
        max_dup_ngram=args.max_dup_ngram,
        max_top_token=args.max_top_token,
        min_quality=args.min_quality,
        langs=langs,
    )

    kept = sig.filter(F.col("reject_reason").isNull()).select(docs.columns)
    kept.write.mode("overwrite").parquet(args.output)
    if args.rejects:
        sig.filter(F.col("reject_reason").isNotNull()).write.mode(
            "overwrite"
        ).parquet(args.rejects)

    n_in = docs.count()
    n_out = spark.read.parquet(args.output).count()
    by_reason = {
        r.reject_reason: r["count"]
        for r in sig.filter(F.col("reject_reason").isNotNull())
        .groupBy("reject_reason").count().collect()
    }
    print(json.dumps({
        "rows_in": n_in, "rows_out": n_out,
        "drop_rate": round((n_in - n_out) / max(n_in, 1), 6),
        "rejects_by_reason": by_reason,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
