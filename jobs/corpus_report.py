"""spark-submit entry point for a one-command corpus AUDIT — the report a
pipeline owner reads before (and after) running jobs/prep_corpus.py:

    cd /root/repo && zip -r /tmp/amr_kg_spark.zip amr_kg_spark
    spark-submit --master <cluster> --py-files /tmp/amr_kg_spark.zip \
        jobs/corpus_report.py \
        --input  <documents parquet: doc_id, text, ...> \
        --output <report dir> \
        [--stratum-col lang] [--top-k 30] [--approx]

Writes four small parquet tables under --output and prints a one-line
JSON summary (the jobs/ convention):

  stats.parquet       per-stratum doc/token/char totals + p50/p90/p99
                      token-count quantiles (textprep.corpus_stats)
  top_tokens.parquet  Zipf head by document frequency AND term frequency
                      (textprep.top_tokens — boilerplate/stopword drift)
  quality.parquet     reject-reason histogram + mean quality signals at
                      the default prep_corpus gate thresholds
                      (text.corpus_filter — what WOULD be dropped)
  dupes.parquet       exact-duplicate and near-duplicate-prefix rates
                      (xxhash64(text) + text.fingerprint distincts)

Scale shape: the signal frame is computed once (one projection over one
scan) and persisted; every aggregate here is map-side combinable with a
tiny result (strata x metrics, k tokens, a handful of reasons), so the
job is a constant number of full scans regardless of corpus size —
nothing corpus-sized ever reaches the driver (the summary JSON carries
only the aggregate numbers). ``--approx`` switches the quantiles to the
bounded-memory Greenwald-Khanna sketch for extreme per-stratum
cardinality (corpus_stats' documented 100 TB path).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--stratum-col", default="lang")
    ap.add_argument("--top-k", type=int, default=30)
    ap.add_argument("--approx", action="store_true",
                    help="approx_percentile quantiles (bounded memory)")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("corpus-report").getOrCreate()

    from amr_kg_spark.operators.text import corpus_filter, fingerprint
    from amr_kg_spark.operators.textprep import corpus_stats, top_tokens

    docs = spark.read.parquet(args.input)
    out = args.output.rstrip("/")
    summary: dict = {}

    # 1: per-stratum shape report
    stats = corpus_stats(
        docs, stratum_col=args.stratum_col, text_col=args.text_col,
        exact=not args.approx,
    )
    stats.write.mode("overwrite").parquet(out + "/stats")
    srows = spark.read.parquet(out + "/stats").collect()
    summary["rows"] = int(sum(r["n_docs"] for r in srows))
    summary["total_tokens"] = int(sum(r["total_tokens"] for r in srows))
    summary["strata"] = len(srows)

    # 2: Zipf head, both counting bases in one table
    tt = top_tokens(
        docs, k=args.top_k, text_col=args.text_col, by="df"
    ).withColumn("by", F.lit("df")).unionByName(
        top_tokens(
            docs, k=args.top_k, text_col=args.text_col, by="tf"
        ).withColumn("by", F.lit("tf"))
    )
    tt.write.mode("overwrite").parquet(out + "/top_tokens")

    # 3: quality audit at the default gate thresholds — the signal frame
    # is ONE projection (plan-asserted in tests/test_plans.py for
    # corpus_filter); both aggregates below read the persisted frame
    sig = corpus_filter(docs, text_col=args.text_col).persist()
    qual = sig.groupBy(
        F.coalesce(F.col("reject_reason"), F.lit("kept")).alias("outcome")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("quality").alias("mean_quality"),
        F.avg("dup_ngram_ratio").alias("mean_dup_ngram_ratio"),
        F.avg("top_token_ratio").alias("mean_top_token_ratio"),
    )
    qual.write.mode("overwrite").parquet(out + "/quality")
    for r in spark.read.parquet(out + "/quality").collect():
        summary[f"quality_{r['outcome']}"] = int(r["n_docs"])
    sig.unpersist()

    # 4: duplication rates — exact (full-text hash) and near-dup-prefix
    # (winnowing fingerprint); both are count-distinct aggregates over
    # longs/strings computed inside the scan
    dup = docs.select(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.xxhash64(F.col(args.text_col))).alias(
            "distinct_texts"
        ),
    ).crossJoin(
        F.broadcast(
            fingerprint(docs, text_col=args.text_col).select(
                F.count_distinct("fingerprint").alias("distinct_fingerprints")
            )
        )
    ).select(
        "n_docs", "distinct_texts", "distinct_fingerprints",
        (1 - F.col("distinct_texts") / F.col("n_docs")).alias(
            "exact_dup_rate"
        ),
        (1 - F.col("distinct_fingerprints") / F.col("n_docs")).alias(
            "neardup_prefix_rate"
        ),
    )
    dup.write.mode("overwrite").parquet(out + "/dupes")
    d = spark.read.parquet(out + "/dupes").collect()[0]
    summary["exact_dup_rate"] = round(float(d["exact_dup_rate"]), 6)
    summary["neardup_prefix_rate"] = round(
        float(d["neardup_prefix_rate"]), 6
    )

    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
