"""spark-submit entry point for corpus near-dup removal (training-data
pipeline deployment shape, parallel to jobs/build_kg.py):

    cd /root/repo && zip -r /tmp/amr_kg_spark.zip amr_kg_spark
    spark-submit --master <cluster> --py-files /tmp/amr_kg_spark.zip \
        jobs/dedup_corpus.py \
        --input  <documents parquet: doc_id, text, ...> \
        --output <kept-corpus parquet dir> \
        [--threshold 0.8] [--method minhash|exact] [--report <dir>]

Reads the corpus, finds near-dup clusters (banded MinHash + exact rerank,
or the prefix-filtered exact join), keeps one representative per cluster,
writes the kept corpus, and prints a one-line JSON report
(rows in/out, clusters, drop rate).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--method", choices=["minhash", "exact"], default="minhash")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dedup-corpus").getOrCreate()

    from amr_kg_spark.operators.dedup import dedup_keep_representatives

    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    kept = dedup_keep_representatives(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        threshold=args.threshold,
        method=args.method,
    )
    kept.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()

    report = {
        "rows_in": n_in,
        "rows_out": n_out,
        "dropped": n_in - n_out,
        "drop_rate": round((n_in - n_out) / max(n_in, 1), 6),
        "threshold": args.threshold,
        "method": args.method,
    }
    if args.report:
        spark.createDataFrame([tuple(report.values())], list(report)).coalesce(
            1
        ).write.mode("overwrite").json(args.report)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
