"""Capture .explain("formatted") for every bench headline query (and any
declared registry query passed by name) into plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> [query1,query2,...]

Measurement support for the optimization round (guide §1): the judge cannot
run Spark, so plan claims are checked against these committed files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amr_kg_spark.session import get_spark  # noqa: E402


def headline_queries(spark, sf_dir):
    from amr_kg_spark.queries import all_queries
    from amr_kg_spark.queries.datapipe import (
        q_minhash_native,
        q_prep_corpus,
        q_span_dedup,
        q_token_count,
        q_token_ids,
    )

    queries, _ = all_queries()
    queries["dp_minhash_native"] = q_minhash_native
    queries["dp_token_count"] = q_token_count
    queries["dp_prep_corpus"] = q_prep_corpus
    queries["dp_token_ids"] = q_token_ids
    queries["dp_span_dedup"] = q_span_dedup
    return queries


HEADLINE = [
    "kg_triples",
    "kg_mentions",
    "kg_reconstruct",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "dp_ngram_jaccard",
    "dp_simhash",
    "dp_cosine_topk",
    "dp_minhash_native",
    "dp_token_count",
    "dp_prep_corpus",
    "dp_token_ids",
    "dp_span_dedup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="amr-kg-plans", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    queries = headline_queries(spark, sf_dir)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
