"""Extra benchmarks for the optimization rounds (guide §1.4) — bench.py is
frozen for measurement, so isolated per-query timings live here.

Usage:
  python bench_extra.py [query1,query2,...] [passes]

Times each named headline query with the noop sink on
$SPARK_GRAFT_SF_DIR / local[$SPARK_GRAFT_CPUS] (same methodology as
bench.py: warmup pass + min/median of k), prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amr_kg_spark.session import get_spark  # noqa: E402
from tools.capture_plans import HEADLINE, headline_queries  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else HEADLINE
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(app_name="amr-kg-bench-extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    queries = headline_queries(spark, sf_dir)

    def _run(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup: JVM + codegen + Arrow worker spin-up on the first query
    spark.sparkContext.setJobDescription("warmup")
    _run(queries[names[0]](spark, sf_dir))

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {n}")
            t0 = time.monotonic()
            _run(queries[n](spark, sf_dir))
            samples[n].append(round(time.monotonic() - t0, 3))
    out = {
        "sf_dir": sf_dir,
        "cores": cores,
        "passes": passes,
        "min": {n: min(v) for n, v in samples.items()},
        "samples": samples,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
