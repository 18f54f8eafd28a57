"""spark-submit entry point for the KG construction pipeline.

Cluster deployment (north_rule: spark-submit --py-files on multi-executor
clusters):

    cd /root/repo && zip -r /tmp/amr_kg_spark.zip amr_kg_spark
    spark-submit --master <cluster> \
        --py-files /tmp/amr_kg_spark.zip \
        jobs/build_kg.py \
        --input  <transcripts parquet/Iceberg path> \
        --workdir <checkpoint/output dir> \
        [--canonicalize] [--run-id RID] [--salt-buckets 1024]

Local smoke:
    spark-submit --master 'local[8]' --py-files /tmp/amr_kg_spark.zip \
        jobs/build_kg.py --synthetic 10000 --workdir /tmp/kg_out

The job is resumable: re-submitting with the same --workdir skips committed
stages (lineage in <workdir>/lineage). Output tables land under
<workdir>/stages/{nodes,edges,triples}.

Catalog-table persistence (--catalog-db): stages become catalog TABLES
committed through a commit-log (amr_kg_spark/lineage.py
CatalogStageRunner — the Iceberg snapshot protocol on whatever catalog
the session has). With a PERSISTENT catalog, resume survives JVM
restarts; verified end-to-end in this sandbox with the Hive metastore
Spark ships (Derby-backed):

    spark-submit --master 'local[8]' --py-files /tmp/amr_kg_spark.zip \
        --conf spark.sql.catalogImplementation=hive \
        --conf spark.driver.extraJavaOptions=-Dderby.system.home=<msdir> \
        --conf spark.sql.warehouse.dir=<msdir>/warehouse \
        jobs/build_kg.py --synthetic 20000 \
        --catalog-db kg --catalog-location <dbdir> --run-id a

    # resubmit (new JVM, new run-id): every stage resumes from the
    # catalog — lineage shows ONLY the first run's id (measured: second
    # submit = startup cost only)
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--input-table", help="transcripts CATALOG table (e.g. an Iceberg table: catalog.db.transcripts) — the production input shape")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N synthetic turns instead of --input")
    ap.add_argument("--workdir", help="parquet-dir checkpoint root (default persistence)")
    ap.add_argument("--catalog-db", help="persist stages as catalog TABLES in this database (CatalogStageRunner) instead of parquet dirs")
    ap.add_argument("--catalog-location", help="explicit database location for --catalog-db")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--canonicalize", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("amr-kg-build").getOrCreate()

    from amr_kg_spark.pipeline import run_pipeline

    if args.synthetic:
        from amr_kg_spark.fixtures import synth_transcripts

        transcripts = synth_transcripts(spark, n_turns=args.synthetic)
    elif args.input_table:
        transcripts = spark.read.table(args.input_table)
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        print("need --input, --input-table or --synthetic", file=sys.stderr)
        sys.exit(2)

    runner = None
    if args.catalog_db:
        from amr_kg_spark.lineage import CatalogStageRunner

        runner = CatalogStageRunner(
            spark, database=args.catalog_db, run_id=args.run_id,
            location=args.catalog_location,
        )
    elif not args.workdir:
        print("need --workdir or --catalog-db", file=sys.stderr)
        sys.exit(2)

    out = run_pipeline(
        spark, transcripts, args.workdir,
        run_id=args.run_id, canonicalize=args.canonicalize, runner=runner,
    )
    summary = {
        "triples": out["triples"].count(),
        "nodes": out["nodes"].count(),
        "edges": out["edges"].count(),
        "stages": [r.stage for r in out["metrics"].select("stage").distinct().collect()],
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
