"""Checkpoint-resumable stage runner with per-partition lineage + metrics.

Production target is Iceberg (stage outputs as snapshots, resume by
snapshot id, idempotent overwritePartitions). The sandbox has no Iceberg
catalog jar, so the same contract is implemented on parquet directories:

- each stage writes ``<workdir>/stages/<stage>/`` atomically (parquet
  _SUCCESS marker = committed snapshot);
- resume: a committed stage is read back, never recomputed — re-running
  the pipeline after a crash redoes only uncommitted stages;
- every commit appends per-partition rows to ``<workdir>/lineage/``:
  (run_id, stage, partition_id, rows, wall_ms, snapshot) — the audit
  trail the north_rule requires; per-partition counts are computed
  declaratively via ``spark_partition_id`` (one extra cheap aggregation,
  no collect of data).

Stage outputs are deterministic (engine rule: deterministic xxhash64 ids,
no monotonically_increasing_id / Date.now in plans), so kill+resume yields
a bit-identical triple set — asserted in tests/test_resume.py.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageRunner:
    def __init__(self, spark: SparkSession, workdir: str, run_id: str | None = None):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(os.path.join(workdir, "stages"), exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, "stages", stage)

    def _lineage_dir(self) -> str:
        return os.path.join(self.workdir, "lineage")

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._stage_dir(stage), "_SUCCESS"))

    # -- core ----------------------------------------------------------------
    def run(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the stage output, computing + committing it only if no
        committed copy exists (checkpoint/resume semantics)."""
        out = self._stage_dir(stage)
        if self.is_committed(stage):
            return self.spark.read.parquet(out)

        t0 = time.monotonic()
        df = build()
        tmp = out + ".inprogress"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        wall_ms = int((time.monotonic() - t0) * 1000)

        # atomic publish FIRST, lineage append second: a crash in between
        # leaves a committed snapshot with a missing audit row (resume is
        # still correct — the stage is not recomputed), whereas the reverse
        # order would record lineage for a snapshot that never committed and
        # then double-count the stage after the resumed re-run.
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)

        committed = self.spark.read.parquet(out)
        lineage = (
            committed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").cast("long").alias("rows"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("partition_id"),
                "rows",
                F.lit(wall_ms).cast("long").alias("wall_ms"),
                F.lit(os.path.basename(out)).alias("snapshot"),
            )
        )
        lineage.write.mode("append").parquet(self._lineage_dir())
        return self.spark.read.parquet(out)

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self._lineage_dir())

    def metrics(self) -> DataFrame:
        """Stage-level rollup: rows, partitions, wall time, rows/sec."""
        lin = self.lineage()
        return (
            lin.groupBy("run_id", "stage")
            .agg(
                F.sum("rows").alias("rows"),
                F.count("*").alias("partitions"),
                F.max("wall_ms").alias("wall_ms"),
            )
            .withColumn(
                "rows_per_sec",
                F.round(F.col("rows") / (F.col("wall_ms") / 1000.0), 2),
            )
        )

    def invalidate(self, stage: str) -> None:
        out = self._stage_dir(stage)
        if os.path.exists(out):
            shutil.rmtree(out)
