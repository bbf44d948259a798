"""Stage checkpointing, lineage and resume (SURVEY §4.2, north rule).

The north rule requires: every stage checkpoints to Iceberg with
per-partition lineage rows (partition_id, urls_in, pages_in, bytes_out,
wall_ms) so a killed run resumes from the last committed snapshot.

This module is format-agnostic behind one ``Catalog`` helper:
  * Iceberg when the runtime jar + catalog are configured
    (``spark.sql.catalog.<name>`` present) — ``writeTo(...).append()``;
  * parquet-directory fallback otherwise (this sandbox: no Iceberg jar,
    see /opt guide) — same table semantics, append = new files.

Resume semantics mirror the reference's skip-existing incremental mode
(benchmarks/cli.py:318-323, SURVEY F8/U6): a restarted run left-anti joins
its input keys against the committed output snapshot and processes only the
remainder. Lineage rows are collected during the stage write via
``mapInPandas`` accounting, appended to a ``<table>__lineage`` table.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _iceberg_available(spark: SparkSession, catalog: str) -> bool:
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


class Catalog:
    """Minimal table catalog: Iceberg when configured, parquet dirs else."""

    def __init__(self, spark: SparkSession, root: str,
                 iceberg_catalog: str = "plp"):
        self.spark = spark
        self.root = root
        self.iceberg = _iceberg_available(spark, iceberg_catalog)
        self.catalog_name = iceberg_catalog
        if not self.iceberg:
            os.makedirs(root, exist_ok=True)

    # -- basic table ops ----------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog_name}.{table}")
        import glob

        return bool(glob.glob(os.path.join(self._path(table), "*.parquet")) or
                    glob.glob(os.path.join(self._path(table), "*", "*.parquet")))

    def read(self, table: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"{self.catalog_name}.{table}")
        return self.spark.read.parquet(self._path(table))

    def append(self, df: DataFrame, table: str) -> None:
        if self.iceberg:
            df.writeTo(f"{self.catalog_name}.{table}").createOrReplace() \
                if not self.exists(table) else \
                df.writeTo(f"{self.catalog_name}.{table}").append()
        else:
            df.write.mode("append").parquet(self._path(table))

    # -- checkpointed stage write with lineage -------------------------------

    def checkpoint_stage(self, df: DataFrame, table: str,
                         url_col: str = "url",
                         page_col: str | None = "page_no") -> DataFrame:
        """Append ``df`` to ``table`` while recording per-partition lineage
        rows (partition_id, urls_in, pages_in, bytes_out, wall_ms) to
        ``<table>__lineage``, then return the committed table.

        The staged DataFrame is persisted around the two appends: without
        it, the lineage append would RECOMPUTE the whole upstream (incl.
        mapInPandas stages) — doubling stage cost and potentially recording
        partition counts from a different physical plan than the data
        actually written. On a real cluster replace the persist with a
        read-back of the just-committed snapshot. A crash between the data
        append and the lineage append leaves data committed with lineage
        missing for that run_id — resume correctness is unaffected (resume
        keys off the DATA snapshot; lineage is observability)."""
        run_id = uuid.uuid4().hex[:12]
        cols = df.columns
        page_expr = F.col(page_col) if page_col and page_col in cols else F.lit(1)
        sizer = sum(
            (F.when(F.col(c).isNotNull(), F.length(F.col(c).cast("string")))
             .otherwise(0) for c in cols),
            F.lit(0),
        )
        # lineage is aggregated relationally in the same job via
        # spark_partition_id() — one pass, no side channels
        staged = (
            df.withColumn("__bytes", sizer)
            .withColumn("__page", page_expr)
            .withColumn("__pid", F.spark_partition_id())
        ).persist()
        lineage = staged.groupBy("__pid").agg(
            F.countDistinct(url_col).alias("urls_in"),
            F.countDistinct(url_col, "__page").alias("pages_in"),
            F.sum("__bytes").alias("bytes_out"),
            F.count("*").alias("rows_out"),
        ).select(
            F.lit(run_id).alias("run_id"),
            F.col("__pid").alias("partition_id"),
            "urls_in", "pages_in", "bytes_out", "rows_out",
            F.lit(int(time.time() * 1000)).alias("committed_ms"),
        )
        t0 = time.monotonic()
        try:
            self.append(staged.drop("__bytes", "__page", "__pid"), table)
            wall_ms = int((time.monotonic() - t0) * 1000)
            self.append(lineage.withColumn("wall_ms", F.lit(wall_ms)),
                        f"{table}__lineage")
        finally:
            staged.unpersist()
        return self.read(table)

    # -- bucketing ------------------------------------------------------------

    def write_bucketed(self, df: DataFrame, table: str, num_buckets: int,
                       *bucket_cols: str) -> DataFrame:
        """Persist a table bucketed (+ sorted) on the join key so subsequent
        joins/aggregations on that key are exchange-free (SURVEY §4.2:
        co-located joins via bucketing). Uses the session catalog's managed
        warehouse (Iceberg: bucket(n, col) partition transform instead)."""
        import shutil

        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = self.spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(warehouse.removeprefix("file:"), table)
        shutil.rmtree(loc, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(num_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .format("parquet")
            .saveAsTable(table)
        )
        return self.spark.read.table(table)

    # -- resume -------------------------------------------------------------

    def pending_inputs(self, inputs: DataFrame, table: str,
                       key: str = "url") -> DataFrame:
        """Input rows NOT yet present in the committed output — the resume
        primitive (left-anti join against the last snapshot; reference
        analogue: skip-existing, cli.py:318-323)."""
        if not self.exists(table):
            return inputs
        done = self.read(table).select(key).distinct()
        return inputs.join(done, key, "left_anti")


def run_resumable(catalog: Catalog, pages: DataFrame, table: str,
                  stage_fn, key: str = "url") -> DataFrame:
    """Process only not-yet-committed inputs through ``stage_fn`` and
    checkpoint the results; returns the full committed table. Calling this
    again after a crash (or with new inputs) finishes the remainder —
    exactly-once per input key as long as stage_fn is deterministic."""
    todo = catalog.pending_inputs(pages, table, key=key)
    if todo.limit(1).count() > 0:
        catalog.checkpoint_stage(stage_fn(todo), table, url_col=key)
    return catalog.read(table)
