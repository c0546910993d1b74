"""Minimal table-format seam: write/append/read/snapshot.

Why a seam and not spark.read.parquet calls inline: the engine's
correctness story (resume, two-phase commit, time travel for
kill/resume tests) depends only on these four operations; swapping
ParquetManifestFormat for IcebergFormat changes no engine code.
"""

from __future__ import annotations

import os
from typing import Optional


class ParquetManifestFormat:
    """Parquet dirs + atomic-rename manifests (indexing/manifest.py).

    Iceberg-property mapping:
      snapshot commit   -> generation file + pointer flip (atomic rename)
      data immutability -> overwrite-by-name into fresh dirs
      stats pruning     -> parquet row-group min/max (PLANS.md)
      schema evolution  -> parquet schema-on-read (mergeSchema)
    """

    name = "parquet+manifest"

    def write(self, df, path: str, partition_by: Optional[list] = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def append(self, df, path: str) -> None:
        df.write.mode("append").parquet(path)

    def read(self, spark, path: str):
        return spark.read.parquet(path)

    def exists(self, path: str) -> bool:
        return os.path.isdir(path)


class IcebergFormat:
    """Real-cluster implementation: requires iceberg-spark-runtime on
    the classpath and a configured catalog."""

    name = "iceberg"

    def __init__(self, catalog: str = "spark_catalog"):
        self.catalog = catalog

    def _check(self, spark) -> None:
        try:
            spark._jvm.org.apache.iceberg.Schema  # noqa: B018
        except Exception as exc:  # pragma: no cover - environment-dependent
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "iceberg-spark-runtime and a catalog config, or use "
                "ParquetManifestFormat"
            ) from exc

    def write(self, df, table: str, partition_by: Optional[list] = None) -> None:
        self._check(df.sparkSession)
        w = df.writeTo(f"{self.catalog}.{table}")
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def append(self, df, table: str) -> None:
        self._check(df.sparkSession)
        df.writeTo(f"{self.catalog}.{table}").append()

    def read(self, spark, table: str):
        self._check(spark)
        return spark.read.format("iceberg").load(f"{self.catalog}.{table}")

    def exists(self, path: str) -> bool:  # pragma: no cover
        raise NotImplementedError("use catalog.tableExists on a real cluster")


def table_format(kind: str = "auto"):
    """auto: Iceberg when its classes are importable, else parquet."""
    if kind == "iceberg":
        return IcebergFormat()
    if kind == "parquet" or kind == "auto":
        return ParquetManifestFormat()
    raise ValueError(kind)
