"""Stage-table IO abstraction: Iceberg when a catalog is configured, parquet
directories otherwise (SURVEY.md §7 — the sandbox has no Iceberg runtime jar,
so the fallback keeps the same layout/semantics: atomic overwrite, schema on
read, `exists` via successful-write marker).

On a real cluster, configure e.g.::

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hive

and pass ``iceberg_catalog='lake'``: stages then checkpoint as Iceberg tables
(``lake.<namespace>.<stage>``) and pick up snapshot isolation + time travel
for free. Everything else in the pipeline is format-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["StageCatalog"]


class StageCatalog:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        iceberg_catalog: str | None = None,
        namespace: str = "dedup",
    ):
        self.spark = spark
        self.root = root
        self.namespace = namespace
        self.iceberg = None
        if iceberg_catalog:
            try:
                spark.sql(
                    f"CREATE NAMESPACE IF NOT EXISTS {iceberg_catalog}.{namespace}"
                )
                self.iceberg = iceberg_catalog
            except Exception:
                self.iceberg = None  # jar/catalog absent -> parquet fallback

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _table(self, name: str) -> str:
        return f"{self.iceberg}.{self.namespace}.{name}"

    def write(self, df: DataFrame, name: str) -> None:
        if self.iceberg:
            df.writeTo(self._table(name)).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.iceberg:
            try:
                df.writeTo(self._table(name)).append()
            except Exception:
                df.writeTo(self._table(name)).createOrReplace()
        else:
            df.write.mode("append").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._table(name))
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._table(name))
        # Hadoop FileSystem probe, not os.path: resume-from-checkpoint must
        # work for s3://, hdfs://, etc. workdirs, exactly the deployment
        # scripts/run_dedup.py advertises (round-1 ADVICE)
        marker = os.path.join(self._path(name), "_SUCCESS")
        jvm = self.spark._jvm  # noqa: SLF001
        hpath = jvm.org.apache.hadoop.fs.Path(marker)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())  # noqa: SLF001
        return bool(fs.exists(hpath))
