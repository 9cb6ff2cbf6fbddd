"""Iceberg-branch coverage for StageCatalog — gated on the runtime jar.

The sandbox image ships no iceberg-spark-runtime jar and has no network, so
this test SKIPS there (the parquet fallback is covered by test_pipeline).
On any machine with the jar (ICEBERG_JAR env var, or dropped into
$SPARK_HOME/jars), it runs the real branch: createOrReplace / read /
append / tableExists against a hadoop-type catalog in a tmpdir, in its own
subprocess (catalog + jar configs must be set at JVM launch)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    cand = os.environ.get("ICEBERG_JAR")
    if cand and os.path.exists(cand):
        return cand
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = glob.glob(os.path.join(jars_dir, "iceberg-spark-runtime*.jar"))
    return hits[0] if hits else None


_DRIVER = r"""
import json, sys, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from fast_er_spark.catalog import StageCatalog

jar, wh = sys.argv[1], tempfile.mkdtemp(prefix="iceberg_wh_")
spark = (SparkSession.builder.master("local[2]")
         .appName("iceberg-test")
         .config("spark.jars", jar)
         .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
         .config("spark.sql.catalog.it.type", "hadoop")
         .config("spark.sql.catalog.it.warehouse", wh)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
cat = StageCatalog(spark, wh, iceberg_catalog="it", namespace="t")
assert cat.iceberg == "it", "catalog fell back to parquet despite the jar"
df = spark.range(5).withColumnRenamed("id", "x")
assert not cat.exists("s1")
cat.write(df, "s1")
assert cat.exists("s1")
assert cat.read("s1").count() == 5
cat.append(df, "s1")
assert cat.read("s1").count() == 10
cat.write(df, "s1")  # atomic replace
assert cat.read("s1").count() == 5
print("ICEBERG_OK")
spark.stop()
"""


@pytest.mark.skipif(
    _find_iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar in this environment (set ICEBERG_JAR)",
)
def test_stage_catalog_iceberg_branch():
    jar = _find_iceberg_jar()
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER.format(repo=REPO), jar],
        capture_output=True, text=True, timeout=600,
    )
    assert "ICEBERG_OK" in out.stdout, out.stderr[-2000:]
