"""Executor-side import safety: the package ships its closures by value
(cloudpickle pickle-by-value registration in __init__), so every Arrow
kernel must work when the driver's cwd is NOT the repo and the package is
not on the workers' sys.path. A deferred ``from ..x import y`` inside a
shipped closure breaks exactly here and nowhere in the normal test suite
(whose cwd makes the package importable everywhere) — this caught a real
bug in the bloom kernel."""

import os
import subprocess
import sys


def test_write_kernels_run_with_foreign_cwd(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import sys; sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
import qbeast_spark_spark as qss
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(2000)
      .withColumn("rid", F.format_string("id-%d", F.col("l_orderkey"))))
p = {str(tmp_path / "t")!r}
qss.write(li, p, columns_to_index=["l_orderkey"], cube_size=500,
          bloom_columns=["rid"])
qt = qss.QbeastTable.for_path(spark, p)
assert qt.to_df().count() == 2000
assert qt.sample(0.5).count() > 0
assert qt._prune_files(qt.snapshot(), [("rid", "=", "id-nope")]) == []
print("EXECUTOR_IMPORTS_OK")
"""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", script], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "EXECUTOR_IMPORTS_OK" in out.stdout


def test_pyds_runs_with_foreign_cwd(tmp_path):
    """format('qbeast') planning runs in a driver-side Python worker and
    scans run in executor workers — neither has the package on sys.path,
    so ANY deferred intra-package import in sources/pyds.py (or anything
    it reaches: prune_files, sparkhash, deletion vectors) breaks only
    here. Caught two real bugs (blooms_exclude, _timestamp_to_ms)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import sys, time; sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import qbeast_spark_spark as qss
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qss.register_data_source(spark)
li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(2000)
p = {str(tmp_path / "t")!r}
qss.write(li, p, columns_to_index=["l_orderkey"], cube_size=500)
t_mid = int(time.time() * 1000)
df = spark.read.format("qbeast").load(p)
assert df.count() == 2000
assert df.filter("l_orderkey < 500").count() == \\
    li.filter("l_orderkey < 500").count()
assert spark.read.format("qbeast").option("fraction", 0.1) \\
    .load(p).count() > 0
assert spark.read.format("qbeast").option("timestampAsOf", str(t_mid)) \\
    .load(p).count() == 2000
assert spark.read.format("qbeast").option("where", "l_orderkey < 500") \\
    .load(p).where("l_orderkey < 500").count() == \\
    li.filter("l_orderkey < 500").count()
import qbeast_spark_spark as _q
_q.QbeastTable.for_path(spark, p).enable_change_data_feed()
li.limit(10).write.format("qbeast").mode("append").save(p)
assert spark.read.format("qbeast").load(p).count() == 2010
q = (spark.readStream.format("qbeast").load(p)
     .writeStream.format("parquet").option("path", {str(tmp_path / "o")!r})
     .option("checkpointLocation", {str(tmp_path / "ck")!r})
     .trigger(availableNow=True).start())
q.awaitTermination(120)
assert spark.read.parquet({str(tmp_path / "o")!r}).count() == 2010
assert spark.read.format("qbeast").option("readChangeFeed", "true") \\
    .option("startingVersion", 0).load(p) \\
    .where("_change_type = 'insert'").count() == 2010
print("PYDS_FOREIGN_CWD_OK")
"""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", script], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PYDS_FOREIGN_CWD_OK" in out.stdout
