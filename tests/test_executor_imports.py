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
