"""Multi-process stress for the SQL catalog metastore (sources/catalog.py).

Same discipline as tests/test_concurrency_stress.py: real subprocess
interpreters with a ready-file start gate (interpreter startup stagger
would otherwise serialize the race). Two lanes:

- pure-metastore: N processes hammer ``_mutate`` read-modify-writes on
  one catalog file — the flock + tmp/rename protocol must serialize
  them (no lost updates, parseable JSON at every point);
- full-stack: N Spark-bearing processes race ``CREATE TABLE`` on ONE
  name (exactly one may win — the reservation is the creation-race
  guard) and then race INSERTs into the winner's table (the commit log
  arbitrates; every row must land).
"""
import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MUTATE_WORKER = r"""
import sys
sys.path.insert(0, @@REPO@@)
from qbeast_spark_spark.sources.catalog import QbeastSqlCatalog
import os, time

wh, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
go = os.path.join(wh, "_go")
open(os.path.join(wh, f"_ready_{wid}"), "w").close()
while not os.path.exists(go):
    time.sleep(0.001)
cat = QbeastSqlCatalog.__new__(QbeastSqlCatalog)
cat.warehouse = wh
for j in range(n):
    def bump(entries, wid=wid, j=j):
        entries[f"t_{wid}_{j}"] = {"location": f"/x/{wid}/{j}",
                                   "managed": False, "options": {}}
        entries["_counter"] = {"location": str(
            int(entries.get("_counter", {}).get("location", "0")) + 1),
            "managed": False, "options": {}}
    cat._mutate(bump)
print("OK")
"""

_CREATE_WORKER = r"""
import sys
sys.path.insert(0, @@REPO@@)
import os, time
wh, wid = sys.argv[1], int(sys.argv[2])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "1g").getOrCreate())
from qbeast_spark_spark.sources.catalog import QbeastSqlCatalog
cat = QbeastSqlCatalog(spark, wh)
go = os.path.join(wh, "_go")
os.makedirs(wh, exist_ok=True)
open(os.path.join(wh, f"_ready_{wid}"), "w").close()
while not os.path.exists(go):
    time.sleep(0.001)
won = 0
try:
    cat.sql("CREATE TABLE raced (id INT, w INT) USING qbeast "
            "OPTIONS ('columnsToIndex'='id', cubeSize=100)")
    won = 1
except ValueError as e:
    assert "already exists" in str(e), e
# whoever won, everyone INSERTs (log arbitration) — retry while the
# winner's empty write is still in flight
deadline = time.time() + 120
while True:
    try:
        cat.sql(f"INSERT INTO raced VALUES (1, {wid}), (2, {wid})")
        break
    except Exception:
        if time.time() > deadline:
            raise
        time.sleep(0.2)
print("WON" if won else "LOST")
"""


def _run_workers(script, args_list, gate_dir, timeout=300):
    src = script.replace("@@REPO@@", repr(REPO))
    procs = [subprocess.Popen(
        [sys.executable, "-c", src, *[str(a) for a in args]],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for args in args_list]
    deadline = time.time() + timeout
    while time.time() < deadline:
        ready = [f for f in os.listdir(gate_dir)
                 if f.startswith("_ready_")] if os.path.isdir(gate_dir) \
            else []
        if len(ready) == len(args_list):
            break
        time.sleep(0.01)
    open(os.path.join(gate_dir, "_go"), "w").close()
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out.strip().splitlines()[-1] if out.strip() else "")
    return outs


def test_metastore_mutations_never_lost(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    n_workers, n_each = 6, 25
    outs = _run_workers(_MUTATE_WORKER,
                        [(wh, w, n_each) for w in range(n_workers)],
                        wh)
    assert all(o == "OK" for o in outs)
    with open(os.path.join(wh, "_qbeast_catalog.json")) as fh:
        entries = json.load(fh)
    names = [k for k in entries if k.startswith("t_")]
    assert len(names) == n_workers * n_each          # no lost update
    assert entries["_counter"]["location"] == str(n_workers * n_each)


def test_racing_creates_one_winner_inserts_all_land(tmp_path):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    n_workers = 3
    outs = _run_workers(_CREATE_WORKER,
                        [(wh, w) for w in range(n_workers)],
                        wh, timeout=600)
    assert outs.count("WON") == 1, outs
    assert outs.count("LOST") == n_workers - 1, outs

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.ui.enabled", "false").getOrCreate())
    from qbeast_spark_spark.sources.catalog import QbeastSqlCatalog

    cat = QbeastSqlCatalog(spark, wh)
    assert list(cat.tables()) == ["raced"]
    rows = cat.sql("SELECT w, COUNT(*) AS n FROM raced GROUP BY w") \
        .collect()
    # every worker's two rows landed exactly once
    assert sorted((r.w, r.n) for r in rows) == [
        (w, 2) for w in range(n_workers)]
