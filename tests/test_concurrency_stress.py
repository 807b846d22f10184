"""Multi-PROCESS commit-log stress: real OS-level writer concurrency,
beyond the in-process thread races elsewhere in the suite.

The reference serializes writers through Delta's OptimisticTransaction
(IndexedTable.scala:355-368); this log replaces that with O_EXCL version
files + logical conflict detection (sources/log.py:484). Two properties
must hold under genuinely concurrent writers in SEPARATE interpreters:

1. blind appends never lose a commit — every writer's every commit lands
   on a unique contiguous version (WriteSerializable, like Delta);
2. read-modify-write transactions are SERIALIZABLE: racing rewrites of
   the same file raise ConcurrentModificationError for every loser, and
   the retry loop produces one linear lineage with no lost update.

Workers run via ``subprocess`` (clean interpreters — no fork-inside-JVM
hazards), synchronized on a go-file so they actually race.
"""

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_APPEND_WORKER = r"""
import sys
sys.path.insert(0, @@REPO@@)
from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile
import os, time

table, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
go = os.path.join(table, "_go")
open(os.path.join(table, f"_ready_{wid}"), "w").close()
while not os.path.exists(go):
    time.sleep(0.001)
log = CommitLog(table)
for j in range(n):
    log.commit(add=[IndexFile(f"w{wid}_c{j}.parquet", 1, 1, 1,
                              [Block("0:0", 0, 1, 1)])],
               operation="WRITE", max_retries=500)
print("OK")
"""

_READER_WORKER = r"""
import sys
sys.path.insert(0, @@REPO@@)
from qbeast_spark_spark.sources.log import CommitLog
import os, time

table, wid, _ = sys.argv[1], int(sys.argv[2]), sys.argv[3]
go = os.path.join(table, "_go")
open(os.path.join(table, f"_ready_{wid}"), "w").close()
while not os.path.exists(go):
    time.sleep(0.001)
log = CommitLog(table)
last_v, reads = -1, 0
while not os.path.exists(os.path.join(table, "_stop")):
    snap = log.snapshot()       # must NEVER see a torn/partial commit
    assert snap.version >= last_v, "snapshot went backwards"
    if snap.version >= 0:
        # blind-append workload: every commit adds exactly one file, so
        # any valid prefix satisfies files == version + 1
        assert len(snap.files) == snap.version + 1, (
            f"inconsistent prefix at v{snap.version}: "
            f"{len(snap.files)} files")
    last_v = snap.version
    reads += 1
print(f"READS={reads}")
"""

_REWRITE_WORKER = r"""
import sys
sys.path.insert(0, @@REPO@@)
from qbeast_spark_spark.sources.log import (
    Block, CommitLog, ConcurrentModificationError, IndexFile)
import os, time

table, wid, n_rewrites = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
go = os.path.join(table, "_go")
open(os.path.join(table, f"_ready_{wid}"), "w").close()
while not os.path.exists(go):
    time.sleep(0.001)
log = CommitLog(table)
cme = 0
done = 0
while done < n_rewrites:
    snap = log.snapshot()
    head = [p for p in snap.files if p.startswith("head_")]
    assert len(head) == 1, f"non-linear state: {head}"
    head = head[0]
    gen = int(head.split("_")[1]) + 1   # head_<gen>_<wid>.parquet
    new = [IndexFile(f"head_{gen:03d}_{wid}.parquet", 1, 1, 1,
                     [Block("0:0", 0, 1, 1)]),
           IndexFile(f"mark_{gen:03d}_{wid}.parquet", 1, 1, 1,
                     [Block("0:0", 0, 1, 1)])]
    try:
        log.commit(add=new, remove=[head], operation="REWRITE",
                   read_version=snap.version, read_files=[head],
                   max_retries=500)
        done += 1
    except ConcurrentModificationError:
        cme += 1            # loser: re-read and re-plan (the contract)
print(f"CME={cme}")
"""


def _env(publisher: str):
    """Worker environment selecting the commit publish strategy — "" is
    the default (POSIX hard links), "condsim" is the object-store
    simulation (flock conditional put, NO hard links), so every
    multi-process property is proven for both the POSIX deployment and
    the conditional-PUT protocol an S3/GCS backend would plug in."""
    env = dict(os.environ)
    if publisher:
        env["QBEAST_COMMIT_PUBLISHER"] = publisher
    else:
        env.pop("QBEAST_COMMIT_PUBLISHER", None)
    return env


def _run_workers(script: str, table: str, n_workers: int, arg: int,
                 publisher: str = ""):
    procs = [subprocess.Popen(
        [sys.executable, "-c", script.replace("@@REPO@@", repr(REPO)),
         table, str(i), str(arg)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(publisher))
        for i in range(n_workers)]
    deadline = time.time() + 60           # wait until EVERYONE is at the
    while time.time() < deadline:         # gate — interpreter startup
        ready = [f for f in os.listdir(table)   # stagger would otherwise
                 if f.startswith("_ready_")]    # serialize the "race"
        if len(ready) == n_workers:
            break
        time.sleep(0.005)
    else:
        raise TimeoutError("workers never reached the start gate")
    with open(os.path.join(table, "_go"), "w"):
        pass
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    return outs


@pytest.mark.parametrize("publisher", ["", "condsim"])
def test_multiprocess_blind_appends_lose_nothing(tmp_path, publisher):
    from qbeast_spark_spark.sources.log import CommitLog

    table = str(tmp_path / "t")
    os.makedirs(table)
    n_writers, n_commits = 6, 20
    n_readers = 2               # hammer snapshot() while writers commit:
    n_workers = n_writers + n_readers   # this is the torn-read scenario

    scripts = ([_APPEND_WORKER] * n_writers + [_READER_WORKER] * n_readers)
    procs = [subprocess.Popen(
        [sys.executable, "-c", s.replace("@@REPO@@", repr(REPO)),
         table, str(i), str(n_commits)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(publisher))
        for i, s in enumerate(scripts)]
    deadline = time.time() + 60
    while time.time() < deadline:
        if len([f for f in os.listdir(table)
                if f.startswith("_ready_")]) == n_workers:
            break
        time.sleep(0.005)
    else:
        raise TimeoutError("workers never reached the start gate")
    with open(os.path.join(table, "_go"), "w"):
        pass
    outs = []
    for i, p in enumerate(procs[:n_writers]):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"writer failed:\n{err[-2000:]}"
        outs.append(out)
    with open(os.path.join(table, "_stop"), "w"):
        pass
    for p in procs[n_writers:]:
        out, err = p.communicate(timeout=60)
        assert p.returncode == 0, f"reader saw a torn commit:\n{err[-2000:]}"
        assert int(out.strip().split("=")[1]) >= 1, "reader never read"
    n_workers = n_writers       # the assertions below count writers only

    log = CommitLog(table)
    total = n_workers * n_commits
    assert log._versions() == list(range(total)), "versions not contiguous"
    snap = log.snapshot()
    assert snap.version == total - 1
    want = {f"w{i}_c{j}.parquet"
            for i in range(n_workers) for j in range(n_commits)}
    assert set(snap.files) == want, "a concurrent commit was lost"
    # the checkpoint a racing writer produced is a readable valid prefix
    cp = log._last_checkpoint_version()
    assert cp is not None and cp % 10 == 0
    assert len(log.snapshot(at_version=cp).files) == cp + 1


@pytest.mark.parametrize("publisher", ["", "condsim"])
def test_multiprocess_conflicting_rewrites_serialize(tmp_path, publisher):
    from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile

    table = str(tmp_path / "t")
    os.makedirs(table)
    log = CommitLog(table)
    log.commit(add=[IndexFile("head_000_seed.parquet", 1, 1, 1,
                              [Block("0:0", 0, 1, 1)])], operation="WRITE")

    n_workers, n_rewrites = 4, 5
    outs = _run_workers(_REWRITE_WORKER, table, n_workers, n_rewrites,
                        publisher=publisher)

    total = n_workers * n_rewrites
    snap = log.snapshot()
    # exactly one live head, at generation == total rewrites: a linear
    # lineage — every transaction built on the previous winner's state
    heads = sorted(p for p in snap.files if p.startswith("head_"))
    assert len(heads) == 1, f"split-brain heads: {heads}"
    assert int(heads[0].split("_")[1]) == total
    # one marker per generation 1..total — no generation lost or doubled
    gens = sorted(int(p.split("_")[1]) for p in snap.files
                  if p.startswith("mark_"))
    assert gens == list(range(1, total + 1))
    # every commit after init is a rewrite: versions contiguous
    assert snap.version == total
    # contention actually happened and was surfaced as CME (not silent)
    cmes = sum(int(o.strip().split("=")[1]) for o in outs)
    assert cmes >= 1, "race never materialized — gate broken?"
    # the log's own history agrees: each REWRITE removed exactly 1 file
    hist = [json.loads(open(os.path.join(log.log_dir, f"{v:012d}.json"))
                       .read()) for v in range(1, total + 1)]
    assert all(len(h["remove"]) == 1 and len(h["add"]) == 2 for h in hist)


_CRASH_WORKER = r"""
import sys
sys.path.insert(0, @@REPO@@)
from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile

table, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
log = CommitLog(table)
for j in range(n):                      # no gate: parent kills us mid-run
    log.commit(add=[IndexFile(f"k{wid}_c{j}.parquet", 1, 1, 1,
                              [Block("0:0", 0, 1, 1)])],
               operation="WRITE", max_retries=500)
"""


@pytest.mark.parametrize("publisher", ["", "condsim"])
def test_sigkill_mid_commit_never_corrupts_the_log(tmp_path, publisher):
    """Kill committing writers at random moments, repeatedly: every
    version file that exists must be COMPLETE valid JSON (the atomic
    link — or conditional-put tmp+rename — publish guarantees it),
    versions stay contiguous, the snapshot replays, and new commits keep
    working. Orphaned staging tmps are the only permitted residue — and
    vacuum ages them out. Under condsim a writer can die HOLDING the
    flock (the kernel releases it with the fd), so later commits must
    not wedge."""
    import signal

    from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile

    table = str(tmp_path / "t")
    os.makedirs(table)
    log = CommitLog(table)
    for round_no in range(6):
        p = subprocess.Popen(
            [sys.executable, "-c",
             _CRASH_WORKER.replace("@@REPO@@", repr(REPO)),
             table, str(round_no), "10000"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=_env(publisher))
        time.sleep(0.4 + 0.15 * round_no)   # varied kill points
        p.send_signal(signal.SIGKILL)
        p.wait()
        versions = log._versions()
        assert versions == list(range(len(versions))), "gap after crash"
        for v in versions[-3:]:             # newest are the risky ones
            with open(os.path.join(log.log_dir, f"{v:012d}.json")) as fh:
                assert json.load(fh)["add"], f"torn commit at v{v}"
        snap = log.snapshot()               # full replay still works
        assert snap.version == len(versions) - 1
        # the log stays writable after every crash
        log.commit(add=[IndexFile(f"alive_{round_no}.parquet", 1, 1, 1,
                                  [Block("0:0", 0, 1, 1)])],
                   operation="WRITE")

    # a crash between staging and publish may orphan .commit-*.tmp files;
    # they are invisible to _versions() and vacuum ages them out
    stale = os.path.join(log.log_dir, ".commit-999-deadbeef.tmp")
    with open(stale, "w") as fh:
        fh.write("{}")
    os.utime(stale, (time.time() - 9000, time.time() - 9000))
    import pyspark  # noqa: F401 — QbeastTable needs no session for vacuum

    from qbeast_spark_spark.sources.reader import QbeastTable
    qt = QbeastTable(None, table)
    gone = qt.vacuum(retention_hours=1.0)
    assert any(p.endswith(".commit-999-deadbeef.tmp") for p in gone)
    assert not os.path.exists(stale)
    # fresh tmps (a possibly in-flight writer) survive the retention
    live = os.path.join(log.log_dir, ".commit-1000-cafe.tmp")
    with open(live, "w") as fh:
        fh.write("{}")
    assert not any(".commit-1000" in p
                   for p in qt.vacuum(retention_hours=1.0))
    assert os.path.exists(live)


def test_readers_racing_dml_see_only_committed_versions(spark, tmp_table):
    """Snapshot-isolation invariant through the FULL stack: while one
    thread runs a DML burst (delete / update / merge / optimize), reader
    threads continuously open fresh QbeastTable handles and count rows.
    Every observed count must equal the row count of SOME committed
    version — never a mix of two (files are immutable and commits are
    atomic adds+removes, so a snapshot either includes a rewrite
    entirely or not at all)."""
    import threading

    from conftest import load

    import qbeast_spark_spark as qss

    li = load(spark, "lineitem").limit(5000)
    qss.write(li, tmp_table,
              columns_to_index=["l_orderkey", "l_extendedprice"],
              cube_size=600)
    qt = qss.QbeastTable.for_path(spark, tmp_table)

    committed = {li.count()}        # version 0
    observed = []
    stop = threading.Event()
    errs = []

    def reader():
        try:
            while not stop.is_set():
                h = qss.QbeastTable.for_path(spark, tmp_table)
                observed.append(h.to_df().count())
        except Exception as e:      # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for step in range(6):
            if step % 3 == 0:
                qt.delete([("l_orderkey", ">=", 100 * step),
                           ("l_orderkey", "<", 100 * step + 60)])
            elif step % 3 == 1:
                qt.update({"l_quantity": "l_quantity + 1"},
                          [("l_extendedprice", "<", 20000.0)])
            else:
                qss.optimize_table(spark, tmp_table, fraction=1.0)
            committed.add(          # read only after all threads join
                qss.QbeastTable.for_path(spark, tmp_table)
                .to_df().count())
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errs, errs[:1]
    assert len(observed) >= 3, "readers never completed a read"
    stray = [n for n in observed if n not in committed]
    assert not stray, (
        f"reader saw row counts {sorted(set(stray))} matching no "
        f"committed version (committed: {sorted(committed)})")


def _mk_txn_log(table, marker_holder):
    """CommitLog whose Nth _versions() call lets a racing writer land
    the same (appId, version) txn commit at a controlled point — a
    deterministic reproduction of the check-then-act windows.

    NOTE on call numbering: commit() consumes _versions() call #1
    inside table_protocol() before the retry loop, so the loop's own
    listings start at call #2. The parametrized injection points (1-3,
    before/after the listing) bracket every boundary of the
    check/list/publish sequence; against the pre-fix ordering the
    (2, True) and (3, False) points produce DUPLICATE commits (verified
    by checking out the old log.py), and all four are exactly-once under
    the reordered check."""
    from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile

    class InjectingLog(CommitLog):
        def __init__(self, path, inject_on_call, after_listing):
            super().__init__(path)
            self._calls = 0
            self._on = inject_on_call
            self._after = after_listing

        def _inject(self):
            racer = CommitLog(self.table_path)
            racer.commit(add=[IndexFile("racer.parquet", 1, 1, 1,
                                        [Block("0:0", 0, 1, 1)])],
                         operation="WRITE",
                         txn={"appId": "stream", "version": 7})
            marker_holder.append("injected")

        def _versions(self):
            self._calls += 1
            if self._calls != self._on or marker_holder:
                return super()._versions()
            if self._after:
                out = super()._versions()
                self._inject()
                return out
            self._inject()
            return super()._versions()

    return InjectingLog


@pytest.mark.parametrize("inject_on_call,after_listing",
                         [(1, False), (2, False), (2, True), (3, False)])
def test_txn_idempotence_survives_racing_same_txn_commit(
        tmp_path, inject_on_call, after_listing):
    """Exactly-once under the worst interleavings: a racer commits the
    SAME (appId, version) at every boundary of this writer's
    check/list/publish sequence. Wherever it lands, exactly ONE data
    commit for the txn may exist — the reordered skip (checked AS OF the
    listed state, log.py) plus the EEXIST retry cover every window. The
    (2, True) and (3, False) cases DUPLICATED the commit under the
    pre-r6 ordering (idempotency snapshot read before the version
    listing); see _mk_txn_log's call-numbering note."""
    from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile

    table = str(tmp_path / "t")
    os.makedirs(table)
    base = CommitLog(table)
    base.commit(add=[IndexFile("seed.parquet", 1, 1, 1,
                               [Block("0:0", 0, 1, 1)])], operation="WRITE")

    markers = []
    Injecting = _mk_txn_log(table, markers)
    log = Injecting(table, inject_on_call, after_listing)
    v = log.commit(add=[IndexFile("mine.parquet", 1, 1, 1,
                                  [Block("0:0", 0, 1, 1)])],
                   operation="WRITE",
                   txn={"appId": "stream", "version": 7})
    assert markers == ["injected"]

    final = CommitLog(table)
    snap = final.snapshot()
    # exactly one data commit for the txn: the racer's file is in, ours
    # must NOT be (we lost the idempotency race and returned its version)
    assert "racer.parquet" in snap.files
    assert "mine.parquet" not in snap.files, (
        "duplicate txn commit: both writers published (appId,version)")
    assert snap.txns.get("stream") == 7
    # the skip returned the version the racer committed
    assert v == snap.version == 1
