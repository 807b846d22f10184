"""Commit-publish strategy tests (sources/log.py CommitPublisher).

The put-if-absent primitive is the one correctness-critical filesystem
operation in the whole commit protocol — the same role Delta's LogStore
implementations play for the reference (docs/CloudStorages.md). These
tests pin the strategy contract itself; the multi-process races live in
test_concurrency_stress.py (parametrized over link + condsim).
"""

import json
import os
import threading

import pytest

from qbeast_spark_spark.sources.log import (
    Block, CommitLog, ConditionalPutPublisher, ExclusivePublisher,
    FailLoudPublisher, IndexFile, LinkPublisher,
    LocalConditionalPutPublisher, _publisher_factory_from_env)


def _f(name):
    return IndexFile(name, 1, 1, 1, [Block("0:0", 0, 1, 1)])


def test_env_keyword_resolution(monkeypatch):
    monkeypatch.delenv("QBEAST_COMMIT_PUBLISHER", raising=False)
    assert _publisher_factory_from_env() is LinkPublisher
    for kw, cls in (("link", LinkPublisher), ("excl", ExclusivePublisher),
                    ("condsim", LocalConditionalPutPublisher),
                    ("fail", FailLoudPublisher)):
        monkeypatch.setenv("QBEAST_COMMIT_PUBLISHER", kw)
        assert _publisher_factory_from_env() is cls
    monkeypatch.setenv("QBEAST_COMMIT_PUBLISHER", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        _publisher_factory_from_env()


def test_env_dotted_path_resolution(monkeypatch):
    # a deployment points the env var at its own factory — resolve a
    # stdlib attribute to prove the import path works
    monkeypatch.setenv(
        "QBEAST_COMMIT_PUBLISHER",
        "qbeast_spark_spark.sources.log:LocalConditionalPutPublisher")
    assert _publisher_factory_from_env() is LocalConditionalPutPublisher


def test_fail_loud_refuses_commits(tmp_path):
    log = CommitLog(str(tmp_path), publisher_factory=FailLoudPublisher)
    with pytest.raises(RuntimeError, match="put-if-absent"):
        log.commit(add=[_f("a.parquet")])
    # nothing was published or staged
    assert log._versions() == []


def test_condsim_commit_roundtrip_without_hardlinks(tmp_path):
    log = CommitLog(str(tmp_path),
                    publisher_factory=LocalConditionalPutPublisher)
    v0 = log.commit(add=[_f("a.parquet")], operation="WRITE")
    v1 = log.commit(add=[_f("b.parquet")], remove=["a.parquet"],
                    operation="REWRITE", read_version=v0,
                    read_files=["a.parquet"])
    snap = CommitLog(str(tmp_path)).snapshot()
    assert (v0, v1) == (0, 1)
    assert set(snap.files) == {"b.parquet"}
    # published versions are complete JSON; ONE per-table lock file
    for v in (0, 1):
        with open(os.path.join(log.log_dir, f"{v:012d}.json")) as fh:
            json.load(fh)
    assert os.path.exists(os.path.join(log.log_dir, ".commitlock"))
    assert not [n for n in os.listdir(log.log_dir) if n.endswith(".lock")]


def test_condsim_in_process_race_loses_no_commit(tmp_path):
    """Threads hammering one version counter through the flock
    conditional put: every commit lands exactly once on a contiguous
    version (the same property the multi-process stress proves across
    interpreters)."""
    table = str(tmp_path)
    n_threads, n_commits = 8, 15
    errs = []

    def worker(wid):
        try:
            log = CommitLog(table,
                            publisher_factory=LocalConditionalPutPublisher)
            for j in range(n_commits):
                log.commit(add=[_f(f"w{wid}_c{j}.parquet")],
                           max_retries=2000)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs[:1]
    log = CommitLog(table)
    total = n_threads * n_commits
    assert log._versions() == list(range(total))
    assert len(log.snapshot().files) == total


def test_conditional_put_lost_reply_disambiguation(tmp_path):
    """A retried conditional PUT whose first attempt landed server-side
    reports a conflict for OUR OWN object (S3 412 on retransmit); the
    publisher must recognize the content as its own and report success —
    otherwise the retry loop would publish a DUPLICATE commit at the
    next version."""
    lied = {"n": 0}

    def lying_put(path, body):
        ok = LocalConditionalPutPublisher._cond_put(path, body)
        if ok and lied["n"] == 0:
            lied["n"] += 1
            return False        # write landed; reply lost
        return ok

    def get(path):
        with open(path, "rb") as fh:
            return fh.read()

    log = CommitLog(str(tmp_path), publisher_factory=lambda d:
                    ConditionalPutPublisher(lying_put, get))
    v = log.commit(add=[_f("x.parquet")])
    assert lied["n"] == 1       # the ambiguous branch actually ran
    assert v == 0
    assert CommitLog(str(tmp_path))._versions() == [0], \
        "lost-reply retry duplicated the commit"


def test_conditional_put_without_get_treats_conflict_as_lost(tmp_path):
    """No get() configured -> a conflict is taken at face value and the
    writer retries at the next version (safe for stores whose PUT is
    not retried, e.g. SDKs with disabled auto-retry)."""
    log_a = CommitLog(str(tmp_path),
                      publisher_factory=LocalConditionalPutPublisher)
    log_a.commit(add=[_f("a.parquet")])

    def put(path, body):
        return LocalConditionalPutPublisher._cond_put(path, body)

    log_b = CommitLog(str(tmp_path), publisher_factory=lambda d:
                      ConditionalPutPublisher(put))

    # stale listing simulation: force b to try the taken version first
    calls = {"n": 0}
    orig = log_b._versions

    def stale_then_real():
        calls["n"] += 1
        return [] if calls["n"] == 1 else orig()

    log_b._versions = stale_then_real
    v = log_b.commit(add=[_f("b.parquet")])
    assert v == 1
    snap = CommitLog(str(tmp_path)).snapshot()
    assert set(snap.files) == {"a.parquet", "b.parquet"}


def test_conditional_put_oserror_is_recorded_and_disambiguated(tmp_path):
    """A put raising OSError is an UNKNOWN outcome: the publisher
    records it (retry-exhaustion diagnostics) and resolves the round
    via the content check — treating it as plainly lost could duplicate
    a commit whose request landed server-side."""
    boom = OSError("staging tmp vacuumed")

    def failing_put(path, body):
        raise boom

    # no get(): the outcome cannot be resolved — abort loudly (contract)
    pub = ConditionalPutPublisher(failing_put)
    with pytest.raises(OSError, match="staging tmp vacuumed"):
        pub.publish(str(tmp_path / "x.json"), b"{}")
    assert pub.last_error is boom

    # with get(): target absent resolves to a safe lost round
    pub1 = ConditionalPutPublisher(failing_put,
                                   get=LocalConditionalPutPublisher._read)
    assert pub1.publish(str(tmp_path / "x.json"), b"{}") is False
    assert pub1.last_error is boom

    # same failure, but the request DID land: get() sees our body
    landed = {"body": None}

    def landing_put(path, body):
        landed["body"] = body
        raise OSError("timeout after send")

    pub2 = ConditionalPutPublisher(landing_put,
                                   get=lambda p: landed["body"])
    assert pub2.publish(str(tmp_path / "y.json"), b"mine") is True

    # WITHOUT a get() an unknown outcome is UNRESOLVABLE: the publisher
    # must abort loudly (retrying could duplicate a commit whose
    # request landed), so the OSError propagates out of commit()
    log = CommitLog(str(tmp_path), publisher_factory=lambda d:
                    ConditionalPutPublisher(failing_put))
    with pytest.raises(OSError, match="staging tmp vacuumed"):
        log.commit(add=[_f("a.parquet")], max_retries=3)
    assert CommitLog(str(tmp_path))._versions() == [], \
        "aborted unknown-outcome commit must not publish"

    # with a get() that resolves 'absent', the same failure is a safe
    # lost round and the retry eventually errors out as exhaustion
    log2 = CommitLog(str(tmp_path), publisher_factory=lambda d:
                     ConditionalPutPublisher(
                         failing_put,
                         get=LocalConditionalPutPublisher._read))
    with pytest.raises(RuntimeError, match="staging tmp vacuumed"):
        log2.commit(add=[_f("a.parquet")], max_retries=3)


def test_orphaned_put_tmp_is_vacuumed(tmp_path):
    """A writer crashing inside the condsim critical section orphans
    NNNN.json.put; vacuum ages it out. Lock files are NEVER vacuumed
    (deleting one a slow writer may still open reintroduces the
    split-lock double-publish race)."""
    import time

    import pyspark  # noqa: F401

    from qbeast_spark_spark.sources.reader import QbeastTable

    table = str(tmp_path)
    log = CommitLog(table, publisher_factory=LocalConditionalPutPublisher)
    log.commit(add=[_f("a.parquet")])
    orphan = os.path.join(log.log_dir,
                          "000000000007.json.put-deadbeefcafe")
    with open(orphan, "w") as fh:
        fh.write("{")
    old = time.time() - 9000
    os.utime(orphan, (old, old))
    lock = os.path.join(log.log_dir, ".commitlock")
    os.utime(lock, (old, old))
    qt = QbeastTable(None, table)
    gone = qt.vacuum(retention_hours=1.0)
    assert any("000000000007.json.put" in p for p in gone)
    assert not os.path.exists(orphan)
    assert os.path.exists(lock), "vacuum must never delete the lock file"


def test_link_publisher_still_default_and_checkpointing_works(tmp_path):
    """Default path unchanged: link strategy, checkpoint at interval,
    txn idempotency intact through the strategy refactor."""
    log = CommitLog(str(tmp_path))
    for i in range(11):
        log.commit(add=[_f(f"c{i}.parquet")],
                   txn={"appId": "app", "version": i})
    assert log._last_checkpoint_version() == 10
    # idempotent replay: same (appId, version) is skipped
    v = log.commit(add=[_f("dup.parquet")],
                   txn={"appId": "app", "version": 10})
    assert v == 10
    snap = log.snapshot()
    assert "dup.parquet" not in snap.files
    assert len(snap.files) == 11


def test_clean_conflict_with_failing_get_raises(tmp_path):
    """put returns False CLEANLY (store reports conflict) but the
    disambiguating get raises: the outcome is UNKNOWN — the conflict may
    be the store's retried duplicate of OUR own write — so the publisher
    must raise, never guess "lost" (guessing would re-publish the same
    payload at N+1: a duplicate commit). Round-7 verdict #1."""
    boom = OSError("get timed out")

    def conflict_put(path, body):
        return False

    def failing_get(path):
        raise boom

    pub = ConditionalPutPublisher(conflict_put, get=failing_get)
    with pytest.raises(OSError, match="get timed out"):
        pub.publish(str(tmp_path / "x.json"), b"mine")
    assert pub.last_error is boom

    # a clean conflict whose get resolves 'absent' is still a safe loss
    pub2 = ConditionalPutPublisher(conflict_put,
                                   get=LocalConditionalPutPublisher._read)
    assert pub2.publish(str(tmp_path / "gone.json"), b"mine") is False

    # ... and one whose get returns OUR body is a win (lost-reply shape)
    pub3 = ConditionalPutPublisher(conflict_put, get=lambda p: b"mine")
    assert pub3.publish(str(tmp_path / "won.json"), b"mine") is True


def test_commit_bodies_are_globally_unique(tmp_path):
    """Two logically identical commits (same properties, ms-identical
    timestamps possible) must still produce distinct bodies: the
    writerNonce makes every publisher's content-equality check a
    reliable OWNERSHIP test, so byte-identical racers can never both be
    told they won one version."""
    import json as _json

    log = CommitLog(str(tmp_path))
    log.commit(properties={"k": "v"}, data_change=False)
    log.commit(properties={"k": "v"}, data_change=False)
    bodies = []
    for v in (0, 1):
        with open(os.path.join(log.log_dir, f"{v:012d}.json")) as fh:
            bodies.append(fh.read())
    assert bodies[0] != bodies[1]
    nonces = [_json.loads(b)["writerNonce"] for b in bodies]
    assert nonces[0] != nonces[1]
    assert all(len(n) == 32 for n in nonces)


# -- HTTP object-store contract twin (r9, VERDICT r8 next #5) -------------
#
# condsim proves the protocol given an abstract conditional-put; this
# stub pins the HEADER-LEVEL contract the docstrings promise — a real
# S3 `If-None-Match: *` PUT answering 412 on conflict / 200 on create,
# the GCS `x-goog-if-generation-match: 0` equivalent, GET for the
# own-detection content check — and drives the REAL commit path over
# HTTP, including the lost-reply and unresolved-outcome branches.


class _HttpObjectStore:
    """In-process HTTP server speaking the conditional-PUT subset of the
    S3/GCS APIs over an in-memory dict. ``fail_mode`` injects faults:
    'lost_reply' stores the body but answers 500 (timeout after the
    write landed); 'get_500' makes GET fail (outcome unresolvable)."""

    def __init__(self):
        import http.server
        import threading as _th

        store = self.objects = {}
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):        # quiet
                pass

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                cond = (self.headers.get("If-None-Match") == "*"
                        or self.headers.get(
                            "x-goog-if-generation-match") == "0")
                if not cond:
                    self.send_response(400)   # unconditional PUT refused
                    self.end_headers()
                    return
                if self.path in store:
                    self.send_response(412)   # S3 PreconditionFailed
                    self.end_headers()
                    return
                store[self.path] = body
                if outer.fail_mode == "lost_reply":
                    outer.fail_mode = None    # one-shot
                    self.send_response(500)   # reply lost AFTER landing
                    self.end_headers()
                    return
                self.send_response(200)
                self.end_headers()

            def do_GET(self):
                if outer.fail_mode == "get_500":
                    self.send_response(500)
                    self.end_headers()
                    return
                if self.path not in store:
                    self.send_response(404)
                    self.end_headers()
                    return
                body = store[self.path]
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.fail_mode = None
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        _th.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self):
        self.httpd.shutdown()

    # -- publisher callables (what a real S3/GCS adapter would be) -----
    def _url(self, path: str) -> str:
        from urllib.parse import quote

        return f"http://127.0.0.1:{self.port}/{quote(path, safe='')}"

    def put(self, path: str, body: bytes, header="If-None-Match") -> bool:
        import urllib.error
        import urllib.request

        hdr = {"If-None-Match": "*"} if header == "If-None-Match" \
            else {"x-goog-if-generation-match": "0"}
        req = urllib.request.Request(self._url(path), data=body,
                                     method="PUT", headers=hdr)
        try:
            with urllib.request.urlopen(req):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 412:
                return False              # clean conflict
            raise OSError(f"PUT {e.code}")   # outcome unknown
        except urllib.error.URLError as e:
            raise OSError(str(e))

    def get(self, path: str) -> bytes:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(self._url(path)) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(path)
            raise OSError(f"GET {e.code}")
        except urllib.error.URLError as e:
            raise OSError(str(e))

    # a local-mirroring factory: the HTTP store arbitrates the race,
    # the winner mirrors the body to the local path CommitLog lists.
    # Mirroring happens on ANY won outcome — including a win resolved
    # through the get() own-detection path (lost reply), where the raw
    # put callable raised and could not mirror itself.
    def factory(self):
        outer = self

        class _P(ConditionalPutPublisher):
            def __init__(self, _log_dir):
                super().__init__(lambda p, b: outer.put(p, b),
                                 lambda p: outer.get(p))

            def publish(self, target, body):
                won = super().publish(target, body)
                if won:
                    tmp = target + ".httpmirror"
                    with open(tmp, "wb") as fh:
                        fh.write(body)
                    os.replace(tmp, target)
                return won

        return _P


@pytest.fixture()
def http_store():
    s = _HttpObjectStore()
    yield s
    s.close()


def test_http_condput_header_contract(http_store):
    """First conditional PUT creates (200), the second answers 412, GET
    returns the stored body byte-exact — for BOTH the S3 and the GCS
    header spellings. An unconditional PUT is refused outright."""
    s = http_store
    assert s.put("k1", b"v1") is True
    assert s.put("k1", b"other") is False          # If-None-Match: *
    assert s.get("k1") == b"v1"
    assert s.put("k2", b"v2", header="gcs") is True
    assert s.put("k2", b"x", header="gcs") is False
    with pytest.raises(FileNotFoundError):
        s.get("absent")


def test_http_condput_commit_log_e2e(tmp_path, http_store):
    """The real commit path over the HTTP contract: sequential commits
    land, an in-process race loses no commit and produces no duplicate
    versions, and the log replays cleanly."""
    log = CommitLog(str(tmp_path), publisher_factory=http_store.factory())
    v0 = log.commit(add=[_f("a.parquet")], operation="WRITE")
    v1 = log.commit(add=[_f("b.parquet")], operation="WRITE")
    assert (v0, v1) == (0, 1)
    errs, versions = [], []

    def race(i):
        try:
            lg = CommitLog(str(tmp_path),
                           publisher_factory=http_store.factory())
            versions.append(lg.commit(add=[_f(f"r{i}.parquet")]))
        except Exception as e:           # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=race, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs and sorted(versions) == [2, 3, 4, 5, 6, 7]
    snap = CommitLog(str(tmp_path)).snapshot()
    assert len(snap.files) == 8
    # the HTTP store holds exactly one object per version, none torn
    assert len(http_store.objects) == 8


def test_http_condput_lost_reply_own_detection(tmp_path, http_store):
    """Timeout AFTER the PUT landed server-side (500 reply, object
    stored): the publisher must resolve the unknown outcome via GET
    content equality and claim the version — no duplicate commit at
    N+1, no raise."""
    log = CommitLog(str(tmp_path), publisher_factory=http_store.factory())
    log.commit(add=[_f("a.parquet")])
    http_store.fail_mode = "lost_reply"
    v = log.commit(add=[_f("b.parquet")])
    assert v == 1
    assert CommitLog(str(tmp_path)).snapshot().version == 1
    assert len(http_store.objects) == 2


def test_http_condput_unresolved_outcome_raises(tmp_path, http_store):
    """PUT outcome unknown AND the disambiguating GET also fails: the
    publisher must raise (never guess) — a guessed 'lost' could publish
    a duplicate version."""
    log = CommitLog(str(tmp_path), publisher_factory=http_store.factory())
    log.commit(add=[_f("a.parquet")])
    http_store.fail_mode = "lost_reply"
    orig_get = http_store.get

    def bad_get(path):
        raise OSError("GET 500")

    http_store.get = bad_get
    try:
        with pytest.raises((OSError, RuntimeError)):
            log.commit(add=[_f("b.parquet")], max_retries=1)
    finally:
        http_store.get = orig_get


def test_http_condput_retried_put_clean_conflict_is_own(tmp_path,
                                                        http_store):
    """The store-level retry shape: our body already landed (a previous
    attempt), the next PUT reports a CLEAN 412 — content equality must
    still decide 'won', not re-publish at N+1."""
    import uuid as _u

    target = str(tmp_path / "000000000000.json")
    body = json.dumps({"writerNonce": _u.uuid4().hex}).encode()
    http_store.put(target, body)         # previous attempt landed
    pub = ConditionalPutPublisher(
        lambda p, b: http_store.put(p, b), http_store.get)
    assert pub.publish(target, body) is True       # own object
    other = json.dumps({"writerNonce": _u.uuid4().hex}).encode()
    pub2 = ConditionalPutPublisher(
        lambda p, b: http_store.put(p, b), http_store.get)
    assert pub2.publish(target, other) is False    # a real conflict
