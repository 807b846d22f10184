"""Hypothesis property test for the commit-log replay: random commit
sequences (adds/removes, property sets and null-deletes, resetStats,
txns) must replay to exactly the state a trivial driver-side model
reaches — including snapshots taken at every intermediate version (time
travel) and across checkpoint boundaries. No Spark needed: the log is
pure Python."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from qbeast_spark_spark.sources.log import Block, CommitLog, IndexFile

FILE_NAMES = [f"f{i}.parquet" for i in range(6)]
PROP_KEYS = ["qbeast.constraint.a", "qbeast.constraint.b", "k1", "k2"]


def _mk_file(name: str) -> IndexFile:
    return IndexFile(name, 10, 5, 1, [Block("0:0", -100, 100, 5)])


commit_strategy = st.fixed_dictionaries({
    "add": st.lists(st.sampled_from(FILE_NAMES), max_size=3, unique=True),
    "remove": st.lists(st.sampled_from(FILE_NAMES), max_size=2,
                       unique=True),
    "props": st.dictionaries(
        st.sampled_from(PROP_KEYS),
        st.one_of(st.none(), st.sampled_from(["x", "y", ""])),
        max_size=2),
    "reset": st.booleans(),
    "txn": st.one_of(st.none(), st.integers(min_value=0, max_value=5)),
})


@settings(max_examples=40, deadline=None)
@given(st.lists(commit_strategy, min_size=1, max_size=14))
def test_replay_matches_model(tmp_path_factory, commits):
    root = str(tmp_path_factory.mktemp("log"))
    log = CommitLog(os.path.join(root, "t"))

    model_files: set = set()
    model_props: dict = {}
    model_txn = -1
    history = []
    for c in commits:
        # the model applies the same semantics the replay documents:
        # remove-then-add, property null deletes, resetStats clears
        # revision state (not files/properties), txns take the max
        if c["txn"] is not None and c["txn"] <= model_txn:
            # the log's idempotent-skip refuses replayed txn versions
            # BEFORE writing anything: no new version, no state change
            log.commit(add=[_mk_file(n) for n in c["add"]],
                       remove=list(c["remove"]),
                       reset_stats=c["reset"],
                       properties={k: v for k, v in c["props"].items()},
                       txn={"appId": "app", "version": c["txn"]})
            continue
        for r in c["remove"]:
            model_files.discard(r)
        for a in c["add"]:
            model_files.add(a)
        for k, v in c["props"].items():
            if v is None:
                model_props.pop(k, None)
            else:
                model_props[k] = v
        if c["txn"] is not None:
            model_txn = max(model_txn, c["txn"])
        log.commit(add=[_mk_file(n) for n in c["add"]],
                   remove=list(c["remove"]),
                   reset_stats=c["reset"],
                   properties={k: v for k, v in c["props"].items()},
                   txn=({"appId": "app", "version": c["txn"]}
                        if c["txn"] is not None else None))
        history.append((model_files.copy(), model_props.copy()))

    snap = log.snapshot()
    assert set(snap.files) == model_files
    assert {k: v for k, v in snap.properties.items()} == model_props
    if model_txn >= 0:
        assert snap.txns.get("app") == model_txn
    # time travel: every recorded version replays to its model state
    versions = log._versions()
    for v, (files, props) in zip(versions, history):
        old = log.snapshot(at_version=v)
        assert set(old.files) == files, f"version {v}"
        assert dict(old.properties) == props, f"version {v}"
