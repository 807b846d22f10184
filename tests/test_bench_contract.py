"""Contract tests over the bench harness artifact (r11, VERDICT r10
"What's wrong #1"): the isolation protocol adjudicates contaminated
captures min-to-min, so every entry in BENCH_LAST.json must satisfy
min <= median. The r10 capture violated it on qb_range_read because the
overridden headline median came from per-lane sums while the min still
held the stale full-probe samples; bench.py now derives both from the
same per-lane samples and stamps ``minrule: per-lane``.

Also pins the --wait-for-idle evidence shape (VERDICT r10 Next #5) and
keeps the wait loop honest without running a capture.
"""

import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_LAST = os.path.join(HERE, "BENCH_LAST.json")


def _load_capture():
    if not os.path.exists(BENCH_LAST):
        pytest.skip("no BENCH_LAST.json capture present")
    with open(BENCH_LAST) as fh:
        return json.loads(fh.read())


def test_min_le_median_every_entry():
    cap = _load_capture()
    if cap.get("minrule") != "per-lane":
        pytest.skip("capture predates the per-lane minrule fix")
    queries = cap["queries"]
    mins = cap["queries_min"]
    bad = {}
    for k, med in queries.items():
        mn = mins.get(k)
        assert mn is not None, f"no queries_min for {k}"
        # rounding happens independently at 3 decimals on each side
        if mn > med + 1e-3:
            bad[k] = (mn, med)
    assert not bad, f"min > median (adjudication rule broken): {bad}"


def test_overridden_headlines_have_min():
    """The entries whose median is overridden from per-lane samples
    must emit a min from those SAME lanes (not a setdefault copy of
    some other sample set)."""
    cap = _load_capture()
    if cap.get("minrule") != "per-lane":
        pytest.skip("capture predates the per-lane minrule fix")
    for k in ("qb_range_read", "qb_range_read_pyds", "qb_matview"):
        assert k in cap["queries_min"], k


def test_wait_for_idle_unit(monkeypatch):
    """_wait_for_idle returns immediately on an idle box and exhausts
    its budget (reporting so) on a persistently busy one — without
    sleeping the real budget."""
    import bench

    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))

    monkeypatch.setattr(bench, "_machine_sample",
                        lambda: {"load": [0.0, 0.0, 0.0]})
    info = bench._wait_for_idle()
    assert info["waited_sec"] == 0.0 and not info["wait_exhausted"]
    assert not slept

    monkeypatch.setattr(bench, "_machine_sample",
                        lambda: {"load": [99.0, 99.0, 99.0]})
    monkeypatch.setattr(bench, "_WAIT_FOR_IDLE_SEC", 25.0)
    info = bench._wait_for_idle()
    assert info["wait_exhausted"] and info["waited_sec"] >= 25.0
    assert info["polls"] >= 3
