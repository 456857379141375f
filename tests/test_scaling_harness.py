"""The scaling-evidence harness (tools/scaling_bench.py) decides which
N-vs-4N pairs enter the pre-registered series from its own in-flight host
probes — that admission logic must be pinned, or a silent change would turn
the north rule's >=0.8 criterion into an unauditable number.

No Spark here: the monitor thread and threshold rule are pure Python.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sb():
    spec = importlib.util.spec_from_file_location(
        "scaling_bench", os.path.join(REPO, "tools", "scaling_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_monitor_samples_while_child_runs(sb):
    # 6s child: the cadence is ~(probe + membw + 2s) ≈ 3s under host noise,
    # so a 4s child made the second sample a coin-flip (observed flaky)
    out, stats = sb._run_monitored("import time; time.sleep(6); print('{}')")
    assert out.strip().endswith("{}")
    assert stats["n"] >= 2
    assert 0.3 < stats["median"] < 10.0
    assert stats["p90"] >= stats["median"]
    assert stats["max"] >= stats["p90"]


def test_monitor_records_membw_samples_without_gating(sb, monkeypatch):
    """The r6 memory-bandwidth probe rides along in the stats (the busy-loop
    probe is blind to bandwidth contention) but must NEVER affect the
    pre-registered clean flag — admission rules can't change mid-series."""
    out, stats = sb._run_monitored("import time; time.sleep(3); print('{}')")
    assert stats["membw_median"] > 0
    assert stats["membw_p90"] >= stats["membw_median"]

    # pathological bandwidth reading, quiet CPU probe -> still clean
    monkeypatch.setattr(sb, "_cpu_probe", lambda: 0.8)
    monkeypatch.setattr(sb, "_membw_probe", lambda: 9.9)
    _, stats = sb._run_monitored("import time; time.sleep(3)")
    assert stats["clean"] is True
    assert stats["membw_median"] == 9.9


def test_monitor_thresholds_are_the_registered_ones(sb):
    # pre-registered r6b admission rule — changing these invalidates the
    # recorded series; bump the series name if you ever must
    assert sb.CLEAN_MEDIAN == 0.95
    assert sb.CLEAN_P90 == 1.15


def test_clean_flag_follows_thresholds(sb, monkeypatch):
    ticks = iter([0.8, 0.8, 0.8])

    def fake_probe():
        try:
            return next(ticks)
        except StopIteration:
            return 0.8

    monkeypatch.setattr(sb, "_cpu_probe", fake_probe)
    _, stats = sb._run_monitored("import time; time.sleep(3)")
    assert stats["clean"] is True

    ticks = iter([1.3, 1.3, 1.3])
    _, stats = sb._run_monitored("import time; time.sleep(3)")
    assert stats["clean"] is False


def test_recorded_pairs_carry_probe_evidence():
    """Every r6b-era pair in the session log must carry per-leg in-flight
    stats, so exclusion is auditable from the artifact alone."""
    path = os.path.join(REPO, "BENCH", "scaling_pairs.jsonl")
    pairs = [json.loads(ln) for ln in open(path) if ln.strip()]
    modern = [p for p in pairs if "inflight_lo" in p]
    assert modern, "no in-flight-monitored pairs recorded yet"
    for p in modern:
        for leg in ("inflight_lo", "inflight_hi"):
            assert {"n", "median", "p90", "clean"} <= set(p[leg])
        assert p["clean"] == (p["inflight_lo"]["clean"] and p["inflight_hi"]["clean"])
