"""bench.py orchestration machinery (the outage-proofing itself).

The measurement sections need the accelerator, but the orchestrator's
contract -- child-process isolation, hard timeouts, metric dedupe across
retries, host-only sections surviving without a backend -- is what the
round-3 outage broke, so it gets its own CPU tests."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

_CPU_ENV = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}


def test_decoders_section_child_and_dedupe():
    seen: set = set()
    ok, lines, tail = bench._run_section_child(
        "decoders", timeout_s=600, env_extra=_CPU_ENV, seen_metrics=seen)
    assert ok, tail
    metrics = [json.loads(l)["metric"] for l in lines]
    assert len(metrics) >= 6 and len(set(metrics)) == len(metrics)
    assert seen == set(metrics)
    # A retry re-measures but must not re-emit already-streamed metrics:
    # emitted lines are still collected, the seen set stays fixed.
    ok2, lines2, _ = bench._run_section_child(
        "decoders", timeout_s=600, env_extra=_CPU_ENV, seen_metrics=seen)
    assert ok2 and len(lines2) == len(lines)
    assert seen == set(metrics)


def test_hung_child_is_killed_not_wedged():
    # A slow/hung child must be killed at the hard timeout (the r3
    # failure mode was an indefinite in-process hang): the headline
    # section cannot finish in 3s even on a healthy machine.
    import time

    t0 = time.time()
    ok, lines, tail = bench._run_section_child(
        "headline", timeout_s=3, env_extra=_CPU_ENV)
    assert time.time() - t0 < 60
    assert not ok
    assert "timeout" in tail or tail


def test_orchestrate_backend_down_runs_host_sections(tmp_path):
    # A bogus platform makes the backend probe fail deterministically
    # fast (we must not depend on the real tunnel's state).
    env = dict(os.environ, BENCH_BACKEND_WAIT_S="3",
               BENCH_TOTAL_BUDGET_S="900",
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="bogus_platform")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=900, env=env)
    # No headline without a backend -> rc 1, but the host-only decoder
    # lines must still be present (incremental output survives outages).
    assert r.returncode == 1
    metrics = [json.loads(l)["metric"] for l in r.stdout.splitlines()
               if l.startswith("{")]
    assert any("decode" in m for m in metrics), r.stdout[-500:]
    assert not any("Megapixels" in m for m in metrics)
