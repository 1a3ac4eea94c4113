"""Multi-host input feed (imagepipe_tpu/parallel/multihost.py).

Runs single-process on the virtual 8-device CPU mesh: the degenerate
process_count=1 case must match the plain BatchEngine bit-for-bit, the
partition/schedule logic is unit-tested for N processes, and the
constraint checks (uniform statics, host-major mesh) fail loud. Real
multi-process execution uses the identical code paths with
jax.make_array_from_process_local_data / process_allgather."""

import numpy as np
import pytest

from imagepipe_tpu.decode import save_synraw
from imagepipe_tpu.parallel import BatchEngine, BatchError
from imagepipe_tpu.parallel.multihost import (MultiHostBatchEngine,
                                              global_batch_mesh,
                                              partition_files)
from imagepipe_tpu.raw import synthetic_bayer


def _files(tmp_path, n, w=96, h=64, seed0=0):
    paths = []
    for s in range(n):
        raw = synthetic_bayer(w, h, seed=seed0 + s)
        p = str(tmp_path / f"mh{w}x{h}_{s}.synraw.npz")
        save_synraw(p, raw)
        paths.append(p)
    return paths


def test_partition_files_deterministic_cover():
    paths = [f"f{i}" for i in range(11)]
    got = [partition_files(paths, pi, 4) for pi in range(4)]
    # Disjoint, covering, round-robin.
    flat = sorted(p for part in got for p in part)
    assert flat == sorted(paths)
    assert got[0] == ["f0", "f4", "f8"]
    assert got[3] == ["f3", "f7"]
    with pytest.raises(ValueError, match="process index"):
        partition_files(paths, 4, 4)


def test_matches_batch_engine_single_process(tmp_path):
    paths = _files(tmp_path, 5, seed0=30)
    ref = BatchEngine(max_batch=8).develop_files(paths)
    mh = MultiHostBatchEngine().develop_files(paths)
    # Single process: the partition is the whole list, order preserved.
    assert len(mh) == 5
    for a, b in zip(ref, mh):
        np.testing.assert_array_equal(a, b)


def test_multiple_steps_and_padding(tmp_path):
    # 11 files over 8 local rows -> 2 global steps, the second padded.
    paths = _files(tmp_path, 11, w=48, h=32, seed0=50)
    mh = MultiHostBatchEngine().develop_files(paths)
    ref = BatchEngine(max_batch=8).develop_files(paths)
    for a, b in zip(ref, mh):
        np.testing.assert_array_equal(a, b)


def test_errors_skip_keeps_schedule(tmp_path):
    paths = _files(tmp_path, 4, seed0=70)
    bad = tmp_path / "corrupt.synraw.npz"
    bad.write_bytes(b"not an npz")
    paths.insert(2, str(bad))
    mh = MultiHostBatchEngine().develop_files(paths, errors="skip")
    assert isinstance(mh[2], BatchError)
    assert sum(1 for r in mh if not isinstance(r, BatchError)) == 4
    with pytest.raises(Exception):
        MultiHostBatchEngine().develop_files(paths, errors="raise")


def test_mixed_statics_bucket_scheduled(tmp_path):
    """One call over a mixed-camera directory: files group into
    statics buckets iterated in agreed order; results match the plain
    BatchEngine per file (which buckets internally too)."""
    paths = _files(tmp_path, 3, w=96, h=64, seed0=80)
    paths += _files(tmp_path, 2, w=48, h=32, seed0=90)
    paths += _files(tmp_path, 2, w=96, h=64, seed0=95)
    # Interleave shapes so buckets are not contiguous in the list.
    order = [0, 3, 1, 4, 5, 2, 6]
    paths = [paths[i] for i in order]
    mh = MultiHostBatchEngine().develop_files(paths)
    ref = BatchEngine(max_batch=8).develop_files(paths)
    assert len(mh) == len(ref) == 7
    for a, b in zip(ref, mh):
        np.testing.assert_array_equal(a, b)


def test_mixed_statics_with_errors(tmp_path):
    paths = _files(tmp_path, 2, w=96, h=64, seed0=180)
    paths += _files(tmp_path, 2, w=48, h=32, seed0=190)
    bad = tmp_path / "bad.synraw.npz"
    bad.write_bytes(b"nope")
    paths.insert(1, str(bad))
    mh = MultiHostBatchEngine().develop_files(paths, errors="skip")
    assert isinstance(mh[1], BatchError)
    ref = BatchEngine(max_batch=8).develop_files(paths, errors="skip")
    for a, b in zip(ref, mh):
        if isinstance(a, BatchError):
            assert isinstance(b, BatchError)
        else:
            np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not __import__("os").environ.get(
    "IMAGEPIPE_MULTIHOST_2PROC"),
    reason="opt-in: spawns a real 2-process jax.distributed fleet "
           "(~2 min); set IMAGEPIPE_MULTIHOST_2PROC=1")
def test_real_two_process_fleet():
    """The non-degenerate validation: two OS processes form a
    jax.distributed fleet (Gloo on localhost, 4 CPU devices each) and
    the feed's make_array_from_process_local_data / process_allgather /
    addressable-shard paths must produce BatchEngine's outputs exactly.
    This is the harness that caught the int64-truncating allgather."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/exp_multihost_2proc.py"],
        capture_output=True, text=True, timeout=1200,
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__file__)))
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-500:]
    assert "TWO-PROCESS MULTIHOST OK" in r.stdout


def test_global_mesh_is_host_major():
    mesh = global_batch_mesh()
    devs = list(mesh.devices.reshape(-1))
    assert [d.process_index for d in devs] == \
        sorted(d.process_index for d in devs)
    eng = MultiHostBatchEngine(mesh)
    assert eng.total_dp == len(devs)
    assert eng.local_dp >= 1
