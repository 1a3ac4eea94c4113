"""Cross-implementation golden check: the JAX pipeline vs the independent
scalar C++ implementation (native/golden_develop.cc) on the same RAW, <=1 LSB
at 8-bit output -- the numeric contract SURVEY.md section 4 defines (the Rust
reference itself cannot be built in this image; the C++ golden mirrors its
algorithms with no code shared with the JAX side)."""

import os
import struct
import subprocess

import numpy as np
import pytest

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.ops.colorspaces import normalize_wbs
from imagepipe_tpu.raw import synthetic_bayer, synthetic_xtrans
from imagepipe_tpu.spline import SplineFunc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "native", "build", "golden_develop")


def _run_golden(tmp_path, raw):
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))

    # Pack the exact parameters the pipeline will use.
    mul = normalize_wbs(p.ops.tolab.wb_coeffs)
    cmatrix = np.asarray(p.ops.tolab.cam_to_xyz_normalized, np.float32)
    spline = SplineFunc([(x, y * (2.0 ** p.ops.basecurve.exposure))
                         for (x, y) in p.ops.basecurve.points])
    n = len(spline.xs)

    def pad16(a):
        out = np.zeros(16, np.float32)
        out[:len(a)] = a
        return out

    blob = b"IPGD"
    blob += struct.pack("<II", raw.width, raw.height)
    blob += struct.pack("<II", raw.cfa.height, raw.cfa.width)
    blob += raw.cfa.name.encode()
    blob += struct.pack("<ff", float(raw.blacklevels[0]),
                        float(raw.whitelevels[0] - raw.blacklevels[0]))
    blob += struct.pack("<4f", *[float(v) for v in mul])
    blob += np.asarray(cmatrix, "<f4").tobytes()
    blob += struct.pack("<I", n)
    for arr in (spline.xs, spline.ys, spline.c1s, spline.c2s, spline.c3s):
        blob += pad16(arr).astype("<f4").tobytes()
    blob += np.asarray(raw.data, "<u2").tobytes()

    inp = tmp_path / "in.bin"
    outp = tmp_path / "out.bin"
    inp.write_bytes(blob)
    subprocess.run([GOLDEN, str(inp), str(outp)], check=True, timeout=120)
    golden = np.frombuffer(outp.read_bytes(), np.uint8).reshape(
        raw.height, raw.width, 3).astype(int)

    ours = p.output_8bit(None).data.astype(int)
    diff = np.abs(ours - golden)
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # The vast majority must agree exactly (independent libm/XLA rounding
    # only flips values at quantization edges).
    assert (diff != 0).mean() < 0.01


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="native golden not built")
def test_pipeline_matches_independent_native_golden(tmp_path):
    _run_golden(tmp_path, synthetic_bayer(320, 200, seed=13))


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="native golden not built")
def test_pipeline_matches_golden_xtrans(tmp_path):
    _run_golden(tmp_path, synthetic_xtrans(312, 204, seed=14))
