"""Randomized settings sweep: staged pipeline vs fused engine must agree
within the fusion contract (<=1 LSB, few flips) across random crops,
exposure, white balance, curves, and orientations."""

import numpy as np

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, develop_fused, planar_to_hwc
from imagepipe_tpu.raw import Orientation, synthetic_bayer, synthetic_xtrans


def test_fuzz_staged_vs_fused():
    rng = np.random.default_rng(123)
    orientations = list(Orientation)
    for trial in range(8):
        make = synthetic_bayer if trial % 2 == 0 else synthetic_xtrans
        raw = make(24 * rng.integers(4, 8), 24 * rng.integers(3, 6), seed=trial)
        raw.orientation = orientations[rng.integers(0, len(orientations))]
        raw.crops = tuple(int(v) for v in rng.integers(0, 6, 4))
        p = Pipeline.new_from_source(ImageSource.from_raw(raw))
        p.ops.basecurve.exposure = float(rng.uniform(-1.0, 1.0))
        if rng.random() < 0.5:
            p.ops.basecurve.points = [(0.25, float(rng.uniform(0.2, 0.4))),
                                      (0.75, float(rng.uniform(0.6, 0.9)))]
        p.ops.tolab.wb_coeffs = [float(rng.uniform(1.2, 2.5)), 1.0,
                                 float(rng.uniform(1.1, 2.0)), float("nan")]
        p.globals.settings.use_fastpath = False
        staged = p.output_8bit(None)
        plan = make_develop_plan(p, out_bits=8)
        fused = planar_to_hwc(develop_fused(plan, raw.data))
        diff = np.abs(staged.data.astype(int) - fused.astype(int))
        assert diff.max() <= 1, f"trial {trial}: max {diff.max()}"
        assert (diff != 0).mean() < 0.02, f"trial {trial}"
