"""Pallas develop megakernel vs the XLA fused engine (interpret mode on CPU;
the driver's bench exercises the compiled TPU path)."""

import numpy as np
import pytest

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, develop_fused
from imagepipe_tpu.kernels.develop_pallas import develop_pallas, pallas_supported
from imagepipe_tpu.raw import synthetic_bayer, synthetic_xtrans


@pytest.mark.parametrize("make_raw,out_bits", [
    (synthetic_bayer, 8),
    (synthetic_bayer, 16),
    (synthetic_xtrans, 8),
])
def test_pallas_matches_fused(make_raw, out_bits):
    raw = make_raw(168, 112)
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    if out_bits == 16:
        p.globals.settings.linear = True
    plan = make_develop_plan(p, out_bits=out_bits, numerics="direct")
    assert pallas_supported(plan)
    want = np.asarray(develop_fused(plan, raw.data)).astype(int)
    got = np.asarray(develop_pallas(plan, raw.data, interpret=True)).astype(int)
    diff = np.abs(want - got)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02


def test_pallas_with_crops():
    raw = synthetic_bayer(140, 104)
    raw.crops = (2, 6, 4, 8)
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    want = np.asarray(develop_fused(plan, raw.data)).astype(int)
    got = np.asarray(develop_pallas(plan, raw.data, interpret=True)).astype(int)
    assert np.abs(want - got).max() <= 1


def test_pallas_unsupported_plans():
    raw = synthetic_bayer(96, 64)
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    p.globals.settings.maxwidth = 32  # resize -> scaled demosaic path
    plan = make_develop_plan(p, out_bits=8)
    assert not pallas_supported(plan)


def test_pallas_closed_form_bayer_interpret():
    """The closed-form Bayer path (compiled mode gated off pending a Mosaic
    fix) must match the fused engine in interpret mode."""
    from imagepipe_tpu.kernels import develop_pallas as dp

    raw = synthetic_bayer(168, 112)
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    want = np.asarray(develop_fused(plan, raw.data)).astype(int)
    old = dp.BAYER_CLOSED_FORM
    try:
        dp.BAYER_CLOSED_FORM = True
        dp._develop_pallas_jit.clear_cache()
        got = np.asarray(develop_pallas(plan, raw.data, interpret=True)).astype(int)
    finally:
        dp.BAYER_CLOSED_FORM = old
        dp._develop_pallas_jit.clear_cache()
    assert np.abs(want - got).max() <= 1
