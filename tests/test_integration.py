"""Cross-feature editor-session scenario: vendor decode -> staged cache ->
rotation kernel -> curve edits -> 8/16-bit export -> serialize/reload.
Composes the round-2 subsystems end to end the way a GUI (e.g. chimper over
the reference crate) would drive them."""

import numpy as np

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.service import RenderService

import sys
sys.path.insert(0, "tests")
from test_raf import make_raf, _sensor  # noqa: E402


def test_editor_session_end_to_end(tmp_path):
    path = tmp_path / "shot.raf"
    path.write_bytes(make_raf(_sensor(120, 144, seed=42)))

    svc = RenderService(cache_bytes=512 << 20)
    svc.open_file("img", str(path))

    # First render (cold) and an identical re-render (cached suffix).
    first = svc.render("img", max_size=96)
    again = svc.render("img", max_size=96)
    np.testing.assert_array_equal(first.data, again.data)

    # Rotate (the Pallas rotation kernel path) + a tone-curve edit.
    rotated = svc.edit("img", {"rotatecrop": {"rotation": 0.18,
                                              "crop_left": 0.05}}, max_size=96)
    assert (rotated.width, rotated.height) != (first.width, first.height) or \
        not np.array_equal(rotated.data, first.data)
    curved = svc.edit("img", {"basecurve": {"exposure": 0.4}}, max_size=96)
    assert not np.array_equal(curved.data, rotated.data)

    # Serialize the edited state, reload into a fresh pipeline, and the
    # render must reproduce the service's output exactly.
    serial = svc.sessions["img"].pipeline.to_serial()
    src = ImageSource.from_raw(svc.sessions["img"].pipeline.globals.image.raw)
    fresh = Pipeline.new_from_serial(src, serial)
    fresh.globals.settings.use_fastpath = False
    fresh.globals.settings.maxwidth = 96
    fresh.globals.settings.maxheight = 96
    replay = fresh.output_8bit(None)
    np.testing.assert_array_equal(replay.data, curved.data)

    # 16-bit export of the same edited state: same geometry, deterministic
    # across a serialize/reload cycle.
    fresh16 = Pipeline.new_from_serial(src, serial)
    fresh16.globals.settings.use_fastpath = False
    fresh16.globals.settings.maxwidth = 96
    fresh16.globals.settings.maxheight = 96
    out16 = fresh16.output_16bit(None)
    assert (out16.width, out16.height) == (replay.width, replay.height)
    again16 = Pipeline.new_from_serial(src, serial)
    again16.globals.settings.use_fastpath = False
    again16.globals.settings.maxwidth = 96
    again16.globals.settings.maxheight = 96
    np.testing.assert_array_equal(np.asarray(again16.output_16bit(None).data),
                                  np.asarray(out16.data))
