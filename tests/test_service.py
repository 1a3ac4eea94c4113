"""Interactive render service: sessions, setting patches, cached re-renders,
settings round-trip (the chimper-style loop, SURVEY.md section 3.5)."""

import numpy as np
import pytest

from imagepipe_tpu import ImageSource
from imagepipe_tpu.service import RenderService
from imagepipe_tpu.raw import synthetic_bayer


def test_service_edit_loop(tmp_path):
    svc = RenderService(cache_bytes=500 << 20)
    raw = synthetic_bayer(160, 100, seed=3)
    s = svc.open_source("img1", ImageSource.from_raw(raw))

    base = svc.render("img1")
    assert (base.width, base.height) == (160, 100)

    brighter = svc.edit("img1", {"basecurve": {"exposure": 0.8}})
    assert brighter.data.mean() > base.data.mean() + 5

    # Restoring settings gives a full cache hit: identical bits.
    restored = svc.edit("img1", {"basecurve": {"exposure": 0.0}})
    np.testing.assert_array_equal(base.data, restored.data)

    # Preview render at reduced size.
    prev = svc.render("img1", max_size=64)
    assert (prev.width, prev.height) == (64, 40)

    # Crop patch flows through rotatecrop.
    cropped = svc.edit("img1", {"rotatecrop": {"crop_left": 0.25}}, max_size=0)
    assert cropped.width == 120

    # 16-bit render from the same session.
    out16 = svc.render("img1", bits=16)
    assert out16.data.dtype == np.uint16

    # Unknown op / setting rejected.
    with pytest.raises(KeyError):
        svc.edit("img1", {"nosuch": {"x": 1}})
    with pytest.raises(KeyError):
        svc.edit("img1", {"basecurve": {"nope": 1}})


def test_service_settings_roundtrip():
    svc = RenderService(cache_bytes=100 << 20)
    raw = synthetic_bayer(96, 64, seed=4)
    s = svc.open_source("a", ImageSource.from_raw(raw))
    s.apply({"basecurve": {"exposure": 0.4}})
    serial = s.save_settings()
    out_a = s.render()

    s2 = svc.open_source("b", ImageSource.from_raw(raw))
    s2.load_settings(serial)
    out_b = svc.sessions["b"].render()
    np.testing.assert_array_equal(out_a.data, out_b.data)


def test_service_two_sessions_share_cache():
    svc = RenderService(cache_bytes=500 << 20)
    raws = [synthetic_bayer(96, 64, seed=s) for s in (5, 6)]
    svc.open_source("x", ImageSource.from_raw(raws[0]))
    svc.open_source("y", ImageSource.from_raw(raws[1]))
    ox = svc.render("x")
    oy = svc.render("y")
    assert not np.array_equal(ox.data, oy.data)
    assert len(svc.cache) == 16  # 8 stages per image


def test_service_per_session_byte_accounting():
    """Owner-tagged cache accounting: per-session byte totals sum to the
    cache total and go to zero as a session's entries are evicted."""
    svc = RenderService(cache_bytes=500 << 20)
    raws = [synthetic_bayer(96, 64, seed=s) for s in (5, 6)]
    sx = svc.open_source("x", ImageSource.from_raw(raws[0]))
    sy = svc.open_source("y", ImageSource.from_raw(raws[1]))
    svc.render("x")
    assert sx.cache_bytes() > 0 and sy.cache_bytes() == 0
    svc.render("y")
    assert sy.cache_bytes() > 0
    assert sx.cache_bytes() + sy.cache_bytes() == svc.cache.total_bytes
    # Shrink the budget and force new puts: eviction must keep the per-owner
    # accounting consistent (sum of owners == total).
    before_x = sx.cache_bytes()
    svc.cache.max_bytes = sy.cache_bytes() // 2
    svc.edit("y", {"basecurve": {"exposure": 0.3}})  # dirty suffix -> puts
    assert sx.cache_bytes() + sy.cache_bytes() == svc.cache.total_bytes
    assert sx.cache_bytes() < before_x  # x's older stages were evicted


def test_service_concurrent_sessions_threads():
    """Concurrent edit/render across different sessions from threads must be
    safe (shared locked cache) and every result must match the same edits
    applied serially."""
    import threading

    svc = RenderService(cache_bytes=500 << 20)
    raws = {f"s{i}": synthetic_bayer(96, 64, seed=10 + i) for i in range(4)}
    for key, raw in raws.items():
        svc.open_source(key, ImageSource.from_raw(raw))

    results = {}
    errors = []

    def worker(key, expo):
        try:
            svc.render(key)
            out = svc.edit(key, {"basecurve": {"exposure": expo}})
            results[key] = out.data
        except Exception as e:  # pragma: no cover
            errors.append((key, e))

    threads = [threading.Thread(target=worker, args=(k, 0.1 * i))
               for i, k in enumerate(raws)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    for i, (key, raw) in enumerate(raws.items()):
        ssvc = RenderService(cache_bytes=100 << 20)
        ssvc.open_source("one", ImageSource.from_raw(raw))
        want = ssvc.edit("one", {"basecurve": {"exposure": 0.1 * i}})
        np.testing.assert_array_equal(results[key], want.data)
