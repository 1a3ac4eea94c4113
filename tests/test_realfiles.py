"""Opt-in real-file cross-validation harness (r2 verdict missing #2).

Every vendor-decoder test in this repo reads containers synthesized by
tests/tiffgen.py -- a closed loop that cannot catch a misunderstood
maker-note layout. This harness breaks the loop with real camera files and
an independent decoder's output:

1. On any machine with rawpy (LibRaw) and real RAWs, run
       python scripts/make_sidecar.py shot.NEF
   producing shot.NEF.sidecar.npz with the independently-decoded sensor
   plane and metadata.
2. Point IMAGEPIPE_REALFILE_DIR at a directory holding the RAW +
   sidecar pairs and run pytest: each pair asserts bit-exact sensor-plane
   agreement and WB/levels/CFA/orientation agreement against this repo's
   decoders.

Without the env var the tests skip (no real files ship in this repo).
"""

import glob
import os

import numpy as np
import pytest

_DIR = os.environ.get("IMAGEPIPE_REALFILE_DIR", "")
_RAW_EXTS = (".dng", ".nef", ".nrw", ".cr2", ".arw", ".sr2", ".raf",
             ".orf", ".pef", ".rw2", ".mrw", ".erf", ".rwl", ".srw",
             ".mef", ".mos", ".kdc", ".dcr", ".3fr", ".pgm")


def _pairs():
    if not _DIR:
        return []
    out = []
    for sidecar in sorted(glob.glob(os.path.join(_DIR, "*.sidecar.npz"))):
        rawpath = sidecar[: -len(".sidecar.npz")]
        if os.path.exists(rawpath):
            out.append((rawpath, sidecar))
    return out


pytestmark = pytest.mark.skipif(
    not _DIR, reason="IMAGEPIPE_REALFILE_DIR not set (opt-in harness)")


# Codec families with implemented decoders: the coverage summary reports
# which of these a real-file run actually exercised, so the first run on
# real camera bytes is a one-command audit (see docs/MIGRATION.md).
_FAMILIES = [
    "dng-lj92", "dng-deflate", "dng-uncompressed",
    "dng-lj92-linear", "dng-deflate-linear", "dng-uncompressed-linear",
    "nef-34713-lossless", "nef-34713-lossy", "nef-34713-lossy2",
    "cr2-lj92", "arw",
    "raf-fujic", "raf-tiff-16bit", "raf-classic-xtrans",
    "raf-classic-bayer", "raf-superccd",
    "orf-compressed", "orf-12bit-packed", "orf-16bit",
    "pef-compressed",
    "rw2-classic", "rw2-v5", "rw2-v6", "rw2-v6-12bit", "rw2-v7",
    "rw2-uncompressed",
    "mrw", "pgm",
    "iiq-fmt3", "iiq-fmt5", "iiq-fmt8", "iiq-uncompressed",
    "srf", "3fr-compressed",
    "cr2-sraw", "srw-32772", "mef-lj92", "mos-lj92", "x3f-huffman",
    "dcr-65000", "kdc-65000", "arw-v1",
]
# Families whose synthetic tests leave a named open question that ONLY
# real bytes can settle.
_CONFIRMS = {
    "raf-fujic": "confirms the X-Trans B2 interpolation mask (fujic.py)",
    "rw2-v5": "confirms the recalled v5 packet layout (rw2.py)",
    "rw2-v6": "confirms the recalled v6 page layout (rw2.py)",
    "rw2-v6-12bit": "confirms the recalled 12-bit v6 page layout (rw2.py)",
    "rw2-v7": "confirms the recalled pana8 block layout (rw2.py)",
    "nef-34713-lossy2": "confirms the type-2 quartered curve (nikon.py)",
    "raf-superccd": "confirms the lattice CFA derivation (raf.py)",
    "iiq-fmt3": "confirms the recalled IIQ header/bitstream layout (iiq.py)",
    "iiq-fmt5": "confirms the format-5 companding curve (iiq.py)",
    "iiq-uncompressed": "confirms the XOR-key swizzle masks (iiq.py)",
    "srf": "confirms the key-block offsets + F828 geometry (sony_srf.py)",
    "orf-compressed": "confirms the ImageProcessing calibration tags "
                      "(ColorMatrix /256, BlackLevel2, ValidBits, crop; "
                      "vendor.py _olympus_calibration)",
    "3fr-compressed": "confirms the paired-column predictor + psv-11 "
                      "row-2 correction (hasselblad.py)",
    "cr2-sraw": "confirms the sRAW YCbCr reconstruction constants "
                "(vendor.py _SRAW_RGB)",
    "srw-32772": "confirms the recalled block/length-op framing "
                 "(samsung.py)",
    "x3f-huffman": "confirms the table order + no-row-realignment "
                   "recall, and rules the SD9/SD10 conditional u32 "
                   "skip in or out (x3f.py provenance notes)",
    "dcr-65000": "confirms the run framing + word-order recall "
                 "(kodak.py provenance notes)",
    "arw-v1": "confirms the global-sum parity-striped traversal "
              "(arw1.py; the code table itself is Kraft-verified)",
}
_seen: dict = {}


@pytest.mark.parametrize("rawpath,sidecar", _pairs() or [("", "")])
def test_real_file_matches_sidecar(rawpath, sidecar):
    if not rawpath:
        pytest.skip("no RAW+sidecar pairs found in IMAGEPIPE_REALFILE_DIR")
    from imagepipe_tpu.decode import codec_family, decode_file

    _seen.setdefault(codec_family(rawpath), []).append(
        os.path.basename(rawpath))

    side = np.load(sidecar, allow_pickle=False)
    raw = decode_file(rawpath).raw

    # Sensor plane: bit-exact. LibRaw's raw_image covers the full sensor
    # including masked borders; compare the overlap anchored at the
    # top-left active pixel if shapes differ by the reported margins.
    want = side["raw_image"]
    got = np.asarray(raw.data)
    if got.shape != want.shape:
        ty, tx = int(side.get("top_margin", 0)), int(side.get("left_margin", 0))
        want = want[ty:ty + got.shape[0], tx:tx + got.shape[1]]
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)

    # Metadata agreement.
    if "black" in side:
        assert abs(raw.blacklevels[0] - int(side["black"])) <= 1
    if "white" in side:
        assert abs(raw.whitelevels[0] - int(side["white"])) <= 1
    if "cam_mul" in side:
        cm = np.asarray(side["cam_mul"], np.float64)
        got_wb = np.asarray(raw.wb_coeffs[:3], np.float64)
        if np.isnan(got_wb).any():
            # Some readers intentionally leave WB neutral (the generic
            # TIFF-EP fallback, PEF bodies without the classic maker-note
            # blocks): the sensor-plane equality above is the real check
            # there, so don't fail the file over the documented fallback.
            pass
        elif cm[1] > 0:
            want_wb = (cm[0] / cm[1], 1.0, cm[2] / cm[1])
            got_wb = got_wb / got_wb[1]
            np.testing.assert_allclose(got_wb, want_wb, rtol=1e-3)
    if "cfa_letters" in side:
        assert raw.cfa.name == str(side["cfa_letters"])
    if "flip" in side:
        # LibRaw flip: 0 none, 3 = 180, 5 = 270 CCW, 6 = 90 CW.
        flips = {0: (False, False, False), 3: (False, True, True),
                 5: (True, False, True), 6: (True, True, False)}
        want_fl = flips.get(int(side["flip"]))
        if want_fl is not None:
            assert raw.orientation.to_flips() == want_fl


def test_zzz_family_coverage_summary():
    """Runs last (name-ordered): prints + writes the per-family coverage
    table of this real-file run. Never fails -- it is the audit report."""
    if not _pairs():
        pytest.skip("no RAW+sidecar pairs found")
    lines = ["real-file codec-family coverage:"]
    for fam in _FAMILIES:
        files = _seen.get(fam, [])
        mark = f"EXERCISED ({len(files)}: {', '.join(files[:3])}" + \
            ("...)" if len(files) > 3 else ")") if files else "not exercised"
        note = f"  [{_CONFIRMS[fam]}]" if fam in _CONFIRMS and files else ""
        lines.append(f"  {fam:<22} {mark}{note}")
    extra = sorted(set(_seen) - set(_FAMILIES))
    for fam in extra:
        lines.append(f"  {fam:<22} EXERCISED ({len(_seen[fam])}) "
                     "[outside the named family list]")
    open_qs = [f for f in _CONFIRMS if f not in _seen]
    if open_qs:
        lines.append("  open questions still awaiting real bytes: "
                     + ", ".join(open_qs))
    report = "\n".join(lines)
    print("\n" + report)
    try:
        with open(os.path.join(_DIR, "coverage_summary.txt"), "w") as f:
            f.write(report + "\n")
    except OSError:
        pass
