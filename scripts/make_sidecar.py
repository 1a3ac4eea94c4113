#!/usr/bin/env python
"""Produce <raw>.sidecar.npz from a real camera file using rawpy (LibRaw),
for the opt-in cross-validation harness (tests/test_realfiles.py).

Run this on any machine with `pip install rawpy` and real RAW files, copy
the RAW + sidecar pairs into a directory, and point IMAGEPIPE_REALFILE_DIR
at it. The sidecar records the independently-decoded sensor plane plus the
calibration metadata this repo's decoders must agree with.

Usage: python scripts/make_sidecar.py shot1.NEF [shot2.ARW ...]
"""

import sys

import numpy as np


def make_sidecar(path: str) -> str:
    import rawpy

    with rawpy.imread(path) as r:
        cdesc = r.color_desc.decode()
        pat = r.raw_pattern
        letters = "".join(cdesc[pat[y, x]] for y in range(pat.shape[0])
                          for x in range(pat.shape[1]))
        out = path + ".sidecar.npz"
        np.savez_compressed(
            out,
            raw_image=np.asarray(r.raw_image).copy(),
            top_margin=np.int32(r.sizes.top_margin),
            left_margin=np.int32(r.sizes.left_margin),
            black=np.int32(r.black_level_per_channel[0]),
            white=np.int32(r.white_level),
            cam_mul=np.asarray(r.camera_whitebalance, np.float64),
            cfa_letters=letters,
            flip=np.int32(r.sizes.flip),
        )
    return out


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    for p in argv[1:]:
        print(p, "->", make_sidecar(p))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
