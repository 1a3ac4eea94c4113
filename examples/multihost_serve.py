"""Multi-host batched RAW serving over DCN.

Run the SAME script on every host of a jax.distributed fleet; each host
decodes its own round-robin partition of the global file list from its
local disk, the global dp mesh develops the assembled batches, and each
host fetches the outputs for its partition. Pixel bytes never cross
hosts -- DCN carries only XLA coordination (parallel/multihost.py).

Single-host usage degenerates to BatchEngine semantics, so this example
runs standalone too:

    python examples/multihost_serve.py <dir-with-raws> [out-dir]

On a real fleet, initialize jax.distributed first, e.g.:

    JAX_COORDINATOR=host0:9876 NPROC=4 PROC_ID=$I \
        python examples/multihost_serve.py /data/shoot out/

(see scripts/exp_multihost_2proc.py for a complete localhost fleet).
"""

import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    indir = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "."

    coord = os.environ.get("JAX_COORDINATOR")
    if coord:
        import jax

        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["NPROC"]),
            process_id=int(os.environ["PROC_ID"]))

    from PIL import Image

    from imagepipe_tpu.parallel.batch import BatchError
    from imagepipe_tpu.parallel.multihost import (MultiHostBatchEngine,
                                                  partition_files)

    exts = (".dng", ".nef", ".nrw", ".cr2", ".arw", ".sr2", ".raf",
            ".orf", ".pef", ".rw2", ".mrw", ".pgm", ".synraw", ".npz",
            ".erf", ".rwl", ".srw", ".mef", ".mos", ".kdc", ".dcr",
            ".3fr", ".fff")
    paths = sorted(os.path.join(indir, n) for n in os.listdir(indir)
                   if n.lower().endswith(exts))
    if not paths:
        print(f"no RAW files under {indir!r}")
        return 1

    eng = MultiHostBatchEngine(maxwidth=2048, maxheight=2048)
    mine = partition_files(paths)
    results = eng.develop_files(paths, errors="skip")

    os.makedirs(outdir, exist_ok=True)
    ok = 0
    for path, res in zip(mine, results):
        base = os.path.splitext(os.path.basename(path))[0]
        if isinstance(res, BatchError):   # carrier names the failure
            print(f"SKIP {path}: {res.error}")
            continue
        Image.fromarray(np.asarray(res)).save(
            os.path.join(outdir, base + ".jpg"), quality=90)
        ok += 1
    print(f"host developed {ok}/{len(mine)} of its partition "
          f"({len(paths)} files globally)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
