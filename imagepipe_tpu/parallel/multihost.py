"""Multi-host input feed over DCN (SURVEY.md §2.5/§5's deferred item).

Scaling the batch engine past one host changes only the INPUT FEED: the
develop step itself is the same SPMD program (dp-sharded fused develop),
and per-image work is embarrassingly parallel, so no hand-written
collectives are needed — exactly the survey's design point ("multi-host
input pipeline feeds over DCN; no custom collectives").

Design:

  * every process receives the same global file list and takes the
    deterministic round-robin slice `paths[process_index::process_count]`
    (`partition_files`) — each host's decode I/O rides its own local
    disk/NIC, never the interconnect;
  * the global mesh orders devices host-major, so a global batch of
    `total_dp` rows is `local_dp` consecutive rows per host; each host
    decodes and normalizes only its own rows and assembles the global
    [B,H,W] planes and per-image calibration pytrees with
    `jax.make_array_from_process_local_data` — pixel bytes go straight
    from the decoding host's RAM to its own chips' HBM (DCN carries only
    XLA's program coordination);
  * every host runs the identical jit (`_develop_batch_perimage_jit`)
    for the globally-agreed number of steps (a `process_allgather` max
    over per-host queue lengths; short queues pad by repeating their
    last row), then fetches only its addressable output shards.

Mixed inputs (different sensor geometries/configs in one call — a real
directory) are served by BUCKET SCHEDULING: files group by plan-statics
key, every host's bucket metadata (statics + zeroed example calibration
+ normalized plane geometry) is allgathered, and the union is iterated
in agreed (hash-sorted) order so all hosts run the identical jit
sequence — a host with no files of some bucket fabricates zero padding
rows from the broadcast metadata. Every decision below is made from
allgathered evidence so any raise happens on EVERY host (a unilateral
raise between collectives would hang the fleet). In a single-process
environment every helper degenerates to the plain BatchEngine behavior,
which is how the CPU-mesh tests pin it; the driver's multichip dryrun
runs the same code over 8 virtual devices.
"""

from __future__ import annotations

import concurrent.futures as cf
import hashlib
import math
import pickle
import struct

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import (_develop_batch_perimage_jit, make_develop_plan,
                      normalize_plane_np, stack_params)
from ..pipeline import Pipeline
from .batch import BatchError

__all__ = ["MultiHostBatchEngine", "partition_files", "global_batch_mesh"]


def partition_files(paths, process_index: int | None = None,
                    process_count: int | None = None) -> list:
    """This host's deterministic slice of the global file list
    (round-robin: adjacent shots usually share camera/shape, so striding
    balances shape buckets across hosts)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process index {pi} outside 0..{pc - 1}")
    return list(paths[pi::pc])


def global_batch_mesh() -> Mesh:
    """1-D dp mesh over ALL devices, host-major (each host's rows of a
    global batch are contiguous and land on its own chips)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), ("batch",))


def _allgather_i32(value: int) -> np.ndarray:
    """Gather one small int from every process (identity when
    single-process). int32 ONLY: the gather rides device arrays, and
    with the default x64-disabled config an int64 would silently
    truncate (observed: a 56-bit statics hash wrapping negative and
    tripping the sentinel logic on every host)."""
    assert -(1 << 31) <= value < (1 << 31), value
    if jax.process_count() == 1:
        return np.array([value], np.int32)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        np.array([value], np.int32))).reshape(-1).astype(np.int32)


def _make_global(sharding: NamedSharding, local: np.ndarray) -> jax.Array:
    """Assemble a global dp-sharded array from this host's rows."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def _allgather_blob(blob: bytes) -> list[bytes]:
    """Gather one variable-length byte blob from every process. Two
    phases keep shapes collective-safe: lengths are allgathered first so
    every host pads to the same max (process_allgather needs identical
    shapes), then the payload rides one uint8 gather."""
    if jax.process_count() == 1:
        return [blob]
    from jax.experimental import multihost_utils

    n = int(_allgather_i32(len(blob)).max())
    arr = np.zeros(n + 4, np.uint8)
    arr[:4] = np.frombuffer(struct.pack("<I", len(blob)), np.uint8)
    arr[4:4 + len(blob)] = np.frombuffer(blob, np.uint8)
    g = np.asarray(multihost_utils.process_allgather(arr))
    out = []
    for row in g.reshape(jax.process_count(), -1):
        (ln,) = struct.unpack("<I", row[:4].tobytes())
        out.append(row[4:4 + ln].tobytes())
    return out


class MultiHostBatchEngine:
    """Batched develop whose input feed scales across hosts.

    develop_files(paths) returns results for THIS host's partition of
    the global list, in partition order (`partition_files(paths)` gives
    the matching path order)."""

    def __init__(self, mesh: Mesh | None = None, out_bits: int = 8,
                 decode_workers: int | None = None, maxwidth: int = 0,
                 maxheight: int = 0, inflight_batches: int = 2):
        self.mesh = mesh if mesh is not None else global_batch_mesh()
        if "batch" not in self.mesh.axis_names:
            raise ValueError("mesh needs a 'batch' axis")
        self.out_bits = out_bits
        if decode_workers is None:
            from .batch import default_decode_workers

            decode_workers = default_decode_workers()
        self.decode_workers = decode_workers
        self.maxwidth = maxwidth
        self.maxheight = maxheight
        self.inflight_batches = inflight_batches
        devs = list(self.mesh.devices.reshape(-1))
        self.total_dp = len(devs)
        pi = jax.process_index()
        self.local_dp = sum(1 for d in devs if d.process_index == pi)
        if self.local_dp == 0:
            raise ValueError("this host owns no devices of the mesh")
        # Host-major check: this host's rows must be contiguous.
        mine = [i for i, d in enumerate(devs) if d.process_index == pi]
        if mine != list(range(mine[0], mine[0] + len(mine))):
            raise ValueError("mesh devices must be host-major "
                             "(use global_batch_mesh())")
        self.row0 = mine[0]

    def _plan_for(self, source):
        pipe = Pipeline.new_from_source(source)
        pipe.globals.settings.maxwidth = self.maxwidth
        pipe.globals.settings.maxheight = self.maxheight
        if self.out_bits == 16:
            pipe.globals.settings.linear = True
        return make_develop_plan(pipe, out_bits=self.out_bits)

    def develop_files(self, paths: list[str], errors: str = "skip"):
        """Decode this host's partition and develop the global batches.

        errors='skip' (default, the production policy) records a
        BatchError for an undecodable file and keeps the global schedule
        intact; 'raise' aborts this host (and with it the SPMD job)."""
        from ..decode import decode_file

        assert errors in ("raise", "skip"), errors
        mine = partition_files(paths)
        results: list = [None] * len(mine)
        entries = []  # (local_idx, source, plan)
        with cf.ThreadPoolExecutor(self.decode_workers) as pool:
            futs = {pool.submit(decode_file, p): i
                    for i, p in enumerate(mine)}
            for fut in cf.as_completed(futs):
                idx = futs[fut]
                try:
                    src = fut.result()
                    plan = self._plan_for(src)
                except Exception as e:
                    if errors == "raise":
                        raise
                    results[idx] = BatchError(mine[idx], e)
                    continue
                entries.append((idx, src, plan))
        entries.sort(key=lambda t: t[0])

        # Bucket scheduling (mixed statics in one call). Group local
        # entries by plan-statics key, allgather every host's bucket
        # metadata, and iterate the UNION in hash-sorted order so all
        # hosts run the identical jit sequence. The metadata carries
        # everything a bucket-less host needs to fabricate padding rows
        # (statics dict, zeroed example calibration pytree, normalized
        # plane geometry). Every raise below is computed from the same
        # gathered evidence on every host — collective-raise discipline.
        by_key: dict[tuple, list] = {}
        for e in entries:
            by_key.setdefault(tuple(sorted(e[2].statics().items())),
                              []).append(e)
        # 30-bit positive hashes give the agreed bucket iteration order;
        # entries bucket by the FULL key, so a same-host collision can't
        # silently merge two configs -- it is REPORTED through the gather
        # (raising before the collective would hang the peers).
        local: dict[int, list] = {}
        meta = []
        hash_of: dict[tuple, int] = {}
        collided = False
        for key, es in sorted(by_key.items()):
            kh = int.from_bytes(hashlib.blake2b(
                repr(key).encode(), digest_size=4).digest(),
                "little") & 0x3FFFFFFF
            hash_of[key] = kh
            if kh in local:
                collided = True
                continue
            local[kh] = es
            _, src0, plan0 = es[0]
            plane0 = normalize_plane_np(plan0, src0.raw.data)
            meta.append({
                "hash": kh,
                "statics": dict(plan0.statics()),
                "params0": jax.tree.map(
                    lambda l: np.zeros_like(np.asarray(l)), plan0.params),
                "plane": (tuple(plane0.shape), plane0.dtype.str),
            })
        if collided:
            meta.append({"collision": True})
        # The fleet is our own trusted processes (pickle is fine here;
        # this is coordination state, not external input).
        union: dict[int, dict] = {}
        collision = collided
        for blob in _allgather_blob(pickle.dumps(meta)):
            for m in pickle.loads(blob):
                if m.get("collision"):
                    collision = True
                if "hash" not in m:
                    continue
                have = union.get(m["hash"])
                if have is None:
                    union[m["hash"]] = m
                elif (have["statics"] != m["statics"]
                      or have["plane"] != m["plane"]):
                    collision = True
        if collision:
            # Identical union/sentinels on every host -> identical raise.
            raise ValueError(
                "plan-statics hash collision between camera configs; "
                "rehash with a different digest size")
        if not union:
            return results  # nothing decodable anywhere

        inflight = []
        for kh in sorted(union):
            m = union[kh]
            es = local.get(kh, [])
            steps = int(_allgather_i32(
                math.ceil(len(es) / self.local_dp)).max())
            statics = m["statics"]
            pshape, pdtype = m["plane"]
            sh_plane = NamedSharding(self.mesh,
                                     P("batch", *([None] * len(pshape))))
            zero_plane = None
            for step in range(steps):
                rows = es[step * self.local_dp:(step + 1) * self.local_dp]
                pad = self.local_dp - len(rows)
                if rows:
                    pad_rows = [rows[-1]] * pad
                elif es:
                    pad_rows = [es[-1]] * pad
                else:
                    pad_rows = []
                planes_l = [normalize_plane_np(p_, src.raw.data)
                            for _, src, p_ in list(rows) + pad_rows]
                params_l = [p_.params for _, _, p_ in list(rows) + pad_rows]
                if not planes_l or len(planes_l) < self.local_dp:
                    # No local files in this bucket: fabricate zero rows
                    # from the broadcast metadata.
                    if zero_plane is None:
                        zero_plane = np.zeros(pshape, np.dtype(pdtype))
                    need = self.local_dp - len(planes_l)
                    planes_l += [zero_plane] * need
                    params_l += [m["params0"]] * need
                planes = np.stack(planes_l)
                params = stack_params(params_l)
                g_planes = _make_global(sh_plane, planes)
                g_params = jax.tree.map(
                    lambda leaf: _make_global(
                        NamedSharding(self.mesh,
                                      P("batch", *([None] * (leaf.ndim - 1)))),
                        np.asarray(leaf)),
                    params)
                out = _develop_batch_perimage_jit(g_planes, g_params,
                                                  **statics)
                inflight.append((rows, out))
                self._drain(inflight, results, keep=self.inflight_batches)
        self._drain(inflight, results, keep=0)
        return results

    def _drain(self, inflight, results, keep: int) -> None:
        while len(inflight) > keep:
            rows, out = inflight.pop(0)
            # Fetch only this host's addressable rows.
            shards = {s.index[0].start: np.asarray(s.data)
                      for s in out.addressable_shards}
            for k, (idx, _, _) in enumerate(rows):
                row = self.row0 + k
                base = max(b for b in shards if b <= row)
                img = shards[base][row - base]  # host numpy [C,h,w]
                results[idx] = np.moveaxis(img, 0, -1)
