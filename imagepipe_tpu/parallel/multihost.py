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

One constraint, validated collectively: all files of one
`develop_files` call must share plan statics (sensor geometry/config) —
the fleet-serving case. Per-host plan-statics hashes are allgathered
and must agree; mixed inputs raise before any device step runs. In a
single-process environment every helper degenerates to the plain
BatchEngine behavior, which is how the CPU-mesh tests pin it; the
driver's multichip dryrun runs the same code over 8 virtual devices.
"""

from __future__ import annotations

import concurrent.futures as cf
import hashlib
import math

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import (_develop_batch_perimage_jit, make_develop_plan,
                      normalize_plane, stack_params)
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

        # Collective agreement: one statics key fleet-wide. EVERY raise
        # below happens on ALL hosts from the same allgathered evidence —
        # a unilateral raise while peers proceed into the next collective
        # would hang the fleet, so local problems are reported into the
        # gather as sentinels (-1 = empty partition, -2 = mixed statics)
        # and judged collectively.
        key_hash = -1
        if entries:
            key = tuple(sorted(entries[0][2].statics().items()))
            if any(tuple(sorted(plan.statics().items())) != key
                   for _, _, plan in entries[1:]):
                key_hash = -2
            else:
                # 30-bit positive hash: must survive the int32 gather.
                key_hash = int.from_bytes(hashlib.blake2b(
                    repr(key).encode(), digest_size=4).digest(),
                    "little") & 0x3FFFFFFF
        hashes = _allgather_i32(key_hash)
        real = hashes[hashes >= 0]
        if (hashes == -2).any():
            raise ValueError(
                "multi-host batches require uniform plan statics (same "
                "sensor geometry/config) per call; split the file list "
                "by camera model first")
        if real.size and not (real == real[0]).all():
            raise ValueError("hosts disagree on plan statics; split the "
                             "file list by camera model first")
        if real.size == 0:
            return results  # nothing decodable anywhere
        if (hashes == -1).any():
            # Some host's partition has no decodable files: it cannot
            # build padding rows (it has no plan), so the whole fleet
            # refuses together with the same error.
            raise ValueError(
                "a host's partition has no decodable files while others "
                "do; feed at least one decodable file per host")

        steps = int(_allgather_i32(
            math.ceil(len(entries) / self.local_dp)).max())
        plan = entries[0][2]
        # Host-side rank probe: normalize_plane only reshapes [H,W*3]
        # to [H,W,3] for rgb mode -- no device upload needed here.
        rank = 3 if (plan.statics().get("mode") == "rgb"
                     and entries[0][1].raw.data.ndim == 2) \
            else entries[0][1].raw.data.ndim
        sh_plane = NamedSharding(self.mesh, P("batch", *([None] * rank)))

        inflight = []
        for step in range(steps):
            rows = entries[step * self.local_dp:(step + 1) * self.local_dp]
            pad_src = rows[-1] if rows else entries[-1]
            chunk = list(rows) + [pad_src] * (self.local_dp - len(rows))
            planes = np.stack([
                np.asarray(normalize_plane(p_, src.raw.data))
                for _, src, p_ in chunk])
            params = stack_params([p_.params for _, _, p_ in chunk])
            g_planes = _make_global(sh_plane, planes)
            g_params = jax.tree.map(
                lambda leaf: _make_global(
                    NamedSharding(self.mesh,
                                  P("batch", *([None] * (leaf.ndim - 1)))),
                    np.asarray(leaf)),
                params)
            out = _develop_batch_perimage_jit(g_planes, g_params,
                                              **plan.statics())
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
