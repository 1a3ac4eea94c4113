"""Byte-weighted stage cache holding HBM-resident buffers.

Equivalent of the external `multicache` crate (SURVEY.md section 2.1, usage
at /root/reference/src/pipeline.rs:43,258-260,355-370): a size-bounded map
BufHash -> OpBuffer. Entries keep their backing jax.Array alive on device, so
a cache hit resumes a re-render from the deepest valid stage without any
host<->device transfer. Eviction is least-recently-used by byte weight.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

from .buffer import OpBuffer
from .hasher import BufHash

__all__ = ["MultiCache"]


class MultiCache:
    def __init__(self, max_bytes: int):
        self.max_bytes = int(max_bytes)
        self._entries: OrderedDict[BufHash, tuple[OpBuffer, int]] = OrderedDict()
        self._total = 0

    def get(self, key: BufHash) -> Optional[OpBuffer]:
        hit = self._entries.get(key)
        if hit is None:
            return None
        self._entries.move_to_end(key)
        return hit[0]

    def put(self, key: BufHash, buf: OpBuffer, weight: int) -> None:
        if key in self._entries:
            _, old = self._entries.pop(key)
            self._total -= old
        self._entries[key] = (buf, int(weight))
        self._total += int(weight)
        while self._total > self.max_bytes and len(self._entries) > 1:
            _, (_, w) = self._entries.popitem(last=False)
            self._total -= w

    # Name parity with the reference call site (pipeline.rs:369).
    put_arc = put

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def total_bytes(self) -> int:
        return self._total
