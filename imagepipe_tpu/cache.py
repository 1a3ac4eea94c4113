"""Byte-weighted stage cache holding HBM-resident buffers.

Equivalent of the external `multicache` crate (SURVEY.md section 2.1, usage
at /root/reference/src/pipeline.rs:43,258-260,355-370): a size-bounded map
BufHash -> OpBuffer. Entries keep their backing jax.Array alive on device, so
a cache hit resumes a re-render from the deepest valid stage without any
host<->device transfer. Eviction is least-recently-used by byte weight.

Over-budget-singleton semantics: a put always succeeds and the newest entry
is always retained, even when its weight alone exceeds max_bytes (everything
older is evicted first). Rationale: the orchestrator puts stages in execution
order, so the newest entry is the deepest stage -- dropping it would make a
small cache strictly useless, while keeping it leaves exactly one resumable
stage. total_bytes may therefore exceed max_bytes only when len() == 1.

Thread safety: all operations take an internal lock, so one MultiCache may
be shared by concurrent render sessions (service.py). Entries can carry an
`owner` tag for per-session byte accounting (`bytes_for`), kept consistent
under eviction and key replacement.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional

from .buffer import OpBuffer
from .hasher import BufHash

__all__ = ["MultiCache"]


class MultiCache:
    def __init__(self, max_bytes: int):
        self.max_bytes = int(max_bytes)
        self._entries: OrderedDict[BufHash, tuple[OpBuffer, int, object]] = OrderedDict()
        self._total = 0
        self._by_owner: dict = {}
        self._lock = threading.RLock()

    def get(self, key: BufHash) -> Optional[OpBuffer]:
        with self._lock:
            hit = self._entries.get(key)
            if hit is None:
                return None
            self._entries.move_to_end(key)
            return hit[0]

    def _account(self, owner, delta: int) -> None:
        if owner is None:
            return
        n = self._by_owner.get(owner, 0) + delta
        if n:
            self._by_owner[owner] = n
        else:
            self._by_owner.pop(owner, None)

    def put(self, key: BufHash, buf: OpBuffer, weight: int, owner=None) -> None:
        with self._lock:
            if key in self._entries:
                _, old_w, old_owner = self._entries.pop(key)
                self._total -= old_w
                self._account(old_owner, -old_w)
            self._entries[key] = (buf, int(weight), owner)
            self._total += int(weight)
            self._account(owner, int(weight))
            while self._total > self.max_bytes and len(self._entries) > 1:
                _, (_, w, o) = self._entries.popitem(last=False)
                self._total -= w
                self._account(o, -w)

    # Name parity with the reference call site (pipeline.rs:369).
    put_arc = put

    def bytes_for(self, owner) -> int:
        """Bytes currently held by entries tagged with this owner."""
        with self._lock:
            return self._by_owner.get(owner, 0)

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    @property
    def total_bytes(self) -> int:
        with self._lock:
            return self._total
