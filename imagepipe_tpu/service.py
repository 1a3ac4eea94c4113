"""Stage-cache-aware interactive render service.

The reference's downstream GUI (chimper) drives Pipeline + MultiCache in a
mutate/re-render loop (SURVEY.md section 3.5). This service packages that
pattern for production: one session per open image holding its pipeline and
a shared byte-budgeted device cache, edits applied as setting patches, and
renders returned at preview or full size -- only the dirty stage suffix
recomputes (pipeline.rs:354-372 semantics).

Threading contract: RenderService is safe for concurrent use across
DIFFERENT sessions -- the shared MultiCache is internally locked, the
session table is guarded, and each EditSession serializes its own
apply/render under a per-session lock (edits mutate the pipeline in place,
so interleaved edit+render on ONE session from two threads would otherwise
race; with the lock they execute in some serial order). Stage-cache entries
are salted with the image content hash, so sessions never alias each other's
buffers; per-session HBM usage in the shared cache is tracked via owner tags
(`session.cache_bytes()`).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Optional

from .cache import MultiCache
from .pipeline import Pipeline, SRGBImage, SRGBImage16
from .sources import ImageSource

__all__ = ["RenderService", "EditSession"]


class _OwnedCacheView:
    """Forwards to a shared MultiCache, tagging puts with this session's
    owner key so eviction-aware per-session byte accounting stays exact."""

    def __init__(self, cache: MultiCache, owner: str):
        self._cache = cache
        self.owner = owner

    def get(self, key):
        return self._cache.get(key)

    def put(self, key, buf, weight):
        self._cache.put(key, buf, weight, owner=self.owner)

    put_arc = put

    def bytes(self) -> int:
        return self._cache.bytes_for(self.owner)


@dataclass
class EditSession:
    pipeline: Pipeline
    cache: _OwnedCacheView
    _lock: threading.RLock = field(default_factory=threading.RLock)

    def apply(self, patch: dict) -> None:
        """Patch op settings: {"basecurve": {"exposure": 0.3},
        "rotatecrop": {"crop_left": 0.1}, ...} -- unknown keys rejected."""
        with self._lock:
            for op_name, fields in patch.items():
                op = getattr(self.pipeline.ops, op_name, None)
                if op is None or op_name not in self.pipeline.ops.ORDER:
                    raise KeyError(f"unknown op {op_name!r}")
                current = op.to_settings_dict()
                for k, v in fields.items():
                    if k not in current:
                        raise KeyError(f"unknown setting {op_name}.{k}")
                current.update(fields)
                op.load_settings_dict(current)

    def set_temp(self, temp: float, tint: float = 1.0) -> None:
        with self._lock:
            self.pipeline.ops.tolab.set_temp(temp, tint)

    def render(self, max_size: int = 0, bits: int = 8):
        """Develop with the session cache; only dirty stages recompute."""
        with self._lock:
            s = self.pipeline.globals.settings
            s.maxwidth = max_size
            s.maxheight = max_size
            if bits == 8:
                return self.pipeline.output_8bit(self.cache)
            return self.pipeline.output_16bit(self.cache)

    def cache_bytes(self) -> int:
        """HBM bytes this session currently holds in the shared cache."""
        return self.cache.bytes()

    def save_settings(self) -> str:
        with self._lock:
            return self.pipeline.to_serial()

    def load_settings(self, serial: str) -> None:
        with self._lock:
            self.pipeline = Pipeline.new_from_serial(
                self.pipeline.globals.image, serial)


class RenderService:
    """Open images, apply edits, render -- with one shared device cache.
    See the module docstring for the threading contract."""

    def __init__(self, cache_bytes: int = 4 << 30):
        self.cache = MultiCache(cache_bytes)
        self.sessions: dict[str, EditSession] = {}
        self._lock = threading.RLock()

    def open_file(self, key: str, path: str) -> EditSession:
        return self.open_source(key, None, path=path)

    def open_source(self, key: str, source: Optional[ImageSource], path=None) -> EditSession:
        if path is not None:
            pipeline = Pipeline.new_from_file(path)
        else:
            pipeline = Pipeline.new_from_source(source)
        # Interactive sessions use the staged cached path.
        pipeline.globals.settings.use_fastpath = False
        session = EditSession(pipeline, _OwnedCacheView(self.cache, key))
        with self._lock:
            self.sessions[key] = session
        return session

    def close(self, key: str) -> None:
        with self._lock:
            self.sessions.pop(key, None)

    def render(self, key: str, max_size: int = 0, bits: int = 8):
        with self._lock:
            session = self.sessions[key]
        return session.render(max_size=max_size, bits=bits)

    def edit(self, key: str, patch: dict, max_size: int = 0, bits: int = 8):
        with self._lock:
            session = self.sessions[key]
        with session._lock:
            session.apply(patch)
            return session.render(max_size=max_size, bits=bits)
