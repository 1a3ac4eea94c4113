"""The op contract.

Equivalent of the ImageOp trait (/root/reference/src/pipeline.rs:82-108).
Each op is a small host-side parameter object; `run` stages device work
(pure jnp/Pallas functions jitted per shape class). Hashing covers the
op name plus a canonical binary serialization of every field, chained by
the pipeline so editing op k invalidates exactly stages >= k.
"""

from __future__ import annotations

from ..hasher import BufHasher, BufHash

__all__ = ["ImageOp"]


class ImageOp:
    NAME = "op"

    def name(self) -> str:
        return self.NAME

    def run(self, globals_, buf):
        raise NotImplementedError

    def serialize_binary(self) -> bytes:
        raise NotImplementedError

    # YAML settings dict, in declared field order (serde_yaml schema parity).
    def to_settings_dict(self) -> dict:
        raise NotImplementedError

    def load_settings_dict(self, d: dict) -> None:
        raise NotImplementedError

    def to_settings(self) -> str:
        import yaml

        return yaml.safe_dump(self.to_settings_dict(), sort_keys=False)

    def hash(self, hasher: BufHasher) -> None:
        # Name first: a field-less op would otherwise hash nothing
        # (pipeline.rs:88-92).
        hasher.write(self.name().encode())
        hasher.from_serialize(self)

    def shash(self) -> BufHash:
        h = BufHasher()
        h.from_serialize(self)
        return h.result()

    def device_chain(self, globals_, meta):
        """Fused-suffix support (single-dispatch dirty-suffix re-render).

        `meta` is the host-side buffer descriptor `(width, height, colors,
        monochrome)` this op would receive. Return None when the op cannot
        join a fused dispatch (the pipeline falls back to per-stage
        `run()`), else a 4-tuple `(key, fn, params, out_meta)`:

        - `key`: hashable statics that select this op's trace (knot count,
          orientation flips, ...) — any value change that alters the traced
          program MUST change the key;
        - `fn`: pure traceable `fn(data, *params) -> data`, or None for an
          identity stage (no-op crop, linear-mode gamma, ...);
        - `params`: host-numpy jit arguments (NOT baked into the trace, so
          interactive edits re-dispatch without recompiling);
        - `out_meta`: the descriptor of the op's output.

        The pipeline runs the composed stages inside ONE jit, separated by
        `lax.optimization_barrier` so each stage's arithmetic (and hence
        rounding) is exactly the standalone per-op kernel's — the fusion
        removes per-dispatch overhead, not stage boundaries, and every
        intermediate is still returned and cached per stage."""
        return None

    def transform_forward(self, width: int, height: int) -> tuple[int, int]:
        return (width, height)

    def transform_reverse(self, width: int, height: int) -> tuple[int, int]:
        return (width, height)

    def reset(self) -> None:
        pass
