"""Stage 2: CFA -> RGBE, fused with downscale where possible.

Re-design of OpDemosaic (/root/reference/src/ops/demosaic.rs). Path selection
(demosaic.rs:41-60) is host logic; each path dispatches a different compiled
device kernel. The fused scaled-demosaic path is the reference's key memory
trick (full-res RGB never materialized) and matters just as much for HBM.
"""

from __future__ import annotations

from .base import ImageOp
from ..buffer import OpBuffer
from ..hasher import pack_str
from ..raw import CFA
from ..sources import ImageSource
from .. import scaling
from ..kernels.demosaic_full import demosaic_full

__all__ = ["OpDemosaic"]


def minscale_for(cfa_width: int) -> float:
    """Minimum downscale at which every output pixel covers all CFA colors
    (demosaic.rs:33-39); shared by the staged op and the fused planner."""
    return {2: 2.0, 6: 3.0, 8: 2.0, 12: 12.0}.get(cfa_width, 2.0)


class OpDemosaic(ImageOp):
    NAME = "demosaic"

    def __init__(self, img: ImageSource):
        if img.is_raw:
            self.cfa = str(img.raw.cropped_cfa())
        else:
            self.cfa = ""

    def serialize_binary(self) -> bytes:
        return pack_str(self.cfa)

    def to_settings_dict(self) -> dict:
        return {"cfa": self.cfa}

    def load_settings_dict(self, d: dict) -> None:
        self.cfa = str(d["cfa"] or "")

    def run(self, globals_, buf: OpBuffer) -> OpBuffer:
        nwidth = globals_.settings.demosaic_width
        nheight = globals_.settings.demosaic_height
        scale = scaling.calculate_scale(buf.width, buf.height, nwidth, nheight)

        cfa = CFA(self.cfa)
        minscale = minscale_for(cfa.width)

        if scale <= 1.0 and buf.colors == 4:
            return buf
        elif buf.colors == 4:
            return scaling.scale_down_opbuf(buf, nwidth, nheight)
        elif scale >= minscale:
            return scaling.scaled_demosaic(cfa, buf, nwidth, nheight)
        else:
            fullsize = demosaic_full(cfa, buf)
            if scale > 1.0:
                return scaling.scale_down_opbuf(fullsize, nwidth, nheight)
            return fullsize

    # No transform_forward/reverse overrides: sizing happens here via the
    # settings' demosaic dimensions (demosaic.rs:63-65).
