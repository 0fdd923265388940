"""CKSprite3D: billboard quad entities.

API mirror of RCKSprite3D (/root/reference/src/CKSprite3d.cpp,
include/RCKSprite3D.h): material, billboard mode, center offset, UV rect,
size. The reference batches sprites per material on the CPU (4 verts / 6
indices each, CKSprite3DBatch flushed in camera space,
src/CKRenderContext.cpp:2841-2921); here every sprite owns 4 reserved rows
of the device vertex pool and ALL corner positions are computed by one
vectorized device step per frame (pipeline/overlay.apply_billboards) inside
the frame program.
"""

from __future__ import annotations

import numpy as np

from .base import CKCID_SPRITE3D, CKContext
from .entity import CK3dEntity
from ..pipeline.overlay import (
    SPRITE3D_BILLBOARD, SPRITE3D_ORIENTABLE, SPRITE3D_XROTATE, SPRITE3D_YROTATE,
)


class CKSprite3D(CK3dEntity):
    CLASS_ID = CKCID_SPRITE3D

    MODE_BILLBOARD = SPRITE3D_BILLBOARD
    MODE_XROTATE = SPRITE3D_XROTATE
    MODE_YROTATE = SPRITE3D_YROTATE
    MODE_ORIENTABLE = SPRITE3D_ORIENTABLE

    def __init__(self, context: CKContext, name: str = ""):
        super().__init__(context, name)
        self.material = None
        self.mode = self.MODE_BILLBOARD
        self.offset = np.zeros(2, np.float32)
        self.uv_rect = np.array([0.0, 0.0, 1.0, 1.0], np.float32)
        self.size2d = np.array([1.0, 1.0], np.float32)
        context._bump_topology()

    def SetMaterial(self, material):
        self.material = material
        self.context._bump_topology()

    def GetMaterial(self):
        return self.material

    def SetMode(self, mode: int):
        self.mode = int(mode)
        self.context._bump_dynamic()

    def GetMode(self) -> int:
        return self.mode

    def SetOffset(self, offset):
        self.offset = np.asarray(offset, np.float32)[:2]
        self.context._bump_dynamic()

    def GetOffset(self) -> np.ndarray:
        return self.offset.copy()

    def SetUVMapping(self, rect):
        self.uv_rect = np.asarray(rect, np.float32)[:4]
        self.context._bump_topology()

    def GetUVMapping(self) -> np.ndarray:
        return self.uv_rect.copy()

    def SetSize(self, size):
        self.size2d = np.asarray(size, np.float32)[:2]
        self.context._bump_dynamic()

    def GetSize(self) -> np.ndarray:
        return self.size2d.copy()
