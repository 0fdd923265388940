"""Spatial grids: CKGrid / CKLayer.

API mirror of RCKGrid / RCKLayer (/root/reference/src/CKGrid.cpp,
src/CKLayer.cpp, include/RCKGrid.h:9-51, include/RCKLayer.h:10-61): an
invisible width x length grid entity with orientation/priority and named,
typed data layers (CKSquare value arrays). TPU mapping (SURVEY §2.4): layers
are plain 2D numpy arrays keyed by grid coordinates — consumers can lift
them to jnp for batched queries.
"""

from __future__ import annotations

import numpy as np

from .base import CKCID_GRID, CKCID_LAYER, CKContext, CKObject
from .entity import CK3dEntity

# Grid orientation modes (CK_GRIDORIENTATION)
CKGRID_XZ = 0     # squares in the entity's local XZ plane (default)
CKGRID_XY = 1
CKGRID_YZ = 2

_layer_type_registry: dict[str, int] = {}


def RegisterLayerType(name: str) -> int:
    """Global layer-type registry (reference CKGridManager type registration)."""
    if name not in _layer_type_registry:
        _layer_type_registry[name] = len(_layer_type_registry) + 1
    return _layer_type_registry[name]


def GetLayerTypeByName(name: str) -> int:
    return _layer_type_registry.get(name, 0)


class CKLayer(CKObject):
    CLASS_ID = CKCID_LAYER

    def __init__(self, context: CKContext, name: str = "", grid=None,
                 ltype: int = 0, width: int = 0, length: int = 0):
        super().__init__(context, name)
        self.grid = grid
        self.type = int(ltype)
        self.format = 0
        self.squares = np.zeros((length, width), np.int32)
        self.visible = True

    def GetType(self) -> int:
        return self.type

    def SetType(self, t: int):
        self.type = int(t)

    def GetFormat(self) -> int:
        return self.format

    def SetFormat(self, f: int):
        self.format = int(f)

    def SetValue(self, x: int, y: int, value):
        self.squares[y, x] = value

    def GetValue(self, x: int, y: int):
        return self.squares[y, x]

    def GetSquareArray(self) -> np.ndarray:
        return self.squares

    def SetSquareArray(self, arr):
        a = np.asarray(arr)
        assert a.shape == self.squares.shape
        self.squares = a.astype(self.squares.dtype)

    def GetGrid(self):
        return self.grid

    # -- API-surface parity batch (reference include/RCKLayer.h) -----------
    def SetValue2(self, x: int, y: int, value) -> bool:
        """Bounds-checked SetValue returning success (reference
        RCKLayer::SetValue2, src/CKLayer.cpp)."""
        if not (0 <= x < self.squares.shape[1]
                and 0 <= y < self.squares.shape[0]):
            return False
        self.squares[y, x] = value
        return True

    def GetValue2(self, x: int, y: int):
        """Bounds-checked GetValue; None when outside (reference
        GetValue2)."""
        if not (0 <= x < self.squares.shape[1]
                and 0 <= y < self.squares.shape[0]):
            return None
        return self.squares[y, x]

    def SetVisible(self, visible: bool = True):
        self.visible = bool(visible)

    def IsVisible(self) -> bool:
        return self.visible

    def InitOwner(self, owner):
        """First owner binding (reference InitOwner — the grid that created
        the layer)."""
        self.grid = owner

    def SetOwner(self, owner):
        self.grid = owner

    def GetOwner(self):
        return self.grid

    def InitValue(self, value):
        self.squares[:] = value


class CKGrid(CK3dEntity):
    CLASS_ID = CKCID_GRID

    def __init__(self, context: CKContext, name: str = ""):
        super().__init__(context, name)
        self.width = 10          # squares along local x
        self.length = 10         # squares along local z (XZ orientation)
        self.orientation_mode = CKGRID_XZ
        self.grid_priority = 0
        self.layers: list[CKLayer] = []
        self.Show(False)         # grids are invisible entities by default

    # -- shape ---------------------------------------------------------------
    def SetDimensions(self, width: int, length: int, size_x: float = 1.0,
                      size_y: float = 1.0):
        """width x length squares of size (size_x, size_y) in local units;
        resizes existing layers (values preserved where overlapping)."""
        self.width = int(width)
        self.length = int(length)
        for layer in self.layers:
            old = layer.squares
            new = np.zeros((self.length, self.width), old.dtype)
            h = min(old.shape[0], self.length)
            w = min(old.shape[1], self.width)
            new[:h, :w] = old[:h, :w]
            layer.squares = new
        self._size = (float(size_x), float(size_y))

    def GetWidth(self) -> int:
        return self.width

    def GetLength(self) -> int:
        return self.length

    def SetOrientationMode(self, mode: int):
        self.orientation_mode = int(mode)

    def GetOrientationMode(self) -> int:
        return self.orientation_mode

    def UpdateBox(self):
        """Recompute the grid's local bbox from its dimensions (reference
        RCKGrid::UpdateBox); returns (bmin, bmax)."""
        import numpy as np
        w = self.GetWidth() * self._size[0]
        l = self.GetLength() * self._size[1]
        bmin = np.array([-w * 0.5, 0.0, -l * 0.5], np.float32)
        bmax = np.array([w * 0.5, 0.0, l * 0.5], np.float32)
        self._local_box = (bmin, bmax)
        return bmin, bmax

    def SetGridPriority(self, p: int):
        self.grid_priority = int(p)

    def GetGridPriority(self) -> int:
        return self.grid_priority

    @property
    def square_size(self) -> tuple:
        return getattr(self, "_size", (1.0, 1.0))

    # -- layers --------------------------------------------------------------
    def AddLayer(self, type_or_name, format: int = 0) -> CKLayer:
        ltype = (RegisterLayerType(type_or_name)
                 if isinstance(type_or_name, str) else int(type_or_name))
        layer = CKLayer(self.context, f"{self.GetName()}_layer{ltype}",
                        grid=self, ltype=ltype, width=self.width,
                        length=self.length)
        layer.SetFormat(format)
        self.layers.append(layer)
        return layer

    def GetLayer(self, type_or_name) -> CKLayer | None:
        ltype = (GetLayerTypeByName(type_or_name)
                 if isinstance(type_or_name, str) else int(type_or_name))
        for l in self.layers:
            if l.type == ltype:
                return l
        return None

    def GetLayerCount(self) -> int:
        return len(self.layers)

    def GetLayerByIndex(self, i: int) -> CKLayer:
        return self.layers[i]

    def RemoveLayer(self, layer_or_type):
        layer = (layer_or_type if isinstance(layer_or_type, CKLayer)
                 else self.GetLayer(layer_or_type))
        if layer in self.layers:
            self.layers.remove(layer)

    # -- coordinates ---------------------------------------------------------
    def _axes(self):
        if self.orientation_mode == CKGRID_XY:
            return 0, 1
        if self.orientation_mode == CKGRID_YZ:
            return 1, 2
        return 0, 2   # XZ

    def GetGridCoordinates(self, world_pos) -> tuple[int, int] | None:
        """World position -> (x, y) square coords, or None if outside."""
        inv = np.linalg.inv(self.GetWorldMatrix())
        p = np.asarray(world_pos, np.float32) @ inv[:3, :3] + inv[3, :3]
        ax, ay = self._axes()
        sx, sy = self.square_size
        gx = int(np.floor(p[ax] / sx + self.width * 0.5))
        gy = int(np.floor(p[ay] / sy + self.length * 0.5))
        if 0 <= gx < self.width and 0 <= gy < self.length:
            return gx, gy
        return None

    def GetPositionFromCoordinates(self, x: int, y: int) -> np.ndarray:
        """Square-center world position."""
        ax, ay = self._axes()
        sx, sy = self.square_size
        local = np.zeros(3, np.float32)
        local[ax] = (x + 0.5 - self.width * 0.5) * sx
        local[ay] = (y + 0.5 - self.length * 0.5) * sy
        w = self.GetWorldMatrix()
        return local @ w[:3, :3] + w[3, :3]

    def IsInGrid(self, world_pos) -> bool:
        return self.GetGridCoordinates(world_pos) is not None

    def IsActive(self) -> bool:
        return self.IsVisible() or True
