"""CKVertexBuffer: user-facing dynamic vertex buffer + immediate draw.

API mirror of RCKVertexBuffer (/root/reference/include/RCKVertexBuffer.h:
8-31, src/CKVertexBuffer.cpp — Check/Lock/Draw against the rasterizer's
dynamic VB pool) and the render context's user DrawPrimitive staging buffer
(RCKRenderContext::GetDrawPrimitiveStructure,
/root/reference/src/CKRenderContext.cpp:967). TPU mapping: Lock returns a
numpy staging view; Draw composites immediately onto the context's
framebuffer through the device raster pass — the analogue of an
out-of-scene-graph DrawPrimitive call.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..raster import batch as rbatch
from ..raster import jax_backend as rb
from ..raster.types import RasterState, VXCULL, VXPRIMITIVE, pack_states
from .base import CKContext, CKObject

CK_VB_OK = 0
CK_VB_LOST = 1
CK_VB_FAILED = 2


class CKVertexBuffer(CKObject):
    def __init__(self, context: CKContext, name: str = "",
                 max_vertices: int = 1024):
        super().__init__(context, name)
        self.max_vertices = int(max_vertices)
        self.positions = np.zeros((self.max_vertices, 4), np.float32)  # clip xyzw
        self.colors = np.ones((self.max_vertices, 4), np.float32)
        self.uvs = np.zeros((self.max_vertices, 2), np.float32)
        self._locked = None
        self._count = 0

    def Check(self, count: int) -> int:
        """(reference Check: ensure capacity)"""
        if count > self.max_vertices:
            grow = max(count, 2 * self.max_vertices)
            for attr, fill in (("positions", 0.0), ("colors", 1.0), ("uvs", 0.0)):
                a = getattr(self, attr)
                out = np.full((grow,) + a.shape[1:], fill, np.float32)
                out[: a.shape[0]] = a
                setattr(self, attr, out)
            self.max_vertices = grow
        return CK_VB_OK

    def Lock(self, start: int, count: int):
        """Returns (positions, colors, uvs) staging views for [start, start+count)."""
        self.Check(start + count)
        self._locked = (start, count)
        self._count = max(self._count, start + count)
        sl = slice(start, start + count)
        return self.positions[sl], self.colors[sl], self.uvs[sl]

    def Unlock(self):
        self._locked = None

    def GetCount(self) -> int:
        return self._count

    def Draw(self, rc, prim_type: int = int(VXPRIMITIVE.TRIANGLELIST),
             start: int = 0, count: int | None = None,
             state: RasterState | None = None, texture=None):
        """Immediate draw of clip-space vertices onto rc's framebuffer.

        Positions are CLIP-space xyzw (pre-transformed, the VxDrawPrimitive
        screen/clip path of the reference); the raster pass runs now.
        """
        count = count if count is not None else self._count - start
        if prim_type == int(VXPRIMITIVE.POINTLIST):
            if count < 1:
                return False
        elif count < 3:
            return False
        v = slice(start, start + count)
        pos = self.positions[v]
        col = self.colors[v]
        uv = self.uvs[v]
        if prim_type == int(VXPRIMITIVE.POINTLIST):
            # Points draw as pixel-sized right triangles around each vertex
            # (the reference's DrawPrimitive(VX_POINTLIST) path).
            vxp, vyp, vw, vh = rc.viewport
            dx = 2.0 / max(vw, 1) * 1.5
            dy = 2.0 / max(vh, 1) * 1.5
            p = np.repeat(pos, 3, axis=0).reshape(count, 3, 4)
            w_ = np.maximum(p[..., 3:4], 1e-6)
            p[:, 1, 0] += dx * w_[:, 1, 0]
            p[:, 2, 1] -= dy * w_[:, 2, 0]
            pos = p.reshape(-1, 4)
            col = np.repeat(col, 3, axis=0)
            uv = np.repeat(uv, 3, axis=0)
            count = count * 3
            prim_type = int(VXPRIMITIVE.TRIANGLELIST)
        if prim_type == int(VXPRIMITIVE.TRIANGLESTRIP):
            t = count - 2
            idx = np.stack([
                np.arange(t), np.arange(1, t + 1), np.arange(2, t + 2)], -1)
            flip = (np.arange(t) % 2) == 1
            idx[flip] = idx[flip][:, [1, 0, 2]]
        elif prim_type == int(VXPRIMITIVE.TRIANGLEFAN):
            t = count - 2
            idx = np.stack([
                np.zeros(t, np.int64), np.arange(1, t + 1),
                np.arange(2, t + 2)], -1)
        else:
            t = count // 3
            idx = np.arange(t * 3).reshape(-1, 3)
        tb = rbatch.make_batch(
            pos[idx], view=rc.viewport, color=col[idx], uv=uv[idx],
            pad_to=max(8, ((t + 7) // 8) * 8))
        # Immediate draws default to no culling (user geometry has no
        # guaranteed winding; matches the reference's 2D/DP paths).
        st = state or RasterState(cull=int(VXCULL.NONE))
        if texture is not None and st.tex < 0:
            import dataclasses
            st = dataclasses.replace(st, tex=0)
        si, sf = pack_states([st])
        db = rb.DeviceBatch.from_host(tb)
        if texture is not None:
            img = texture.current_image()
            planes = jnp.asarray(np.moveaxis(img, -1, 0))[None]
            tex_planes = planes
            tex_hw = jnp.asarray([[img.shape[0], img.shape[1]]], jnp.int32)
        else:
            tex_planes = jnp.zeros((1, 4, 1, 1), jnp.float32)
            tex_hw = jnp.ones((1, 2), jnp.int32)
        fb, zb = rb.render_pass(
            rc.fb, rc.zb, db, jnp.asarray(si), jnp.asarray(sf),
            tex_planes, tex_hw, jnp.zeros(3, jnp.float32),
            jnp.asarray(rc.viewport, jnp.float32))
        rc.fb, rc.zb = fb, zb
        return True

    def Destroy(self):
        """Release the buffer storage (reference RCKVertexBuffer::Destroy);
        the object stays and can be re-Checked into a new allocation."""
        self.positions = self.positions[:0]
        self.colors = self.colors[:0]
        self.uvs = self.uvs[:0]
        self._count = 0
        self.max_vertices = 0
