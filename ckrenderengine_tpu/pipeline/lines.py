"""Device line rasterization: screen-space segments over the rendered frame.

The reference draws mesh line lists through DrawPrimitive(VX_LINELIST)
(RCKMesh::DefaultRender line pass, /root/reference/src/CKMesh.cpp:4168-4192)
and uses them for curves (RCKCurve renders as a line mesh) and wireframe
overlays. TPU design: all line segments of the scene are one LineBank;
endpoints ride the same entity-transform path as triangles, then a
lax.scan over line chunks composites distance-to-segment coverage with a
Z test against the frame's depth buffer (no z-write — lines are overlay
geometry, matching the reference's line pass coming after the fill pass).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import vxmath as vx
from ..scene.entity_table import compose_world


class LineBank(NamedTuple):
    """L line segments over the instanced vertex stream."""

    idx: jnp.ndarray        # (L,2) int32 into the instanced stream (src_idx space)
    color: jnp.ndarray      # (L,4) f32
    valid: jnp.ndarray      # (L,) bool


def build_line_bank(segments: list[dict], pad: int = 8) -> LineBank | None:
    """Host: list of dicts (i0, i1, color) -> LineBank."""
    if not segments:
        return None
    l = len(segments)
    lp = max(pad, ((l + pad - 1) // pad) * pad)
    idx = np.zeros((lp, 2), np.int32)
    color = np.ones((lp, 4), np.float32)
    valid = np.zeros(lp, bool)
    for i, s in enumerate(segments):
        idx[i] = (s["i0"], s["i1"])
        color[i] = s.get("color", (1, 1, 1, 1))
        valid[i] = True
    return LineBank(idx=jnp.asarray(idx), color=jnp.asarray(color),
                    valid=jnp.asarray(valid))


def draw_lines(fb: jnp.ndarray, zb: jnp.ndarray, scene, world: jnp.ndarray,
               bank: LineBank, height: int, width: int,
               half_width: float = 0.7, z_bias: float = 1e-4,
               chunk: int = 32, row0=0.0) -> jnp.ndarray:
    """Composite the line bank onto fb (4,H,W) with a Z test against zb."""
    if bank.idx.shape[0] == 0:
        return fb
    # Transform the endpoints (same path as the triangle vertex stage).
    world_ext = jnp.concatenate(
        [world, jnp.eye(4, dtype=world.dtype)[None]], axis=0)
    ep = bank.idx.reshape(-1)                                  # (2L,)
    src = jnp.take(scene.src_idx, ep, axis=0)
    ent = jnp.take(scene.vert_entity, ep, axis=0)
    pos = jnp.take(scene.positions, src, axis=0)
    wm = jnp.take(world_ext, ent, axis=0)
    posw = vx.transform_points(pos, wm)
    posw4 = jnp.concatenate([posw, jnp.ones(posw.shape[:-1] + (1,), posw.dtype)], -1)
    clip = vx.transform_h4(posw4, jnp.matmul(scene.view, scene.proj))

    vxp, vyp, vw_, vh_ = (scene.viewport[0], scene.viewport[1],
                          scene.viewport[2], scene.viewport[3])
    w = jnp.maximum(clip[:, 3], 1e-6)
    sx = vxp + vw_ * 0.5 + clip[:, 0] / w * (vw_ * 0.5)
    sy = vyp + vh_ * 0.5 - clip[:, 1] / w * (vh_ * 0.5)
    sz = clip[:, 2] / w
    behind = clip[:, 3] <= 1e-6

    l = bank.idx.shape[0]
    p0 = jnp.stack([sx[0::2], sy[0::2]], -1)                  # (L,2)
    p1 = jnp.stack([sx[1::2], sy[1::2]], -1)
    z0 = sz[0::2]
    z1 = sz[1::2]
    lvalid = bank.valid & ~(behind[0::2] | behind[1::2])

    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5 + row0,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )

    nchunks = (l + chunk - 1) // chunk
    pad = nchunks * chunk - l

    def prep(a, fill=0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
        return a.reshape((nchunks, chunk) + a.shape[1:])

    cp0 = prep(p0)
    cp1 = prep(p1)
    cz0 = prep(z0)
    cz1 = prep(z1)
    cvalid = prep(lvalid, False)
    ccolor = prep(bank.color)

    def body(fb, xs):
        a, b, za, zbz, valid, color = xs
        d = b - a                                             # (C,2)
        len2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)         # (C,)
        # param of closest point per pixel, clamped to the segment
        pax = px[None] - a[:, 0, None, None]
        pay = py[None] - a[:, 1, None, None]
        t = (pax * d[:, 0, None, None] + pay * d[:, 1, None, None]) / len2[:, None, None]
        t = jnp.clip(t, 0.0, 1.0)
        dx = pax - t * d[:, 0, None, None]
        dy = pay - t * d[:, 1, None, None]
        dist2 = dx * dx + dy * dy
        cov = (dist2 <= half_width * half_width) & valid[:, None, None]
        zline = za[:, None, None] * (1 - t) + zbz[:, None, None] * t
        cov &= (zline <= zb[None] + z_bias) & (zline >= 0.0) & (zline <= 1.0)
        # composite chunk in order (later lines win within overlap)
        out = fb
        for ci in range(cov.shape[0]):
            m = cov[ci]
            out = jnp.stack([
                jnp.where(m, color[ci, 0], out[0]),
                jnp.where(m, color[ci, 1], out[1]),
                jnp.where(m, color[ci, 2], out[2]),
                jnp.where(m, jnp.maximum(out[3], color[ci, 3]), out[3]),
            ])
        return out, None

    xs = (cp0, cp1, cz0, cz1, cvalid, ccolor)
    if nchunks <= 8:
        # Unrolled: each lax.scan iteration is a separately dispatched
        # program on TPU (~ms overhead); small banks fuse straight-line.
        for k in range(nchunks):
            fb, _ = body(fb, tuple(a[k] for a in xs))
        return fb
    fb, _ = jax.lax.scan(body, fb, xs)
    return fb
