"""2D overlay compositing: screen-space textured quads over/under the 3D pass.

The reference draws 2D entities as 4-vertex screen-space fans through the
rasterizer (RCK2dEntity::Draw, /root/reference/src/CK2dEntity.cpp:805-908),
background tree before the 3D scene and foreground tree after
(CKRenderedScene::Draw :166-179, :314-327). TPU design: all visible quads of
one layer are packed into a QuadBank and composited in order by an UNROLLED
loop over quads with the (4,H,W) framebuffer as carry — axis-aligned
boxes, so per-quad coverage is two range tests; texturing samples with a
scalar texture id per quad. Unrolling (vs lax.scan) matters on TPU: each
scan iteration is a separately dispatched program (~ms of overhead each)
while the unrolled chain fuses into straight-line code; banks beyond 64
quads fall back to a scan whose body composites 8 unrolled quads per step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuadBank(NamedTuple):
    """Q screen-space quads in composite order (back to front)."""

    rect: jnp.ndarray      # (Q,4) f32 pixel rect [x0,y0,x1,y1]
    uvrect: jnp.ndarray    # (Q,4) f32 [u0,v0,u1,v1]
    color: jnp.ndarray     # (Q,4) f32 modulate RGBA
    tex: jnp.ndarray       # (Q,) int32 texture slot, -1 = untextured
    blend: jnp.ndarray     # (Q,) int32 1 = alpha blend, 0 = opaque copy
    valid: jnp.ndarray     # (Q,) bool

    @staticmethod
    def empty() -> "QuadBank":
        return QuadBank(
            rect=jnp.zeros((0, 4), jnp.float32),
            uvrect=jnp.zeros((0, 4), jnp.float32),
            color=jnp.zeros((0, 4), jnp.float32),
            tex=jnp.zeros((0,), jnp.int32),
            blend=jnp.zeros((0,), jnp.int32),
            valid=jnp.zeros((0,), bool),
        )


def build_quad_bank(quads: list[dict], pad: int = 4) -> QuadBank | None:
    """Host: list of dicts (rect, uvrect, color, tex, blend) -> QuadBank."""
    if not quads:
        return None
    q = len(quads)
    qp = max(pad, ((q + pad - 1) // pad) * pad)
    rect = np.zeros((qp, 4), np.float32)
    uvrect = np.tile(np.array([0, 0, 1, 1], np.float32), (qp, 1))
    color = np.ones((qp, 4), np.float32)
    tex = np.full(qp, -1, np.int32)
    blend = np.zeros(qp, np.int32)
    valid = np.zeros(qp, bool)
    for i, d in enumerate(quads):
        rect[i] = d["rect"]
        uvrect[i] = d.get("uvrect", (0, 0, 1, 1))
        color[i] = d.get("color", (1, 1, 1, 1))
        tex[i] = d.get("tex", -1)
        blend[i] = int(d.get("blend", 1))
        valid[i] = True
    return QuadBank(rect=jnp.asarray(rect), uvrect=jnp.asarray(uvrect),
                    color=jnp.asarray(color), tex=jnp.asarray(tex),
                    blend=jnp.asarray(blend), valid=jnp.asarray(valid))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "win_cap"))
def composite_quads(fb: jnp.ndarray, bank: QuadBank, tex_planes: jnp.ndarray,
                    tex_hw: jnp.ndarray, height: int, width: int,
                    win_cap: int = 256, row0=0.0) -> jnp.ndarray:
    """Composite quads onto fb (4,H,W) in bank order. Returns new fb.

    Per-quad texel fetches are WINDOWED: a quad smaller than
    ``win_cap`` x ``win_cap`` composites inside a dynamically-sliced static
    window around its rect, so the texel gather touches ~win_cap^2 pixels
    instead of the whole frame (a full-frame element gather costs ~6 ms at
    1024x768 PER QUAD on this TPU — two HUD quads were worth 13 ms/frame).
    Quads larger than the cap take the dense full-frame branch under
    lax.cond — identical math, just unwindowed."""
    if bank.rect.shape[0] == 0:
        return fb
    nt, _, th, tw = tex_planes.shape
    flat = tex_planes.transpose(0, 2, 3, 1).reshape(nt * th * tw, 4)
    wh = min(win_cap, height)
    ww = min(win_cap, width)

    def quad_math(sub, px, py, q):
        """Composite ONE quad onto the (4, h, w) block ``sub`` whose pixel
        centers are (px, py)."""
        rect, uvrect, color, tex, blend, valid = q
        x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
        inside = (px >= x0) & (px < x1) & (py >= y0) & (py < y1) & valid
        w = jnp.maximum(x1 - x0, 1e-6)
        h = jnp.maximum(y1 - y0, 1e-6)
        u = uvrect[0] + (px - x0) / w * (uvrect[2] - uvrect[0])
        v = uvrect[1] + (py - y0) / h * (uvrect[3] - uvrect[1])

        tid = jnp.clip(tex, 0, tex_hw.shape[0] - 1)
        tww = tex_hw[tid, 1].astype(jnp.float32)
        thh = tex_hw[tid, 0].astype(jnp.float32)
        iu = jnp.clip(u * tww, 0, tww - 1).astype(jnp.int32)
        iv = jnp.clip(v * thh, 0, thh - 1).astype(jnp.int32)
        ncols = tex_hw.shape[1]
        if ncols >= 4:                 # packed atlas: apply texture offsets
            iu = iu + tex_hw[tid, ncols - 1]
            iv = iv + tex_hw[tid, ncols - 2]
            idx = iv * tw + iu
        else:
            idx = tid * (th * tw) + iv * tw + iu
        texel = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            px.shape + (4,))
        has_tex = tex >= 0
        src = [jnp.where(has_tex, texel[..., c] * color[c],
                         jnp.broadcast_to(color[c], px.shape))
               for c in range(4)]
        alpha = jnp.where(blend != 0, src[3], 1.0)
        out = []
        for c in range(3):
            out.append(jnp.where(inside,
                                 src[c] * alpha + sub[c] * (1.0 - alpha),
                                 sub[c]))
        out.append(jnp.where(inside, jnp.maximum(sub[3], alpha), sub[3]))
        return jnp.stack(out)

    py_full, px_full = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5 + row0,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    row0_i = jnp.asarray(row0, jnp.float32).astype(jnp.int32)

    def one(fb, q):
        rect = q[0]
        valid = q[5]
        x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
        # Covered pixel CENTERS are columns [ceil(x0-0.5), ceil(x1-0.5)):
        # size/fit tests must use that integer footprint, not x1-x0 — a
        # win_cap-wide quad at a fractional origin > .5 would otherwise
        # lose its last covered column to the window edge.
        ix0 = jnp.ceil(x0 - 0.5).astype(jnp.int32)
        ix1 = jnp.ceil(x1 - 0.5).astype(jnp.int32)
        iy0 = jnp.ceil(y0 - 0.5).astype(jnp.int32)
        iy1 = jnp.ceil(y1 - 0.5).astype(jnp.int32)
        small = ((ix1 - ix0 <= ww) & (iy1 - iy0 <= wh)) | ~valid

        def windowed(fb):
            # Slice indices are band-LOCAL rows; pixel centers stay GLOBAL
            # (rects arrive in global screen coordinates — band sharding).
            ox = jnp.clip(ix0, 0, width - ww)
            oy = jnp.clip(iy0 - row0_i, 0, height - wh)
            sub = jax.lax.dynamic_slice(fb, (0, oy, ox), (4, wh, ww))
            pxw = (ox.astype(jnp.float32)
                   + jnp.arange(ww, dtype=jnp.float32)[None, :] + 0.5)
            pyw = ((oy + row0_i).astype(jnp.float32)
                   + jnp.arange(wh, dtype=jnp.float32)[:, None] + 0.5)
            pxw = jnp.broadcast_to(pxw, (wh, ww))
            pyw = jnp.broadcast_to(pyw, (wh, ww))
            out = quad_math(sub, pxw, pyw, q)
            return jax.lax.dynamic_update_slice(fb, out, (0, oy, ox))

        def dense(fb):
            return quad_math(fb, px_full, py_full, q)

        if wh >= height and ww >= width:
            return dense(fb)
        return jax.lax.cond(small, windowed, dense, fb)

    q = bank.rect.shape[0]
    if q <= 64:
        for j in range(q):
            fb = one(fb, jax.tree_util.tree_map(lambda a: a[j], bank))
        return fb
    # Large banks: scan over groups of 8 unrolled quads (bounded compile).
    group = 8
    pad = (-q) % group
    if pad:
        def padrow(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        bank = jax.tree_util.tree_map(padrow, bank)
    grouped = jax.tree_util.tree_map(
        lambda a: a.reshape(((q + pad) // group, group) + a.shape[1:]), bank)

    def body(fb, sub):
        for j in range(group):
            fb = one(fb, jax.tree_util.tree_map(lambda a: a[j], sub))
        return fb, None

    fb, _ = jax.lax.scan(body, fb, grouped)
    return fb


@functools.partial(jax.jit, static_argnames=("x", "y"))
def composite_label(fb: jnp.ndarray, label: jnp.ndarray, x: int, y: int):
    """Alpha-composite a small host-rastered RGBA label (h,w,4) onto the
    (4,H,W) framebuffer at pixel (x, y) — the debug-mode object name/time
    overlay (reference GDI text during object stepping,
    /root/reference/src/CKRenderContext.cpp:657-762)."""
    h, w = label.shape[0], label.shape[1]
    lab = jnp.moveaxis(label, -1, 0)                     # (4,h,w)
    dst = jax.lax.dynamic_slice(fb, (0, y, x), (4, h, w))
    a = lab[3:4]
    out = jnp.concatenate([lab[:3] * a + dst[:3] * (1.0 - a),
                           jnp.maximum(dst[3:4], a)], axis=0)
    return jax.lax.dynamic_update_slice(fb, out, (0, y, x))


def raster_label(text: str, max_w: int, pad: int = 2) -> np.ndarray:
    """Host: rasterize ``text`` white-on-translucent-black via PIL
    (the CKSpriteText raster reused for the debug overlay); (h,w,4) f32."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    probe = ImageDraw.Draw(Image.new("RGBA", (1, 1)))
    bb = probe.textbbox((0, 0), text, font=font)
    w = min(max(bb[2] + 2 * pad, 1), max_w)
    h = bb[3] + 2 * pad
    img = Image.new("RGBA", (w, h), (0, 0, 0, 160))
    ImageDraw.Draw(img).text((pad, pad), text, font=font,
                             fill=(255, 255, 255, 255))
    return np.asarray(img, np.float32) / 255.0


class Sprite3DBank(NamedTuple):
    """S billboard sprites expanded on device (4 verts / 2 tris each).

    Pool layout: sprite s owns pool rows pool_base + 4s .. +3 in corner
    order (-x-y, +x-y, +x+y, -x+y).
    """

    entity_row: jnp.ndarray   # (S,) int32
    size: jnp.ndarray         # (S,2) world-size (w,h)
    offset: jnp.ndarray       # (S,2) center offset in billboard plane
    mode: jnp.ndarray         # (S,) int32 VXSPRITE3D mode
    pool_base: jnp.ndarray    # (S,) int32 first pool row of the sprite
    valid: jnp.ndarray        # (S,) bool


# Sprite3D modes (reference VXSPRITE3D_TYPE)
SPRITE3D_BILLBOARD = 0
SPRITE3D_XROTATE = 1
SPRITE3D_YROTATE = 2
SPRITE3D_ORIENTABLE = 3


def apply_billboards(world: jnp.ndarray, view: jnp.ndarray,
                     positions: jnp.ndarray, bank: Sprite3DBank,
                     visible: jnp.ndarray | None = None) -> jnp.ndarray:
    """Write billboard corner positions (world space) into the vertex pool.

    The reference batches sprites per material and fills 4 verts/6 indices
    per sprite in camera space on the CPU (RCKRenderContext::AddSprite3DBatch,
    /root/reference/src/CKRenderContext.cpp:2841-2921). Here ALL sprites
    expand in one vectorized step; the resulting pool verts ride the normal
    instanced stream bound to an identity entity row.
    """
    if bank.entity_row.shape[0] == 0:
        return positions
    s = bank.entity_row.shape[0]
    wm = jnp.take(world, bank.entity_row, axis=0)            # (S,4,4)
    center = wm[:, 3, :3]                                    # (S,3)

    # Camera right/up in world space: V maps world->camera (row-vector), so
    # the world direction imaging to camera +x is column 0 of V's 3x3.
    cam_right = view[:3, 0]
    cam_up = view[:3, 1]
    cam_right = cam_right / jnp.maximum(jnp.linalg.norm(cam_right), 1e-12)
    cam_up = cam_up / jnp.maximum(jnp.linalg.norm(cam_up), 1e-12)

    ent_right = wm[:, 0, :3]
    ent_up = wm[:, 1, :3]

    mode = bank.mode[:, None]
    right = jnp.where(mode == SPRITE3D_ORIENTABLE, ent_right, cam_right[None])
    up = jnp.where(mode == SPRITE3D_ORIENTABLE, ent_up, cam_up[None])
    # axis-locked rotations: keep the world axis, billboard the other
    right = jnp.where(mode == SPRITE3D_YROTATE, ent_right, right)
    up = jnp.where(mode == SPRITE3D_XROTATE, ent_up, up)

    hw = bank.size[:, 0:1] * 0.5
    hh = bank.size[:, 1:2] * 0.5
    ox = bank.offset[:, 0:1]
    oy = bank.offset[:, 1:2]
    c = center + right * ox + up * oy
    corners = jnp.stack([
        c - right * hw - up * hh,
        c + right * hw - up * hh,
        c + right * hw + up * hh,
        c - right * hw + up * hh,
    ], axis=1)                                               # (S,4,3)

    if visible is not None:
        vis = jnp.take(visible, bank.entity_row, axis=0)
        # invisible sprites collapse to a degenerate point (culled in setup)
        corners = jnp.where(vis[:, None, None], corners, center[:, None, :])

    rows = bank.pool_base[:, None] + jnp.arange(4, dtype=jnp.int32)[None]
    rows = jnp.where(bank.valid[:, None], rows, positions.shape[0])
    return positions.at[rows.reshape(-1)].set(
        corners.reshape(-1, 3), mode="drop")
