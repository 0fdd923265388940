"""Bounding boxes, box-visibility, frustum and ray tests (batched, jit-safe).

TPU-native replacement for the VxMath bbox/frustum helpers the reference engine
uses for culling:

- ``transform_box_2d`` mirrors VxTransformBox2D as used by
  CKRasterizerContext::ComputeBoxVisibility (reference:
  /root/reference/src/CKRasterizer/CKRasterizerLib/CKRasterizerContext.cpp:394-421):
  transform the 8 box corners to clip space, OR/AND-reduce the per-corner clip
  flags, and compute the on-screen extent rectangle.
- ``box_visibility`` returns CBV_OFFSCREEN / CBV_VISIBLE / CBV_ALLINSIDE with the
  same classification rule (AND != 0 -> offscreen; OR != 0 -> partially visible;
  else all-inside). The all-inside result drives the reference's NoTestsTraversal
  fast path (src/CKSceneGraph.cpp:558-612); here it lets whole subtrees skip
  per-entity tests in the batched cull.
- Ray tests back picking (RCKRenderContext::Pick3D, src/CKRenderContext.cpp:1661-1900).

Everything is vmappable over a leading box/entity axis — the whole scene is
culled in one batched call instead of the reference's per-node recursion.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import vxmath as vx

_CORNER_SEL = None


def box_corners(bmin: jnp.ndarray, bmax: jnp.ndarray) -> jnp.ndarray:
    """(...,3),(...,3) -> (...,8,3) corners."""
    sel = jnp.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
            [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
        ],
        jnp.float32,
    )
    bmin = bmin[..., None, :]
    bmax = bmax[..., None, :]
    return bmin + (bmax - bmin) * sel


def transform_box_2d(mat: jnp.ndarray, bmin: jnp.ndarray, bmax: jnp.ndarray,
                     view_x, view_y, view_w, view_h):
    """VxTransformBox2D equivalent.

    Returns (or_flags, and_flags, extents) where extents is (...,4) as
    (left, top, right, bottom) in screen pixels, clamped to the viewport.
    """
    corners = box_corners(bmin, bmax)  # (...,8,3)
    clip = vx.transform_points4(corners, mat[..., None, :, :] if mat.ndim > 2 else mat)
    flags = vx.clip_flags(clip)  # (...,8) uint32
    or_flags = flags[..., 0]
    and_flags = flags[..., 0]
    for i in range(1, 8):
        or_flags = or_flags | flags[..., i]
        and_flags = and_flags & flags[..., i]

    # Screen extents: project corners (guard w<=0 — behind-eye corners get a
    # huge extent, same practical effect as the reference's clamp to viewport).
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-30, 1e-30, w)
    rw = 1.0 / safe_w
    half_w = view_w * 0.5
    half_h = view_h * 0.5
    cx = view_x + half_w
    cy = view_y + half_h
    xs = cx + clip[..., 0] * rw * half_w
    ys = cy - clip[..., 1] * rw * half_h
    behind = w <= 0.0
    xs_min = jnp.where(behind, jnp.inf, xs).min(axis=-1)
    xs_max = jnp.where(behind, -jnp.inf, xs).max(axis=-1)
    ys_min = jnp.where(behind, jnp.inf, ys).min(axis=-1)
    ys_max = jnp.where(behind, -jnp.inf, ys).max(axis=-1)
    any_behind = behind.any(axis=-1)
    # A box crossing the near plane covers (conservatively) the whole viewport.
    left = jnp.where(any_behind, view_x, xs_min)
    right = jnp.where(any_behind, view_x + view_w, xs_max)
    top = jnp.where(any_behind, view_y, ys_min)
    bottom = jnp.where(any_behind, view_y + view_h, ys_max)
    left = jnp.clip(left, view_x, view_x + view_w)
    right = jnp.clip(right, view_x, view_x + view_w)
    top = jnp.clip(top, view_y, view_y + view_h)
    bottom = jnp.clip(bottom, view_y, view_y + view_h)
    extents = jnp.stack([left, top, right, bottom], axis=-1)
    return or_flags, and_flags, extents


def box_visibility(mat: jnp.ndarray, bmin: jnp.ndarray, bmax: jnp.ndarray) -> jnp.ndarray:
    """CBV_* classification of a (batch of) box(es) under a clip-space matrix."""
    corners = box_corners(bmin, bmax)
    clip = vx.transform_points4(corners, mat[..., None, :, :] if mat.ndim > 2 else mat)
    flags = vx.clip_flags(clip)
    or_flags = flags[..., 0]
    and_flags = flags[..., 0]
    for i in range(1, 8):
        or_flags = or_flags | flags[..., i]
        and_flags = and_flags & flags[..., i]
    return jnp.where(
        and_flags != 0,
        jnp.uint32(vx.CBV_OFFSCREEN),
        jnp.where(or_flags != 0, jnp.uint32(vx.CBV_VISIBLE), jnp.uint32(vx.CBV_ALLINSIDE)),
    )


def merge_boxes(bmin_a, bmax_a, bmin_b, bmax_b):
    return jnp.minimum(bmin_a, bmin_b), jnp.maximum(bmax_a, bmax_b)


def transform_box(bmin: jnp.ndarray, bmax: jnp.ndarray, m: jnp.ndarray):
    """Axis-aligned box of a transformed box (VxBbox::TransformFrom)."""
    corners = box_corners(bmin, bmax)
    pts = vx.transform_points(corners, m[..., None, :, :] if m.ndim > 2 else m)
    return pts.min(axis=-2), pts.max(axis=-2)


def points_box(points: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Bbox of (...,N,3) points; masked entries ignored."""
    if mask is not None:
        big = jnp.float32(3.0e38)
        pmin = jnp.where(mask[..., None], points, big).min(axis=-2)
        pmax = jnp.where(mask[..., None], points, -big).max(axis=-2)
        return pmin, pmax
    return points.min(axis=-2), points.max(axis=-2)


# ---------------------------------------------------------------------------
# Ray tests (picking)
# ---------------------------------------------------------------------------

def ray_box(origin: jnp.ndarray, direction: jnp.ndarray, bmin: jnp.ndarray, bmax: jnp.ndarray):
    """Slab test. Returns (hit, t_near). Batched over any leading axes."""
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-30, 1e-30, direction)
    t0 = (bmin - origin) * inv
    t1 = (bmax - origin) * inv
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tmax >= tmin) & (tmax >= 0.0)
    return hit, jnp.maximum(tmin, 0.0)


def ray_triangles(origin: jnp.ndarray, direction: jnp.ndarray,
                  v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
                  eps: float = 1e-9):
    """Moller-Trumbore over (...,3) triangles. Returns (hit, t, u, v).

    Backs the batched mesh picking that replaces the reference's per-face loop in
    g_RayIntersection (src/CKMeshUtils.cpp).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(direction, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    tvec = origin - v0
    u = jnp.sum(tvec * p, axis=-1) * inv_det
    q = jnp.cross(tvec, e1)
    v = jnp.sum(direction * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    hit = (jnp.abs(det) > eps) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return hit, t, u, v
