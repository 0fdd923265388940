"""Deferred opaque rasterization: depth argmin-reduce + one shade per pixel.

The reference's hot loop is sequential per-triangle DrawPrimitive into a
z-buffered framebuffer (CKDX9RasterizerContext::DrawPrimitive,
/root/reference/src/CKRasterizer/CKDX9Rasterizer/CKDX9RasterizerContext.cpp:
1555-1648). For OPAQUE triangles with default depth semantics (LESSEQUAL +
z-write, no blending/alpha-test — the InitDefaultRenderStatesValue defaults,
CKRasterizerLib/CKRasterizerContext.cpp:423-477), the final image is
order-independent except for exact-depth ties, where the LATER draw wins.
That makes the whole opaque pass a pure reduction:

    winner(px) = argmin over triangles of (depth(px), -draw_index)

Edge functions and the depth plane are affine in screen space, so each
triangle-chunk evaluation is a fused multiply-add sweep over the pixel grid
(VPU-wide, MXU-mappable), and the reduction scans triangle chunks with an
(H,W) carry — no per-triangle sequential framebuffer dependency. Shading
(texture/fog/specular) then runs ONCE per pixel on the winning triangle
(deferred shading), instead of once per covered pixel per triangle.

Triangles whose state needs order (alpha blend, alpha test, z-func override,
no z-write) are excluded here and take the ordered path (jax_backend.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .types import (
    NUM_SF, NUM_SI, SF_ALPHAREF, SF_BORDER_R,
    SI_ALPHABLEND, SI_ALPHAFUNC, SI_ALPHATEST, SI_CULL, SI_DSTBLEND, SI_FOG,
    SI_PERSPECTIVE, SI_SRCBLEND, SI_TEX, SI_TEXADDR, SI_TEXBLEND,
    SI_TEXFILTER, SI_ZFUNC, SI_ZWRITE, VXBLEND, VXCMP, VXCULL, VXTEXTUREBLEND,
    VXTEXTURE_ADDRESS, VXTEXTURE_FILTER,
)


def take_small(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather from a SMALL table via one-hot matmul.

    XLA's general gather on this TPU costs ~8 ns/row regardless of table
    size (docs/PERFORMANCE.md); for tables of <= 128 rows a one-hot f32
    matmul runs dense on the MXU instead. Bit-exact vs the gather: each
    output row accumulates exactly one finite table row (0*x terms vanish,
    and int payloads stay below 2^24)."""
    s = table.shape[0]
    if s > 128 or s == 0 or idx.ndim != 1:
        return jnp.take(table, idx, axis=0)
    flat = table.reshape(s, -1).astype(jnp.float32)
    oh = (idx[:, None] == jnp.arange(s, dtype=idx.dtype)[None, :])
    # HIGHEST precision: the TPU MXU truncates f32 operands to bf16 at
    # DEFAULT precision, which would round every joined value (world
    # matrices, material colors) by ~3e-3 rel. The multi-pass decomposition
    # is exact here: the one-hot side is bf16-exact 0/1.
    out = jnp.matmul(oh.astype(jnp.float32), flat,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + table.shape[1:]).astype(table.dtype)


def deferred_mask(state_i: jnp.ndarray) -> jnp.ndarray:
    """Per-state-bucket: eligible for the order-independent opaque reduce."""
    return (
        (state_i[:, SI_ALPHABLEND] == 0)
        & (state_i[:, SI_ALPHATEST] == 0)
        & (state_i[:, SI_ZWRITE] != 0)
        & ((state_i[:, SI_ZFUNC] == VXCMP.LESSEQUAL)
           | (state_i[:, SI_ZFUNC] == VXCMP.LESS))
    )


def triangle_setup(xyw, z, state_idx, valid, state_i, clip_rect=None,
                   clipd=None, planar=None):
    """Per-triangle setup: adjoint edge coeffs, depth plane, cull, flags.

    xyw: (T,3,3) screen-homogeneous verts; z: (T,3) clip z.
    clip_rect: optional (T,4) per-triangle scissor (Place viewport clips).
    clipd: optional (T,3,P) per-corner user-clip-plane signed distances
    (world-space, reference SetUserClipPlane). The perspective-correct
    interpolated distance is (sum_i e_i d_i)/(sum_i e_i); coverage already
    requires signed esum > 0, so the per-pixel keep test reduces to the SIGN
    of the affine plane sum_i e_i(p) d_i — clip planes ride the deferred
    reduce at full rate, no ordered-pass rerouting of straddlers.

    ``planar``: optional PLANAR corner payload (DeviceBatch.planar) — when
    given, every per-corner quantity reads the 2D wide rows instead of the
    rank-3 ``xyw``/``z``/``clipd`` (whose (3,C) trailing dims pad to native
    (8,128) tiles on TPU — 16x the HBM traffic, ~12 ms/frame at 527k tris).
    Identical arithmetic either way.
    Returns dict of (T,...) arrays (plus 2D twins ``e9``/``dplane9``).
    """
    t = xyw.shape[0] if planar is None else planar["c"][0].shape[0]
    if planar is not None:
        c0, c1, c2 = planar["c"]
        v0c = (c0[:, 0], c0[:, 1], c0[:, 2])
        v1c = (c1[:, 0], c1[:, 1], c1[:, 2])
        v2c = (c2[:, 0], c2[:, 1], c2[:, 2])
        z3 = (c0[:, 3], c1[:, 3], c2[:, 3])
    else:
        v0c = tuple(xyw[:, 0, k] for k in range(3))
        v1c = tuple(xyw[:, 1, k] for k in range(3))
        v2c = tuple(xyw[:, 2, k] for k in range(3))
        z3 = tuple(z[:, i] for i in range(3))

    def cross_c(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    adj0c = cross_c(v1c, v2c)         # 3 x (T,): coeffs [a_x, a_y, c]
    adj1c = cross_c(v2c, v0c)
    adj2c = cross_c(v0c, v1c)
    det = v0c[0] * adj0c[0] + v0c[1] * adj0c[1] + v0c[2] * adj0c[2]   # (T,)
    s = jnp.where(det >= 0, 1.0, -1.0)
    degenerate = jnp.abs(det) < 1e-14

    cull = take_small(state_i[:, SI_CULL], state_idx)
    front = det > 0
    keep = ((cull == VXCULL.NONE)
            | ((cull == VXCULL.CCW) & front)
            | ((cull == VXCULL.CW) & ~front))

    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    # depth(p) = sum_j e_j(p) * z_j / det  — affine plane in (x, y, 1).
    zplane = jnp.stack(
        [(adj0c[k] * z3[0] + adj1c[k] * z3[1] + adj2c[k] * z3[2]) * inv_det
         for k in range(3)], axis=1)
    # esum(p) = det / w(p) — also affine; its sign (vs s) rejects behind-eye px.
    esum_plane = jnp.stack(
        [adj0c[k] + adj1c[k] + adj2c[k] for k in range(3)], axis=1)
    # For bit-exact agreement with the ordered pass (jax_backend._one_triangle
    # computes depth as (e0*z0+e1*z1+e2*z2)*inv_det per pixel), the reduce
    # must use the SAME arithmetic; with signed e's the factor s cancels:
    # depth = (e0s*z0 + e1s*z1 + e2s*z2) * (s*inv_det).
    inv_det_s = jnp.where(det >= 0, 1.0, -1.0) * inv_det

    # Signed edge coeffs and top-left flags (fill convention of the oracle).
    e0s = tuple(adj0c[k] * s for k in range(3))
    e1s = tuple(adj1c[k] * s for k in range(3))
    e2s = tuple(adj2c[k] * s for k in range(3))
    # 2D twin consumed by the packed-row builders (phase A, shade table);
    # the rank-3 ``e_coef`` below is the same values as a lazy stack.
    e9 = jnp.stack(e0s + e1s + e2s, axis=1)                          # (T,9)
    e_coef = e9.reshape(t, 3, 3)
    top_left = jnp.stack(
        [(es[1] > 0) | ((es[1] == 0) & (es[0] > 0))
         for es in (e0s, e1s, e2s)], axis=1)                         # (T,3)

    # Sub-epsilon screen-area slivers (collinear verts): their edge functions
    # are ~0 along an entire line, so exact float zeros + the top-left rule
    # would cover pixels far outside the hull (and outside the tile binner's
    # bbox). A zero-area triangle covers no pixel centers — cull it, like any
    # hardware rasterizer. w-crossing triangles keep their validity (screen
    # coords are meaningless pre-clip there).
    w3 = (v0c[2], v1c[2], v2c[2])
    wmin = jnp.minimum(jnp.minimum(w3[0], w3[1]), w3[2])
    sw = tuple(jnp.where(jnp.abs(wi) < 1e-6, 1e-6, wi) for wi in w3)
    sx = (v0c[0] / sw[0], v1c[0] / sw[1], v2c[0] / sw[2])
    sy = (v0c[1] / sw[0], v1c[1] / sw[1], v2c[1] / sw[2])
    area2 = jnp.abs((sx[1] - sx[0]) * (sy[2] - sy[0])
                    - (sx[2] - sx[0]) * (sy[1] - sy[0]))
    sliver = (wmin > 1e-6) & (area2 < 1e-6)

    tvalid = valid & ~degenerate & keep & ~sliver
    if clip_rect is None:
        big = 1.0e9
        clip_rect = jnp.tile(jnp.array([[-big, -big, big, big]], jnp.float32),
                             (t, 1))
    d3 = planar.get("clipd") if planar is not None else None
    if d3 is None and clipd is not None and clipd.shape[-1] > 0:
        d3 = (clipd[:, 0], clipd[:, 1], clipd[:, 2])
    if d3 is None:
        dplane9 = jnp.zeros((t, 0), jnp.float32)
        dplane = jnp.zeros((t, 0, 3), jnp.float32)
    else:
        # (T,P,3): affine screen-space coefficients of sum_i e_i(p) * d_i
        # per plane (signed e's — consistent with the signed esum in cov).
        n_planes = d3[0].shape[1]
        cols = []
        for p in range(n_planes):
            for k in range(3):
                cols.append(e0s[k] * d3[0][:, p] + e1s[k] * d3[1][:, p]
                            + e2s[k] * d3[2][:, p])
        dplane9 = jnp.stack(cols, axis=1)                   # (T, 3P) p-major
        dplane = dplane9.reshape(t, n_planes, 3)
    zout = jnp.stack(z3, axis=1) if planar is not None else z
    return dict(e_coef=e_coef, e9=e9, top_left=top_left, zplane=zplane,
                esum_plane=esum_plane, s=s, det=det, inv_det=inv_det,
                inv_det_s=inv_det_s, z=zout, valid=tvalid,
                clip_rect=clip_rect, dplane=dplane, dplane9=dplane9)


@functools.partial(jax.jit, static_argnames=("height", "width", "chunk"))
def depth_reduce(setup, defer_tri, clear_z, viewport, height: int, width: int,
                 chunk: int = 64, row0=0.0):
    """Argmin-reduce over deferred triangles.

    ``row0``: global row offset of this raster's first pixel row (framebuffer
    band sharding, parallel/tile_shard.py). Pixels evaluate at their GLOBAL
    screen coordinates — an integer offset on the pixel iota is exact in
    f32, so a band's pixels are BIT-IDENTICAL to the same rows of an
    unbanded render (a viewport shift would re-round every edge
    coefficient).

    Returns (best_id (H,W) int32 [-1 = background], best_depth (H,W) f32).
    """
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5 + row0,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    scissor = (
        (px >= viewport[0]) & (px < viewport[0] + viewport[2])
        & (py >= viewport[1]) & (py < viewport[1] + viewport[3])
    )

    t = setup["e_coef"].shape[0]
    # Cap the round count: each lax.scan iteration is a separately
    # dispatched program on TPU (~ms overhead each); widen chunks so small
    # scenes run in <= 8 fused rounds instead of T/64 dispatches.
    chunk = max(chunk, -(-t // 8))
    nchunks = (t + chunk - 1) // chunk
    pad = nchunks * chunk - t

    def prep(a, fill=0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
        return a.reshape((nchunks, chunk) + a.shape[1:])

    e_coef = prep(setup["e_coef"])
    top_left = prep(setup["top_left"])
    zvert = prep(setup["z"])
    inv_det_s = prep(setup["inv_det_s"])
    esum_plane = prep(setup["esum_plane"])
    s_sign = prep(setup["s"])
    tvalid = prep(setup["valid"] & defer_tri, False)
    tri_ids = prep(jnp.arange(t, dtype=jnp.int32), -1)
    trect = prep(setup["clip_rect"])
    dplane_t = setup.get("dplane", jnp.zeros((t, 0, 3), jnp.float32))
    dplane = prep(dplane_t)
    n_planes = dplane_t.shape[1]

    init_depth = jnp.broadcast_to(jnp.asarray(clear_z, jnp.float32), (height, width))
    init_id = jnp.full((height, width), -1, jnp.int32)

    big = jnp.float32(3.0e38)

    def body(carry, xs):
        best_d, best_i = carry
        ec, tl, zv, ivs, ep, ss, tv, ids, rect, dp = xs  # leading dim = chunk C

        def plane(coef):                       # coef (C,3) -> (C,H,W)
            return (coef[:, 0, None, None] * px + coef[:, 1, None, None] * py
                    + coef[:, 2, None, None])

        e0 = plane(ec[:, 0])
        e1 = plane(ec[:, 1])
        e2 = plane(ec[:, 2])
        cov = (
            ((e0 > 0) | ((e0 == 0) & tl[:, 0, None, None]))
            & ((e1 > 0) | ((e1 == 0) & tl[:, 1, None, None]))
            & ((e2 > 0) | ((e2 == 0) & tl[:, 2, None, None]))
        )
        esum = plane(ep) * ss[:, None, None]
        # Per-pixel depth with EXACTLY the ordered pass's arithmetic
        # (bit-equality on shared edges keeps LESSEQUAL multi-pass draws
        # like material channels working).
        depth = (e0 * zv[:, 0, None, None] + e1 * zv[:, 1, None, None]
                 + e2 * zv[:, 2, None, None]) * ivs[:, None, None]
        cov &= ((esum > 0) & (depth >= 0.0) & (depth <= 1.0)
                & tv[:, None, None] & scissor[None])
        # Per-triangle scissor (Place viewport clips).
        cov &= ((px[None] >= rect[:, 0, None, None])
                & (py[None] >= rect[:, 1, None, None])
                & (px[None] < rect[:, 2, None, None])
                & (py[None] < rect[:, 3, None, None]))
        # User clip planes: per-pixel half-space keep test (see
        # triangle_setup's dplane derivation). Unrolled over the static
        # plane count — zero planes costs nothing.
        for p in range(n_planes):
            cov &= plane(dp[:, p]) >= 0
        dm = jnp.where(cov, depth, big)
        # Within-chunk argmin; exact-depth ties -> later draw id wins.
        dmin = jnp.min(dm, axis=0)                                  # (H,W)
        idwin = jnp.max(jnp.where(dm == dmin[None], ids[:, None, None], -1), axis=0)
        # Merge with carry (LESSEQUAL semantics: equal depth -> later wins).
        better = (idwin >= 0) & ((dmin < best_d) | ((dmin == best_d) & (idwin > best_i)))
        best_d = jnp.where(better, dmin, best_d)
        best_i = jnp.where(better, idwin, best_i)
        return (best_d, best_i), None

    xs = (e_coef, top_left, zvert, inv_det_s, esum_plane, s_sign, tvalid,
          tri_ids, trect, dplane)
    carry = (init_depth, init_id)
    for k in range(nchunks):        # <= 8 unrolled fused rounds (see above)
        carry, _ = body(carry, tuple(a[k] for a in xs))
    best_d, best_i = carry
    return best_i, best_d


def _address_pp(coord, fsize, mode):
    """Per-pixel texel addressing (mode is a per-pixel int array)."""
    wrap = jnp.mod(coord, fsize)
    period = jnp.mod(coord, 2.0 * fsize)
    mirror = jnp.where(period < fsize, period, 2.0 * fsize - 1e-4 - period)
    mirror_once = jnp.clip(jnp.abs(coord), 0.0, fsize - 1e-4)
    clamp = jnp.clip(coord, 0.0, fsize - 1e-4)
    return jnp.select(
        [mode == VXTEXTURE_ADDRESS.WRAP, mode == VXTEXTURE_ADDRESS.MIRROR,
         mode == VXTEXTURE_ADDRESS.MIRRORONCE],
        [wrap, mirror, mirror_once], default=clamp)


def _tex_params(tex_hw, tid):
    """Per-element texture parameters from the (NT, 2..5) tex_hw table.

    tex_hw column layouts (static): 2 = per-texture planes; 3 = planes +
    mip column; 4 = packed ATLAS (h, w, off_y, off_x); 5 = atlas + mips
    (h, w, levels, off_y, off_x). See CKRenderContext._refresh_textures.
    Returns dict of arrays shaped like ``tid`` — precomputable per TRIANGLE
    and packed into the shade-row table so the per-pixel path pays zero
    tex_hw gathers (gather cost is per-row; see docs/PERFORMANCE.md)."""
    tid_c = jnp.clip(tid, 0, tex_hw.shape[0] - 1)
    h0 = tex_hw[tid_c, 0].astype(jnp.float32)
    w0 = tex_hw[tid_c, 1].astype(jnp.float32)
    ncols = tex_hw.shape[1]
    has_mips = ncols in (3, 5)
    is_atlas = ncols >= 4
    n_levels = (tex_hw[tid_c, 2] if has_mips
                else jnp.ones_like(tid_c)).astype(jnp.float32)
    if is_atlas:
        atl_y = tex_hw[tid_c, ncols - 2].astype(jnp.float32)
        atl_x = tex_hw[tid_c, ncols - 1].astype(jnp.float32)
        plane = jnp.zeros_like(tid_c).astype(jnp.float32)
        base_tw = w0           # per-texture mip column = its own base width
    else:
        atl_y = jnp.zeros_like(h0)
        atl_x = jnp.zeros_like(h0)
        plane = tid_c.astype(jnp.float32)
        base_tw = jnp.zeros_like(h0)   # filled statically by the core
    return dict(h0=h0, w0=w0, n_levels=n_levels, atl_y=atl_y, atl_x=atl_x,
                plane=plane, base_tw=base_tw)


_TEX_PARAM_KEYS = ("h0", "w0", "n_levels", "atl_y", "atl_x", "plane",
                   "base_tw")


def _shade_state_rows(state_i, state_f, tex_hw):
    """(S, 22) packed per-state shade columns: the 8 si + 7 sf columns the
    fixed-function shade reads, plus the 7 per-texture sampling params —
    built on the TINY state table so the per-triangle stage pays ONE row
    gather instead of three (gather cost is per row; docs/PERFORMANCE.md)."""
    from .types import SF_CONST_R, SI_COLORWRITE, SI_TEXGEN

    si_cols = (SI_TEX, SI_TEXADDR, SI_TEXFILTER, SI_TEXBLEND, SI_FOG,
               SI_PERSPECTIVE, SI_TEXGEN, SI_COLORWRITE)
    sf_cols = (SF_BORDER_R, SF_BORDER_R + 1, SF_BORDER_R + 2,
               SF_BORDER_R + 3, SF_CONST_R, SF_CONST_R + 1, SF_CONST_R + 2)
    prm = _tex_params(tex_hw, state_i[:, SI_TEX])
    return jnp.concatenate([
        state_i[:, list(si_cols)].astype(jnp.float32),
        state_f[:, list(sf_cols)],
        jnp.stack([prm[k] for k in _TEX_PARAM_KEYS], axis=-1),
    ], axis=1)


def sample_texture_pp(tex_planes, tex_hw, tid, u, v, mode, filt, border_rgba,
                      lod=None):
    """Per-pixel texture sampling with per-pixel texture ids + optional mips.

    tex_planes (NT,4,TH,AW) — AW may include the mip atlas (level L at cols
    [TW, TW + w>>L), rows [h - (h >> (L-1)), ...) of each texture's own h/w;
    see CKRenderContext._refresh_textures). tex_hw (NT,2|3): (h, w[, levels]).
    tid/u/v/mode/filt: (H,W) arrays; lod: (H,W) f32 or None (level 0).
    Returns 4 (H,W) planes.
    """
    prm = _tex_params(tex_hw, tid)
    has_mips = tex_hw.shape[1] in (3, 5)
    return _sample_texture_core(tex_planes, has_mips, prm, u, v, mode, filt,
                                border_rgba, lod)


def _sample_texture_core(tex_planes, has_mips, prm, u, v, mode, filt,
                         border_rgba, lod=None, profile=None, quad_flat=None):
    """Sampling core over precomputed per-element texture params (see
    :func:`_tex_params`).

    ``profile``: optional STATIC (any_nearest, any_mip[, quad_ok]) sampler
    profile derived from the frame's state table. Texel fetches are the
    dominant per-pixel gather cost; when no state uses a nearest filter the
    nearest fetch (1 tap/level) is skipped, and when no state uses a mip
    filter the second mip level is skipped. Conservative when None.

    ``quad_flat``: optional (NT*TH*TAW, 16) quad-texel table — each row
    holds the 2x2 texel block [c00, c10, c01, c11] with +1 neighbors baked
    per the texture's addressing mode (manager._bake_tex_quads). When the
    static profile asserts quad_ok, the bilinear fetch is ONE row gather
    instead of four (per-pixel gathers cost ~8 ns/row on this TPU)."""
    any_nearest = profile is None or bool(profile[0])
    any_mip = profile is None or bool(profile[1])
    use_quad = (quad_flat is not None and profile is not None
                and len(profile) > 2 and bool(profile[2]))
    nt, _, th, taw = tex_planes.shape
    flat = tex_planes.transpose(0, 2, 3, 1).reshape(nt * th * taw, 4)
    h0 = prm["h0"]
    w0 = prm["w0"]
    n_levels = prm["n_levels"].astype(jnp.int32)
    atl_y = prm["atl_y"]
    atl_x = prm["atl_x"]
    plane = prm["plane"].astype(jnp.int32)
    # non-atlas entries signal base_tw=0: global mip column = max base width
    glob_col = jnp.float32((taw * 2) // 3 if has_mips else 0.0)
    base_tw = jnp.where(prm["base_tw"] > 0, prm["base_tw"], glob_col)
    border = mode == VXTEXTURE_ADDRESS.BORDER

    linear = (
        (filt == VXTEXTURE_FILTER.LINEAR)
        | (filt == VXTEXTURE_FILTER.LINEARMIPNEAREST)
        | (filt == VXTEXTURE_FILTER.LINEARMIPLINEAR)
        | (filt == VXTEXTURE_FILTER.ANISOTROPIC)
    )

    def sample_level(level):
        """level: (H,W) int32. Returns list of 4 (H,W) planes."""
        lf = level.astype(jnp.float32)
        scale = jnp.exp2(-lf)
        w = jnp.maximum(jnp.floor(w0 * scale), 1.0)
        h = jnp.maximum(jnp.floor(h0 * scale), 1.0)
        x_off = jnp.where(level == 0, 0.0, base_tw) + atl_x
        y_off = jnp.where(level <= 1, 0.0,
                          h0 - jnp.floor(h0 * jnp.exp2(-(lf - 1.0)))) + atl_y
        tu = u * w
        tv = v * h

        def fetch(cu, cv):
            iu = jnp.clip(_address_pp(cu, w, mode), 0, w - 1) + x_off
            iv = jnp.clip(_address_pp(cv, h, mode), 0, h - 1) + y_off
            idx = (plane * (th * taw) + iv.astype(jnp.int32) * taw
                   + iu.astype(jnp.int32))
            texel = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                idx.shape + (4,)).astype(jnp.float32)   # bf16 stacks upcast
            return [texel[..., c] for c in range(4)]

        fu = tu - 0.5
        fv = tv - 0.5
        u0_ = jnp.floor(fu)
        v0_ = jnp.floor(fv)
        du = fu - u0_
        dv = fv - v0_
        if use_quad:
            # ONE quad-row gather: the 2x2 block with baked +1 neighbors.
            iu = jnp.clip(_address_pp(u0_, w, mode), 0, w - 1) + x_off
            iv = jnp.clip(_address_pp(v0_, h, mode), 0, h - 1) + y_off
            idx = (plane * (th * taw) + iv.astype(jnp.int32) * taw
                   + iu.astype(jnp.int32))
            q = jnp.take(quad_flat, idx.reshape(-1), axis=0).reshape(
                idx.shape + (16,)).astype(jnp.float32)
            # Clamp-family modes send a below-range base and its +1 neighbor
            # to the SAME edge texel; the baked neighbor is the interior one,
            # so zero the fraction there (wrap keeps it — its baked neighbor
            # IS the wrapped tap).
            wrapm = mode == VXTEXTURE_ADDRESS.WRAP
            du_e = jnp.where(~wrapm & (u0_ < 0), 0.0, du)
            dv_e = jnp.where(~wrapm & (v0_ < 0), 0.0, dv)
            lin = [q[..., c] * (1 - du_e) * (1 - dv_e)
                   + q[..., 4 + c] * du_e * (1 - dv_e)
                   + q[..., 8 + c] * (1 - du_e) * dv_e
                   + q[..., 12 + c] * du_e * dv_e for c in range(4)]
        else:
            c00 = fetch(u0_, v0_)
            c10 = fetch(u0_ + 1.0, v0_)
            c01 = fetch(u0_, v0_ + 1.0)
            c11 = fetch(u0_ + 1.0, v0_ + 1.0)
            lin = [c00[c] * (1 - du) * (1 - dv) + c10[c] * du * (1 - dv)
                   + c01[c] * (1 - du) * dv + c11[c] * du * dv
                   for c in range(4)]
        if any_nearest:
            near = fetch(tu, tv)
            out = [jnp.where(linear, lin[c], near[c]) for c in range(4)]
        else:
            out = lin
        oob = (tu < 0) | (tu >= w) | (tv < 0) | (tv >= h)
        return [jnp.where(border & oob, border_rgba[c], out[c])
                for c in range(4)]

    if lod is None or not has_mips or not any_mip:
        return sample_level(jnp.zeros_like(plane))

    mip_near = ((filt == VXTEXTURE_FILTER.MIPNEAREST)
                | (filt == VXTEXTURE_FILTER.LINEARMIPNEAREST))
    mip_lin = ((filt == VXTEXTURE_FILTER.MIPLINEAR)
               | (filt == VXTEXTURE_FILTER.LINEARMIPLINEAR)
               | (filt == VXTEXTURE_FILTER.ANISOTROPIC))
    use_mip = mip_near | mip_lin
    lod_c = jnp.clip(jnp.where(use_mip, lod, 0.0), 0.0,
                     (n_levels - 1).astype(jnp.float32))
    l0 = jnp.floor(lod_c).astype(jnp.int32)
    frac = lod_c - l0.astype(jnp.float32)
    l0 = jnp.where(mip_near, jnp.round(lod_c).astype(jnp.int32), l0)
    l1 = jnp.clip(l0 + 1, 0, n_levels - 1)
    s0 = sample_level(l0)
    s1 = sample_level(l1)
    tri = mip_lin
    return [jnp.where(tri, s0[c] * (1 - frac) + s1[c] * frac, s0[c])
            for c in range(4)]


def tex_blend_pp(mode, tex, diff, const=None):
    """Per-pixel texture-stage blend; mode (H,W) int; tex/diff lists of
    planes; const: optional 3 planes of the per-draw constant color
    (TEXTUREFACTOR) for TEXBLEND_DOT3FACTOR (the DP3 effect)."""
    from .types import TEXBLEND_DOT3FACTOR

    tr, ta = tex[:3], tex[3]
    dr, da = diff[:3], diff[3]
    cr = const if const is not None else dr
    dot = ((tr[0] - 0.5) * (dr[0] - 0.5) + (tr[1] - 0.5) * (dr[1] - 0.5)
           + (tr[2] - 0.5) * (dr[2] - 0.5)) * 4.0
    dotc = jnp.clip(((tr[0] - 0.5) * (cr[0] - 0.5)
                     + (tr[1] - 0.5) * (cr[1] - 0.5)
                     + (tr[2] - 0.5) * (cr[2] - 0.5)) * 4.0, 0.0, 1.0)
    out = []
    for c in range(3):
        out.append(jnp.select(
            [(mode == VXTEXTUREBLEND.DECAL) | (mode == VXTEXTUREBLEND.COPY)
             | (mode == VXTEXTUREBLEND.DECALMASK),
             (mode == VXTEXTUREBLEND.MODULATE) | (mode == VXTEXTUREBLEND.MODULATEALPHA)
             | (mode == VXTEXTUREBLEND.MODULATEMASK),
             mode == VXTEXTUREBLEND.DECALALPHA,
             mode == VXTEXTUREBLEND.ADD,
             mode == VXTEXTUREBLEND.DOTPRODUCT3,
             mode == TEXBLEND_DOT3FACTOR,
             mode == VXTEXTUREBLEND.MAX],
            [tr[c], tr[c] * dr[c], dr[c] * (1 - ta) + tr[c] * ta, dr[c] + tr[c],
             dot, dotc, jnp.maximum(tr[c], dr[c])],
            default=dr[c]))
    alpha = jnp.select(
        [(mode == VXTEXTUREBLEND.DECAL) | (mode == VXTEXTUREBLEND.COPY)
         | (mode == VXTEXTUREBLEND.DECALMASK),
         (mode == VXTEXTUREBLEND.MODULATE) | (mode == VXTEXTUREBLEND.MODULATEALPHA)
         | (mode == VXTEXTUREBLEND.MODULATEMASK)],
        [ta, ta * da], default=da)
    out.append(alpha)
    return out


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "pixel_shader",
                                    "sampler_profile"))
def shade_deferred(best_id, batch_xyw, batch_z, batch_color, batch_spec,
                   batch_uv, batch_fog, batch_state, state_i, state_f,
                   tex_planes, tex_hw, fog_color, clear_fb,
                   height: int, width: int, batch_refl=None,
                   pixel_shader=None, sampler_profile=None, tex_quad=None,
                   row0=0.0):
    """One shading evaluation per pixel on the winning triangle.

    Fixed-function frames take :func:`_shade_deferred_fast`: every
    per-triangle quantity the pixel needs (edge planes, corner attributes,
    the few state columns read, texture geometry) packs into ONE wide row
    so the per-pixel cost is a single row gather + texture taps — gather
    cost on this TPU is per ROW, nearly independent of width (see
    docs/PERFORMANCE.md), and the old path paid ~13 narrow gathers/pixel.

    ``pixel_shader``: optional traced JAX fn replacing the fixed-function
    texture-blend stage — the TPU analogue of the reference's pixel shaders
    (CKDX9RasterizerContext::CreatePixelShader/SetPixelShader,
    /root/reference/src/CKRasterizer/CKDX9Rasterizer/CKDX9RasterizerContext
    .cpp:1445-1553). Receives a dict of per-pixel arrays — ``color``
    (...,4) interpolated lit vertex color, ``texel`` (...,4) sampled
    texture color (white when untextured), ``uv`` (...,2), ``xy`` (...,2)
    screen position, ``si``/``sf`` (...,NUM_SI/NUM_SF) render-state rows —
    and returns the (...,4) stage output. Specular add, fog, and alpha
    blending remain fixed-function after it (D3D9 semantics). Shader frames
    keep the reference per-pixel-gather path (full state rows per pixel).

    Returns (4,H,W) fb planes (background pixels keep clear_fb).
    """
    if pixel_shader is None:
        return _shade_deferred_fast(
            best_id, batch_xyw, batch_color, batch_spec, batch_uv,
            batch_fog, batch_state, state_i, state_f, tex_planes, tex_hw,
            fog_color, clear_fb, height, width, batch_refl=batch_refl,
            sampler_profile=sampler_profile, tex_quad=tex_quad, row0=row0)
    return _shade_deferred_ps(
        best_id, batch_xyw, batch_z, batch_color, batch_spec, batch_uv,
        batch_fog, batch_state, state_i, state_f, tex_planes, tex_hw,
        fog_color, clear_fb, height, width, batch_refl=batch_refl,
        pixel_shader=pixel_shader, row0=row0)


# Shade row-table column layout (shared by the per-pixel gather path here
# and the Pallas in-kernel one-hot fetch, raster/pallas_tiled.py): everything
# one pixel needs to shade its winning triangle, in ONE wide f32 row.
SH_EC = slice(0, 9)      # edge-plane coefficients (adjoint rows; any
                         # consistent sign — shade uses ratios only)
SH_WS = slice(9, 12)     # vertex w's
SH_IVD = 12              # inverse determinant (same sign convention as EC)
SH_COL = slice(13, 25)   # corner colors (3 x RGBA)
SH_SPC = slice(25, 34)   # corner speculars (3 x RGB)
SH_UV = slice(34, 40)    # corner UVs (3 x 2)
SH_FOG = slice(40, 43)   # corner fog factors
SH_SI = 43               # 8 int state cols, order = _SH_SI_COLS
SH_SF = 51               # 7 f32 state cols, order = _SH_SF_COLS
SH_TP = 58               # 7 texture-params cols, order = _TEX_PARAM_KEYS
SH_RFL = slice(65, 74)   # corner world reflection vectors (cube env only)
SH_NCOL = 65             # without refl; 74 with


def _sh_cols():
    from .types import SF_CONST_R, SI_COLORWRITE, SI_TEXGEN

    si_cols = (SI_TEX, SI_TEXADDR, SI_TEXFILTER, SI_TEXBLEND, SI_FOG,
               SI_PERSPECTIVE, SI_TEXGEN, SI_COLORWRITE)
    sf_cols = (SF_BORDER_R, SF_BORDER_R + 1, SF_BORDER_R + 2,
               SF_BORDER_R + 3, SF_CONST_R, SF_CONST_R + 1, SF_CONST_R + 2)
    return si_cols, sf_cols


def shade_row_table(batch_xyw, batch_color, batch_spec, batch_uv, batch_fog,
                    batch_state, state_i, state_f, tex_hw, batch_refl=None,
                    e_coef=None, inv_det_s=None):
    """(T, SH_NCOL[+9]) packed shade rows (dense build, one wide row).

    ``e_coef``/``inv_det_s``: optional SIGNED edge coefficients + inverse
    determinant from triangle_setup — the shade math only uses ratios, so
    the signed pair from the solve works identically and saves recomputing
    the cross products."""
    t = batch_xyw.shape[0]
    has_refl = batch_refl is not None and batch_refl.shape[-1] > 0

    if e_coef is not None:
        ec9 = e_coef.reshape(t, 9)
        ivd = inv_det_s[:, None]
    else:
        v0, v1, v2 = batch_xyw[:, 0], batch_xyw[:, 1], batch_xyw[:, 2]
        adj0 = jnp.cross(v1, v2)
        adj1 = jnp.cross(v2, v0)
        adj2 = jnp.cross(v0, v1)
        det = jnp.sum(v0 * adj0, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        ec9 = jnp.concatenate([adj0, adj1, adj2], axis=1)
        ivd = inv_det[:, None]

    # One-hot matmul join: a plain take here is a 527k-row x 22-col gather
    # (~8 ms at Ballance scale); the state bank is tiny, so the MXU does it.
    st_t = take_small(_shade_state_rows(state_i, state_f, tex_hw),
                      batch_state)                                 # (T,22)
    cols = [
        ec9,
        batch_xyw[..., 2],
        ivd,
        batch_color.reshape(t, 12),
        batch_spec.reshape(t, 9),
        batch_uv.reshape(t, 6),
        batch_fog.reshape(t, 3),
        st_t,
    ]
    if has_refl:
        cols.append(batch_refl.reshape(t, 9))
    return jnp.concatenate(cols, axis=1)


# Compact shade-row layout: the 22 per-STATE columns (8 si + 7 sf + 7 tex
# params) are replaced by ONE state-index column and re-joined per PIXEL
# from the tiny state bank (expand_rows_compact). The Pallas fused fetch's
# cost is proportional to the fetched width (~0.2 ms per column per frame at
# 1024x768 — docs/PERFORMANCE.md), so shipping 44 instead of 65 columns
# through the kernel saves ~1/3 of the fetch cost for a ~0.3 ms pixel join.
SH_C_STIDX = 43          # after EC(9) WS(3) IVD(1) COL(12) SPC(9) UV(6) FOG(3)
SH_C_NCOL = 44           # without refl; 53 with
SH_C_RFL = slice(44, 53)


def shade_row_table_compact(batch_xyw, batch_color, batch_spec, batch_uv,
                            batch_fog, batch_state, batch_refl=None,
                            e_coef=None, inv_det_s=None, planar=None):
    """(T, 44[+9]) compact shade rows: per-triangle data + state INDEX.

    ``planar``: optional DeviceBatch.planar payload — the column groups are
    then built from the 2D per-corner wide rows by concat (identical values
    and layout; avoids rank-3 (T,3,K) reshapes that pad to (8,128) tiles)."""
    has_refl = batch_refl is not None and batch_refl.shape[-1] > 0
    if planar is not None:
        cp = planar["c"]
        t = cp[0].shape[0]

        def cat3(sl):
            return jnp.concatenate([c[:, sl] for c in cp], axis=1)

        ws3 = jnp.stack([c[:, 2] for c in cp], axis=1)            # (T,3)
        color12 = cat3(slice(4, 8))
        spec9 = cat3(slice(8, 11))
        uv6 = cat3(slice(11, 13))
        fog3 = jnp.stack([c[:, 13] for c in cp], axis=1)
        refl9 = cat3(slice(14, 17)) if has_refl else None
    else:
        t = batch_xyw.shape[0]
        ws3 = batch_xyw[..., 2]
        color12 = batch_color.reshape(t, 12)
        spec9 = batch_spec.reshape(t, 9)
        uv6 = batch_uv.reshape(t, 6)
        fog3 = batch_fog.reshape(t, 3)
        refl9 = batch_refl.reshape(t, 9) if has_refl else None
    if e_coef is not None:
        ec9 = e_coef.reshape(t, 9) if e_coef.ndim == 3 else e_coef
        ivd = inv_det_s[:, None]
    else:
        v0, v1, v2 = batch_xyw[:, 0], batch_xyw[:, 1], batch_xyw[:, 2]
        adj0 = jnp.cross(v1, v2)
        adj1 = jnp.cross(v2, v0)
        adj2 = jnp.cross(v0, v1)
        det = jnp.sum(v0 * adj0, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        ec9 = jnp.concatenate([adj0, adj1, adj2], axis=1)
        ivd = inv_det[:, None]
    cols = [
        ec9,
        ws3,
        ivd,
        color12,
        spec9,
        uv6,
        fog3,
        batch_state.astype(jnp.float32)[:, None],
    ]
    if has_refl:
        cols.append(refl9)
    return jnp.concatenate(cols, axis=1)


# Quantized shade-row layout (the TPU fast-fetch path): the per-pixel row
# gather engine has a width cliff at 16 f32 lanes (118 Mrows/s at W16 vs 68
# at W32+, benchmarks/micro.py probe_cliff), so the fetched row is squeezed
# to <= 16 words for the common case. Colors, speculars and fog quantize to
# u8 packed four-per-word — exactly the reference's D3D9 vertex precision
# (D3DCOLOR DWORDs, saturated per vertex) — and the 9 edge coefficients
# drop out entirely: the Pallas solve kernel exports the WINNER's
# (e0, e1, e2) per pixel instead (pallas_tiled want_eplanes).
SH_Q_UV = slice(0, 6)     # corner UVs (3 x 2), f32
SH_Q_STIDX = 6            # state index, f32 integer
SH_Q_COL = slice(7, 10)   # 3 words: corner RGBA as u8x4 (bitcast)
SH_Q_SPF = slice(10, 13)  # 3 words: corner spec RGB + fog as u8x4
SH_Q_NBASE = 13           # +4 (ws3, ivd) when any non-perspective state;
                          # +9 refl when cube env; padded to a lane multiple


def _q8(v):
    """[0,1] f32 -> u8 as i32 (round-to-nearest, saturated) — the D3D9
    vertex-color DWORD quantization (D3DCOLOR_COLORVALUE semantics)."""
    return jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.int32)


def _pack4(b0, b1, b2, b3):
    return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


def _unpack4(word):
    inv = jnp.float32(1.0 / 255.0)
    return ((word & 0xFF).astype(jnp.float32) * inv,
            ((word >> 8) & 0xFF).astype(jnp.float32) * inv,
            ((word >> 16) & 0xFF).astype(jnp.float32) * inv,
            ((word >> 24) & 0xFF).astype(jnp.float32) * inv)


def _f2i(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def _i2f(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def shade_row_table_quant(batch_xyw, batch_color, batch_spec, batch_uv,
                          batch_fog, batch_state, batch_refl=None,
                          inv_det_s=None, planar=None,
                          want_ws: bool = False):
    """(T, <=28) quantized shade rows (see SH_Q_* layout).

    ``want_ws``: include (ws3, ivd) f32 words — only needed when some render
    state disables perspective-correct interpolation (SI_PERSPECTIVE = 0).

    The table dtype is INT32: f32 columns travel bitcast. Packed u8 bytes
    can alias NaN/denormal f32 bit patterns, which float-typed data
    movement is allowed to canonicalize/flush; integer movement is
    bit-transparent by construction."""
    has_refl = batch_refl is not None and batch_refl.shape[-1] > 0
    if planar is not None:
        cp = planar["c"]
        t = cp[0].shape[0]
        ws3 = [cp[k][:, 2:3] for k in range(3)]                   # 3 x (T,1)
        colk = [cp[k][:, 4:8] for k in range(3)]                  # (T,4) RGBA
        spck = [cp[k][:, 8:11] for k in range(3)]                 # (T,3)
        uv6 = jnp.concatenate([c[:, 11:13] for c in cp], axis=1)  # (T,6)
        fogk = [cp[k][:, 13] for k in range(3)]                   # (T,)
        reflc = ([c[:, 14:17] for c in cp] if has_refl else None)
    else:
        t = batch_xyw.shape[0]
        ws3 = [batch_xyw[:, k, 2:3] for k in range(3)]
        colk = [batch_color[:, k] for k in range(3)]
        spck = [batch_spec[:, k] for k in range(3)]
        uv6 = batch_uv.reshape(t, 6)
        fogk = [batch_fog[:, k] for k in range(3)]
        reflc = ([batch_refl[:, k] for k in range(3)] if has_refl else None)
    cols = [_f2i(uv6), batch_state.astype(jnp.int32)[:, None]]
    for k in range(3):
        c = _q8(colk[k])
        cols.append(_pack4(c[:, 0], c[:, 1], c[:, 2], c[:, 3])[:, None])
    for k in range(3):
        s = _q8(spck[k])
        f = _q8(fogk[k])
        cols.append(_pack4(s[:, 0], s[:, 1], s[:, 2], f)[:, None])
    if want_ws:
        cols += [_f2i(w3) for w3 in ws3]
        cols.append(_f2i(inv_det_s[:, None]))
    if has_refl:
        cols += [_f2i(r) for r in reflc]
    tbl = jnp.concatenate(cols, axis=1)
    pad = (-tbl.shape[1]) % 4
    if tbl.shape[1] <= 16:
        pad = 16 - tbl.shape[1]
    if pad:
        tbl = jnp.pad(tbl, ((0, 0), (0, pad)))
    return tbl


def expand_rows_quant(rows_q, state_i, state_f, tex_hw,
                      want_ws: bool, has_refl: bool):
    """Quantized per-pixel INT32 rows (Wq, H, W) -> the full shade_rows
    layout (65[+9], H, W) with ZERO edge-coefficient planes (shade_rows
    must be called with ``eplanes`` so the EC block is never read)."""
    h, w = rows_q.shape[1], rows_q.shape[2]
    zeros9 = jnp.zeros((9, h, w), jnp.float32)
    off = SH_Q_NBASE
    if want_ws:
        ws_ivd = _i2f(rows_q[off:off + 4])
        off += 4
    else:
        ws_ivd = jnp.zeros((4, h, w), jnp.float32)
    col12, spc9, fog3 = [], [], []
    for k in range(3):
        r, g, b, a = _unpack4(rows_q[SH_Q_COL.start + k])
        col12 += [r, g, b, a]
    for k in range(3):
        r, g, b, f = _unpack4(rows_q[SH_Q_SPF.start + k])
        spc9 += [r, g, b]
        fog3.append(f)
    st = _shade_state_rows(state_i, state_f, tex_hw)          # (S, 22)
    s = st.shape[0]
    stidx = rows_q[SH_Q_STIDX].reshape(-1)
    oh = (jnp.arange(s, dtype=jnp.int32)[:, None] == stidx[None, :])
    st_px = jnp.matmul(st.T, oh.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)   # (22, HW)
    parts = [zeros9, ws_ivd, jnp.stack(col12), jnp.stack(spc9),
             _i2f(rows_q[SH_Q_UV]), jnp.stack(fog3),
             st_px.reshape(22, h, w)]
    if has_refl:
        parts.append(_i2f(rows_q[off:off + 9]))
    return jnp.concatenate(parts, axis=0)


def expand_rows_compact(rows_c, state_i, state_f, tex_hw):
    """Compact per-pixel rows (44[+9], H, W) -> full shade_rows layout
    (65[+9], H, W): join the 22 per-state columns per pixel via a
    channel-major one-hot matmul over the tiny state bank."""
    st = _shade_state_rows(state_i, state_f, tex_hw)          # (S, 22)
    s = st.shape[0]
    h, w = rows_c.shape[1], rows_c.shape[2]
    stidx = rows_c[SH_C_STIDX].astype(jnp.int32).reshape(-1)  # (HW,)
    oh = (jnp.arange(s, dtype=jnp.int32)[:, None] == stidx[None, :])
    # HIGHEST precision: exact (one-hot is bf16-exact; see take_small).
    st_px = jnp.matmul(st.T, oh.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)   # (22, HW)
    return jnp.concatenate([
        rows_c[:SH_C_STIDX],
        st_px.reshape(22, h, w),
        rows_c[SH_C_NCOL:],
    ], axis=0)


def _shade_deferred_fast(best_id, batch_xyw, batch_color, batch_spec,
                         batch_uv, batch_fog, batch_state, state_i, state_f,
                         tex_planes, tex_hw, fog_color, clear_fb,
                         height: int, width: int, batch_refl=None,
                         sampler_profile=None, tex_quad=None, row0=0.0):
    """Packed-row fixed-function deferred shade (see shade_deferred)."""
    t = batch_xyw.shape[0]
    tbl = shade_row_table(batch_xyw, batch_color, batch_spec, batch_uv,
                          batch_fog, batch_state, state_i, state_f, tex_hw,
                          batch_refl=batch_refl)

    # --- ONE wide per-pixel gather ----------------------------------------
    hit = best_id >= 0
    tid = jnp.clip(best_id, 0, t - 1)
    # Transpose the table ONCE (channel-major), fence it, and gather along
    # the row axis so the result lands channel-major (C,H,W) directly.
    # The barrier stops XLA from fusing the concat INTO the gather — fused,
    # the "one wide row gather" decomposes back into a dozen narrow gathers
    # (measured 28 ms vs 12 ms for the single 786k-row gather at 1024x768);
    # gather cost here is per ROW, nearly independent of width.
    tblT = jax.lax.optimization_barrier(tbl.T)
    row = jnp.take(tblT, tid.reshape(-1), axis=1).reshape(
        (tbl.shape[1], height, width))
    return shade_rows(row, hit, tex_planes, tex_hw, fog_color, clear_fb,
                      height, width, sampler_profile=sampler_profile,
                      tex_quad=tex_quad, row0=row0)


def shade_rows(row, hit, tex_planes, tex_hw, fog_color, clear_fb,
               height: int, width: int, sampler_profile=None, tex_quad=None,
               eplanes=None, row0=0.0):
    """Fixed-function shade over per-pixel winner ROWS (C,H,W) in the
    shade_row_table layout — the per-pixel half of the deferred shade,
    shared by the gather path and the Pallas in-kernel fetch path.

    ``eplanes``: optional (e0, e1, e2) per-pixel winner edge values exported
    by the Pallas solve (want_eplanes). When given, the row's EC block is
    never read (the quantized path ships zero planes there) and the
    gradient-based mip LOD is unavailable — callers must be on a no-mip
    sampler profile (frame.py gates this statically)."""
    from ..math.vxmath import oct_encode
    from .types import SF_CONST_R, SI_COLORWRITE, SI_TEXGEN, TEXGEN_CUBE

    has_refl = row.shape[0] > SH_NCOL
    has_mips = tex_hw.shape[1] in (3, 5)
    _EC = SH_EC
    _WS = SH_WS
    _IVD = SH_IVD
    _COL = SH_COL
    _SPC = SH_SPC
    _UV = SH_UV
    _FOG = SH_FOG
    _SI = SH_SI
    _SF = SH_SF
    _TP = SH_TP
    _RFL = SH_RFL
    si_cols, sf_cols = _sh_cols()

    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5 + row0,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    si_pos = {c: i for i, c in enumerate(si_cols)}
    sf_pos = {c: i for i, c in enumerate(sf_cols)}

    def si(c):
        return row[_SI + si_pos[c]]

    def sf(c):
        return row[_SF + sf_pos[c]]

    def plane3(o):
        return row[o] * px + row[o + 1] * py + row[o + 2]

    if eplanes is not None:
        e0, e1, e2 = eplanes
    else:
        e0 = plane3(0)
        e1 = plane3(3)
        e2 = plane3(6)
    esum = e0 + e1 + e2
    persp = si(SI_PERSPECTIVE) != 0
    inv_esum = 1.0 / jnp.where(jnp.abs(esum) < 1e-30, 1e-30, esum)
    ivd = row[_IVD]
    ws0 = row[_WS.start]
    ws1 = row[_WS.start + 1]
    ws2 = row[_WS.start + 2]
    w0 = jnp.where(persp, e0 * inv_esum, e0 * ws0 * ivd)
    w1 = jnp.where(persp, e1 * inv_esum, e1 * ws1 * ivd)
    w2 = jnp.where(persp, e2 * inv_esum, e2 * ws2 * ivd)

    def interp(sl, k):
        """Interpolate k channels stored [v0 x k, v1 x k, v2 x k]; returns a
        list of k (H,W) planes."""
        o = sl.start
        return [row[o + c] * w0 + row[o + k + c] * w1 + row[o + 2 * k + c] * w2
                for c in range(k)]

    colorp = interp(_COL, 4)
    uvil = interp(_UV, 2)
    if has_refl:
        # Per-pixel cube-env UV: oct-encode AFTER interpolating the world
        # reflection vector — seam-free (see jax_backend).
        rl = interp(_RFL, 3)
        r = jnp.stack(rl, axis=-1)
        r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True),
                            1e-12)
        uvc = oct_encode(r)
        is_cube = si(SI_TEXGEN) == TEXGEN_CUBE
        uvil = [jnp.where(is_cube, uvc[..., c], uvil[c]) for c in range(2)]
    has_tex = si(SI_TEX) >= 0
    border = [sf(SF_BORDER_R + c) for c in range(4)]

    # Per-pixel mip LOD from screen-space UV gradients (edge functions are
    # affine: slope a per +x, b per +y — all from the packed row). Skipped
    # entirely when the static sampler profile says no state uses a mip
    # filter this frame (the state-bucket idea at the jit-signature level,
    # SURVEY §7; profile changes recompile, mirroring the reference's
    # render-state cache).
    lod = None
    if tex_hw.shape[1] > 2 and (sampler_profile is not None
                                and sampler_profile[1]) \
            and eplanes is not None and height % 2 == 0 and width % 2 == 0:
        # Quad finite-difference LOD (the quantized fast path carries no
        # edge coefficients): per-2x2-quad UV derivatives, shared by the
        # quad's four pixels — EXACTLY D3D9's hardware derivative model
        # (the analytic per-pixel gradient of the slow path is the more
        # precise deviation). Quads straddling triangle boundaries read a
        # neighbor's UV, like real hardware.
        def quad_dd(p):
            ddx = p[:, 1::2] - p[:, 0::2]                 # (H, W/2)
            ddx = jnp.repeat(ddx, 2, axis=1)
            ddy = p[1::2, :] - p[0::2, :]                 # (H/2, W)
            ddy = jnp.repeat(ddy, 2, axis=0)
            return ddx, ddy

        tw_, th_ = row[_TP + 1], row[_TP + 0]
        dux, duy = quad_dd(uvil[0])
        dvx, dvy = quad_dd(uvil[1])
        rho = jnp.maximum(
            jnp.sqrt((dux * tw_) ** 2 + (dvx * th_) ** 2),
            jnp.sqrt((duy * tw_) ** 2 + (dvy * th_) ** 2))
        lod = jnp.log2(jnp.maximum(rho, 1.0))
    elif tex_hw.shape[1] > 2 and (sampler_profile is None
                                  or sampler_profile[1]) and eplanes is None:

        def uv_at(de0, de1, de2):
            e0n, e1n, e2n = e0 + de0, e1 + de1, e2 + de2
            esum_n = e0n + e1n + e2n
            inv_n = 1.0 / jnp.where(jnp.abs(esum_n) < 1e-30, 1e-30, esum_n)
            w0n = jnp.where(persp, e0n * inv_n, e0n * ws0 * ivd)
            w1n = jnp.where(persp, e1n * inv_n, e1n * ws1 * ivd)
            w2n = jnp.where(persp, e2n * inv_n, e2n * ws2 * ivd)
            o = _UV.start
            return [row[o + c] * w0n + row[o + 2 + c] * w1n
                    + row[o + 4 + c] * w2n for c in range(2)]

        ux = uv_at(row[0], row[3], row[6])      # +x: edge-plane a coeffs
        uy = uv_at(row[1], row[4], row[7])      # +y: edge-plane b coeffs
        tw_, th_ = row[_TP + 1], row[_TP + 0]
        rho = jnp.maximum(
            jnp.sqrt(((ux[0] - uvil[0]) * tw_) ** 2
                     + ((ux[1] - uvil[1]) * th_) ** 2),
            jnp.sqrt(((uy[0] - uvil[0]) * tw_) ** 2
                     + ((uy[1] - uvil[1]) * th_) ** 2))
        lod = jnp.log2(jnp.maximum(rho, 1.0))

    # Static any-textured gate (sampler_profile[4]): jnp.where masks VALUES,
    # not execution — an untextured frame would still pay the full per-pixel
    # texel gather (~6.6 ms at 1024x768). When the state bank proves no
    # state binds a texture, the sampling stage compiles away entirely.
    any_tex = (sampler_profile is None or len(sampler_profile) < 5
               or bool(sampler_profile[4]))
    if any_tex:
        prm = {k: row[_TP + i] for i, k in enumerate(_TEX_PARAM_KEYS)}
        texel = _sample_texture_core(
            tex_planes, has_mips, prm, uvil[0], uvil[1],
            si(SI_TEXADDR).astype(jnp.int32),
            si(SI_TEXFILTER).astype(jnp.int32),
            border, lod=lod, profile=sampler_profile, quad_flat=tex_quad)
        const = [sf(SF_CONST_R + c) for c in range(3)]
        blended = tex_blend_pp(si(SI_TEXBLEND).astype(jnp.int32), texel,
                               colorp, const)
        colorp = [jnp.where(has_tex, blended[c], colorp[c])
                  for c in range(4)]

    spec = interp(_SPC, 3)
    for c in range(3):
        colorp[c] = colorp[c] + spec[c]

    fog_on = si(SI_FOG) != 0
    fogf = jnp.clip(interp(_FOG, 1)[0], 0.0, 1.0)
    for c in range(3):
        colorp[c] = jnp.where(
            fog_on, colorp[c] * fogf + fog_color[c] * (1.0 - fogf), colorp[c])
    colorp = [jnp.clip(c, 0.0, 1.0) for c in colorp]

    # Z-only draws occlude but leave the background color
    # (VX_MOVEABLE_ZBUFONLY, reference src/CKMesh.cpp:3938-3974).
    hit &= si(SI_COLORWRITE) != 0
    fb = jnp.stack([jnp.where(hit, colorp[c], clear_fb[c]) for c in range(4)])
    return fb


def _shade_deferred_ps(best_id, batch_xyw, batch_z, batch_color, batch_spec,
                       batch_uv, batch_fog, batch_state, state_i, state_f,
                       tex_planes, tex_hw, fog_color, clear_fb,
                       height: int, width: int, batch_refl=None,
                       pixel_shader=None, row0=0.0):
    """Reference per-pixel-gather shade (pixel-shader frames only)."""
    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5 + row0,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    hit = best_id >= 0
    tid = jnp.clip(best_id, 0, batch_xyw.shape[0] - 1)

    # Gather winner attributes per pixel.
    xyw = jnp.take(batch_xyw, tid, axis=0)       # (H,W,3,3)
    v0, v1, v2 = xyw[..., 0, :], xyw[..., 1, :], xyw[..., 2, :]
    adj0 = jnp.cross(v1, v2)
    adj1 = jnp.cross(v2, v0)
    adj2 = jnp.cross(v0, v1)
    det = jnp.sum(v0 * adj0, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)

    p1 = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)   # (H,W,3)
    e0 = jnp.sum(adj0 * p1, -1)
    e1 = jnp.sum(adj1 * p1, -1)
    e2 = jnp.sum(adj2 * p1, -1)
    esum = e0 + e1 + e2

    sidx = jnp.take(batch_state, tid, axis=0)               # (H,W) state row
    from .types import SF_CONST_R, SI_COLORWRITE, SI_TEXGEN

    if pixel_shader is None:
        # Fixed-function shading reads only a few state columns: slice the
        # (tiny) state tables BEFORE the per-pixel gather — the full-row
        # gather moved ~45 MB/frame at 1024x768 for columns never read.
        si_cols = (SI_TEX, SI_TEXADDR, SI_TEXFILTER, SI_TEXBLEND, SI_FOG,
                   SI_PERSPECTIVE, SI_TEXGEN, SI_COLORWRITE)
        sf_cols = (SF_BORDER_R, SF_BORDER_R + 1, SF_BORDER_R + 2,
                   SF_BORDER_R + 3,
                   SF_CONST_R, SF_CONST_R + 1, SF_CONST_R + 2)
    else:
        # The pixel-shader API receives full si/sf rows (see docstring).
        si_cols = tuple(range(state_i.shape[1]))
        sf_cols = tuple(range(state_f.shape[1]))
    si_pos = {c: i for i, c in enumerate(si_cols)}
    sf_pos = {c: i for i, c in enumerate(sf_cols)}
    si_all = jnp.take(state_i[:, list(si_cols)], sidx, axis=0)
    sf_all = jnp.take(state_f[:, list(sf_cols)], sidx, axis=0)

    def si(c):
        return si_all[..., si_pos[c]]

    def sf(c):
        return sf_all[..., sf_pos[c]]

    persp = si(SI_PERSPECTIVE) != 0
    inv_esum = 1.0 / jnp.where(jnp.abs(esum) < 1e-30, 1e-30, esum)
    ws = xyw[..., 2]                                       # (H,W,3) vertex w
    w0 = jnp.where(persp, e0 * inv_esum, e0 * ws[..., 0] * inv_det)
    w1 = jnp.where(persp, e1 * inv_esum, e1 * ws[..., 1] * inv_det)
    w2 = jnp.where(persp, e2 * inv_esum, e2 * ws[..., 2] * inv_det)

    def interp3(attr):                                     # attr (T,3,K)
        a = jnp.take(attr, tid, axis=0)                    # (H,W,3,K)
        return (w0[..., None] * a[..., 0, :] + w1[..., None] * a[..., 1, :]
                + w2[..., None] * a[..., 2, :])

    color = interp3(batch_color)                           # (H,W,4)
    colorp = [color[..., c] for c in range(4)]

    has_tex = si(SI_TEX) >= 0
    uvi = interp3(batch_uv)                                # (H,W,2)
    if batch_refl is not None and batch_refl.shape[-1] > 0:
        # Per-pixel cube-env UV (see jax_backend: oct-encode AFTER
        # interpolating the world reflection vector — seam-free).
        from ..math.vxmath import oct_encode
        from .types import TEXGEN_CUBE
        r = interp3(batch_refl)                            # (H,W,3)
        r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True),
                            1e-12)
        uvc = oct_encode(r)
        is_cube = (si(SI_TEXGEN) == TEXGEN_CUBE)[..., None]
        uvi = jnp.where(is_cube, uvc, uvi)
    border = [sf(SF_BORDER_R + c) for c in range(4)]

    # Per-pixel mip LOD from screen-space UV gradients: edge functions are
    # affine (slope a per +x, b per +y), so re-weighting at the neighbor
    # pixels gives exact footprints.
    lod = None
    if tex_hw.shape[1] > 2:
        ws = xyw[..., 2]

        def uv_at(de0, de1, de2):
            e0n, e1n, e2n = e0 + de0, e1 + de1, e2 + de2
            esum_n = e0n + e1n + e2n
            inv_n = 1.0 / jnp.where(jnp.abs(esum_n) < 1e-30, 1e-30, esum_n)
            w0n = jnp.where(persp, e0n * inv_n, e0n * ws[..., 0] * inv_det)
            w1n = jnp.where(persp, e1n * inv_n, e1n * ws[..., 1] * inv_det)
            w2n = jnp.where(persp, e2n * inv_n, e2n * ws[..., 2] * inv_det)
            a = jnp.take(batch_uv, tid, axis=0)
            return (w0n[..., None] * a[..., 0, :] + w1n[..., None] * a[..., 1, :]
                    + w2n[..., None] * a[..., 2, :])

        uv_dx = uv_at(adj0[..., 0], adj1[..., 0], adj2[..., 0]) - uvi
        uv_dy = uv_at(adj0[..., 1], adj1[..., 1], adj2[..., 1]) - uvi
        tidc = jnp.clip(si(SI_TEX), 0, tex_hw.shape[0] - 1)
        tsize = jnp.stack([tex_hw[tidc, 1], tex_hw[tidc, 0]], -1).astype(
            jnp.float32)                                    # (H,W,2) (w,h)
        rho = jnp.maximum(jnp.linalg.norm(uv_dx * tsize, axis=-1),
                          jnp.linalg.norm(uv_dy * tsize, axis=-1))
        lod = jnp.log2(jnp.maximum(rho, 1.0))

    texel = sample_texture_pp(
        tex_planes, tex_hw, si(SI_TEX), uvi[..., 0], uvi[..., 1],
        si(SI_TEXADDR), si(SI_TEXFILTER), border, lod=lod)
    if pixel_shader is not None:
        texel4 = jnp.stack(
            [jnp.where(has_tex, texel[c], 1.0) for c in range(4)], -1)
        out = pixel_shader({
            "color": color, "texel": texel4, "uv": uvi,
            "xy": jnp.stack([px, py], -1), "si": si_all, "sf": sf_all})
        colorp = [out[..., c] for c in range(4)]
    else:
        const = [sf(SF_CONST_R + c) for c in range(3)]
        blended = tex_blend_pp(si(SI_TEXBLEND), texel, colorp, const)
        colorp = [jnp.where(has_tex, blended[c], colorp[c]) for c in range(4)]

    spec = interp3(batch_spec)                             # (H,W,3)
    for c in range(3):
        colorp[c] = colorp[c] + spec[..., c]

    fog_on = si(SI_FOG) != 0
    fogf = jnp.clip(interp3(batch_fog[..., None])[..., 0], 0.0, 1.0)
    for c in range(3):
        colorp[c] = jnp.where(fog_on, colorp[c] * fogf + fog_color[c] * (1.0 - fogf),
                              colorp[c])
    colorp = [jnp.clip(c, 0.0, 1.0) for c in colorp]

    # Z-only draws occlude but leave the background color
    # (VX_MOVEABLE_ZBUFONLY, reference src/CKMesh.cpp:3938-3974).
    hit &= si(SI_COLORWRITE) != 0
    fb = jnp.stack([jnp.where(hit, colorp[c], clear_fb[c]) for c in range(4)])
    return fb
