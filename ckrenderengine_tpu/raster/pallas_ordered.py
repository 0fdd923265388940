"""Pallas TPU kernel: tile-binned ORDERED alpha blending at full rate.

The XLA ordered pass (jax_backend.render_pass_tiled) composites one
triangle per sequential step over every tile's full pixel block — exact,
but a heavy-transparency frame (tens of thousands of stacked alpha
triangles) pays thousands of sequential full-tile composites.

The TPU-native replacement rests on one algebraic fact: every D3D9 blend
that the transparent path uses is AFFINE in the destination color —
``out = a * dst + b`` with (a, b) computed from the source fragment alone
(alpha-over: a = 1-sa, b = src*sa; replace: a = 0, b = src; uncovered:
identity a = 1, b = 0). Affine maps compose associatively, so the
back-to-front blend chain per pixel is an ORDERED product that the solve
kernel's streaming structure evaluates without per-step framebuffer
round-trips: each screen tile streams its (draw-ordered) triangle rows
through VMEM and folds their per-pixel (a, b) coefficients in draw order
into an 8-register carry; the frame then composites once:
``fb' = A * fb + B``.

EXACTNESS ENVELOPE (host-gated, manager ``ordered_kernel_ok``): the kernel
path is only taken when every potentially-ordered render state is
untextured, zwrite-off, and either alpha-blend-off (replace) or
(SRCALPHA, INVSRCALPHA, ADD) — the convex alpha-over case, where the flat
pass's per-step [0,1] clamp is a no-op and the composed result matches the
sequential blend to float rounding. Everything else (textured transparency,
cutouts that write z, exotic blend ops) keeps the exact XLA pass. A dynamic
``bad`` flag (span/slab/pair-cap overflow) likewise falls back via
``lax.cond`` — binning is a perf optimization, never a correctness cap.

Reference behavior reproduced: transparent sort then full-rate raster
(/root/reference/src/CKSceneGraph.cpp:618-752 +
CKDX9RasterizerContext::DrawPrimitive blending).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tiled import _scan_place
from .tiled import _pow2ceil, _screen_bbox
from .types import (
    SF_ALPHAREF, SI_ALPHABLEND, SI_ALPHAFUNC, SI_ALPHATEST, SI_COLORWRITE,
    SI_FOG, SI_PERSPECTIVE, SI_ZFUNC, VXCMP,
)

# Ordered-row column layout (lane-padded to nrow).
_OC_EC = slice(0, 9)        # signed edge coefficients
_OC_Z = slice(9, 12)        # corner clip z
_OC_IVS = 12                # signed inverse determinant
_OC_EP = slice(13, 16)      # esum plane
_OC_SS = 16                 # sign s
_OC_FL = 17                 # top-left bits (1|2|4) + valid bit 8
_OC_RECT = slice(18, 22)    # per-triangle scissor
_OC_COL = slice(22, 34)     # corner RGBA x3 (corner-major)
_OC_SPC = slice(34, 43)     # corner spec RGB x3
_OC_FOG = slice(43, 46)     # corner fog factors
_OC_BITS = 46               # blend_on|fog_on<<1|colorwrite<<2|persp<<3|at<<4
_OC_ZF = 47                 # z compare func
_OC_AF = 48                 # alpha compare func
_OC_AREF = 49               # alpha ref
_OC_WS = slice(50, 53)      # corner w (non-perspective weights)
_OC_ID = 53                 # draw index (exact in f32 below 2^24)
_OC_NCOL = 54               # + 3 per user clip plane


def _compare(func, a, b):
    """D3D compare on (8, npix) with func as an (8, 1) int column — pure
    boolean algebra (Mosaic lowers &/| of i1 masks; jnp.select / boolean
    jnp.where chains do not lower)."""
    known = jnp.zeros_like(func, bool)
    out = jnp.zeros_like(a, bool)
    for code, val in ((VXCMP.LESS, a < b), (VXCMP.EQUAL, a == b),
                      (VXCMP.LESSEQUAL, a <= b), (VXCMP.GREATER, a > b),
                      (VXCMP.NOTEQUAL, a != b),
                      (VXCMP.GREATEREQUAL, a >= b)):
        m = func == code
        known = known | m
        out = out | (m & val)
    known = known | (func == VXCMP.NEVER)
    return out | ~known          # unknown/ALWAYS -> true


def _blend_kernel(starts_ref, counts_ref, vp_ref, initz_ref, rows_hbm,
                  out_ref, rbuf, sems, *, kchunk: int, tile: int,
                  tx_n: int, n_planes: int):
    """One screen tile: stream draw-ordered rows, fold per-pixel affine
    blend coefficients (a RGBA, b RGBA) in order. Carry: 8 x (1, npix)."""
    npix = tile * tile
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    pxl = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    ty = t // tx_n
    tx = t - ty * tx_n
    px = (pxl % tile + tx * tile).astype(jnp.float32) + 0.5
    py = (pxl // tile + ty * tile).astype(jnp.float32) + 0.5
    vx0 = vp_ref[0]
    vy0 = vp_ref[1]
    scissor = ((px >= vx0) & (px < vx0 + vp_ref[2])
               & (py >= vy0) & (py < vy0 + vp_ref[3])
               & (px < vp_ref[4]) & (py < vp_ref[5]))
    fogc = (vp_ref[6], vp_ref[7], vp_ref[8])
    zb0 = initz_ref[0][0:1]                                  # (1, npix)
    zb_bits = jax.lax.bitcast_convert_type(zb0, jnp.int32)

    nchunks = (count + kchunk - 1) // kchunk

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * kchunk, kchunk), :],
            rbuf.at[slot], sems.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def group_ab(r8, live):
        """8 rows -> per-row (a RGBA, b RGBA) on (8, npix) planes."""
        def col(i):
            return r8[:, i:i + 1]

        def icol(i):
            return r8[:, i:i + 1].astype(jnp.int32)

        e0 = col(0) * px + col(1) * py + col(2)
        e1 = col(3) * px + col(4) * py + col(5)
        e2 = col(6) * px + col(7) * py + col(8)
        fl = icol(_OC_FL)
        c0 = (e0 > 0) | (((fl & 1) != 0) & (e0 == 0))
        c1 = (e1 > 0) | (((fl & 2) != 0) & (e1 == 0))
        c2 = (e2 > 0) | (((fl & 4) != 0) & (e2 == 0))
        esum_p = (col(_OC_EP.start) * px + col(_OC_EP.start + 1) * py
                  + col(_OC_EP.start + 2)) * col(_OC_SS)
        depth = (e0 * col(_OC_Z.start) + e1 * col(_OC_Z.start + 1)
                 + e2 * col(_OC_Z.start + 2)) * col(_OC_IVS)
        cov = c0 & c1 & c2 & (esum_p > 0) & (depth >= 0.0) & (depth <= 1.0)
        cov &= ((px >= col(_OC_RECT.start)) & (py >= col(_OC_RECT.start + 1))
                & (px < col(_OC_RECT.start + 2))
                & (py < col(_OC_RECT.start + 3)))
        for p in range(n_planes):
            cp = _OC_NCOL + 3 * p
            cov &= (col(cp) * px + col(cp + 1) * py + col(cp + 2)) >= 0
        cov &= ((fl & 8) != 0) & live & scissor

        # Depth test vs the opaque z-buffer (2-ULP tie window on the
        # equality-inclusive compares — jax_backend.z_compare semantics).
        zf = icol(_OC_ZF)
        dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
        near = jnp.abs(dbits - zb_bits) <= 2
        strict = _compare(zf, depth, zb0)
        eq_incl = ((zf == VXCMP.LESSEQUAL) | (zf == VXCMP.EQUAL)
                   | (zf == VXCMP.GREATEREQUAL))
        cov &= strict | (eq_incl & near)

        # Interpolation weights.
        esum = e0 + e1 + e2
        inv_esum = 1.0 / jnp.where(jnp.abs(esum) < 1e-30, 1e-30, esum)
        bits = icol(_OC_BITS)
        persp = (bits & 8) != 0
        ivs = col(_OC_IVS)
        w0 = jnp.where(persp, e0 * inv_esum, e0 * col(_OC_WS.start) * ivs)
        w1 = jnp.where(persp, e1 * inv_esum,
                       e1 * col(_OC_WS.start + 1) * ivs)
        w2 = jnp.where(persp, e2 * inv_esum,
                       e2 * col(_OC_WS.start + 2) * ivs)

        def interp(o, k):
            return (col(o) * w0 + col(o + k) * w1 + col(o + 2 * k) * w2)

        co = _OC_COL.start
        src = [interp(co + c, 4) for c in range(4)]
        for c in range(3):
            src[c] = src[c] + interp(_OC_SPC.start + c, 3)
        fog_on = (bits & 2) != 0
        fogf = jnp.clip(interp(_OC_FOG.start, 1), 0.0, 1.0)
        for c in range(3):
            src[c] = jnp.where(fog_on, src[c] * fogf + fogc[c] * (1.0 - fogf),
                               src[c])
        src = [jnp.clip(c, 0.0, 1.0) for c in src]
        sa = src[3]

        at_on = (bits & 16) != 0
        at_ok = _compare(icol(_OC_AF), sa, col(_OC_AREF))
        cov &= at_ok | ~at_on
        cov &= (bits & 4) != 0                       # colorwrite
        blend_on = (bits & 1) != 0

        a_s = jnp.where(blend_on, 1.0 - sa, 0.0)
        a4 = [jnp.where(cov, a_s, 1.0) for _ in range(4)]
        b4 = [jnp.where(cov, jnp.where(blend_on, src[c] * sa, src[c]), 0.0)
              for c in range(4)]
        return a4, b4

    def fold_group(carry, a4, b4):
        """Apply the 8 rows of (a4, b4) AFTER the carry, in sublane order."""
        ca, cb = carry
        for k in range(8):
            ca = [a4[c][k:k + 1] * ca[c] for c in range(4)]
            cb = [a4[c][k:k + 1] * cb[c] + b4[c][k:k + 1] for c in range(4)]
        return ca, cb

    def process(slot_lit, c, carry):
        nhere = jnp.clip(count - c * kchunk, 0, kchunk)

        def sg_body(gi, car):
            off = pl.multiple_of(gi * 8, 8)
            r8 = rbuf.at[slot_lit][pl.ds(off, 8), :]
            live = (off + sub8) < nhere
            a4, b4 = group_ab(r8, live)
            return fold_group(car, a4, b4)

        return jax.lax.fori_loop(0, (nhere + 7) // 8, sg_body, carry)

    def pair_body(cp, carry):
        c0 = 2 * cp

        @pl.when(c0 + 1 < nchunks)
        def _():
            get_dma(1, c0 + 1).start()

        get_dma(0, c0).wait()
        carry = process(0, c0, carry)

        @pl.when(c0 + 2 < nchunks)
        def _():
            get_dma(0, c0 + 2).start()

        def odd(car):
            get_dma(1, c0 + 1).wait()
            return process(1, c0 + 1, car)

        return jax.lax.cond(c0 + 1 < nchunks, odd, lambda car: car, carry)

    ident = ([jnp.ones((1, npix), jnp.float32) for _ in range(4)],
             [jnp.zeros((1, npix), jnp.float32) for _ in range(4)])
    a4, b4 = jax.lax.fori_loop(0, (nchunks + 1) // 2, pair_body, ident)
    out_ref[0] = jnp.concatenate(a4 + b4, axis=0)            # (8, npix)


def _ordered_phase_a(obatch_xyw, obatch_z, obatch_valid,
                     obatch_color, obatch_spec, obatch_uv,
                     obatch_fog, obatch_state, obatch_rect,
                     obatch_clipd, state_i, state_f,
                     zb, height: int, width: int, tile: int,
                     windows: tuple, pair_cap: int, kchunk: int):
    """Shared ordered-stream build: triangle setup, draw-order packed rows,
    span-window classification, pair-key sort, per-tile contiguous stream
    ranges, tiled opaque z-buffer, and the overflow ``bad`` flag. Used by
    BOTH ordered kernels (affine blend + layer peel)."""
    from .deferred import take_small, triangle_setup

    t = obatch_xyw.shape[0]
    if t >= 1 << 24:
        # The draw index rides the stream as f32 (_OC_ID), exact only below
        # 2^24; beyond that peel layer ids would silently corrupt. Static
        # shape -> fail loudly at trace time.
        raise ValueError(
            f"ordered batch of {t} triangles exceeds the 2^24 f32 draw-id "
            "range of the tiled ordered kernels")
    ty_n = (height + tile - 1) // tile
    tx_n = (width + tile - 1) // tile
    n_tiles = ty_n * tx_n
    npix = tile * tile

    setup = triangle_setup(obatch_xyw, obatch_z, obatch_state, obatch_valid,
                           state_i, clip_rect=obatch_rect,
                           clipd=obatch_clipd)
    tvalid = setup["valid"]
    n_planes = (obatch_clipd.shape[-1]
                if obatch_clipd is not None and obatch_clipd.ndim == 3 else 0)
    ncol = _OC_NCOL + 3 * n_planes
    nrow = 64 if ncol <= 64 else 128
    assert ncol <= nrow

    # --- packed rows (draw order preserved: row k = draw k) ---------------
    tlf = setup["top_left"]
    flags_t = (tlf[:, 0].astype(jnp.int32) + 2 * tlf[:, 1].astype(jnp.int32)
               + 4 * tlf[:, 2].astype(jnp.int32)
               + 8 * tvalid.astype(jnp.int32)).astype(jnp.float32)
    st_cols = jnp.stack([
        (state_i[:, SI_ALPHABLEND] != 0).astype(jnp.float32)
        + 2 * (state_i[:, SI_FOG] != 0).astype(jnp.float32)
        + 4 * (state_i[:, SI_COLORWRITE] != 0).astype(jnp.float32)
        + 8 * (state_i[:, SI_PERSPECTIVE] != 0).astype(jnp.float32)
        + 16 * (state_i[:, SI_ALPHATEST] != 0).astype(jnp.float32),
        state_i[:, SI_ZFUNC].astype(jnp.float32),
        state_i[:, SI_ALPHAFUNC].astype(jnp.float32),
        state_f[:, SF_ALPHAREF],
    ], axis=1)                                               # (S, 4)
    st_t = take_small(st_cols, obatch_state)                 # (T, 4)
    full_cols = [
        setup.get("e9", setup["e_coef"].reshape(t, 9)),
        setup["z"],
        setup["inv_det_s"][:, None],
        setup["esum_plane"],
        setup["s"][:, None],
        flags_t[:, None],
        setup["clip_rect"],
        obatch_color.reshape(t, 12),
        obatch_spec.reshape(t, 9),
        obatch_fog.reshape(t, 3),
        st_t,
        obatch_xyw[..., 2],
        jnp.arange(t, dtype=jnp.float32)[:, None],
    ]
    if n_planes:
        full_cols.append(setup.get(
            "dplane9", setup["dplane"].reshape(t, 3 * n_planes)))
    if nrow > ncol:
        full_cols.append(jnp.zeros((t, nrow - ncol), jnp.float32))
    full_rows = jax.lax.optimization_barrier(
        jnp.concatenate(full_cols, axis=1))                  # (T, nrow)

    # --- classify + bin (draw index IS the key position) ------------------
    x0, y0, x1, y1, unbounded, empty = _screen_bbox(obatch_xyw, obatch_z)
    tx0 = jnp.clip(jnp.floor(x0 / tile).astype(jnp.int32), 0, tx_n - 1)
    tx1 = jnp.clip(jnp.floor(x1 / tile).astype(jnp.int32), 0, tx_n - 1)
    ty0 = jnp.clip(jnp.floor(y0 / tile).astype(jnp.int32), 0, ty_n - 1)
    ty1 = jnp.clip(jnp.floor(y1 / tile).astype(jnp.int32), 0, ty_n - 1)
    offscreen = (x1 < 0) | (x0 >= width) | (y1 < 0) | (y0 >= height) | empty
    span_w = tx1 - tx0 + 1
    span = span_w * (ty1 - ty0 + 1)
    live = tvalid & ~offscreen
    # Normalize windows: clamp span limits to n_tiles, drop now-redundant
    # classes (small framebuffers shrink the ladder).
    norm = []
    prev = 0
    for c, sl in windows:
        sl = n_tiles if sl == -1 else min(int(sl), n_tiles)
        if sl > prev:
            norm.append((int(c), sl))
            prev = sl
    windows = tuple(norm)
    nwin = len(windows)
    limits = [sl for _c, sl in windows]
    cls = jnp.full((t,), nwin, jnp.int32)
    for k in range(nwin - 1, -1, -1):
        cls = jnp.where(live & ~unbounded & (span <= limits[k]), k, cls)
    overspan = live & (unbounded | (span > limits[-1]))

    m_cap = _pow2ceil(max(t, 2))
    skey = jnp.sort(cls * m_cap + jnp.arange(t, dtype=jnp.int32))
    sid = skey & (m_cap - 1)
    scls = skey // m_cap
    max_cap = max(c for c, _sl in windows)
    sid_pad = jnp.concatenate([sid, jnp.full((max_cap,), t, jnp.int32)])
    n_cls = [jnp.sum((cls == k).astype(jnp.int32)) for k in range(nwin)]
    bad_cap = jnp.zeros((), bool)
    ids_parts, ok_parts, caps = [], [], []
    off = jnp.zeros((), jnp.int32)
    for k, (cap, _sl) in enumerate(windows):
        cap = min(cap, m_cap, max(t, 1))
        ids_k = lax.dynamic_slice(sid_pad, (off,), (cap,))
        ok_k = (jnp.arange(cap, dtype=jnp.int32)
                < jnp.minimum(n_cls[k], cap)) & (ids_k < t)
        ids_parts.append(ids_k)
        ok_parts.append(ok_k)
        caps.append(cap)
        bad_cap |= n_cls[k] > cap
        off = off + n_cls[k]

    all_id = jnp.concatenate(ids_parts)
    all_ok = jnp.concatenate(ok_parts)
    safe = jnp.clip(all_id, 0, t - 1)

    pbits = int(t).bit_length()
    assert (n_tiles + 1) << pbits <= 2 ** 32, \
        "tile x draw-id key space exceeds u32"
    a_tx0 = jnp.take(tx0, safe)
    a_ty0 = jnp.take(ty0, safe)
    a_sw = jnp.take(span_w, safe)
    a_span = jnp.take(span, safe)

    def pair_keys(sl, nslots):
        di = jnp.arange(nslots, dtype=jnp.int32)
        sw = jnp.maximum(a_sw[sl], 1)[:, None]
        lx = di[None, :] % sw
        ly = di[None, :] // sw
        ptile = (a_ty0[sl][:, None] + ly) * tx_n + (a_tx0[sl][:, None] + lx)
        ok = all_ok[sl][:, None] & (di[None, :] < a_span[sl][:, None])
        ptile = jnp.where(ok, ptile, n_tiles)
        p = jnp.broadcast_to(safe[sl][:, None].astype(jnp.uint32),
                             ptile.shape)
        return (ptile.astype(jnp.uint32) << pbits) | p

    key_parts = []
    off_s = 0
    for cap, sl in zip(caps, limits):
        key_parts.append(pair_keys(slice(off_s, off_s + cap), sl).reshape(-1))
        off_s += cap
    sorted_key = jnp.sort(jnp.concatenate(key_parts))
    stream_len = sorted_key.shape[0]
    sorted_p = (sorted_key & jnp.uint32((1 << pbits) - 1)).astype(jnp.int32)

    bounds = jnp.searchsorted(
        sorted_key, jnp.arange(n_tiles + 1, dtype=jnp.uint32) << pbits)
    starts = bounds[:-1].astype(jnp.int32)
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)

    align = 8
    rcounts = ((counts + align - 1) // align) * align
    abounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rcounts).astype(jnp.int32)])
    astarts = abounds[:-1]
    sl_aligned = min(-(-(stream_len + n_tiles * align) // kchunk) * kchunk,
                     -(-(pair_cap + n_tiles * align) // kchunk) * kchunk)
    fits = (astarts + rcounts) <= sl_aligned
    kcounts = jnp.where(fits, counts, 0)
    n_live_pairs = bounds[-1].astype(jnp.int32)
    src, live_pos = _scan_place(astarts, starts, starts + kcounts, kcounts,
                                sl_aligned, n_tiles)
    sid_stream = jnp.where(
        live_pos, jnp.take(sorted_p, jnp.clip(src, 0, stream_len - 1)), t)
    full_pad = jax.lax.optimization_barrier(jnp.concatenate(
        [full_rows, jnp.zeros((1, nrow), jnp.float32)], axis=0))
    stream_rows = jnp.take(full_pad, sid_stream, axis=0)
    stream_rows = jnp.concatenate(
        [stream_rows, jnp.zeros((kchunk, nrow), jnp.float32)], axis=0)
    stream_rows = jnp.pad(stream_rows, ((0, 0), (0, 128 - nrow)))

    bad = (jnp.any(overspan) | bad_cap
           | jnp.any(~fits & (counts > 0))
           | (n_live_pairs > pair_cap))

    assert npix % 8 == 0
    zp = jnp.pad(jnp.asarray(zb, jnp.float32),
                 ((0, ty_n * tile - height), (0, tx_n * tile - width)),
                 constant_values=1.0)
    init_flat = zp.reshape(ty_n, tile, tx_n, tile).transpose(0, 2, 1, 3)
    init_z = jnp.broadcast_to(
        init_flat.reshape(n_tiles, npix)[:, None, :], (n_tiles, 8, npix))
    starts_k = jnp.where(fits, astarts, 0)
    return dict(stream_rows=stream_rows, starts_k=starts_k, kcounts=kcounts,
                init_z=init_z, bad=bad, n_planes=n_planes, setup=setup,
                ty_n=ty_n, tx_n=tx_n, n_tiles=n_tiles, npix=npix)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "windows", "pair_cap",
                     "kchunk", "interpret"))
def ordered_blend_tiled_pallas(obatch_xyw, obatch_z, obatch_valid,
                               obatch_color, obatch_spec, obatch_uv,
                               obatch_fog, obatch_state, obatch_rect,
                               obatch_clipd, state_i, state_f, fog_color,
                               zb, viewport, height: int, width: int,
                               tile: int = 32,
                               windows: tuple = ((65536, 4), (4096, 16),
                                                 (1024, 128), (64, -1)),
                               pair_cap: int = 131072,
                               kchunk: int = 128, interpret: bool = False):
    """Ordered alpha blend over the opaque frame, as per-pixel affine maps.

    Inputs are the ordered_subset batch fields IN DRAW ORDER (slot k draws
    k-th). Returns (A (4,H,W), B (4,H,W), bad ()): the caller composites
    ``fb' = A*fb + B`` — or replays the exact XLA pass when ``bad`` (span
    or capacity overflow; binning is never a correctness cap).

    ``windows``: static ((capacity, span_limit), ...) span classes — small
    triangles fill big windows with tiny key fans, full-screen glass panes
    fill a tiny window with an every-tile fan (span_limit -1 = n_tiles).
    A class count over its capacity, or any unbounded row, raises ``bad``.
    """
    pa = _ordered_phase_a(obatch_xyw, obatch_z, obatch_valid, obatch_color,
                          obatch_spec, obatch_uv, obatch_fog, obatch_state,
                          obatch_rect, obatch_clipd, state_i, state_f,
                          zb, height, width, tile, windows, pair_cap, kchunk)
    n_tiles, npix, ty_n, tx_n = (pa["n_tiles"], pa["npix"], pa["ty_n"],
                                 pa["tx_n"])
    vp9 = jnp.concatenate([
        jnp.asarray(viewport, jnp.float32).reshape(4),
        jnp.asarray([width, height], jnp.float32),
        jnp.asarray(fog_color, jnp.float32).reshape(3)])

    kernel = functools.partial(_blend_kernel, kchunk=kchunk, tile=tile,
                               tx_n=tx_n, n_planes=pa["n_planes"])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # vp9
            pl.BlockSpec((1, 8, npix), lambda i, s, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # init_z
            pl.BlockSpec(memory_space=pl.ANY),               # stream (HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, 8, npix), lambda i, s, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kchunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, 8, npix), jnp.float32),),
        interpret=interpret,
    )(pa["starts_k"], pa["kcounts"], vp9, pa["init_z"], pa["stream_rows"])

    full_h, full_w = ty_n * tile, tx_n * tile
    ab = out.reshape(ty_n, tx_n, 8, tile, tile)
    ab = ab.transpose(2, 0, 3, 1, 4).reshape(8, full_h, full_w)
    ab = ab[:, :height, :width]
    return ab[0:4], ab[4:8], pa["bad"]


def _peel_kernel(starts_ref, counts_ref, vp_ref, skip_ref, initz_ref,
                 rows_hbm, out_ref, rbuf, sems, *, kchunk: int, tile: int,
                 tx_n: int, n_planes: int, k_layers: int):
    """One screen tile: stream draw-ordered rows and record, per pixel,
    covering fragments ``skip_ref[0]`` .. ``skip_ref[0] + k_layers - 1`` IN
    DRAW ORDER — (draw id, raw e0/e1/e2) per layer — plus an overflow mask
    when a pixel sees fragments beyond the window (the caller then peels
    another round with a larger skip: iterated depth peeling).

    This is the textured-transparency half of the ordered path: the kernel
    cannot sample textures (no per-lane HBM gather on TPU), so it peels the
    draw-order fragment layers at full streaming rate and the XLA composite
    then shades each layer ONCE per pixel (texture, alpha test, blend) —
    K dense passes instead of one sequential pass per triangle. Coverage
    semantics (top-left rule, esum sign, depth clamp, scissor, rect, user
    clip planes, z test vs the opaque z-buffer with the 2-ULP tie window,
    colorwrite) are exactly the affine kernel's; alpha test is NOT applied
    here (it needs the sampled texel) — a failing fragment composites as
    identity in the XLA stage, exactly like the sequential pass."""
    npix = tile * tile
    t = pl.program_id(0)
    start = starts_ref[t]
    count = counts_ref[t]

    pxl = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    ty = t // tx_n
    tx = t - ty * tx_n
    px = (pxl % tile + tx * tile).astype(jnp.float32) + 0.5
    py = (pxl // tile + ty * tile).astype(jnp.float32) + 0.5
    vx0 = vp_ref[0]
    vy0 = vp_ref[1]
    scissor = ((px >= vx0) & (px < vx0 + vp_ref[2])
               & (py >= vy0) & (py < vy0 + vp_ref[3])
               & (px < vp_ref[4]) & (py < vp_ref[5]))
    zb0 = initz_ref[0][0:1]                                  # (1, npix)
    zb_bits = jax.lax.bitcast_convert_type(zb0, jnp.int32)
    skip = skip_ref[0]

    nchunks = (count + kchunk - 1) // kchunk

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * kchunk, kchunk), :],
            rbuf.at[slot], sems.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def group_cov(r8, live):
        """8 rows -> (cov (8,npix), e0, e1, e2, tid (8,1))."""
        def col(i):
            return r8[:, i:i + 1]

        def icol(i):
            return r8[:, i:i + 1].astype(jnp.int32)

        e0 = col(0) * px + col(1) * py + col(2)
        e1 = col(3) * px + col(4) * py + col(5)
        e2 = col(6) * px + col(7) * py + col(8)
        fl = icol(_OC_FL)
        c0 = (e0 > 0) | (((fl & 1) != 0) & (e0 == 0))
        c1 = (e1 > 0) | (((fl & 2) != 0) & (e1 == 0))
        c2 = (e2 > 0) | (((fl & 4) != 0) & (e2 == 0))
        esum_p = (col(_OC_EP.start) * px + col(_OC_EP.start + 1) * py
                  + col(_OC_EP.start + 2)) * col(_OC_SS)
        depth = (e0 * col(_OC_Z.start) + e1 * col(_OC_Z.start + 1)
                 + e2 * col(_OC_Z.start + 2)) * col(_OC_IVS)
        cov = c0 & c1 & c2 & (esum_p > 0) & (depth >= 0.0) & (depth <= 1.0)
        cov &= ((px >= col(_OC_RECT.start)) & (py >= col(_OC_RECT.start + 1))
                & (px < col(_OC_RECT.start + 2))
                & (py < col(_OC_RECT.start + 3)))
        for p in range(n_planes):
            cp = _OC_NCOL + 3 * p
            cov &= (col(cp) * px + col(cp + 1) * py + col(cp + 2)) >= 0
        cov &= ((fl & 8) != 0) & live & scissor

        zf = icol(_OC_ZF)
        dbits = jax.lax.bitcast_convert_type(depth, jnp.int32)
        near = jnp.abs(dbits - zb_bits) <= 2
        strict = _compare(zf, depth, zb0)
        eq_incl = ((zf == VXCMP.LESSEQUAL) | (zf == VXCMP.EQUAL)
                   | (zf == VXCMP.GREATEREQUAL))
        cov &= strict | (eq_incl & near)
        bits = icol(_OC_BITS)
        cov &= (bits & 4) != 0                       # colorwrite
        return cov, e0, e1, e2, col(_OC_ID)

    def process(slot_lit, c, carry):
        nhere = jnp.clip(count - c * kchunk, 0, kchunk)

        def sg_body(gi, car):
            lid, le0, le1, le2, cnt, ovf = car
            off = pl.multiple_of(gi * 8, 8)
            r8 = rbuf.at[slot_lit][pl.ds(off, 8), :]
            live = (off + sub8) < nhere
            cov8, e0, e1, e2, tid = group_cov(r8, live)
            for k in range(8):                 # draw order is sublane order
                m = cov8[k:k + 1]              # (1, npix)
                # ovf carried as i32: an i1 plane in the fori/cond carry
                # fails Mosaic layout inference (vector<...xi1> in scf).
                ovf = jnp.maximum(
                    ovf, (m & (cnt >= skip + k_layers)).astype(jnp.int32))
                for s in range(k_layers):
                    sel = m & (cnt == skip + s)
                    lid[s] = jnp.where(sel, tid[k:k + 1], lid[s])
                    le0[s] = jnp.where(sel, e0[k:k + 1], le0[s])
                    le1[s] = jnp.where(sel, e1[k:k + 1], le1[s])
                    le2[s] = jnp.where(sel, e2[k:k + 1], le2[s])
                cnt = cnt + m.astype(jnp.int32)
            return lid, le0, le1, le2, cnt, ovf

        return jax.lax.fori_loop(0, (nhere + 7) // 8, sg_body, carry)

    def pair_body(cp, carry):
        c0 = 2 * cp

        @pl.when(c0 + 1 < nchunks)
        def _():
            get_dma(1, c0 + 1).start()

        get_dma(0, c0).wait()
        carry = process(0, c0, carry)

        @pl.when(c0 + 2 < nchunks)
        def _():
            get_dma(0, c0 + 2).start()

        def odd(car):
            get_dma(1, c0 + 1).wait()
            return process(1, c0 + 1, car)

        return jax.lax.cond(c0 + 1 < nchunks, odd, lambda car: car, carry)

    ident = ([jnp.full((1, npix), -1.0, jnp.float32)
              for _ in range(k_layers)],
             [jnp.zeros((1, npix), jnp.float32) for _ in range(k_layers)],
             [jnp.zeros((1, npix), jnp.float32) for _ in range(k_layers)],
             [jnp.zeros((1, npix), jnp.float32) for _ in range(k_layers)],
             jnp.zeros((1, npix), jnp.int32),
             jnp.zeros((1, npix), jnp.int32))
    lid, le0, le1, le2, cnt, ovf = jax.lax.fori_loop(
        0, (nchunks + 1) // 2, pair_body, ident)
    # Layer block s: [id, e0, e1, e2, ovf|count, id, id, id] (8 sublanes).
    blocks = []
    for s in range(k_layers):
        extra = (ovf if s == 0 else cnt).astype(jnp.float32)
        blocks += [lid[s], le0[s], le1[s], le2[s], extra,
                   lid[s], lid[s], lid[s]]
    out_ref[0] = jnp.concatenate(blocks, axis=0)     # (8*K, npix)


def _peel_phase_b(pa, skip, viewport, height: int, width: int, tile: int,
                  kchunk: int, k_layers: int, interpret: bool):
    """Run the peel kernel over a prepared phase-A stream with a dynamic
    layer window start ``skip`` (() int32). Returns (lids (K,H,W) int32,
    les (K,3,H,W) f32, ovf () bool — fragments beyond skip+K exist)."""
    n_tiles, npix, ty_n, tx_n = (pa["n_tiles"], pa["npix"], pa["ty_n"],
                                 pa["tx_n"])
    vp6 = jnp.concatenate([
        jnp.asarray(viewport, jnp.float32).reshape(4),
        jnp.asarray([width, height], jnp.float32)])

    kernel = functools.partial(_peel_kernel, kchunk=kchunk, tile=tile,
                               tx_n=tx_n, n_planes=pa["n_planes"],
                               k_layers=k_layers)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # vp6
            pl.BlockSpec(memory_space=pltpu.SMEM),           # skip
            pl.BlockSpec((1, 8, npix), lambda i, s, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # init_z
            pl.BlockSpec(memory_space=pl.ANY),               # stream (HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, 8 * k_layers, npix), lambda i, s, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kchunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    skip_arr = jnp.asarray(skip, jnp.int32).reshape(1)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, 8 * k_layers, npix),
                                        jnp.float32),),
        interpret=interpret,
    )(pa["starts_k"], pa["kcounts"], vp6, skip_arr, pa["init_z"],
      pa["stream_rows"])

    full_h, full_w = ty_n * tile, tx_n * tile
    o = out.reshape(ty_n, tx_n, 8 * k_layers, tile, tile)
    o = o.transpose(2, 0, 3, 1, 4).reshape(8 * k_layers, full_h, full_w)
    o = o[:, :height, :width]
    lids = jnp.stack([o[8 * s].astype(jnp.int32) for s in range(k_layers)])
    les = jnp.stack([o[8 * s + 1:8 * s + 4] for s in range(k_layers)])
    ovf = jnp.any(o[4] > 0.5)
    return lids, les, ovf


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "windows", "pair_cap",
                     "kchunk", "k_layers", "interpret"))
def ordered_peel_tiled_pallas(obatch_xyw, obatch_z, obatch_valid,
                              obatch_color, obatch_spec, obatch_uv,
                              obatch_fog, obatch_state, obatch_rect,
                              obatch_clipd, state_i, state_f,
                              zb, viewport, height: int, width: int,
                              tile: int = 32,
                              windows: tuple = ((65536, 4), (4096, 16),
                                                (1024, 128), (64, -1)),
                              pair_cap: int = 131072,
                              kchunk: int = 128, k_layers: int = 4,
                              interpret: bool = False):
    """ONE round of draw-order fragment peeling (textured ordered path).

    Returns (lids (K,H,W) int32 [-1 = none], les (K,3,H,W) f32 raw winner
    edge values, bad ()). ``bad`` includes per-pixel layer overflow (more
    than K ordered fragments on some pixel) and the phase-A capacity flags.
    The frame pipeline uses :func:`ordered_peel_iterate` instead, which
    loops rounds until every layer is composited (exact at any depth).
    Reference behavior: transparent sort then per-fragment textured blend
    (/root/reference/src/CKSceneGraph.cpp:618-752 +
    CKDX9RasterizerContext::DrawPrimitive texturing)."""
    pa = _ordered_phase_a(obatch_xyw, obatch_z, obatch_valid, obatch_color,
                          obatch_spec, obatch_uv, obatch_fog, obatch_state,
                          obatch_rect, obatch_clipd, state_i, state_f,
                          zb, height, width, tile, windows, pair_cap, kchunk)
    lids, les, ovf = _peel_phase_b(pa, jnp.int32(0), viewport, height, width,
                                   tile, kchunk, k_layers, interpret)
    return lids, les, pa["bad"] | ovf


def ordered_peel_iterate(composite_fn, fb,
                         obatch_xyw, obatch_z, obatch_valid,
                         obatch_color, obatch_spec, obatch_uv,
                         obatch_fog, obatch_state, obatch_rect,
                         obatch_clipd, state_i, state_f,
                         zb, viewport, height: int, width: int,
                         tile: int = 32,
                         windows: tuple = ((65536, 4), (4096, 16),
                                           (1024, 128), (64, -1)),
                         pair_cap: int = 131072,
                         kchunk: int = 128, k_layers: int = 4,
                         interpret: bool = False):
    """ITERATED depth peeling: composite ordered layers K at a time until
    every pixel's fragment list is drained — exact textured ordered
    transparency at any depth (no bounded-K drops).

    Phase A (bin + sort + stream build) runs ONCE; each round re-streams
    the kernel with the layer window advanced by K and composites via
    ``composite_fn(fb, lids, les)``. Ordinary scenes (depth <= K) run
    exactly one round; the ``lax.while_loop`` body only executes when some
    pixel still has fragments beyond the window. Returns (fb, bad) where
    ``bad`` is the phase-A CAPACITY overflow alone (fragments actually
    dropped — surfaced as OrderedPeelOverflow); per-pixel depth no longer
    raises it."""
    pa = _ordered_phase_a(obatch_xyw, obatch_z, obatch_valid, obatch_color,
                          obatch_spec, obatch_uv, obatch_fog, obatch_state,
                          obatch_rect, obatch_clipd, state_i, state_f,
                          zb, height, width, tile, windows, pair_cap, kchunk)

    def run(skip):
        return _peel_phase_b(pa, skip, viewport, height, width, tile,
                             kchunk, k_layers, interpret)

    lids, les, ovf = run(jnp.int32(0))
    fb = composite_fn(fb, lids, les)

    def body(st):
        _more, f, skip = st
        l, e, o = run(skip)
        f = composite_fn(f, l, e)
        # carry the flag as i32 (i1 in a while carry next to the kernel is
        # the layout-inference trap recorded in round 3)
        return o.astype(jnp.int32), f, skip + k_layers

    def cond(st):
        return st[0] > 0

    _, fb, skip_end = lax.while_loop(
        cond, body, (ovf.astype(jnp.int32), fb, jnp.int32(k_layers)))
    # rounds executed (observability: VxStats.OrderedPeelRounds — the
    # alpha-test pre-gate + K bump exist to keep this at 1)
    rounds = skip_end // k_layers
    return fb, pa["bad"], rounds
