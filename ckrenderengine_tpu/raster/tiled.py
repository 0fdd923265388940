"""Tile-binned deferred rasterization — the scale path (SURVEY §7 step 7).

The flat deferred reduce (deferred.py) evaluates every triangle against every
pixel: O(T * H * W). At Ballance scale (500k tris, 1024x768) that is ~4e11
coverage tests — far past budget. This module bins triangles to screen tiles
so each tile only evaluates triangles whose (clipped) screen bbox overlaps it.

The structure is built from MEASURED primitive costs on the target TPU
(docs/PERFORMANCE.md device table): sorts are cheap (2-7 ms at frame scale),
gathers are row-WIDTH-bound (1.8 GB/s at 4 floats/row vs 27 GB/s at 64), and
element-granularity gathers/scatters cost ~8 ns each. Hence:

1. **Classify + compact by ONE sort.** Per-triangle screen bboxes (with
   straddlers clipped against z>=0 and z<=w so near-plane-crossing geometry
   gets a finite bbox instead of falling into the all-tiles bin) classify
   every triangle as small-span / mid-span / global / dead. A single
   ascending sort of ``class * M + id`` compacts the live triangles into a
   slab of static size L: dead triangles (the vast majority after frustum
   culling) never expand into bin pairs at all.
2. **One packed row table.** Everything the per-pixel test needs — edge
   coefficients, vertex z + inverse determinant (kept in EXACTLY the flat
   reduce's arithmetic so winner ids match bit-for-bit), the esum plane,
   top-left fill-convention flags, per-triangle scissor, the original
   triangle id for tie-breaks, and user clip planes — is packed into ONE
   (L+G, ~23) f32 row per slab entry. The reduce then does ONE wide gather
   per (tile, slot) instead of eight narrow ones (8.8 GB/s vs 1.8).
3. **Bin by ONE key sort.** (tile, slab_pos) pairs pack into a single u32
   key; one sort + searchsorted yields per-tile ranges — the XLA analogue
   of GPU atomic binning (reference: sequential DrawPrimitive submission,
   CKDX9RasterizerContext.cpp:1555-1648, needs no binning at all).
4. **Occupancy-RANKED argmin reduce.** Tiles sort by triangle count and
   partition into static rank classes (densest few get deep unrolled
   budgets, the sparse majority shallow ones); each class reduces in ONE
   fused round. EXACTNESS is never capped: any tile deeper than its class
   budget streams its remainder through a while fallback (0 iterations on
   real scenes), slab/bin overflows and unbounded straddlers stream through
   an all-tiles global loop — the reference draws everything submitted.

The shading stage is unchanged (deferred.shade_deferred runs once per pixel
on the winner id); this module only produces (winner id, depth) per pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _rank_classes(n_tiles: int) -> list[tuple[int, int]]:
    """Static (class_size, id_budget) schedule over occupancy-sorted tiles.

    Quantile-shaped: the densest ~2% of tiles get a 768-id unrolled round,
    the next ~13% get 384, the next ~33% get 128, the sparse tail 24 (a
    Ballance-scale frame measures peak ~460, 15th-pct ~270, 48th-pct ~70,
    median ~11 — budgets sized one notch above each). Sizes are static per
    (height, width, tile) so they live in the jit cache key; tiles deeper
    than their class budget stream the remainder through the exactness
    fallback loop, so budgets are a perf knob, never a correctness cap."""
    bounds = (n_tiles * 2 // 100 + 1, n_tiles * 15 // 100,
              n_tiles * 48 // 100)
    budgets = (768, 384, 128, 24)
    sizes = []
    prev = 0
    for b in bounds:
        b = max(prev, min(b, n_tiles))
        sizes.append(b - prev)
        prev = b
    sizes.append(n_tiles - prev)
    return [(s, k) for s, k in zip(sizes, budgets) if s > 0]


def _pow2ceil(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def _screen_bbox(xyw, z, eps=1e-6, planar=None):
    """Per-triangle pixel bbox, with near/far-plane clipping for straddlers.

    xyw (T,3,3) screen-homogeneous; z (T,3) clip z. For triangles with all
    w > eps the bbox is the projected-vertex hull (identical to the flat
    path's implicit extent). For w-crossing triangles, the VISIBLE region is
    the triangle clipped to {z >= 0, z <= w} (the deferred coverage test
    rejects depth outside [0,1] and the esum sign rejects w(p) <= 0), whose
    projected hull is the hull of <= 9 candidate points: kept vertices plus
    edge intersections with either clip plane. If any in-region candidate
    has w <= eps — or the z=0 cut crosses w=0 inside the triangle — the
    projection is unbounded and the triangle stays exact via the global bin.

    Returns (x0, y0, x1, y1, unbounded, empty), each (T,).

    ``planar``: optional per-corner column payload ((hx0,hx1,hx2),
    (hy0,hy1,hy2), (w0,w1,w2), (z0,z1,z2)) — when given, all math runs on
    1D (T,) columns (rank-2/3 per-corner arrays pad their tiny trailing
    dims to native 128-lane tiles on TPU). Same arithmetic either way.
    """
    if planar is not None:
        hxc, hyc, wc, hzc = planar
    else:
        hxc = tuple(xyw[:, i, 0] for i in range(3))
        hyc = tuple(xyw[:, i, 1] for i in range(3))
        wc = tuple(xyw[:, i, 2] for i in range(3))
        hzc = tuple(z[:, i] for i in range(3))
    wcross = (wc[0] <= eps) | (wc[1] <= eps) | (wc[2] <= eps)

    def min3(a, b, c):
        return jnp.minimum(jnp.minimum(a, b), c)

    def max3(a, b, c):
        return jnp.maximum(jnp.maximum(a, b), c)

    # --- fast path: plain projected hull --------------------------------
    sw = tuple(jnp.where(jnp.abs(wi) < eps, eps, wi) for wi in wc)
    sx = tuple(hxc[i] / sw[i] for i in range(3))
    sy = tuple(hyc[i] / sw[i] for i in range(3))
    px0 = min3(*sx)
    px1 = max3(*sx)
    py0 = min3(*sy)
    py1 = max3(*sy)

    # --- straddler path: candidates of the {z>=0, z<=w} clipped region --
    # Each candidate: (hx, hy, hw, hz) linear over the triangle. 3 vertices
    # + 3 edge ^ {z=0} + 3 edge ^ {z=w}.
    d0c = hzc                                          # z >= 0 halfspace
    d1c = tuple(wc[i] - hzc[i] for i in range(3))      # z <= w halfspace
    scale = (max3(*(jnp.abs(zi) for zi in hzc))
             + max3(*(jnp.abs(wi) for wi in wc)) + 1e-30)   # (T,)
    tol = 1e-5 * scale

    cand_x = [hxc[i] for i in range(3)]
    cand_y = [hyc[i] for i in range(3)]
    cand_w = [wc[i] for i in range(3)]
    # vertex in-region (generous: inclusion only GROWS the bbox — safe)
    cand_ok = [(d0c[i] >= -tol) & (d1c[i] >= -tol) for i in range(3)]
    z0_edge_w = []                                     # w at z=0 cut points
    z0_edge_ok = []
    for (a, b) in ((0, 1), (1, 2), (2, 0)):
        for dplane in (d0c, d1c):
            da, db = dplane[a], dplane[b]
            crosses = (da * db) < 0
            tt = da / jnp.where(jnp.abs(da - db) < 1e-30, 1e-30, da - db)
            tt = jnp.clip(tt, 0.0, 1.0)
            ix = hxc[a] + tt * (hxc[b] - hxc[a])
            iy = hyc[a] + tt * (hyc[b] - hyc[a])
            iw = wc[a] + tt * (wc[b] - wc[a])
            iz = hzc[a] + tt * (hzc[b] - hzc[a])
            other = (iw - iz >= -tol) if dplane is d0c else (iz >= -tol)
            cand_x.append(ix)
            cand_y.append(iy)
            cand_w.append(iw)
            cand_ok.append(crosses & other)
            if dplane is d0c:
                z0_edge_w.append(iw)
                z0_edge_ok.append(crosses & other)

    inf = jnp.float32(jnp.inf)
    any_cand = functools.reduce(jnp.logical_or, cand_ok)
    wmin_in = functools.reduce(
        jnp.minimum, (jnp.where(ok, w_, inf)
                      for ok, w_ in zip(cand_ok, cand_w)))
    # z=0 cut endpoints straddling w sign => a w=0 point lies ON the
    # clipped region's boundary => projection unbounded.
    z0_wmin = functools.reduce(
        jnp.minimum, (jnp.where(ok, w_, inf)
                      for ok, w_ in zip(z0_edge_ok, z0_edge_w)))
    unbounded = wcross & ((wmin_in <= eps) | (z0_wmin <= eps))
    empty_straddle = wcross & ~any_cand

    big = jnp.float32(1.0e9)
    csx = []
    csy = []
    for ok, x_, y_, w_ in zip(cand_ok, cand_x, cand_y, cand_w):
        cwm = jnp.where(ok, jnp.maximum(w_, eps), 1.0)
        csx.append((ok, x_ / cwm))
        csy.append((ok, y_ / cwm))
    # +1px conservative pad: the straddler hull is computed through lerped
    # intersections whose rounding differs from the per-pixel edge test.
    sx0 = functools.reduce(
        jnp.minimum, (jnp.where(ok, v, big) for ok, v in csx)) - 1.0
    sx1 = functools.reduce(
        jnp.maximum, (jnp.where(ok, v, -big) for ok, v in csx)) + 1.0
    sy0 = functools.reduce(
        jnp.minimum, (jnp.where(ok, v, big) for ok, v in csy)) - 1.0
    sy1 = functools.reduce(
        jnp.maximum, (jnp.where(ok, v, -big) for ok, v in csy)) + 1.0

    x0 = jnp.where(wcross, jnp.where(unbounded, -big, sx0), px0)
    x1 = jnp.where(wcross, jnp.where(unbounded, big, sx1), px1)
    y0 = jnp.where(wcross, jnp.where(unbounded, -big, sy0), py0)
    y1 = jnp.where(wcross, jnp.where(unbounded, big, sy1), py1)
    return x0, y0, x1, y1, unbounded, empty_straddle


# Packed-row column layout (see module docstring, point 2).
_C_EC = slice(0, 9)       # signed edge coefficients (3 edges x [a,b,c])
_C_Z = slice(9, 12)       # vertex clip z
_C_IVS = 12               # s * inv_det
_C_EP = slice(13, 16)     # esum plane [a,b,c]
_C_SS = 16                # orientation sign s
_C_FL = 17                # flags: top-left bits 1/2/4, valid bit 8
_C_RECT = slice(18, 22)   # per-triangle scissor rect
_C_ID = 22                # original triangle id (exact in f32 below 2^24)
_NCOL = 23                # + 3 * n_planes user-clip-plane columns


def _reduce_rows(carry, rows, n_planes, px_s, py_s, scissor_s):
    """Merge (S, C, W) packed triangle rows into the (S, tile, tile) carry.

    Per-pixel arithmetic is EXACTLY the flat reduce's (deferred.py
    depth_reduce) so winner ids / depths agree bit-for-bit: coverage from
    signed edge planes with the top-left fill convention, depth as
    (e0*z0 + e1*z1 + e2*z2) * (s*inv_det), LESSEQUAL merge where exact
    depth ties go to the LATER draw id (reference z-func defaults,
    CKRasterizerLib/CKRasterizerContext.cpp:423-477).
    """
    best_d, best_i = carry
    ec = rows[..., _C_EC].reshape(rows.shape[:-1] + (3, 3))
    zv = rows[..., _C_Z]
    ivs = rows[..., _C_IVS]
    ep = rows[..., _C_EP]
    ss = rows[..., _C_SS]
    fl = rows[..., _C_FL].astype(jnp.int32)
    rect = rows[..., _C_RECT]
    ids = rows[..., _C_ID].astype(jnp.int32)
    tl0 = (fl & 1) != 0
    tl1 = (fl & 2) != 0
    tl2 = (fl & 4) != 0
    tv = (fl & 8) != 0

    pxc = px_s[:, None]                     # (S,1,tile,tile)
    pyc = py_s[:, None]

    def plane(coef):                        # (S,C,3) -> (S,C,h,w)
        return (coef[..., 0, None, None] * pxc
                + coef[..., 1, None, None] * pyc
                + coef[..., 2, None, None])

    e0 = plane(ec[:, :, 0])
    e1 = plane(ec[:, :, 1])
    e2 = plane(ec[:, :, 2])
    cov = (((e0 > 0) | ((e0 == 0) & tl0[..., None, None]))
           & ((e1 > 0) | ((e1 == 0) & tl1[..., None, None]))
           & ((e2 > 0) | ((e2 == 0) & tl2[..., None, None])))
    esum = plane(ep) * ss[..., None, None]
    depth = (e0 * zv[..., 0, None, None] + e1 * zv[..., 1, None, None]
             + e2 * zv[..., 2, None, None]) * ivs[..., None, None]
    cov &= ((esum > 0) & (depth >= 0.0) & (depth <= 1.0)
            & tv[..., None, None] & scissor_s[:, None])
    cov &= ((pxc >= rect[..., 0, None, None])
            & (pyc >= rect[..., 1, None, None])
            & (pxc < rect[..., 2, None, None])
            & (pyc < rect[..., 3, None, None]))
    for p in range(n_planes):
        cov &= plane(rows[..., _NCOL + 3 * p:_NCOL + 3 * p + 3]) >= 0
    big = jnp.float32(3.0e38)
    dm = jnp.where(cov, depth, big)
    dmin = jnp.min(dm, axis=1)              # (S,h,w)
    idwin = jnp.max(jnp.where(dm == dmin[:, None], ids[..., None, None], -1),
                    axis=1)
    better = (idwin >= 0) & ((dmin < best_d)
                             | ((dmin == best_d) & (idwin > best_i)))
    best_d = jnp.where(better, dmin, best_d)
    best_i = jnp.where(better, idwin, best_i)
    return best_d, best_i


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "max_span", "chunk",
                     "span2", "g_cap", "slab_cap"))
def depth_reduce_tiled(setup, defer_tri, clear_z, viewport, xyw,
                       height: int, width: int, tile: int = 16,
                       max_span: int = 4, chunk: int = 32,
                       span2: int = 64, g_cap: int = 8192,
                       slab_cap: int = 131072, row0=0.0):
    """Tile-binned argmin depth reduce (exact — no per-tile triangle cap).

    ``row0``: global row offset of the raster's first pixel row (band
    sharding): tiles cover global rows [row0, row0+height) and pixels
    evaluate at GLOBAL coordinates, so band output is bit-identical to the
    same rows of an unbanded render.

    Returns (best_id (H,W) int32, best_depth (H,W) f32, peak () int32 — the
    densest tile's triangle count, surfaced as the VxStats.TileBinPeak
    occupancy counter)."""
    t = setup["e_coef"].shape[0]
    ty_n = (height + tile - 1) // tile
    tx_n = (width + tile - 1) // tile
    n_tiles = ty_n * tx_n
    tvalid = setup["valid"] & defer_tri

    dplane_t = setup.get("dplane")
    if dplane_t is None:
        dplane_t = jnp.zeros((t, 0, 3), jnp.float32)
    n_planes = dplane_t.shape[1]
    ncol = _NCOL + 3 * n_planes

    # --- 1. bboxes (straddlers clipped) + span classification -------------
    # bboxes are GLOBAL screen coords; tiles index the band-local grid.
    x0, y0, x1, y1, unbounded, empty = _screen_bbox(xyw, setup["z"])
    tx0 = jnp.clip(jnp.floor(x0 / tile).astype(jnp.int32), 0, tx_n - 1)
    tx1 = jnp.clip(jnp.floor(x1 / tile).astype(jnp.int32), 0, tx_n - 1)
    ty0 = jnp.clip(jnp.floor((y0 - row0) / tile).astype(jnp.int32),
                   0, ty_n - 1)
    ty1 = jnp.clip(jnp.floor((y1 - row0) / tile).astype(jnp.int32),
                   0, ty_n - 1)
    offscreen = ((x1 < 0) | (x0 >= width) | (y1 < row0)
                 | (y0 >= row0 + height) | empty)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h
    live = tvalid & ~offscreen
    small = live & ~unbounded & (span <= max_span)
    mid = live & ~unbounded & (span > max_span) & (span <= span2)
    glob = live & ~small & ~mid

    # --- 2. ONE class sort compacts small/mid/global ----------------------
    m_cap = _pow2ceil(max(t, 2))
    assert 4 * m_cap < 2 ** 31, "triangle id space exceeds i32 class keys"
    cls = jnp.where(small, 0, jnp.where(mid, 1, jnp.where(glob, 2, 3)))
    skey = jnp.sort(cls.astype(jnp.int32) * m_cap
                    + jnp.arange(t, dtype=jnp.int32))
    sid = skey & (m_cap - 1)
    scls = skey // m_cap
    n_small = jnp.sum(small.astype(jnp.int32))
    n_mid = jnp.sum(mid.astype(jnp.int32))
    n_glob = jnp.sum(glob.astype(jnp.int32))
    g_cap = min(g_cap, m_cap)
    # slab_l may not exceed len(sid) = t + g_cap (the slab is
    # sliced out of the class-sorted id array): clamp to t.
    slab_l = min(slab_cap, m_cap, max(t, 1))
    # pad so the dynamic mid-slice never reads out of range
    sid = jnp.concatenate([sid, jnp.full((g_cap,), t, jnp.int32)])
    scls = jnp.concatenate([scls, jnp.full((g_cap,), 3, jnp.int32)])

    slab_id = lax.slice(sid, (0,), (slab_l,))
    slab_ok = lax.slice(scls, (0,), (slab_l,)) == 0
    mid_id = lax.dynamic_slice(sid, (n_small,), (g_cap,))
    mid_ok = lax.dynamic_slice(scls, (n_small,), (g_cap,)) == 1

    all_id = jnp.concatenate([slab_id, mid_id])            # (LG,)
    all_ok = jnp.concatenate([slab_ok, mid_ok])
    lg = slab_l + g_cap
    safe = jnp.clip(all_id, 0, t - 1)

    # --- 3. packed row table ----------------------------------------------
    # Pack the full-T setup columns ONCE (dense concat, memory-bound cheap)
    # so the slab build is a single wide gather instead of eight narrow ones.
    tlf = setup["top_left"]
    flags_t = (tlf[:, 0].astype(jnp.int32) + 2 * tlf[:, 1].astype(jnp.int32)
               + 4 * tlf[:, 2].astype(jnp.int32)
               + 8 * tvalid.astype(jnp.int32)).astype(jnp.float32)
    full_cols = [
        setup["e_coef"].reshape(t, 9),
        setup["z"],
        setup["inv_det_s"][:, None],
        setup["esum_plane"],
        setup["s"][:, None],
        flags_t[:, None],
        setup["clip_rect"],
        jnp.arange(t, dtype=jnp.float32)[:, None],
    ]
    if n_planes:
        full_cols.append(dplane_t.reshape(t, 3 * n_planes))
    # Fence: keep the concat materialized so the row gather stays ONE wide
    # gather (fused, XLA splits it into a narrow gather per source column).
    full_rows = jax.lax.optimization_barrier(
        jnp.concatenate(full_cols, axis=1))                # (T, ncol)
    rows = jnp.take(full_rows, safe, axis=0)               # (LG, ncol)
    # slab validity replaces the full-table validity bit (dead pad entries)
    fl = rows[:, _C_FL].astype(jnp.int32)
    fl = (fl & 7) + 8 * ((fl >= 8) & all_ok).astype(jnp.int32)
    rows = rows.at[:, _C_FL].set(fl.astype(jnp.float32))
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, ncol), jnp.float32)], axis=0)  # pad row: flags=0

    # --- 4. pair keys + ONE u32 sort ---------------------------------------
    pbits = int(lg).bit_length()
    assert (n_tiles + 1) << pbits <= 2 ** 32, \
        "tile x slab key space exceeds u32 (raise tile size or lower slab_cap)"
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
        p = (jnp.arange(sl.start, sl.stop, dtype=jnp.uint32)[:, None]
             + jnp.zeros((1, nslots), jnp.uint32))
        return (ptile.astype(jnp.uint32) << pbits) | p

    k1 = pair_keys(slice(0, slab_l), max_span)
    k2 = pair_keys(slice(slab_l, lg), span2)
    sorted_key = jnp.sort(jnp.concatenate([k1.reshape(-1), k2.reshape(-1)]))
    stream_len = sorted_key.shape[0]
    sorted_p = (sorted_key & jnp.uint32((1 << pbits) - 1)).astype(jnp.int32)

    bounds = jnp.searchsorted(
        sorted_key,
        jnp.arange(n_tiles + 1, dtype=jnp.uint32) << pbits)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    peak = jnp.max(counts)

    # --- 5. per-tile pixel grids + init carry ------------------------------
    ly_pix = jnp.arange(tile, dtype=jnp.float32) + 0.5
    lx_pix = jnp.arange(tile, dtype=jnp.float32) + 0.5
    tyy, txx = jnp.meshgrid(jnp.arange(ty_n, dtype=jnp.float32),
                            jnp.arange(tx_n, dtype=jnp.float32), indexing="ij")
    base_x = (txx * tile).reshape(-1)                          # (TILES,)
    base_y = (tyy * tile).reshape(-1) + row0                   # global rows
    px = base_x[:, None, None] + lx_pix[None, None, :]
    py = base_y[:, None, None] + ly_pix[None, :, None]
    px = jnp.broadcast_to(px, (n_tiles, tile, tile))
    py = jnp.broadcast_to(py, (n_tiles, tile, tile))
    scissor = ((px >= viewport[0]) & (px < viewport[0] + viewport[2])
               & (py >= viewport[1]) & (py < viewport[1] + viewport[3])
               & (px < width) & (py < row0 + height))

    cz = jnp.asarray(clear_z, jnp.float32)
    if cz.ndim == 2:
        # Kept z-buffer (CLEARZBUFFER off): tile-ify last frame's (H,W) zb.
        zp = jnp.pad(cz, ((0, ty_n * tile - height), (0, tx_n * tile - width)),
                     constant_values=1.0)
        init_d = zp.reshape(ty_n, tile, tx_n, tile).transpose(0, 2, 1, 3)
        init_d = init_d.reshape(n_tiles, tile, tile)
    else:
        init_d = jnp.full((n_tiles, tile, tile), cz)
    init_i = jnp.full((n_tiles, tile, tile), -1, jnp.int32)

    # --- 6. occupancy-ranked reduce over the binned stream ------------------
    order_t = jnp.argsort(-counts)                           # dense tiles first
    slot_c = jnp.arange(chunk, dtype=jnp.int32)
    bd_parts, bi_parts = [], []
    a = 0
    for (size, budget) in _rank_classes(n_tiles):
        idx_t = order_t[a:a + size]
        a += size
        px_s = jnp.take(px, idx_t, axis=0)
        py_s = jnp.take(py, idx_t, axis=0)
        sc_s = jnp.take(scissor, idx_t, axis=0)
        st_s = jnp.take(starts, idx_t)
        en_s = st_s + jnp.take(counts, idx_t)
        sub = (jnp.take(init_d, idx_t, axis=0),
               jnp.take(init_i, idx_t, axis=0))
        bidx = st_s[:, None] + jnp.arange(budget, dtype=jnp.int32)[None, :]
        ids_p = jnp.where(bidx < en_s[:, None],
                          jnp.take(sorted_p,
                                   jnp.clip(bidx, 0, stream_len - 1)), lg)
        rws = jnp.take(rows, ids_p.reshape(-1), axis=0).reshape(
            size, budget, ncol)
        sub = _reduce_rows(sub, rws, n_planes, px_s, py_s, sc_s)
        # Exactness fallback: stream any remainder past the budget.
        deepest = jnp.max(en_s - st_s)

        def fb_body(stt, _st=st_s, _en=en_s, _px=px_s, _py=py_s, _sc=sc_s,
                    _budget=budget, _size=size):
            c, sub_c = stt
            fidx = (_st[:, None] + _budget + c * chunk + slot_c[None, :])
            fids = jnp.where(fidx < _en[:, None],
                             jnp.take(sorted_p,
                                      jnp.clip(fidx, 0, stream_len - 1)), lg)
            frws = jnp.take(rows, fids.reshape(-1), axis=0).reshape(
                _size, chunk, ncol)
            return c + 1, _reduce_rows(sub_c, frws, n_planes, _px, _py, _sc)

        _, sub = lax.while_loop(
            lambda stt, _b=budget, _d=deepest: _b + stt[0] * chunk < _d,
            fb_body, (jnp.int32(0), sub))
        bd_parts.append(sub[0])
        bi_parts.append(sub[1])

    bd_sorted = jnp.concatenate(bd_parts, axis=0)
    bi_sorted = jnp.concatenate(bi_parts, axis=0)
    inv = jnp.argsort(order_t)
    best_d = jnp.take(bd_sorted, inv, axis=0)
    best_i = jnp.take(bi_sorted, inv, axis=0)

    # --- 7. leftover streams: evaluated on ALL tiles (rarely non-empty) ----
    # (a) global class — unbounded straddlers + spans past span2 + mid
    #     triangles past the g_cap slab: contiguous sorted range
    #     [n_small + min(n_mid, g_cap), n_small + n_mid + n_glob).
    # (b) small-class triangles past the slab: range [slab_l, n_small).
    def rows_for(ids):
        """(C,) original ids -> (C, ncol) packed rows (one wide gather; only
        the rare leftover streams pay this)."""
        safe_i = jnp.clip(ids, 0, t - 1)
        r = jnp.take(full_rows, safe_i, axis=0)
        inr = ((ids >= 0) & (ids < t)).astype(jnp.int32)
        flr = r[:, _C_FL].astype(jnp.int32)
        flr = (flr & 7) + (flr & 8) * inr
        return r.at[:, _C_FL].set(flr.astype(jnp.float32))

    def stream_all_tiles(carry, start, count):
        def body(st):
            c, car = st
            idx = start + c * chunk + slot_c
            ids = jnp.where(idx - start < count,
                            jnp.take(sid, jnp.clip(idx, 0, sid.shape[0] - 1)),
                            t)
            rws = jnp.broadcast_to(rows_for(ids)[None],
                                   (n_tiles, chunk, ncol))
            return c + 1, _reduce_rows(car, rws, n_planes, px, py, scissor)

        _, carry = lax.while_loop(
            lambda st: st[0] * chunk < count, body, (jnp.int32(0), carry))
        return carry

    carry = (best_d, best_i)
    g_start = n_small + jnp.minimum(n_mid, g_cap)
    g_count = (n_small + n_mid + n_glob) - g_start
    carry = stream_all_tiles(carry, g_start, g_count)
    s_over = jnp.maximum(n_small - slab_l, 0)
    carry = stream_all_tiles(carry, jnp.int32(slab_l), s_over)
    best_d, best_i = carry

    # --- 8. tiles -> (H, W) -------------------------------------------------
    full_h, full_w = ty_n * tile, tx_n * tile
    bd = best_d.reshape(ty_n, tx_n, tile, tile).transpose(0, 2, 1, 3)
    bd = bd.reshape(full_h, full_w)[:height, :width]
    bi = best_i.reshape(ty_n, tx_n, tile, tile).transpose(0, 2, 1, 3)
    bi = bi.reshape(full_h, full_w)[:height, :width]
    return bi, bd, peak
