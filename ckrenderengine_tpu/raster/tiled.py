"""Tile-binned deferred rasterization — the scale path (SURVEY §7 step 7).

The flat deferred reduce (deferred.py) evaluates every triangle against every
pixel: O(T * H * W). At Ballance scale (500k tris, 1024x768) that is ~4e11
coverage tests — far past budget. This module bins triangles to screen tiles
first, so each tile only evaluates the triangles whose screen bbox overlaps
it:

1. per-triangle screen bbox -> spanned tile range (w<=eps triangles and
   triangles spanning more than MAX_SPAN tiles go to a small GLOBAL bin
   evaluated on every tile),
2. bin-by-sort: (tile_id, tri_id) pairs from a static MAX_SPAN expansion,
   one argsort groups them by tile; per-tile ranges come from searchsorted
   (the XLA replacement for GPU atomic binning),
3. per-tile top-K id lists (static K; overflow drops back-most ids and is
   reported via a counter),
4. the same argmin depth reduce as deferred.py, but vmapped over tiles and
   scanned over K-chunks: work is O(tiles * K * tile_px).

The shading stage is unchanged (deferred.shade_deferred runs once per pixel
on the winner id), so the tiled path only swaps the visibility solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _screen_bbox(xyw, eps=1e-6):
    """Per-triangle pixel bbox; w-crossing triangles get the full screen.

    xyw (T,3,3) screen-homogeneous. Returns (x0, y0, x1, y1) each (T,),
    plus wcross (T,) bool.
    """
    w = xyw[..., 2]                                   # (T,3)
    wcross = jnp.any(w <= eps, axis=1)
    safe_w = jnp.where(jnp.abs(w) < eps, eps, w)
    sx = xyw[..., 0] / safe_w
    sy = xyw[..., 1] / safe_w
    big = jnp.float32(1.0e9)
    x0 = jnp.where(wcross, -big, jnp.min(sx, axis=1))
    x1 = jnp.where(wcross, big, jnp.max(sx, axis=1))
    y0 = jnp.where(wcross, -big, jnp.min(sy, axis=1))
    y1 = jnp.where(wcross, big, jnp.max(sy, axis=1))
    return x0, y0, x1, y1, wcross


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "k_per_tile", "g_cap",
                     "max_span", "chunk"))
def depth_reduce_tiled(setup, defer_tri, clear_z, viewport, xyw,
                       height: int, width: int, tile: int = 16,
                       k_per_tile: int = 512, g_cap: int = 64,
                       max_span: int = 36, chunk: int = 32):
    """Tile-binned argmin depth reduce.

    Returns (best_id (H,W) int32, best_depth (H,W) f32, overflow () int32 —
    number of tiles whose triangle list exceeded k_per_tile).
    """
    t = setup["e_coef"].shape[0]
    ty = (height + tile - 1) // tile
    tx = (width + tile - 1) // tile
    n_tiles = ty * tx
    tvalid = setup["valid"] & defer_tri

    # --- 1. bboxes + span classification ---------------------------------
    x0, y0, x1, y1, wcross = _screen_bbox(xyw)
    tx0 = jnp.clip(jnp.floor(x0 / tile).astype(jnp.int32), 0, tx - 1)
    tx1 = jnp.clip(jnp.floor(x1 / tile).astype(jnp.int32), 0, tx - 1)
    ty0 = jnp.clip(jnp.floor(y0 / tile).astype(jnp.int32), 0, ty - 1)
    ty1 = jnp.clip(jnp.floor(y1 / tile).astype(jnp.int32), 0, ty - 1)
    # fully offscreen?
    offscreen = (x1 < 0) | (x0 >= width) | (y1 < 0) | (y0 >= height)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    span = span_w * span_h
    is_global = (wcross | (span > max_span)) & tvalid & ~offscreen
    binned = tvalid & ~offscreen & ~is_global

    # --- 2. expansion + sort ----------------------------------------------
    di = jnp.arange(max_span, dtype=jnp.int32)                 # (M,)
    lx = di[None, :] % jnp.maximum(span_w, 1)[:, None]         # (T,M)
    ly = di[None, :] // jnp.maximum(span_w, 1)[:, None]
    pair_tile = (ty0[:, None] + ly) * tx + (tx0[:, None] + lx)
    pair_ok = binned[:, None] & (di[None, :] < span[:, None])
    pair_tile = jnp.where(pair_ok, pair_tile, n_tiles)         # pad bin
    tri_ids = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, max_span))
    # Stable sort by tile id alone: the expansion is tri-major, so draw order
    # inside each tile is preserved (no composite key / overflow risk).
    order = jnp.argsort(pair_tile.reshape(-1), stable=True)
    sorted_tile = pair_tile.reshape(-1)[order]
    sorted_tri = tri_ids.reshape(-1)[order]

    starts = jnp.searchsorted(sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32))
    ends = jnp.searchsorted(sorted_tile,
                            jnp.arange(1, n_tiles + 1, dtype=jnp.int32))
    counts = ends - starts
    overflow = jnp.sum((counts > k_per_tile).astype(jnp.int32))

    # per-tile id lists (TILES, K); invalid slots -> t (pad row)
    slot = jnp.arange(k_per_tile, dtype=jnp.int32)
    gidx = starts[:, None] + slot[None, :]
    valid_slot = slot[None, :] < jnp.minimum(counts, k_per_tile)[:, None]
    tile_ids = jnp.where(
        valid_slot,
        jnp.take(sorted_tri, jnp.clip(gidx, 0, sorted_tri.shape[0] - 1)),
        t)

    # --- global bin (big / w-crossing triangles) --------------------------
    gkey = jnp.where(is_global, jnp.arange(t, dtype=jnp.int32), t)
    gsort = jnp.sort(gkey)[:g_cap]                             # (G,)
    g_ids = jnp.broadcast_to(gsort[None, :], (n_tiles, g_cap))
    all_ids = jnp.concatenate([g_ids, tile_ids], axis=1)       # (TILES, K+G)

    # --- 3. per-tile chunked argmin reduce --------------------------------
    # pad triangle arrays with one invalid row at index t
    def padrow(a, fill=0.0):
        pad = jnp.full((1,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    e_coef = padrow(setup["e_coef"])               # (T+1,3,3)
    top_left = padrow(setup["top_left"], False)
    zvert = padrow(setup["z"])
    inv_det_s = padrow(setup["inv_det_s"])
    esum_plane = padrow(setup["esum_plane"])
    s_sign = padrow(setup["s"])
    clip_rect = padrow(setup["clip_rect"])
    v_all = padrow(tvalid, False)

    # local pixel grids per tile
    ly_pix = jnp.arange(tile, dtype=jnp.float32) + 0.5
    lx_pix = jnp.arange(tile, dtype=jnp.float32) + 0.5
    tyy, txx = jnp.meshgrid(jnp.arange(ty, dtype=jnp.float32),
                            jnp.arange(tx, dtype=jnp.float32), indexing="ij")
    base_x = (txx * tile).reshape(-1)                          # (TILES,)
    base_y = (tyy * tile).reshape(-1)
    px = base_x[:, None, None] + lx_pix[None, None, :]         # (TILES,1,tile)
    py = base_y[:, None, None] + ly_pix[None, :, None]         # (TILES,tile,1)
    px = jnp.broadcast_to(px, (n_tiles, tile, tile))
    py = jnp.broadcast_to(py, (n_tiles, tile, tile))
    scissor = ((px >= viewport[0]) & (px < viewport[0] + viewport[2])
               & (py >= viewport[1]) & (py < viewport[1] + viewport[3])
               & (px < width) & (py < height))

    k_total = all_ids.shape[1]
    nchunks = (k_total + chunk - 1) // chunk
    pad_k = nchunks * chunk - k_total
    if pad_k:
        all_ids = jnp.concatenate(
            [all_ids, jnp.full((n_tiles, pad_k), t, jnp.int32)], axis=1)
    ids_chunks = all_ids.reshape(n_tiles, nchunks, chunk).transpose(1, 0, 2)

    cz = jnp.asarray(clear_z, jnp.float32)
    if cz.ndim == 2:
        # Kept z-buffer (CLEARZBUFFER off): tile-ify last frame's (H,W) zb.
        zp = jnp.pad(cz, ((0, ty * tile - height), (0, tx * tile - width)),
                     constant_values=1.0)
        init_d = zp.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3)
        init_d = init_d.reshape(n_tiles, tile, tile)
    else:
        init_d = jnp.full((n_tiles, tile, tile), cz)
    init_i = jnp.full((n_tiles, tile, tile), -1, jnp.int32)
    big = jnp.float32(3.0e38)

    def body(carry, ids):                       # ids (TILES, C)
        best_d, best_i = carry
        ec = jnp.take(e_coef, ids, axis=0)      # (TILES,C,3,3)
        tl = jnp.take(top_left, ids, axis=0)    # (TILES,C,3)
        zv = jnp.take(zvert, ids, axis=0)       # (TILES,C,3)
        ivs = jnp.take(inv_det_s, ids, axis=0)  # (TILES,C)
        ep = jnp.take(esum_plane, ids, axis=0)  # (TILES,C,3)
        ss = jnp.take(s_sign, ids, axis=0)      # (TILES,C)
        tv = jnp.take(v_all, ids, axis=0)       # (TILES,C)
        rect = jnp.take(clip_rect, ids, axis=0)  # (TILES,C,4)

        pxc = px[:, None]                       # (TILES,1,tile,tile)
        pyc = py[:, None]

        def plane(coef):                        # (TILES,C,3) -> (TILES,C,h,w)
            return (coef[..., 0, None, None] * pxc
                    + coef[..., 1, None, None] * pyc
                    + coef[..., 2, None, None])

        e0 = plane(ec[:, :, 0])
        e1 = plane(ec[:, :, 1])
        e2 = plane(ec[:, :, 2])
        cov = (((e0 > 0) | ((e0 == 0) & tl[:, :, 0, None, None]))
               & ((e1 > 0) | ((e1 == 0) & tl[:, :, 1, None, None]))
               & ((e2 > 0) | ((e2 == 0) & tl[:, :, 2, None, None])))
        esum = plane(ep) * ss[..., None, None]
        # Bit-exact with the ordered pass (see deferred.py depth note).
        depth = (e0 * zv[..., 0, None, None] + e1 * zv[..., 1, None, None]
                 + e2 * zv[..., 2, None, None]) * ivs[..., None, None]
        cov &= ((esum > 0) & (depth >= 0.0) & (depth <= 1.0)
                & tv[..., None, None] & scissor[:, None])
        cov &= ((pxc >= rect[..., 0, None, None])
                & (pyc >= rect[..., 1, None, None])
                & (pxc < rect[..., 2, None, None])
                & (pyc < rect[..., 3, None, None]))
        dm = jnp.where(cov, depth, big)
        dmin = jnp.min(dm, axis=1)              # (TILES,h,w)
        idwin = jnp.max(jnp.where(dm == dmin[:, None], ids[..., None, None], -1),
                        axis=1)
        better = (idwin >= 0) & ((dmin < best_d)
                                 | ((dmin == best_d) & (idwin > best_i)))
        best_d = jnp.where(better, dmin, best_d)
        best_i = jnp.where(better, idwin, best_i)
        return (best_d, best_i), None

    (best_d, best_i), _ = jax.lax.scan(body, (init_d, init_i), ids_chunks)

    # --- 4. tiles -> (H, W) -------------------------------------------------
    full_h, full_w = ty * tile, tx * tile
    bd = best_d.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3)
    bd = bd.reshape(full_h, full_w)[:height, :width]
    bi = best_i.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3)
    bi = bi.reshape(full_h, full_w)[:height, :width]
    return bi, bd, overflow
