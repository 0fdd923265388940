"""Pallas TPU kernel: flat depth argmin-reduce with the framebuffer carry
resident in VMEM.

The XLA scan in deferred.depth_reduce carries the (H,W) best-depth/best-id
arrays through HBM on every triangle-chunk step (2 x H x W x 4B x steps of
traffic). This kernel keeps the carry in VMEM for the whole reduction: the
grid iterates triangle chunks, per-chunk coefficient rows stream through a
small VMEM block (Pallas double-buffers block fetches automatically), and the
outputs use a constant index_map so the same VMEM tile accumulates across
sequential grid steps (the standard TPU accumulation pattern).

Semantics are identical to deferred.depth_reduce (same per-pixel arithmetic,
LESSEQUAL later-draw-wins ties); the parity test runs the kernel in
interpreter mode on CPU.

Packed per-triangle row layout (F32_FIELDS floats):
  [0:3]   e0 coefficients (a, b, c)   signed (s * adj)
  [3:6]   e1 coefficients
  [6:9]   e2 coefficients
  [9:12]  top-left flags (0/1)
  [12:15] vertex z (z0, z1, z2)
  [15]    inv_det_s
  [16:19] esum plane coefficients (unsigned adj sums)
  [19]    s sign
  [20]    valid (0/1)
  [21:25] clip rect (x0, y0, x1, y1)
  [25]    triangle id (as float; exact for id < 2^24)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32_FIELDS = 32          # padded row width
_BIG = 3.0e38


def pack_rows(setup, defer_tri) -> jnp.ndarray:
    """(T, F32_FIELDS) packed triangle rows for the kernel."""
    t = setup["e_coef"].shape[0]
    rows = jnp.zeros((t, F32_FIELDS), jnp.float32)
    ec = setup["e_coef"].reshape(t, 9)
    rows = rows.at[:, 0:9].set(ec)
    rows = rows.at[:, 9:12].set(setup["top_left"].astype(jnp.float32))
    rows = rows.at[:, 12:15].set(setup["z"])
    rows = rows.at[:, 15].set(setup["inv_det_s"])
    rows = rows.at[:, 16:19].set(setup["esum_plane"])
    rows = rows.at[:, 19].set(setup["s"])
    rows = rows.at[:, 20].set((setup["valid"] & defer_tri).astype(jnp.float32))
    rows = rows.at[:, 21:25].set(setup["clip_rect"])
    rows = rows.at[:, 25].set(jnp.arange(t, dtype=jnp.float32))
    return rows


def _kernel(view_ref, rows_ref, best_d_ref, best_i_ref, *, chunk, block_h,
            width):
    # grid = (row_blocks, tri_chunks): the chunk axis is fastest, so this
    # block's carry stays resident in VMEM across all chunk steps.
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        best_d_ref[:] = (jnp.full((block_h, width), 1.0, jnp.float32)
                         * view_ref[4])
        best_i_ref[:] = jnp.full((block_h, width), -1, jnp.int32)

    row0 = (pl.program_id(0) * block_h).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(
        jnp.int32, (block_h, width), 0).astype(jnp.float32) + 0.5 + row0
    px = jax.lax.broadcasted_iota(
        jnp.int32, (block_h, width), 1).astype(jnp.float32) + 0.5
    vx0 = view_ref[0]
    vy0 = view_ref[1]
    vx1 = vx0 + view_ref[2]
    vy1 = vy0 + view_ref[3]
    scissor = (px >= vx0) & (px < vx1) & (py >= vy0) & (py < vy1)

    def body(c, carry):
        best_d, best_i = carry
        r = rows_ref[c]
        e0 = r[0] * px + r[1] * py + r[2]
        e1 = r[3] * px + r[4] * py + r[5]
        e2 = r[6] * px + r[7] * py + r[8]
        cov = (((e0 > 0) | ((e0 == 0) & (r[9] > 0)))
               & ((e1 > 0) | ((e1 == 0) & (r[10] > 0)))
               & ((e2 > 0) | ((e2 == 0) & (r[11] > 0))))
        depth = (e0 * r[12] + e1 * r[13] + e2 * r[14]) * r[15]
        esum = (r[16] * px + r[17] * py + r[18]) * r[19]
        cov &= (esum > 0) & (depth >= 0.0) & (depth <= 1.0) & scissor
        cov &= (r[20] > 0)
        cov &= ((px >= r[21]) & (py >= r[22]) & (px < r[23]) & (py < r[24]))
        tri_id = r[25].astype(jnp.int32)
        # LESSEQUAL with later-draw-wins ties: rows stream in draw order, so
        # depth <= best_d suffices.
        better = cov & (depth <= best_d)
        return (jnp.where(better, depth, best_d),
                jnp.where(better, tri_id, best_i))

    best_d, best_i = jax.lax.fori_loop(
        0, chunk, body, (best_d_ref[:], best_i_ref[:]))
    best_d_ref[:] = best_d
    best_i_ref[:] = best_i


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "chunk", "block_h", "interpret"))
def depth_reduce_pallas(setup, defer_tri, clear_z, viewport, height: int,
                        width: int, chunk: int = 16, block_h: int = 64,
                        interpret: bool = False):
    """Pallas flat depth reduce. Returns (best_id (H,W) int32, best_depth)."""
    rows = pack_rows(setup, defer_tri)
    t = rows.shape[0]
    nchunks = max(1, (t + chunk - 1) // chunk)
    pad = nchunks * chunk - t
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, F32_FIELDS), jnp.float32)], axis=0)
    n_blocks = (height + block_h - 1) // block_h
    pad_h = n_blocks * block_h

    view = jnp.concatenate([
        jnp.asarray(viewport, jnp.float32).reshape(4),
        jnp.asarray(clear_z, jnp.float32).reshape(1)])
    kernel = functools.partial(_kernel, chunk=chunk, block_h=block_h,
                               width=width)

    best_d, best_i = pl.pallas_call(
        kernel,
        grid=(n_blocks, nchunks),
        in_specs=[
            pl.BlockSpec((5,), lambda b, i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, F32_FIELDS), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_h, width), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, width), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pad_h, width), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, width), jnp.int32),
        ),
        interpret=interpret,
    )(view, rows)
    return best_i[:height], best_d[:height]
