"""Single-context framebuffer band sharding over a device mesh.

The reference has no multi-device notion at all (SURVEY §5); contexts are
the batch axis (context_batch.py). This module covers the OTHER scale axis:
ONE context whose framebuffer is too large (or whose frame must be too fast)
for one chip. The frame is split into horizontal pixel bands, one per
device on a 1-D ``band`` mesh axis, via ``shard_map``:

- every device receives the WHOLE packed dynamic state (replicated — it is
  two flat buffers, a few hundred KB) and the whole triangle stream;
- each device renders only its band: the identical frame program runs with
  the raster stages' pixel iotas offset by the band's starting row
  (render_frame_packed_impl's ``y_shift`` -> ``row0``) while vertices and
  scissors stay in GLOBAL screen coordinates — geometry outside the band
  is rejected by tile binning / coverage exactly like any off-viewport
  geometry, no triangle redistribution, and band pixels are BIT-IDENTICAL
  to the same rows of an unbanded render (integer iota offsets are exact
  in f32; the old viewport-shift re-rounded every edge coefficient);
- the per-device (4, band_h, W) outputs ARE the sharded global framebuffer:
  out_specs places the band axis on H, so no gather collective runs unless
  the host reads the image back (the all-to-all the SURVEY flags as "the
  only collective required" happens implicitly at readback / consumption).

Band work is roughly proportional to the band's covered pixels; vertex-stage
work is replicated. For raster-bound frames (large H×W, heavy shading) the
speedup approaches the device count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map              # jax >= 0.8
except ImportError:                        # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..pipeline import frame as fr


def render_frame_packed_banded(static: dict, dyn_f, dyn_i, layout: tuple,
                               levels: tuple, height: int, width: int,
                               mesh: Mesh, axis: str = "band",
                               skin=None, skin_ranges: tuple = (),
                               anim=None, world_in=None,
                               sprites_static=None, lines=None,
                               ordered_cap: int | None = None,
                               chunk: int = 64,
                               sort_transparent: bool = True,
                               vertex_shader=None,
                               pixel_shader=None,
                               want_bump: bool = False,
                               want_cube: bool = False,
                               texdev=None, texdev_rects: tuple = (),
                               sampler_profile=None,
                               corner: tuple = (0, 0, 0),
                               want_texgen: bool = True,
                               ss: int = 1,
                               solve_caps: tuple | None = None,
                               cull: tuple | None = None):
    """One logical frame of ``height`` rows rendered as ``mesh.shape[axis]``
    horizontal bands, one per device. Returns (fb (4,H,W), zb (H,W)) sharded
    over H. ``height`` must divide evenly by the band count.

    Bands are BIT-EXACT vs the same rows of an unbanded render: pixels
    evaluate at their GLOBAL screen coordinates (the frame program's
    ``row0`` pixel-iota offset — integer-exact in f32), so no edge
    coefficient re-rounds per band. ``ss``: Antialias supersample factor —
    each band renders at ss x and box-resolves locally (the band split
    composes with AA).

    Unsupported in banded mode (assertions): stencil plane, accumulate-over-
    previous-frame (CLEARBACKBUFFER/CLEARZBUFFER off), Pallas flat reduce.
    """
    n = mesh.shape[axis]
    if height % n:
        raise ValueError(f"height {height} not divisible by {n} bands")
    band_h = height // n

    def band_fn(static_, dyn_f_, dyn_i_):
        b = jax.lax.axis_index(axis)
        y0 = (b * band_h).astype(jnp.float32)
        out = fr.render_frame_packed_impl(
            static_, dyn_f_, dyn_i_, layout, levels, band_h, width,
            skin=skin, skin_ranges=skin_ranges,
            anim=anim, world_in=world_in,
            sprites_static=sprites_static, lines=lines,
            ordered_cap=ordered_cap, chunk=chunk,
            sort_transparent=sort_transparent, want_stencil=False,
            vertex_shader=vertex_shader, pixel_shader=pixel_shader,
            want_bump=want_bump,
            want_cube=want_cube, texdev=texdev, texdev_rects=texdev_rects,
            sampler_profile=sampler_profile, allow_pallas=False, y_shift=y0,
            corner=corner, want_texgen=want_texgen, ss=ss,
            solve_caps=solve_caps, cull=cull)
        fb, zb = out
        return fb, zb

    # Replication/VMA checking is off: scan carries inside the raster start
    # from replicated clears but become band-varying — functionally correct,
    # just not expressible to the checker. (check_vma on jax>=0.8,
    # check_rep on the older experimental API.)
    kw = dict(mesh=mesh, in_specs=(P(), P(), P()),
              out_specs=(P(None, axis, None), P(axis, None)))
    try:
        fn = shard_map(band_fn, check_vma=False, **kw)
    except TypeError:
        fn = shard_map(band_fn, check_rep=False, **kw)
    return fn(static, dyn_f, dyn_i)


render_frame_packed_banded_jit = functools.partial(
    jax.jit,
    static_argnames=("layout", "levels", "height", "width", "mesh", "axis",
                     "ordered_cap", "chunk", "sort_transparent",
                     "vertex_shader", "pixel_shader", "want_bump",
                     "want_cube", "texdev_rects", "sampler_profile",
                     "corner", "want_texgen", "ss", "solve_caps",
                     "cull", "skin_ranges"))(
    render_frame_packed_banded)
