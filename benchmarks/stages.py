"""Staged device-time probe: where does the honest frame time go?

Builds the headline config-5 scene (bench.build_scene), extracts the packed
frame-program inputs, and times jitted PREFIXES of the frame pipeline with
honest completion (pre-drain + blocked loop + final full readback — see
bench.honest_fps for why block_until_ready alone is not enough on this
tunnel). Stage deltas localize the device cost:

    unpack      packed-buffer slicing + transfer
    vertex      transform_and_light (light + project, full vertex streams)
    assemble    triangle assembly + clip-flag cull
    setup       triangle edge/depth planes
    solve       tile-binned visibility reduce (raster/tiled.py)
    shade       deferred per-pixel shade (textures, fog, specular)
    full        the whole frame program (adds ordered pass etc.)

Usage: python benchmarks/stages.py [--config N] [--iters K]
"""

from __future__ import annotations

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_packed(config: str):
    import jax

    if config == "config5":
        import bench

        ctx, rc, spinner = bench.build_scene(1024, 768)
    else:
        from benchmarks.baseline import CONFIGS

        rc, tick, _ = CONFIGS[config]()
    rc.Render()
    jax.block_until_ready(rc.fb)
    rc._frame_flags = rc.ResolveRenderFlags(0)
    static, dyn_f, dyn_i, params = rc._fill_packed(*rc._quad_lists())
    return rc, static, dyn_f, dyn_i, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config5")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--stages", default="unpack,vertex,assemble,setup,solve,"
                                        "shade,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ckrenderengine_tpu.pipeline import frame as fr
    from ckrenderengine_tpu.raster import deferred as df

    rc, static, dyn_f, dyn_i, params = build_packed(args.config)
    layout = params["layout"]
    levels = params["levels"]
    height, width = params["height"], params["width"]
    chunk = params.get("chunk", 64)

    def scene_of(st, f, i):
        scene, _sp, _d = fr.unpack_scene(st, f, i, layout)
        return scene

    def stage_floor(st, f, i):
        """Measurement floor: per-frame transfer + dispatch, ~zero compute."""
        return f.sum() + i.sum()

    def stage_unpack(st, f, i):
        s = scene_of(st, f, i)
        return s.local.sum() + s.state_f.sum()

    corner = params.get("corner", (0, 0, 0))

    def upto_vertex(st, f, i):
        s = scene_of(st, f, i)
        world = fr.compose_world(s.local, s.parent, levels)
        return fr.transform_and_light(s, levels, world, corner=corner)

    def stage_vertex(st, f, i):
        clip, color, spec, fog, _w, uv, clipd_v, refl_v = upto_vertex(st, f, i)
        return clip.sum() + color.sum()

    def upto_assemble(st, f, i):
        s = scene_of(st, f, i)
        world = fr.compose_world(s.local, s.parent, levels)
        clip, color, spec, fog, _w, uv, clipd_v, refl_v = fr.transform_and_light(
            s, levels, world, corner=corner)
        batch = fr.assemble_triangles(s, clip, color, spec, fog, uv, clipd_v,
                                      refl_v, corner=corner)
        return s, batch

    def stage_assemble(st, f, i):
        _s, batch = upto_assemble(st, f, i)
        return batch.xyw.sum() + batch.valid.sum()

    def upto_setup(st, f, i):
        s, batch = upto_assemble(st, f, i)
        setup = df.triangle_setup(batch.xyw, batch.z, batch.state_idx,
                                  batch.valid, s.state_i,
                                  clip_rect=batch.clip_rect, clipd=batch.clipd,
                                  planar=batch.planar)
        defer_tri = jnp.take(df.deferred_mask(s.state_i),
                             batch.state_idx) & batch.valid
        return s, batch, setup, defer_tri

    def stage_setup(st, f, i):
        _s, _b, setup, defer_tri = upto_setup(st, f, i)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(setup))

    def upto_solve(st, f, i):
        import jax as _jax
        s, batch, setup, defer_tri = upto_setup(st, f, i)
        if _jax.default_backend() == "tpu":
            from ckrenderengine_tpu.raster.pallas_tiled import (
                depth_reduce_tiled_pallas as solve)
        else:
            from ckrenderengine_tpu.raster.tiled import (
                depth_reduce_tiled as solve)
        kw = {}
        if _jax.default_backend() == "tpu":
            kw["planar"] = batch.planar
            # Mirror frame.py's default caps: the kernel's own defaults are
            # SMALLER, and an undersized pair_cap silently measures the
            # all-tiles fallback instead of the production solve (config 4
            # read 111 ms here vs its real ~8 ms until this matched).
            t = batch.valid.shape[0]
            kw["pair_cap"] = 98304 if t <= 600_000 else 262144
            kw["slab_cap"] = 131072 if t <= (1 << 21) else 262144
        best_id, best_depth, peak = solve(
            setup, defer_tri, s.clear_z, s.viewport, batch.xyw, height, width,
            **kw)
        return s, batch, best_id, best_depth

    def stage_solve(st, f, i):
        _s, _b, best_id, best_depth = upto_solve(st, f, i)
        return best_id.sum() + best_depth.sum()

    def stage_shade(st, f, i):
        s, batch, best_id, best_depth = upto_solve(st, f, i)
        clear_fb = jnp.broadcast_to(
            s.clear_color[:, None, None].astype(jnp.float32),
            (4, height, width))
        fb = df.shade_deferred(
            best_id, batch.xyw, batch.z, batch.color, batch.specular,
            batch.uv, batch.fog, batch.state_idx, s.state_i, s.state_f,
            s.tex_planes, s.tex_hw, s.fog_color, clear_fb, height, width,
            batch_refl=batch.refl,
            sampler_profile=params.get("sampler_profile"))
        return fb.sum()

    def stage_full(st, f, i):
        p = {k: v for k, v in params.items()
             if k not in ("layout", "levels", "height", "width", "texdev",
                          "texdev_rects")}
        out = fr.render_frame_packed_impl(
            st, f, i, layout, levels, height, width,
            texdev=params.get("texdev"),
            texdev_rects=params.get("texdev_rects", ()), **p)
        return sum(x.sum() for x in out if x is not None)

    stages = {
        "floor": stage_floor,
        "unpack": stage_unpack, "vertex": stage_vertex,
        "assemble": stage_assemble, "setup": stage_setup,
        "solve": stage_solve, "shade": stage_shade, "full": stage_full,
    }
    prev = 0.0
    for name in args.stages.split(","):
        fn = jax.jit(stages[name])
        t0 = time.perf_counter()
        r = fn(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r)).sum()
        t_compile = time.perf_counter() - t0
        # honest steady: drain happened above; pipelined queue + final get
        # (per-iteration block_until_ready costs a ~26 ms RPC and does not
        # actually fence — the final device_get is the fence).
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r))
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:9s} {ms:9.2f} ms  (+{ms - prev:8.2f})   "
              f"[compile {t_compile:.0f}s]", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
