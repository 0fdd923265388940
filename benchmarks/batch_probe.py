"""Batched-context stage breakdown (the ProcessBatched scale axis).

Round-3 verdict: contexts_per_sec_batched sits at 0.439 of its bar with no
stage breakdown. This probe times vmapped PREFIXES of the batched frame
program (8 contexts x 256^2 by default) the same way break_probe.py does for
config 5, plus two structural alternatives for the whole program:

    vm_full     the production path: vmap over ctx, allow_pallas=False
    scan_full   lax.scan over ctx, allow_pallas=True (per-ctx Pallas solve)

Usage: python benchmarks/batch_probe.py [--nctx 8] [--size 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nctx", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--stages", default="floor,unpack,vertex,setup,solve,"
                                        "full1,vm_full,scan_full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from ckrenderengine_tpu.pipeline import frame as fr
    from ckrenderengine_tpu.raster import deferred as df

    rm, rcs, root = bench.build_batched_scene(args.nctx, args.size)
    # Fill the packed batch exactly like manager._batch_packed.
    filled = []
    for rc in rcs:
        if rc._compiled.topology_version != rc.context._topology_version:
            rc._compile()
        rc._frame_flags = rc.ResolveRenderFlags(0)
        rc._refresh_textures()
        filled.append(rc._fill_packed(*rc._quad_lists()))
    static, _f, _i, params = filled[0]
    dyn_f = np.stack([f for _s, f, _i2, _p in filled])
    dyn_i = np.stack([i for _s, _f2, i, _p in filled])
    layout, levels = params["layout"], params["levels"]
    height, width = params["height"], params["width"]
    corner = params.get("corner", (0, 0, 0))
    n = args.nctx

    def scene_of(st, f, i):
        scene, _sp, _d = fr.unpack_scene(st, f, i, layout)
        return scene

    def upto_setup(st, f, i):
        s = scene_of(st, f, i)
        world = fr.compose_world(s.local, s.parent, levels)
        clip, color, spec, fog, _w, uv, clipd_v, refl_v = \
            fr.transform_and_light(s, levels, world, corner=corner)
        batch = fr.assemble_triangles(s, clip, color, spec, fog, uv,
                                      clipd_v, refl_v, corner=corner)
        setup = df.triangle_setup(batch.xyw, batch.z, batch.state_idx,
                                  batch.valid, s.state_i,
                                  clip_rect=batch.clip_rect,
                                  clipd=batch.clipd, planar=batch.planar)
        defer_tri = jnp.take(df.deferred_mask(s.state_i),
                             batch.state_idx) & batch.valid
        return s, batch, setup, defer_tri

    def vm(fn):
        return lambda st, fs, is_: jax.vmap(
            lambda f, i: fn(st, f, i))(fs, is_)

    def s_floor(st, f, i):
        return f.sum() + i.sum()

    def s_unpack(st, f, i):
        s = scene_of(st, f, i)
        return s.local.sum() + s.state_f.sum()

    def s_vertex(st, f, i):
        s = scene_of(st, f, i)
        world = fr.compose_world(s.local, s.parent, levels)
        clip, color, *_ = fr.transform_and_light(s, levels, world,
                                                 corner=corner)
        return clip.sum() + color.sum()

    def s_setup(st, f, i):
        _s, _b, setup, _d = upto_setup(st, f, i)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(setup))

    def s_solve(st, f, i):
        from ckrenderengine_tpu.raster.tiled import depth_reduce_tiled
        s, batch, setup, defer = upto_setup(st, f, i)
        bi, bd, pk = depth_reduce_tiled(setup, defer, s.clear_z, s.viewport,
                                        batch.xyw, height, width)
        return bi.sum() + bd.sum()

    def one_frame(st, f, i, allow_pallas):
        p = {k: v for k, v in params.items()
             if k not in ("layout", "levels", "height", "width", "texdev",
                          "texdev_rects", "world_in")}
        out = fr.render_frame_packed_impl(
            st, f, i, layout, levels, height, width,
            allow_pallas=allow_pallas, **p)
        return out[0]

    def vm_full(st, fs, is_):
        return jax.vmap(lambda f, i: one_frame(st, f, i, False).sum())(
            fs, is_).sum()

    def scan_full(st, fs, is_):
        def body(c, xs):
            f, i = xs
            return c, one_frame(st, f, i, True).sum()
        _, ys = jax.lax.scan(body, jnp.int32(0), (fs, is_))
        return ys.sum()

    def full1(st, fs, is_):
        # single context through the Pallas path (per-context cost floor)
        return one_frame(st, fs[0], is_[0], True).sum()

    stages = {
        "floor": vm(s_floor), "unpack": vm(s_unpack), "vertex": vm(s_vertex),
        "setup": vm(s_setup), "solve": vm(s_solve),
        "full1": full1, "vm_full": vm_full, "scan_full": scan_full,
    }
    names = [x for x in args.stages.split(",") if x in stages]
    jits = {}
    for nm in names:
        jf = jax.jit(stages[nm])
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jf(static, dyn_f, dyn_i)))
        print(f"compiled {nm} [{time.perf_counter()-t0:.0f}s]", flush=True)
        jits[nm] = jf
    best = {nm: 1e9 for nm in names}
    for _ in range(args.rounds):
        for nm in names:
            jf = jits[nm]
            np.asarray(jax.device_get(jf(static, dyn_f, dyn_i)))
            t0 = time.perf_counter()
            for _i in range(args.iters):
                out = jf(static, dyn_f, dyn_i)
            np.asarray(jax.device_get(out))
            best[nm] = min(best[nm],
                           (time.perf_counter() - t0) / args.iters * 1000)
    print(f"-- {n} ctx x {args.size}^2 --")
    prev = 0.0
    for nm in names:
        print(f"{nm:10s} {best[nm]:8.2f} ms/batch  (+{best[nm]-prev:7.2f})",
              flush=True)
        prev = best[nm]


if __name__ == "__main__":
    main()
