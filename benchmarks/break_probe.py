"""Round-3 interleaved breakdown probe (production gather path, config 5).

Cross-process runs on this tunnel show +-2 ms noise; each stage here is
compiled once, then all stages run in ROUND-ROBIN windows and the MIN per
stage over rounds is reported — deltas between adjacent stages are then
trustworthy to a few hundred us."""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from benchmarks.stages import build_packed
    from ckrenderengine_tpu.pipeline import frame as fr
    from ckrenderengine_tpu.raster import deferred as df
    from ckrenderengine_tpu.raster.pallas_tiled import depth_reduce_tiled_pallas

    rc, static, dyn_f, dyn_i, params = build_packed(
        os.environ.get("CK_PROBE_CONFIG", "config5"))
    layout, levels = params["layout"], params["levels"]
    height, width = params["height"], params["width"]
    corner = params.get("corner", (0, 0, 0))
    profile = params.get("sampler_profile")
    caps = dict(pair_cap=int(os.environ.get("CK_PROBE_PAIR_CAP", 65536)),
                slab_cap=int(os.environ.get("CK_PROBE_SLAB_CAP", 131072)),
                g_cap=int(os.environ.get("CK_PROBE_G_CAP", 8192)))

    def upto_setup(st, f, i):
        scene, _sp, _d = fr.unpack_scene(st, f, i, layout)
        world = fr.compose_world(scene.local, scene.parent, levels)
        clip, color, spec, fog, _w, uv, clipd_v, refl_v = \
            fr.transform_and_light(scene, levels, world, corner=corner)
        batch = fr.assemble_triangles(scene, clip, color, spec, fog, uv,
                                      clipd_v, refl_v, corner=corner)
        setup = df.triangle_setup(batch.xyw, batch.z, batch.state_idx,
                                  batch.valid, scene.state_i,
                                  clip_rect=batch.clip_rect, clipd=batch.clipd,
                                  planar=batch.planar)
        defer_tri = jnp.take(df.deferred_mask(scene.state_i),
                             batch.state_idx) & batch.valid
        return scene, batch, setup, defer_tri

    def s_floor(st, f, i):
        return f.sum() + i.sum()

    def s_unpack(st, f, i):
        scene, _sp, _d = fr.unpack_scene(st, f, i, layout)
        return scene.local.sum() + scene.state_f.sum()

    def s_vertex(st, f, i):
        scene, _sp, _d = fr.unpack_scene(st, f, i, layout)
        world = fr.compose_world(scene.local, scene.parent, levels)
        clip, color, *_ = fr.transform_and_light(scene, levels, world,
                                                 corner=corner)
        return clip.sum() + color.sum()

    def s_setup(st, f, i):
        _s, batch, setup, defer = upto_setup(st, f, i)
        return sum(x.sum() for x in jax.tree_util.tree_leaves(setup))

    def _solve(st, f, i, ep):
        scene, batch, setup, defer = upto_setup(st, f, i)
        out = depth_reduce_tiled_pallas(
            setup, defer, scene.clear_z, scene.viewport, batch.xyw,
            height, width, planar=batch.planar, want_eplanes=ep, **caps)
        return scene, batch, setup, out

    def s_solve(st, f, i):
        _s, _b, _su, (bi, bd, pk) = _solve(st, f, i, False)
        return bi.sum() + bd.sum()

    def s_solve_ep(st, f, i):
        _s, _b, _su, (bi, bd, pk, ep) = _solve(st, f, i, True)
        return bi.sum() + bd.sum() + ep.sum()

    def _rows(scene, batch, setup, bi):
        t = batch.valid.shape[0]
        tbl = df.shade_row_table_quant(
            batch.xyw, batch.color, batch.specular, batch.uv, batch.fog,
            batch.state_idx, batch_refl=None,
            inv_det_s=setup["inv_det_s"], planar=batch.planar, want_ws=False)
        tblT = jax.lax.optimization_barrier(tbl.T)
        tid = jnp.clip(bi, 0, t - 1).reshape(-1)
        rows_q = jnp.take(tblT, tid, axis=1).reshape(
            tbl.shape[1], height, width)
        return jnp.where((bi >= 0)[None], rows_q, jnp.int32(0))

    def s_rows(st, f, i):
        scene, batch, setup, (bi, bd, pk, ep) = _solve(st, f, i, True)
        return _rows(scene, batch, setup, bi).sum() + bd.sum() + ep.sum()

    def s_shade(st, f, i):
        scene, batch, setup, (bi, bd, pk, ep) = _solve(st, f, i, True)
        rows_q = _rows(scene, batch, setup, bi)
        fetched = df.expand_rows_quant(rows_q, scene.state_i, scene.state_f,
                                       scene.tex_hw, want_ws=False,
                                       has_refl=False)
        clear_fb = jnp.broadcast_to(
            scene.clear_color[:, None, None].astype(jnp.float32),
            (4, height, width))
        fb = df.shade_rows(fetched, bi >= 0, scene.tex_planes, scene.tex_hw,
                           scene.fog_color, clear_fb, height, width,
                           sampler_profile=profile, tex_quad=scene.tex_quad,
                           eplanes=(ep[0], ep[1], ep[2]))
        return fb.sum() + bd.sum()

    def s_full(st, f, i):
        p = {k: v for k, v in params.items()
             if k not in ("layout", "levels", "height", "width", "texdev",
                          "texdev_rects")}
        out = fr.render_frame_packed_impl(
            st, f, i, layout, levels, height, width,
            texdev=params.get("texdev"),
            texdev_rects=params.get("texdev_rects", ()), **p)
        return sum(x.sum() for x in out if x is not None)

    stages = [("floor", s_floor), ("unpack", s_unpack), ("vertex", s_vertex),
              ("setup", s_setup), ("solve", s_solve),
              ("solve_ep", s_solve_ep), ("rows", s_rows),
              ("shade", s_shade), ("full", s_full)]
    names = os.environ.get("CK_PROBE_STAGES")
    if names:
        keep = set(names.split(","))
        stages = [s for s in stages if s[0] in keep]
    jits = [(n, jax.jit(fn)) for n, fn in stages]
    for n, jf in jits:                       # compile + drain
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jf(static, dyn_f, dyn_i)))
        print(f"compiled {n} [{time.perf_counter()-t0:.0f}s]", flush=True)
    iters, rounds = 6, 4
    best = {n: 1e9 for n, _ in jits}
    for r in range(rounds):
        for n, jf in jits:
            np.asarray(jax.device_get(jf(static, dyn_f, dyn_i)))  # drain
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jf(static, dyn_f, dyn_i)
            np.asarray(jax.device_get(out))
            best[n] = min(best[n], (time.perf_counter() - t0) / iters * 1000)
    prev = 0.0
    for n, _ in jits:
        print(f"{n:9s} {best[n]:8.2f} ms  (+{best[n]-prev:7.2f})", flush=True)
        prev = best[n]


if __name__ == "__main__":
    main()
