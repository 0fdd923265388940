"""Isolate the solve-vs-fetch kernel costs on the config-5 scene (TPU)."""

import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.stages import build_packed
    from ckrenderengine_tpu.pipeline import frame as fr
    from ckrenderengine_tpu.raster import deferred as df
    from ckrenderengine_tpu.raster.pallas_tiled import depth_reduce_tiled_pallas

    rc, static, dyn_f, dyn_i, params = build_packed("config5")
    layout = params["layout"]
    levels = params["levels"]
    height, width = params["height"], params["width"]
    corner = params.get("corner", (0, 0, 0))

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

    def tbl_of(scene, batch, setup=None):
        refl = batch.refl if batch.refl.shape[-1] else None
        if setup is not None:   # production compact table
            return df.shade_row_table_compact(
                batch.xyw, batch.color, batch.specular, batch.uv, batch.fog,
                batch.state_idx, batch_refl=refl,
                e_coef=setup.get("e9", setup["e_coef"]),
                inv_det_s=setup["inv_det_s"], planar=batch.planar)
        return df.shade_row_table(
            batch.xyw, batch.color, batch.specular, batch.uv, batch.fog,
            batch.state_idx, scene.state_i, scene.state_f, scene.tex_hw,
            batch_refl=refl)

    def mk(name):
        def probe_keys(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            r = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                _probe="keys", planar=b.planar)
            return sum(x.sum() for x in r)

        def probe_sort(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            r = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                _probe="sort", planar=b.planar)
            return sum(x.sum() for x in r)

        def probe_phase_a(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            r = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                _probe="phase_a", planar=b.planar)
            return sum(x.sum() for x in r)

        def kernel_only(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                _probe="kernel", planar=b.planar)
            return bi.sum() + bd.sum()

        def solve_nofetch(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                planar=b.planar)
            return bi.sum() + bd.sum()

        def tblbuild(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            return tbl_of(s, b, setup).sum()

        def kernel_fetch(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, fetched = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b, setup), _probe="kernel",
                planar=b.planar)
            return bi.sum() + fetched.sum()

        def fetch_phase_a(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            r = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b), _probe="phase_a")
            return sum(x.sum() for x in r)

        def fetch_w8(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk, frr = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b)[:, :8])
            return bi.sum() + frr.sum()

        def fetch_lowprec(st, f, i):
            from ckrenderengine_tpu.raster import pallas_tiled as pt
            pt._FETCH_PRECISION = jax.lax.Precision.DEFAULT
            s, b, setup, defer = upto_setup(st, f, i)
            # _probe="lowprec" is unhandled (acts like None) but keys a
            # separate jit cache entry so the global actually applies.
            bi, bd, pk, frr = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b), _probe="lowprec")
            pt._FETCH_PRECISION = jax.lax.Precision.HIGHEST
            return bi.sum() + frr.sum()

        def fetch_out8(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            r = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b), _probe="fetch_out8")
            return sum(x.sum() for x in r)

        def full_fetch(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk, frr = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b, setup), planar=b.planar)
            return bi.sum() + frr.sum()

        def expand_fetch(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk, frr = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b, setup), planar=b.planar)
            rows = df.expand_rows_compact(frr, s.state_i, s.state_f, s.tex_hw)
            return bi.sum() + rows.sum()

        def probe_bins(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            return depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                _probe="bins", planar=b.planar)

        def quant_shade(st, f, i):
            """Production quant path: solve w/ e-planes + 16-word int32
            gather + unpack + shade."""
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk, epl = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                planar=b.planar, want_eplanes=True)
            refl = b.refl if b.refl.shape[-1] else None
            tbl = df.shade_row_table_quant(
                b.xyw, b.color, b.specular, b.uv, b.fog, b.state_idx,
                batch_refl=refl, inv_det_s=setup["inv_det_s"],
                planar=b.planar, want_ws=False)
            tblT = jax.lax.optimization_barrier(tbl.T)
            tid = jnp.clip(bi, 0, tbl.shape[0] - 1).reshape(-1)
            rows_q = jnp.take(tblT, tid, axis=1).reshape(
                tbl.shape[1], height, width)
            rows_q = jnp.where((bi >= 0)[None], rows_q, jnp.int32(0))
            rows = df.expand_rows_quant(rows_q, s.state_i, s.state_f,
                                        s.tex_hw, want_ws=False,
                                        has_refl=refl is not None)
            clear_fb = jnp.broadcast_to(
                s.clear_color[:, None, None].astype(jnp.float32),
                (4, height, width))
            fb = df.shade_rows(rows, bi >= 0, s.tex_planes, s.tex_hw,
                               s.fog_color, clear_fb, height, width,
                               sampler_profile=params.get("sampler_profile"),
                               tex_quad=s.tex_quad,
                               eplanes=(epl[0], epl[1], epl[2]))
            return fb.sum()

        def quant_nogather(st, f, i):
            """Solve w/ e-planes + table build only (no per-pixel work)."""
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk, epl = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                planar=b.planar, want_eplanes=True)
            refl = b.refl if b.refl.shape[-1] else None
            tbl = df.shade_row_table_quant(
                b.xyw, b.color, b.specular, b.uv, b.fog, b.state_idx,
                batch_refl=refl, inv_det_s=setup["inv_det_s"],
                planar=b.planar, want_ws=False)
            return bi.sum() + epl.sum() + tbl.sum()

        def gather_only(st, f, i):
            """Solve + the 786k-row per-pixel compact-row gather only."""
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                planar=b.planar)
            tbl = tbl_of(s, b, setup)                      # (T, 44)
            t = tbl.shape[0]
            tblT = jax.lax.optimization_barrier(tbl.T)
            tid = jnp.clip(bi, 0, t - 1).reshape(-1)
            rows_c = jnp.take(tblT, tid, axis=1).reshape(
                tbl.shape[1], height, width)
            return bi.sum() + rows_c.sum()

        def gather_expand(st, f, i):
            """gather_only + the per-pixel state re-join."""
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                planar=b.planar)
            tbl = tbl_of(s, b, setup)                      # (T, 44)
            t = tbl.shape[0]
            tblT = jax.lax.optimization_barrier(tbl.T)
            tid = jnp.clip(bi, 0, t - 1).reshape(-1)
            rows_c = jnp.take(tblT, tid, axis=1).reshape(
                tbl.shape[1], height, width)
            rows_c = jnp.where((bi >= 0)[None], rows_c, 0.0)
            rows = df.expand_rows_compact(rows_c, s.state_i, s.state_f,
                                          s.tex_hw)
            return bi.sum() + rows.sum()

        def gather_shade(st, f, i):
            """Alternative: solve WITHOUT fetch + per-pixel compact-row
            gather + expand + shade (the pre-fetch design, compact table)."""
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                planar=b.planar)
            tbl = tbl_of(s, b, setup)                      # (T, 44)
            t = tbl.shape[0]
            tblT = jax.lax.optimization_barrier(tbl.T)
            tid = jnp.clip(bi, 0, t - 1).reshape(-1)
            rows_c = jnp.take(tblT, tid, axis=1).reshape(
                tbl.shape[1], height, width)
            rows_c = jnp.where((bi >= 0)[None], rows_c, 0.0)
            rows = df.expand_rows_compact(rows_c, s.state_i, s.state_f,
                                          s.tex_hw)
            clear_fb = jnp.broadcast_to(
                s.clear_color[:, None, None].astype(jnp.float32),
                (4, height, width))
            fb = df.shade_rows(rows, bi >= 0, s.tex_planes, s.tex_hw,
                               s.fog_color, clear_fb, height, width,
                               sampler_profile=params.get("sampler_profile"),
                               tex_quad=s.tex_quad)
            return fb.sum()

        def shade_fetch(st, f, i):
            s, b, setup, defer = upto_setup(st, f, i)
            bi, bd, pk, frr = depth_reduce_tiled_pallas(
                setup, defer, s.clear_z, s.viewport, b.xyw, height, width,
                shade_tbl=tbl_of(s, b, setup), planar=b.planar)
            rows = df.expand_rows_compact(frr, s.state_i, s.state_f, s.tex_hw)
            clear_fb = jnp.broadcast_to(
                s.clear_color[:, None, None].astype(jnp.float32),
                (4, height, width))
            fb = df.shade_rows(rows, bi >= 0, s.tex_planes, s.tex_hw,
                               s.fog_color, clear_fb, height, width,
                               sampler_profile=params.get("sampler_profile"),
                               tex_quad=s.tex_quad)
            return fb.sum()

        return locals()[name]

    prev = 0.0
    names = sys.argv[1:] or ["solve_nofetch", "tblbuild", "kernel_fetch",
                             "full_fetch", "expand_fetch", "shade_fetch"]
    for name in names:
        fn = jax.jit(mk(name))
        t0 = time.perf_counter()
        r = fn(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r)).sum()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            r = fn(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r))
        ms = (time.perf_counter() - t0) / iters * 1000
        extra = ""
        if name == "probe_bins":
            v = np.asarray(jax.device_get(r))
            extra = (f"  [n_small={v[0]} n_mid={v[1]} n_glob={v[2]}"
                     f" n_live_pairs={v[3]} peak={v[4]}]")
        print(f"{name:14s} {ms:9.2f} ms (+{ms - prev:8.2f})  "
              f"[compile {t_compile:.0f}s]{extra}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
