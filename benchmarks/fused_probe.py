"""Round-3 probe: cost of the fused quant fetch vs the per-pixel gather.

Times (honest pipelined windows) on the config-5 scene:
  solve_plain   solve + want_eplanes, NO fetch        (round-2 production)
  gather_path   solve_plain + quant tbl + per-pixel row gather + zero mask
  fused         solve + want_eplanes + sh_pack=2 fused fetch
  fused_pa      fused, _probe=phase_a  (binning + stream build only)
  fused_kr      fused, _probe=kernel   (phase A + kernel, no fallbacks/tail)
  plain_pa      plain, _probe=phase_a
  plain_kr      plain, _probe=kernel
"""
import sys, time, os
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
    layout, levels = params["layout"], params["levels"]
    height, width = params["height"], params["width"]
    corner = params.get("corner", (0, 0, 0))
    caps = dict(pair_cap=65536, slab_cap=131072)

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

    def qtbl(scene, batch, setup):
        return df.shade_row_table_quant(
            batch.xyw, batch.color, batch.specular, batch.uv, batch.fog,
            batch.state_idx, batch_refl=None,
            inv_det_s=setup["inv_det_s"], planar=batch.planar, want_ws=False)

    def solve_plain(st, f, i):
        scene, batch, setup, defer = upto_setup(st, f, i)
        bi, bd, pk, ep = depth_reduce_tiled_pallas(
            setup, defer, scene.clear_z, scene.viewport, batch.xyw,
            height, width, planar=batch.planar, want_eplanes=True, **caps)
        return bi.sum() + bd.sum() + ep.sum()

    def gather_path(st, f, i):
        scene, batch, setup, defer = upto_setup(st, f, i)
        bi, bd, pk, ep = depth_reduce_tiled_pallas(
            setup, defer, scene.clear_z, scene.viewport, batch.xyw,
            height, width, planar=batch.planar, want_eplanes=True, **caps)
        tbl = qtbl(scene, batch, setup)
        tblT = jax.lax.optimization_barrier(tbl.T)
        tid = jnp.clip(bi, 0, batch.valid.shape[0] - 1).reshape(-1)
        rows_q = jnp.take(tblT, tid, axis=1).reshape(tbl.shape[1], height, width)
        rows_q = jnp.where((bi >= 0)[None], rows_q, jnp.int32(0))
        return rows_q.sum() + bd.sum() + ep.sum()

    def fused(st, f, i, probe=None):
        scene, batch, setup, defer = upto_setup(st, f, i)
        tbl = qtbl(scene, batch, setup)
        out = depth_reduce_tiled_pallas(
            setup, defer, scene.clear_z, scene.viewport, batch.xyw,
            height, width, planar=batch.planar, want_eplanes=True,
            shade_tbl=tbl, sh_pack=2, _probe=probe, **caps)
        return sum(jnp.asarray(o).sum() for o in out)

    def plain_probe(st, f, i, probe=None):
        scene, batch, setup, defer = upto_setup(st, f, i)
        out = depth_reduce_tiled_pallas(
            setup, defer, scene.clear_z, scene.viewport, batch.xyw,
            height, width, planar=batch.planar, want_eplanes=True,
            _probe=probe, **caps)
        return sum(jnp.asarray(o).sum() for o in out)

    import functools
    cases = [
        ("solve_plain", solve_plain),
        ("gather_path", gather_path),
        ("fused", fused),
        ("fused_pa", functools.partial(fused, probe="phase_a")),
        ("fused_kr", functools.partial(fused, probe="kernel")),
        ("plain_pa", functools.partial(plain_probe, probe="phase_a")),
        ("plain_kr", functools.partial(plain_probe, probe="kernel")),
    ]
    iters = 8
    for name, fn in cases:
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        r = jf(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            r = jf(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r))
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:12s} {ms:8.2f} ms   [compile {tc:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
