"""What does the 4.25 ms per-frame floor consist of? Interleaved probes:
  dev2      two pre-uploaded DEVICE buffers (pure dispatch + readback sched)
  np2       the production case: two numpy buffers transferred per call
  np1       ONE combined numpy buffer of the same total bytes
  np2_put   two jax.device_put'd arrays per call (async transfer API)
Also solve phase internals via _probe levels (keys/sort/phase_a/kernel).
"""
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

    rc, static, dyn_f, dyn_i, params = build_packed("config5")
    layout, levels = params["layout"], params["levels"]
    height, width = params["height"], params["width"]
    corner = params.get("corner", (0, 0, 0))
    caps = dict(pair_cap=65536, slab_cap=131072)
    print("buf sizes:", dyn_f.nbytes, dyn_i.nbytes, flush=True)

    dev_f = jax.device_put(dyn_f)
    dev_i = jax.device_put(dyn_i)
    jax.block_until_ready((dev_f, dev_i))
    comb = np.concatenate([dyn_f.view(np.int32), dyn_i]).copy()

    fsum = jax.jit(lambda f, i: f.sum() + i.sum())
    csum = jax.jit(lambda c: c.sum())

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

    def probe_of(name):
        def f(st, f_, i_):
            scene, batch, setup, defer = upto_setup(st, f_, i_)
            out = depth_reduce_tiled_pallas(
                setup, defer, scene.clear_z, scene.viewport, batch.xyw,
                height, width, planar=batch.planar, _probe=name, **caps)
            return sum(jnp.asarray(o).sum() for o in out)
        return f

    jf_keys = jax.jit(probe_of("keys"))
    jf_sort = jax.jit(probe_of("sort"))
    jf_pa = jax.jit(probe_of("phase_a"))
    jf_kr = jax.jit(probe_of("kernel"))

    cases = {
        "dev2": lambda: fsum(dev_f, dev_i),
        "np2": lambda: fsum(dyn_f, dyn_i),
        "np1": lambda: csum(comb),
        "np2_put": lambda: fsum(jax.device_put(dyn_f), jax.device_put(dyn_i)),
        "keys": lambda: jf_keys(static, dyn_f, dyn_i),
        "sort": lambda: jf_sort(static, dyn_f, dyn_i),
        "phase_a": lambda: jf_pa(static, dyn_f, dyn_i),
        "kernel": lambda: jf_kr(static, dyn_f, dyn_i),
    }
    for n, fn in cases.items():
        np.asarray(jax.device_get(fn()))       # compile + drain
    iters, rounds = 8, 4
    best = {n: 1e9 for n in cases}
    for r in range(rounds):
        for n, fn in cases.items():
            np.asarray(jax.device_get(fn()))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(jax.device_get(out))
            best[n] = min(best[n], (time.perf_counter() - t0) / iters * 1000)
    for n in cases:
        print(f"{n:9s} {best[n]:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
