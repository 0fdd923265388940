"""Sub-stage probe of assemble_triangles on the config-5 scene (TPU)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from benchmarks.stages import build_packed
    from ckrenderengine_tpu.pipeline import frame as fr
    from ckrenderengine_tpu.math import vxmath as vx
    from ckrenderengine_tpu.raster.deferred import take_small

    rc, static, dyn_f, dyn_i, params = build_packed("config5")
    layout = params["layout"]
    levels = params["levels"]
    corner = params.get("corner", (0, 0, 0))
    nc, itc, p0 = corner

    def upto_vertex(st, f, i):
        s, _sp, _d = fr.unpack_scene(st, f, i, layout)
        world = fr.compose_world(s.local, s.parent, levels)
        clip, color, spec, fog, _w, uv, clipd_v, refl_v = \
            fr.transform_and_light(s, levels, world, corner=corner)
        return s, clip, color, spec, fog, uv

    def mk(name):
        def a_flags(st, f, i):
            s, clip, color, spec, fog, uv = upto_vertex(st, f, i)
            flags = vx.clip_flags(clip)
            i0, i1, i2 = s.tri_idx[:, 0], s.tri_idx[:, 1], s.tri_idx[:, 2]
            head = jax.lax.slice_in_dim(flags, 0, nc, axis=0).reshape(itc, 3)
            reject = (head[:, 0] & head[:, 1] & head[:, 2]) != 0
            return reject.sum()

        def a_joins(st, f, i):
            s, clip, color, spec, fog, uv = upto_vertex(st, f, i)
            head = jax.lax.slice_in_dim(s.vert_entity, 0, nc, axis=0)[::3]
            vis_ext = jnp.concatenate(
                [s.entity_visible, jnp.ones((1,), bool)], axis=0)
            ent_vis = take_small(vis_ext, head)
            open_rect = jnp.array([[-1e9, -1e9, 1e9, 1e9]], jnp.float32)
            clip_ext = jnp.concatenate([s.entity_clip, open_rect], axis=0)
            tri_rect = take_small(clip_ext, head)
            return ent_vis.sum() + tri_rect.sum()

        def a_vrow(st, f, i):
            s, clip, color, spec, fog, uv = upto_vertex(st, f, i)
            x, y, z, w = clip[:, 0], clip[:, 1], clip[:, 2], clip[:, 3]
            vparts = [jnp.stack([x, y, w], axis=-1), z[:, None], color, spec,
                      uv, fog[:, None]]
            vrow = jnp.concatenate(vparts, axis=-1)
            return vrow.sum()

        def a_corners(st, f, i):
            s, clip, color, spec, fog, uv = upto_vertex(st, f, i)
            x, y, z, w = clip[:, 0], clip[:, 1], clip[:, 2], clip[:, 3]
            vparts = [jnp.stack([x, y, w], axis=-1), z[:, None], color, spec,
                      uv, fog[:, None]]
            vrow = jnp.concatenate(vparts, axis=-1)
            head = jax.lax.slice_in_dim(vrow, 0, nc, axis=0)
            corners = head.reshape((itc, 3) + vrow.shape[1:])
            return corners.sum()

        def a_full(st, f, i):
            s, clip, color, spec, fog, uv = upto_vertex(st, f, i)
            batch = fr.assemble_triangles(s, clip, color, spec, fog, uv,
                                          None, None, corner=corner)
            return batch.xyw.sum() + batch.valid.sum()

        return locals()[name]

    prev = 0.0
    names = sys.argv[1:] or ["a_flags", "a_joins", "a_vrow", "a_corners",
                             "a_full"]
    for name in names:
        fn = jax.jit(mk(name))
        t0 = time.perf_counter()
        r = fn(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r)).sum()
        t_c = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            r = fn(static, dyn_f, dyn_i)
        np.asarray(jax.device_get(r))
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:10s} {ms:9.2f} ms (+{ms - prev:8.2f})  [compile {t_c:.0f}s]",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
