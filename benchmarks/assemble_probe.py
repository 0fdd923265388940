"""Sub-step timing of the triangle-assembly stage on config 5 (TPU)."""

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
    from ckrenderengine_tpu.raster.deferred import take_small
    from ckrenderengine_tpu.math import vxmath as vx

    rc, static, dyn_f, dyn_i, params = build_packed("config5")
    layout = params["layout"]
    levels = params["levels"]
    corner = params.get("corner", (0, 0, 0))
    nc, itc, _p0 = corner

    def upto_vertex(st, f, i):
        scene, _sp, _d = fr.unpack_scene(st, f, i, layout)
        world = fr.compose_world(scene.local, scene.parent, levels)
        out = fr.transform_and_light(scene, levels, world, corner=corner)
        return scene, out

    def mk(name):
        def vertex(st, f, i):
            scene, (clip, color, spec, fog, _w, uv, clipd_v, refl_v) = \
                upto_vertex(st, f, i)
            return clip.sum() + color.sum() + spec.sum() + fog.sum() + uv.sum()

        def flags_cull(st, f, i):
            """clip-flag AND-reduce + entity gates only."""
            scene, (clip, color, spec, fog, _w, uv, clipd_v, refl_v) = \
                upto_vertex(st, f, i)
            i0, i1, i2 = (scene.tri_idx[:, 0], scene.tri_idx[:, 1],
                          scene.tri_idx[:, 2])
            flags = vx.clip_flags(clip)
            head = jax.lax.slice_in_dim(flags, 0, nc, axis=0).reshape(itc, 3)
            reject = (head[:, 0] & head[:, 1] & head[:, 2]) != 0
            vis_ext = jnp.concatenate(
                [scene.entity_visible, jnp.ones((1,), bool)], axis=0)
            tri_ent = jnp.take(scene.vert_entity, i0, axis=0)
            ent_vis = take_small(vis_ext, tri_ent)
            return reject.sum() + ent_vis.sum()

        def vrow_corners(st, f, i):
            """the packed wide row + corner-major reshape only."""
            scene, (clip, color, spec, fog, _w, uv, clipd_v, refl_v) = \
                upto_vertex(st, f, i)
            vxp, vyp, vw_, vh_ = (scene.viewport[0], scene.viewport[1],
                                  scene.viewport[2], scene.viewport[3])
            x, y, z, w = clip[:, 0], clip[:, 1], clip[:, 2], clip[:, 3]
            sx = (vxp + vw_ * 0.5) * w + x * vw_ * 0.5
            sy = (vyp + vh_ * 0.5) * w - y * vh_ * 0.5
            vrow = jnp.concatenate(
                [jnp.stack([sx, sy, w], -1), z[:, None], color, spec, uv,
                 fog[:, None]], axis=-1)
            head = jax.lax.slice_in_dim(vrow, 0, nc, axis=0)
            corners = head.reshape(itc, 3, vrow.shape[1])
            return corners.sum()

        def assemble(st, f, i):
            scene, (clip, color, spec, fog, _w, uv, clipd_v, refl_v) = \
                upto_vertex(st, f, i)
            batch = fr.assemble_triangles(scene, clip, color, spec, fog, uv,
                                          clipd_v, refl_v, corner=corner)
            return (batch.xyw.sum() + batch.color.sum() + batch.uv.sum()
                    + batch.valid.sum() + batch.z.sum() + batch.fog.sum()
                    + batch.specular.sum())

        return locals()[name]

    prev = 0.0
    for name in ("vertex", "flags_cull", "vrow_corners", "assemble"):
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
        print(f"{name:13s} {ms:9.2f} ms (+{ms - prev:8.2f})  "
              f"[compile {t_compile:.0f}s]", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
