"""On-TPU (Mosaic) parity gate for ALL Pallas kernels.

The 533-test suite runs the kernels in interpret mode on CPU; a Mosaic
lowering divergence would ship invisibly (the driver bench would just
render wrong pixels fast). This module compiles the real kernels on the
current backend and checks them against their XLA references:

  solve       tiled XLA solve vs Pallas streaming solve — ids+depth exact
  fetch       in-kernel one-hot f32 row fetch vs the per-pixel gather
  eplanes     exported winner (e0,e1,e2) vs recomputation from the winner's
              edge coefficients (same formula; FMA-tolerant compare)
  quant       sh_pack=2 int32 fused fetch — BIT-exact vs gathered table
  ordered     affine ordered-blend kernel vs the sequential XLA composite

``run_parity()`` returns {name: bool}; bench.py emits the result as a JSON
line so every BENCH_r*.json proves Mosaic==XLA before reporting fps.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _solve_fixture(T=9000, H=320, W=512, seed=3):
    import jax.numpy as jnp
    from ckrenderengine_tpu.raster import deferred as df
    from ckrenderengine_tpu.raster.types import SI_CULL, VXCULL

    rng = np.random.default_rng(seed)
    xyw = np.zeros((T, 3, 3), np.float32)
    ctr = rng.uniform([0, 0], [W, H], (T, 2)).astype(np.float32)
    for k in range(3):
        ang = rng.uniform(0, 2 * np.pi, T)
        rad = rng.uniform(2, 60, T)
        w = rng.uniform(0.5, 2.0, T).astype(np.float32)
        xyw[:, k, 0] = (ctr[:, 0] + np.cos(ang) * rad) * w
        xyw[:, k, 1] = (ctr[:, 1] + np.sin(ang) * rad) * w
        xyw[:, k, 2] = w
    z = rng.uniform(0, 1, (T, 3)).astype(np.float32) * xyw[:, :, 2]
    state_i = np.zeros((1, 32), np.int32)
    state_i[:, SI_CULL] = int(VXCULL.NONE)
    setup = df.triangle_setup(
        jnp.asarray(xyw), jnp.asarray(z), jnp.zeros(T, jnp.int32),
        jnp.ones(T, bool), jnp.asarray(state_i))
    vp = jnp.asarray([0, 0, W, H], jnp.float32)
    return setup, jnp.asarray(xyw), vp, T, H, W, rng


def check_solve_and_fetch():
    import jax
    import jax.numpy as jnp
    from ckrenderengine_tpu.raster.pallas_tiled import depth_reduce_tiled_pallas
    from ckrenderengine_tpu.raster.tiled import depth_reduce_tiled

    setup, xyw, vp, T, H, W, rng = _solve_fixture()
    defer = jnp.ones(T, bool)
    tbl = jnp.asarray(rng.uniform(-1, 1, (T, 65)).astype(np.float32))
    qwords = rng.integers(-2 ** 31, 2 ** 31, (T, 16), dtype=np.int64)
    qwords[:, 2] = np.int64(0x7FC00001 - 2 ** 32)     # f32 NaN bit pattern
    qtbl = jnp.asarray(qwords.astype(np.int32))

    bi0, bd0, _ = depth_reduce_tiled(setup, defer, 1.0, vp, xyw, H, W)
    bi1, bd1, _, rows = depth_reduce_tiled_pallas(
        setup, defer, 1.0, vp, xyw, H, W, shade_tbl=tbl)
    bi2, bd2, _, ep, qrows = depth_reduce_tiled_pallas(
        setup, defer, 1.0, vp, xyw, H, W, shade_tbl=qtbl, sh_pack=2,
        want_eplanes=True)
    (bi0, bd0, bi1, bd1, rows, bi2, bd2, ep, qrows) = map(
        np.asarray, jax.device_get(
            (bi0, bd0, bi1, bd1, rows, bi2, bd2, ep, qrows)))

    out = {}
    out["solve"] = bool((bi0 == bi1).all() and (bd0 == bd1).all()
                        and (bi0 == bi2).all() and (bd0 == bd2).all())
    hit = bi1 >= 0
    want = np.asarray(tbl)[np.clip(bi1, 0, T - 1)]
    got = np.moveaxis(rows, 0, -1)
    out["fetch"] = bool(np.array_equal(got[hit], want[hit])
                        and (got[~hit] == 0).all())
    wantq = np.asarray(qtbl)[np.clip(bi2, 0, T - 1)]
    gotq = np.moveaxis(qrows, 0, -1)
    out["quant"] = bool(np.array_equal(gotq[hit], wantq[hit])
                        and (gotq[~hit] == 0).all()
                        and qrows.dtype == np.int32)
    # eplanes: recompute e_k(px) from the winner's edge coefficients.
    e9 = np.asarray(setup["e9"])
    ecw = e9[np.clip(bi2, 0, T - 1)]                       # (H, W, 9)
    px = np.arange(W, dtype=np.float32)[None, :] + 0.5
    py = np.arange(H, dtype=np.float32)[:, None] + 0.5
    ok = True
    for k in range(3):
        ref = ecw[..., 3 * k] * px + ecw[..., 3 * k + 1] * py + ecw[..., 3 * k + 2]
        scale = np.abs(ecw[..., 3 * k] * px) + np.abs(
            ecw[..., 3 * k + 1] * py) + np.abs(ecw[..., 3 * k + 2]) + 1e-20
        ok &= bool(np.all(np.abs(ep[k][hit] - ref[hit]) <= 1e-5 * scale[hit]))
    out["eplanes"] = ok and bool((ep[:, ~hit] == 0).all())
    return out


def check_ordered():
    import jax
    import jax.numpy as jnp
    from ckrenderengine_tpu.raster import jax_backend as rb
    from ckrenderengine_tpu.raster.pallas_ordered import (
        ordered_blend_tiled_pallas,
    )
    from ckrenderengine_tpu.raster.types import (
        RasterState, VXBLEND, VXCMP, VXCULL, pack_states,
    )

    h, w = 128, 256
    t = 400
    rng = np.random.default_rng(11)
    over = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                       dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                       cull=int(VXCULL.NONE), fog=True)
    replace = RasterState(z_write=False, cull=int(VXCULL.NONE))
    atest = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                        dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                        alpha_test=True, alpha_func=int(VXCMP.GREATER),
                        alpha_ref=0.35, cull=int(VXCULL.NONE))
    si, sf = pack_states([over, replace, atest])
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)

    xyw = np.zeros((t, 3, 3), np.float32)
    ctr = rng.uniform([0, 0], [w, h], (t, 2)).astype(np.float32)
    for k in range(3):
        ang = rng.uniform(0, 2 * np.pi, t)
        rad = rng.uniform(2, 40, t)
        wv = rng.uniform(0.5, 2.0, t).astype(np.float32)
        xyw[:, k, 0] = (ctr[:, 0] + np.cos(ang) * rad) * wv
        xyw[:, k, 1] = (ctr[:, 1] + np.sin(ang) * rad) * wv
        xyw[:, k, 2] = wv
    z = rng.uniform(0, 1, (t, 3)).astype(np.float32) * xyw[:, :, 2]
    batch = rb.DeviceBatch(
        xyw=jnp.asarray(xyw), z=jnp.asarray(z),
        color=jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32)),
        specular=jnp.asarray(rng.uniform(0, 0.2, (t, 3, 3)).astype(np.float32)),
        uv=jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32)),
        fog=jnp.asarray(rng.uniform(0.3, 1, (t, 3)).astype(np.float32)),
        state_idx=jnp.asarray(rng.integers(0, 3, t).astype(np.int32)),
        valid=jnp.asarray(rng.random(t) < 0.9),
        clip_rect=jnp.asarray(np.tile(
            np.array([[-1e9, -1e9, 1e9, 1e9]], np.float32), (t, 1))),
        clipd=jnp.zeros((t, 3, 0), jnp.float32),
        refl=jnp.zeros((t, 3, 0), jnp.float32))
    fb = jnp.asarray(rng.uniform(0, 1, (4, h, w)).astype(np.float32))
    zb = jnp.asarray(rng.uniform(0.3, 1.0, (h, w)).astype(np.float32))
    fog_color = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    tex_planes = jnp.zeros((1, 4, 2, 2), jnp.float32)
    tex_hw = jnp.asarray([[2, 2]], jnp.int32)
    profile = (False, False, False, True, False)

    fb_ref, _ = rb.render_pass(fb, zb, batch, si, sf, tex_planes, tex_hw,
                               fog_color, viewport, chunk=1,
                               sampler_profile=profile)
    a, b, bad = ordered_blend_tiled_pallas(
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        si, sf, fog_color, zb, viewport, h, w)
    fb_k = np.asarray(a * fb + b)
    fb_ref = np.asarray(fb_ref)
    return {"ordered": bool(not bool(bad)
                            and np.allclose(fb_k, fb_ref, atol=1e-4))}


def check_peel():
    """Layer-peel kernel vs the sequential pass on a bounded-depth textured
    alpha scene (compiled Mosaic on TPU; the CPU suite runs it in interpret
    mode only)."""
    import jax.numpy as jnp
    from types import SimpleNamespace

    import numpy as np
    from ckrenderengine_tpu.pipeline.frame import _composite_peeled
    from ckrenderengine_tpu.raster import jax_backend as rb
    from ckrenderengine_tpu.raster.pallas_ordered import (
        ordered_peel_tiled_pallas,
    )
    from ckrenderengine_tpu.raster.types import (
        RasterState, VXBLEND, VXCMP, VXCULL, VXTEXTURE_FILTER, pack_states,
    )

    h, w = 96, 128
    rng = np.random.default_rng(21)
    tex_over = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                           dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                           cull=int(VXCULL.NONE), fog=True, tex=0,
                           tex_filter=int(VXTEXTURE_FILTER.LINEAR))
    plain = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                        dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                        cull=int(VXCULL.NONE))
    si, sf = pack_states([tex_over, plain])
    pts = []
    spacing, rad = 24, 9.0
    for l in range(3):
        for cy in range(spacing // 2, h, spacing):
            for cx in range(spacing // 2, w, spacing):
                ang = rng.uniform(0, 2 * np.pi, 3)
                r = rng.uniform(rad * 0.5, rad, 3)
                pts.append(np.stack([cx + np.cos(ang) * r,
                                     cy + np.sin(ang) * r], -1))
    pts = np.asarray(pts, np.float32)
    t = pts.shape[0]
    wgt = rng.uniform(0.5, 2.0, (t, 3, 1)).astype(np.float32)
    xyw = jnp.asarray(np.concatenate([pts * wgt, wgt], -1))
    z = jnp.asarray(rng.uniform(0.05, 0.5, (t, 3)).astype(np.float32))
    batch = rb.DeviceBatch(
        xyw=xyw, z=z,
        color=jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32)),
        specular=jnp.asarray(
            rng.uniform(0, 0.2, (t, 3, 3)).astype(np.float32)),
        uv=jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32)),
        fog=jnp.asarray(rng.uniform(0.3, 1, (t, 3)).astype(np.float32)),
        state_idx=jnp.asarray(rng.integers(0, 2, t).astype(np.int32)),
        valid=jnp.ones(t, bool),
        clip_rect=jnp.asarray(np.tile(
            np.array([[-1e9, -1e9, 1e9, 1e9]], np.float32), (t, 1))),
        clipd=jnp.zeros((t, 3, 0), jnp.float32),
        refl=jnp.zeros((t, 3, 0), jnp.float32))
    tex_planes = jnp.asarray(
        rng.uniform(0.1, 1.0, (1, 4, 8, 8)).astype(np.float32))
    tex_hw = jnp.asarray([[8, 8]], np.int32)
    fb = jnp.asarray(rng.uniform(0, 1, (4, h, w)).astype(np.float32))
    zb = jnp.asarray(rng.uniform(0.6, 1.0, (h, w)).astype(np.float32))
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    scene = SimpleNamespace(
        state_i=jnp.asarray(si), state_f=jnp.asarray(sf),
        tex_planes=tex_planes, tex_hw=tex_hw,
        fog_color=jnp.asarray([0.2, 0.3, 0.4], jnp.float32), tex_quad=None)
    profile = (True, False, False, True, True, False, True)
    fb_ref, _ = rb.render_pass(fb, zb, batch, jnp.asarray(si),
                               jnp.asarray(sf), tex_planes, tex_hw,
                               scene.fog_color, viewport, chunk=1,
                               sampler_profile=profile)
    lids, les, bad = ordered_peel_tiled_pallas(
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        jnp.asarray(si), jnp.asarray(sf), zb, viewport, h, w)
    fb_k = _composite_peeled(fb, batch, lids, les, scene, profile, h, w)
    return {"peel": bool(not bool(bad)
                         and np.allclose(np.asarray(fb_k),
                                         np.asarray(fb_ref), atol=0.02))}


def run_parity() -> dict:
    """All kernel parity checks on the CURRENT jax backend. {name: bool}."""
    out = {}
    out.update(check_solve_and_fetch())
    out.update(check_ordered())
    out.update(check_peel())
    return out


if __name__ == "__main__":
    res = run_parity()
    for k, v in res.items():
        print(f"{k:8s} {'OK' if v else 'FAIL'}")
    if not all(res.values()):
        sys.exit(1)
    print("TPU PARITY OK")
