"""Textured ordered transparency: the draw-order layer-peel kernel + K
dense shade/blend passes must reproduce the sequential XLA ordered pass
(within the documented u8 vertex-color quantization of the quantized shade
rows), including draw order, alpha test on sampled alpha, mixed
textured/untextured states, and the layer-overflow fallback flag."""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.pipeline.frame import _composite_peeled
from ckrenderengine_tpu.raster import jax_backend as rb
from ckrenderengine_tpu.raster.pallas_ordered import ordered_peel_tiled_pallas
from ckrenderengine_tpu.raster.types import (
    RasterState, VXBLEND, VXCMP, VXCULL, VXTEXTURE_FILTER, pack_states,
)
from tests.test_tiled_raster import _random_batch


def _states():
    tex_over = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                           dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                           cull=int(VXCULL.NONE), fog=True, tex=0,
                           tex_filter=int(VXTEXTURE_FILTER.LINEAR))
    plain_over = RasterState(alpha_blend=True,
                             src_blend=int(VXBLEND.SRCALPHA),
                             dst_blend=int(VXBLEND.INVSRCALPHA),
                             z_write=False, cull=int(VXCULL.NONE))
    tex_atest = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                            dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                            alpha_test=True, alpha_func=int(VXCMP.GREATER),
                            alpha_ref=0.4, cull=int(VXCULL.NONE), tex=0)
    return pack_states([tex_over, plain_over, tex_atest])


def _tex():
    rng = np.random.default_rng(5)
    img = rng.uniform(0.1, 1.0, (1, 4, 8, 8)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray([[8, 8]], np.int32)


def _scene_ns(si, sf, tex_planes, tex_hw):
    return SimpleNamespace(
        state_i=jnp.asarray(si), state_f=jnp.asarray(sf),
        tex_planes=tex_planes, tex_hw=tex_hw,
        fog_color=jnp.asarray([0.2, 0.3, 0.4], jnp.float32),
        tex_quad=None)


def _bounded_batch(seed, h, w, layers=3, spacing=16, rad=6.0):
    """Grid-placed small triangles in ``layers`` passes: per-pass disjoint
    cells bound the per-pixel ordered depth to <= layers (the peel's K)."""
    rng = np.random.default_rng(seed)
    pts = []
    for l in range(layers):
        for cy in range(spacing // 2, h, spacing):
            for cx in range(spacing // 2, w, spacing):
                ang = rng.uniform(0, 2 * np.pi, 3)
                r = rng.uniform(rad * 0.5, rad, 3)
                jx, jy = rng.uniform(-2, 2, 2)
                pts.append(np.stack([cx + jx + np.cos(ang) * r,
                                     cy + jy + np.sin(ang) * r], -1))
    pts = np.asarray(pts, np.float32)              # (T,3,2)
    t = pts.shape[0]
    wgt = rng.uniform(0.5, 2.0, (t, 3, 1)).astype(np.float32)
    xyw = jnp.asarray(np.concatenate([pts * wgt, wgt], -1))
    z = jnp.asarray(rng.uniform(0.05, 0.5, (t, 3)).astype(np.float32))
    return xyw, z, t


def _run(seed, h=48, w=96, profile=(True, False, False, True, True,
                                    False, True)):
    rng = np.random.default_rng(seed)
    si, sf = _states()
    xyw, z, t = _bounded_batch(seed, h, w)
    batch = rb.DeviceBatch(
        xyw=xyw, z=z,
        color=jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32)),
        specular=jnp.asarray(
            rng.uniform(0, 0.2, (t, 3, 3)).astype(np.float32)),
        uv=jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32)),
        fog=jnp.asarray(rng.uniform(0.3, 1, (t, 3)).astype(np.float32)),
        state_idx=jnp.asarray(rng.integers(0, 3, t).astype(np.int32)),
        valid=jnp.asarray(rng.random(t) < 0.9),
        clip_rect=jnp.asarray(np.tile(
            np.array([[-1e9, -1e9, 1e9, 1e9]], np.float32), (t, 1))),
        clipd=jnp.zeros((t, 3, 0), jnp.float32),
        refl=jnp.zeros((t, 3, 0), jnp.float32))
    tex_planes, tex_hw = _tex()
    fb = jnp.asarray(rng.uniform(0, 1, (4, h, w)).astype(np.float32))
    zb = jnp.asarray(rng.uniform(0.6, 1.0, (h, w)).astype(np.float32))
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    scene = _scene_ns(si, sf, tex_planes, tex_hw)

    fb_ref, _ = rb.render_pass(
        fb, zb, batch, jnp.asarray(si), jnp.asarray(sf), tex_planes, tex_hw,
        scene.fog_color, viewport, chunk=1, sampler_profile=profile)
    lids, les, bad = ordered_peel_tiled_pallas(
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        jnp.asarray(si), jnp.asarray(sf), zb, viewport, h, w, tile=16,
        interpret=True)
    fb_k = _composite_peeled(fb, batch, lids, les, scene, profile, h, w)
    return fb_ref, fb_k, bad, lids


@pytest.mark.parametrize("seed", [1, 7])
def test_peel_matches_sequential_textured(seed):
    fb_ref, fb_k, bad, lids = _run(seed)
    assert not bool(bad)
    assert int((np.asarray(lids[0]) >= 0).sum()) > 200
    # u8-quantized vertex colors (D3DCOLOR precision) accumulate over <=4
    # blended layers: tolerance ~4/255 plus float noise.
    np.testing.assert_allclose(np.asarray(fb_k), np.asarray(fb_ref),
                               atol=0.02)


def test_iterated_peel_exact_beyond_k(monkeypatch=None):
    """Depth ~8 (two rounds of K=4) composites EXACTLY like the sequential
    pass via ordered_peel_iterate — no bounded-K drops."""
    from functools import partial

    from ckrenderengine_tpu.pipeline.frame import _composite_peeled
    from ckrenderengine_tpu.raster.pallas_ordered import ordered_peel_iterate

    rng = np.random.default_rng(11)
    si, sf = _states()
    h, w = 32, 32
    t = 9
    # nine stacked translucent triangles on the same pixels: depth 9 > 2K
    tri = np.array([[2.0, 2.0, 1.0], [30.0, 2.0, 1.0], [2.0, 30.0, 1.0]],
                   np.float32)
    xyw = jnp.asarray(np.tile(tri[None], (t, 1, 1)))
    z = jnp.full((t, 3), 0.4, jnp.float32)
    batch = rb.DeviceBatch(
        xyw=xyw, z=z,
        color=jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32)),
        specular=jnp.zeros((t, 3, 3), jnp.float32),
        uv=jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32)),
        fog=jnp.ones((t, 3), jnp.float32),
        state_idx=jnp.asarray(rng.integers(0, 3, t).astype(np.int32)),
        valid=jnp.ones(t, bool),
        clip_rect=jnp.asarray(np.tile(
            np.array([[-1e9, -1e9, 1e9, 1e9]], np.float32), (t, 1))),
        clipd=jnp.zeros((t, 3, 0), jnp.float32),
        refl=jnp.zeros((t, 3, 0), jnp.float32))
    tex_planes, tex_hw = _tex()
    fb = jnp.asarray(rng.uniform(0, 1, (4, h, w)).astype(np.float32))
    zb = jnp.ones((h, w), jnp.float32)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    profile = (True, False, False, True, True, False, True)
    scene = _scene_ns(si, sf, tex_planes, tex_hw)

    fb_ref, _ = rb.render_pass(
        fb, zb, batch, jnp.asarray(si), jnp.asarray(sf), tex_planes, tex_hw,
        scene.fog_color, viewport, chunk=1, sampler_profile=profile)
    comp = partial(_composite_peeled, scene=scene, sampler_profile=profile,
                   height=h, width=w)

    def comp_fn(f, lids, les):
        return comp(f, batch, lids, les)

    fb_it, bad, _rounds = ordered_peel_iterate(
        comp_fn, fb,
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        jnp.asarray(si), jnp.asarray(sf), zb, viewport, h, w, tile=16,
        interpret=True)
    assert not bool(bad)       # capacity only — depth no longer raises it
    # 9 blended u8-quantized layers accumulate ~9/255 of quantization noise.
    np.testing.assert_allclose(np.asarray(fb_it), np.asarray(fb_ref),
                               atol=0.05)


def test_peel_overflow_raises_bad():
    """More than K=4 covering ordered fragments on a pixel -> bad."""
    rng = np.random.default_rng(3)
    si, sf = _states()
    t, h, w = 6, 32, 32
    # six identical full-ish triangles stacked on the same pixels
    tri = np.array([[2.0, 2.0, 1.0], [30.0, 2.0, 1.0], [2.0, 30.0, 1.0]],
                   np.float32)
    xyw = jnp.asarray(np.tile(tri[None], (t, 1, 1)))
    z = jnp.full((t, 3), 0.4, jnp.float32)
    batch_color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    tex_planes, tex_hw = _tex()
    zb = jnp.ones((h, w), jnp.float32)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    lids, les, bad = ordered_peel_tiled_pallas(
        xyw, z, jnp.ones(t, bool), batch_color,
        jnp.zeros((t, 3, 3), jnp.float32),
        jnp.zeros((t, 3, 2), jnp.float32),
        jnp.ones((t, 3), jnp.float32),
        jnp.zeros(t, jnp.int32),
        jnp.asarray(np.tile(np.array([[-1e9, -1e9, 1e9, 1e9]], np.float32),
                            (t, 1))),
        jnp.zeros((t, 3, 0), jnp.float32),
        jnp.asarray(si), jnp.asarray(sf), zb, viewport, h, w, tile=16,
        interpret=True)
    assert bool(bad)
    # the first four layers carry draw ids 0..3 in order on covered pixels
    cov = np.asarray(lids[0]) >= 0
    assert cov.sum() > 100
    for s in range(4):
        ids = np.asarray(lids[s])[cov]
        assert (ids == s).all()
