"""Ordered-blend Pallas kernel parity (interpret mode on CPU): the affine
composition of per-pixel blend maps must reproduce the sequential XLA
ordered pass (jax_backend.render_pass) on alpha-over content, including
alpha test, fog, clip rects, user clip planes, mixed replace rows, and the
overflow fallback flag."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.raster import jax_backend as rb
from ckrenderengine_tpu.raster.pallas_ordered import ordered_blend_tiled_pallas
from ckrenderengine_tpu.raster.types import (
    VXBLEND, VXCMP, VXCULL, RasterState, pack_states,
)
from tests.test_tiled_raster import _random_batch


def _alpha_states():
    over = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                       dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                       cull=int(VXCULL.NONE), fog=True)
    replace = RasterState(z_write=False, cull=int(VXCULL.NONE))
    atest = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                        dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False,
                        alpha_test=True, alpha_func=int(VXCMP.GREATER),
                        alpha_ref=0.35, cull=int(VXCULL.NONE))
    return pack_states([over, replace, atest])


def _ordered_batch(t, h, w, seed, states=3):
    rng = np.random.default_rng(seed)
    xyw, z, _, _ = _random_batch(t, h, w, seed)
    color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    spec = jnp.asarray(rng.uniform(0, 0.2, (t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32))
    fog = jnp.asarray(rng.uniform(0.3, 1, (t, 3)).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, states, t).astype(np.int32))
    valid = jnp.asarray(rng.random(t) < 0.9)
    big = 1e9
    rect = np.tile(np.array([[-big, -big, big, big]], np.float32), (t, 1))
    rect[rng.random(t) < 0.2] = [8.0, 6.0, w - 10.0, h - 8.0]
    return rb.DeviceBatch(
        xyw=xyw, z=z, color=color, specular=spec, uv=uv, fog=fog,
        state_idx=sidx, valid=valid, clip_rect=jnp.asarray(rect),
        clipd=jnp.zeros((t, 3, 0), jnp.float32),
        refl=jnp.zeros((t, 3, 0), jnp.float32))


def _flat_reference(fb, zb, batch, si, sf, fog_color, viewport, h, w):
    tex_planes = jnp.zeros((1, 4, 2, 2), jnp.float32)
    tex_hw = jnp.asarray([[2, 2]], jnp.int32)
    return rb.render_pass(fb, zb, batch, si, sf, tex_planes, tex_hw,
                          fog_color, viewport, chunk=1,
                          sampler_profile=(False, False, False, True, False))


@pytest.mark.parametrize("seed", [1, 4])
def test_ordered_blend_matches_flat(seed):
    h, w = 48, 96
    t = 150
    si, sf = _alpha_states()
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    batch = _ordered_batch(t, h, w, seed)
    rng = np.random.default_rng(seed + 100)
    fb = jnp.asarray(rng.uniform(0, 1, (4, h, w)).astype(np.float32))
    zb = jnp.asarray(rng.uniform(0.3, 1.0, (h, w)).astype(np.float32))
    fog_color = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    fb_ref, zb_ref = _flat_reference(fb, zb, batch, si, sf, fog_color,
                                     viewport, h, w)
    a, b, bad = ordered_blend_tiled_pallas(
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        si, sf, fog_color, zb, viewport, h, w, tile=16, interpret=True)
    assert not bool(bad)
    fb_k = a * fb + b
    np.testing.assert_array_equal(np.asarray(zb_ref), np.asarray(zb))
    # Composed affine coefficients round differently from the sequential
    # per-step blend; colors are in [0,1] so 1e-4 covers the worst chain.
    np.testing.assert_allclose(np.asarray(fb_k), np.asarray(fb_ref),
                               atol=1e-4)


def test_ordered_blend_clip_planes_and_viewport():
    h, w = 64, 64
    t = 80
    si, sf = _alpha_states()
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    batch = _ordered_batch(t, h, w, seed=7)
    rng = np.random.default_rng(7)
    clipd = jnp.asarray(rng.uniform(-1, 1, (t, 3, 1)).astype(np.float32))
    batch = rb.DeviceBatch(
        xyw=batch.xyw, z=batch.z, color=batch.color, specular=batch.specular,
        uv=batch.uv, fog=batch.fog, state_idx=batch.state_idx,
        valid=batch.valid, clip_rect=batch.clip_rect, clipd=clipd,
        refl=batch.refl)
    fb = jnp.full((4, h, w), 0.25, jnp.float32)
    zb = jnp.full((h, w), 0.8, jnp.float32)
    fog_color = jnp.zeros(3, jnp.float32)
    viewport = jnp.asarray([6, 4, w - 12, h - 10], jnp.float32)

    fb_ref, _ = _flat_reference(fb, zb, batch, si, sf, fog_color,
                                viewport, h, w)
    a, b, bad = ordered_blend_tiled_pallas(
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        si, sf, fog_color, zb, viewport, h, w, tile=16, interpret=True)
    assert not bool(bad)
    np.testing.assert_allclose(np.asarray(a * fb + b), np.asarray(fb_ref),
                               atol=1e-4)


def test_ordered_blend_overflow_flags_bad():
    """Span/slab overflow must raise the ``bad`` flag (the caller then
    replays the exact XLA pass)."""
    h = w = 64
    t = 40
    si, sf = _alpha_states()
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    batch = _ordered_batch(t, h, w, seed=3)
    fb = jnp.zeros((4, h, w), jnp.float32)
    zb = jnp.ones((h, w), jnp.float32)
    fog_color = jnp.zeros(3, jnp.float32)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    _, _, bad = ordered_blend_tiled_pallas(
        batch.xyw, batch.z, batch.valid, batch.color, batch.specular,
        batch.uv, batch.fog, batch.state_idx, batch.clip_rect, batch.clipd,
        si, sf, fog_color, zb, viewport, h, w, tile=16,
        windows=((40, 1),), interpret=True)
    assert bool(bad)
