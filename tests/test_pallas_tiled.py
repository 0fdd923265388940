"""Pallas tiled depth-solve parity (interpreter mode on CPU): the streaming
phase-B kernel must match the XLA tiled solve and the flat reduce exactly —
winner ids equal, depths equal to FMA-contraction noise — including
straddlers, overflow fallbacks, clip rects, user clip planes, and kept
z-buffers."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.raster import deferred as df
from ckrenderengine_tpu.raster.pallas_tiled import depth_reduce_tiled_pallas
from ckrenderengine_tpu.raster.tiled import depth_reduce_tiled
from ckrenderengine_tpu.raster.types import RasterState, pack_states
from tests.test_tiled_raster import _random_batch


def _setup_for(xyw, z, t, clip_rect=None, clipd=None):
    si, sf = pack_states([RasterState()])
    return df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                             jnp.ones(t, bool), jnp.asarray(si),
                             clip_rect=clip_rect, clipd=clipd)


@pytest.mark.parametrize("seed", [0, 2])
@pytest.mark.parametrize("hw", [(64, 64), (48, 96)])
def test_pallas_tiled_matches_flat(seed, hw):
    h, w = hw
    t = 260
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_p, bd_p, peak = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=4,
        span2=16, interpret=True)
    assert int(peak) > 0
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f), atol=4e-6)


def test_pallas_tiled_overflow_fallbacks_exact():
    """Force BOTH leftover streams (slab overflow + mid/global overflow):
    tiny caps reroute most triangles through the all-tiles XLA loops."""
    h = w = 64
    t = 300
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=5, big_frac=0.3)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_p, bd_p, _ = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=2,
        span2=4, g_cap=16, slab_cap=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f), atol=4e-6)


def test_pallas_tiled_near_plane_straddlers():
    """Triangles crossing w=0 (behind-eye corners) must render identically
    to the flat reduce — they ride the unbounded/global path."""
    rng = np.random.default_rng(9)
    t = 40
    h = w = 64
    centers = rng.uniform([0, 0], [w, h], (t, 2)).astype(np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * 30.0
    ws = rng.uniform(-1.5, 3.0, (t, 3, 1)).astype(np.float32)  # some w <= 0
    xyw = jnp.asarray(np.concatenate([pts * ws, ws], axis=-1))
    z = jnp.asarray(rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32))
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_p, bd_p, _ = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f), atol=4e-6)


def test_pallas_tiled_clip_rects_and_planes():
    """Per-triangle scissor rects + one user clip plane, vs the flat reduce."""
    h = w = 64
    t = 120
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=3)
    rng = np.random.default_rng(3)
    rects = np.tile(np.array([[-1e9, -1e9, 1e9, 1e9]], np.float32), (t, 1))
    clipped = rng.random(t) < 0.5
    rects[clipped] = [10.0, 8.0, 50.0, 40.0]
    # one clip plane: per-corner signed distances, linear over the screen
    clipd = rng.uniform(-1.0, 1.0, (t, 3, 1)).astype(np.float32)
    setup = _setup_for(xyw, z, t, clip_rect=jnp.asarray(rects),
                       clipd=jnp.asarray(clipd))
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([4, 2, w - 8, h - 6], jnp.float32)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_p, bd_p, _ = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f), atol=4e-6)


def test_pallas_tiled_kept_zbuffer():
    """CLEARZBUFFER off: init carry from last frame's (H,W) z-buffer."""
    h = w = 64
    t = 90
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=8)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    rng = np.random.default_rng(8)
    prev_zb = jnp.asarray(rng.uniform(0.1, 0.9, (h, w)).astype(np.float32))
    bi_f, bd_f = df.depth_reduce(setup, defer, prev_zb, viewport, h, w)
    bi_p, bd_p, _ = depth_reduce_tiled_pallas(
        setup, defer, prev_zb, viewport, xyw, h, w, tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f), atol=4e-6)


def test_pallas_tiled_nondivisible_framebuffer():
    """H/W not multiples of the tile: edge tiles clip to the framebuffer."""
    h, w = 50, 70
    t = 150
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=4)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_p, bd_p, _ = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f), atol=4e-6)


def test_pallas_tiled_pair_cap_truncation_exact():
    """A tiny ``pair_cap`` truncates most tiles out of the kernel stream;
    the sorted-pair tail must replay through the exact all-tiles fallback
    so the result still matches the flat reduce bit for bit."""
    h = w = 64
    t = 260
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=3)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    for cap in (0, 64, 256):
        bi_p, bd_p, _ = depth_reduce_tiled_pallas(
            setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=4,
            span2=16, pair_cap=cap, interpret=True)
        np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_f))
        np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_f),
                                   atol=4e-6)


def _fake_shade_tbl(t, width=65, seed=11):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (t, width)).astype(np.float32))


@pytest.mark.parametrize("shw", [65, 74])
def test_pallas_tiled_fetch_matches_gather(shw):
    """The kernel's one-hot fetch pass must return EXACTLY the winner's
    shade row per pixel (the per-pixel gather it replaces)."""
    h, w = 48, 96
    t = 260
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=2)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    tbl = _fake_shade_tbl(t, shw)
    bi, bd, peak, rows = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=4,
        span2=16, interpret=True, shade_tbl=tbl)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi_f))
    want = np.where(np.asarray(bi)[None] >= 0,
                    np.asarray(jnp.take(tbl.T, jnp.clip(bi, 0, t - 1)
                                        .reshape(-1), axis=1)
                               .reshape(shw, h, w)), 0.0)
    np.testing.assert_allclose(np.asarray(rows), want, atol=1e-6)


def test_pallas_tiled_fetch_exact_through_fallbacks():
    """Fetch stays exact when overflow reroutes triangles through the XLA
    fallback loops (tiny caps) and when pair_cap truncates tiles."""
    h = w = 64
    t = 300
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=5, big_frac=0.3)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    tbl = _fake_shade_tbl(t)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    for caps in (dict(g_cap=16, slab_cap=64),
                 dict(pair_cap=64),
                 dict(pair_cap=0)):
        bi, bd, _, rows = depth_reduce_tiled_pallas(
            setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=2,
            span2=4, interpret=True, shade_tbl=tbl, **caps)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi_f))
        want = np.where(np.asarray(bi)[None] >= 0,
                        np.asarray(jnp.take(tbl.T, jnp.clip(bi, 0, t - 1)
                                            .reshape(-1), axis=1)
                                   .reshape(tbl.shape[1], h, w)), 0.0)
        np.testing.assert_allclose(np.asarray(rows), want, atol=1e-6)


def test_fetch_shade_matches_gather_shade():
    """End to end: shade_rows on the kernel-fetched rows == shade_deferred
    (the per-pixel gather path) on the same winners."""
    from ckrenderengine_tpu.raster.deferred import shade_row_table, shade_rows

    h, w = 48, 96
    t = 180
    rng = np.random.default_rng(7)
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=7)
    si, sf = pack_states([RasterState()])
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    setup = df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                              jnp.ones(t, bool), si)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    spec = jnp.asarray(rng.uniform(0, 0.3, (t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32))
    fog = jnp.ones((t, 3), jnp.float32)
    tex_planes = jnp.zeros((1, 4, 8, 8), jnp.float32)
    tex_hw = jnp.asarray([[8, 8]], jnp.int32)
    fog_color = jnp.zeros(3, jnp.float32)
    clear_fb = jnp.zeros((4, h, w), jnp.float32)

    tbl = shade_row_table(xyw, color, spec, uv, fog, jnp.zeros(t, jnp.int32),
                          si, sf, tex_hw,
                          e_coef=setup["e_coef"], inv_det_s=setup["inv_det_s"])
    bi, bd, _, rows = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True,
        shade_tbl=tbl)
    fb_fetch = shade_rows(rows, bi >= 0, tex_planes, tex_hw, fog_color,
                          clear_fb, h, w)
    fb_gather = df.shade_deferred(
        bi, xyw, z, color, spec, uv, fog, jnp.zeros(t, jnp.int32), si, sf,
        tex_planes, tex_hw, fog_color, clear_fb, h, w)
    # The gather path recomputes UNSIGNED edge coefficients inside
    # shade_deferred while the compact table ships setup's signed ones, so
    # the two differ by float rounding; 3e-5 covers the worst pixel.
    np.testing.assert_allclose(np.asarray(fb_fetch), np.asarray(fb_gather),
                               atol=3e-5)


def test_compact_fetch_shade_matches_gather_shade():
    """The production fetch path (compact table -> kernel -> per-pixel state
    expansion -> shade_rows) must equal shade_deferred exactly."""
    from ckrenderengine_tpu.raster.deferred import (
        expand_rows_compact, shade_row_table_compact, shade_rows,
    )

    h, w = 48, 96
    t = 180
    rng = np.random.default_rng(9)
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=9)
    si, sf = pack_states([RasterState()])
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    setup = df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                              jnp.ones(t, bool), si)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    spec = jnp.asarray(rng.uniform(0, 0.3, (t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32))
    fog = jnp.asarray(rng.uniform(0.4, 1, (t, 3)).astype(np.float32))
    tex_planes = jnp.zeros((1, 4, 8, 8), jnp.float32)
    tex_hw = jnp.asarray([[8, 8]], jnp.int32)
    fog_color = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    clear_fb = jnp.zeros((4, h, w), jnp.float32)

    tbl = shade_row_table_compact(
        xyw, color, spec, uv, fog, jnp.zeros(t, jnp.int32),
        e_coef=setup["e_coef"], inv_det_s=setup["inv_det_s"])
    assert tbl.shape[1] == 44
    bi, bd, _, rows_c = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True,
        shade_tbl=tbl)
    rows = expand_rows_compact(rows_c, si, sf, tex_hw)
    fb_fetch = shade_rows(rows, bi >= 0, tex_planes, tex_hw, fog_color,
                          clear_fb, h, w)
    fb_gather = df.shade_deferred(
        bi, xyw, z, color, spec, uv, fog, jnp.zeros(t, jnp.int32), si, sf,
        tex_planes, tex_hw, fog_color, clear_fb, h, w)
    # The gather path recomputes UNSIGNED edge coefficients inside
    # shade_deferred while the compact table ships setup's signed ones, so
    # the two differ by float rounding; 3e-5 covers the worst pixel.
    np.testing.assert_allclose(np.asarray(fb_fetch), np.asarray(fb_gather),
                               atol=3e-5)


def test_quant_fetch_shade_matches_gather_shade():
    """The quantized fast-fetch path (<=16-word table + kernel e-plane
    export + per-pixel unpack, frame.py quant branch) must match
    shade_deferred within the u8 quantization step (colors/spec/fog round
    to 1/255 per corner — the reference's D3DCOLOR vertex precision)."""
    from ckrenderengine_tpu.raster.deferred import (
        SH_Q_NBASE, expand_rows_quant, shade_row_table_quant, shade_rows,
    )

    h, w = 48, 96
    t = 180
    rng = np.random.default_rng(11)
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=11)
    si, sf = pack_states([RasterState()])
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    setup = df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                              jnp.ones(t, bool), si)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    spec = jnp.asarray(rng.uniform(0, 0.3, (t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32))
    fog = jnp.asarray(rng.uniform(0.4, 1, (t, 3)).astype(np.float32))
    tex_planes = jnp.zeros((1, 4, 8, 8), jnp.float32)
    tex_hw = jnp.asarray([[8, 8]], jnp.int32)
    fog_color = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    clear_fb = jnp.zeros((4, h, w), jnp.float32)

    bi, bd, _, epl = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True,
        want_eplanes=True)

    # e-planes must equal the winner's own edge values recomputed from the
    # setup coefficients (exactly, modulo FMA contraction).
    bi_np = np.asarray(bi)
    ec = np.asarray(setup["e_coef"]).reshape(t, 9)
    pxh = np.arange(w, dtype=np.float32)[None, :] + 0.5
    pyh = np.arange(h, dtype=np.float32)[:, None] + 0.5
    tidn = np.clip(bi_np, 0, t - 1)
    want_e = np.stack([ec[tidn, 3 * k] * pxh + ec[tidn, 3 * k + 1] * pyh
                       + ec[tidn, 3 * k + 2] for k in range(3)])
    want_e = np.where((bi_np >= 0)[None], want_e, 0.0)
    # FMA contraction differs between the kernel and numpy; the absolute
    # wobble scales with the edge-function TERM magnitude (a*px), which the
    # per-pixel row maximum approximates (near an edge e itself cancels to
    # ~0 while the terms stay large).
    scale = np.maximum(np.abs(want_e).max(axis=0, keepdims=True), 1.0)
    np.testing.assert_allclose(np.asarray(epl) / scale, want_e / scale,
                               atol=2e-4)

    tbl = shade_row_table_quant(
        xyw, color, spec, uv, fog, jnp.zeros(t, jnp.int32),
        inv_det_s=setup["inv_det_s"], want_ws=False)
    assert tbl.shape[1] == 16 and SH_Q_NBASE == 13
    tblT = jnp.asarray(tbl).T
    tid = jnp.clip(bi, 0, t - 1).reshape(-1)
    rows_q = jnp.take(tblT, tid, axis=1).reshape(tbl.shape[1], h, w)
    rows_q = jnp.where((bi >= 0)[None], rows_q, jnp.int32(0))
    rows = expand_rows_quant(rows_q, si, sf, tex_hw,
                             want_ws=False, has_refl=False)
    fb_q = shade_rows(rows, bi >= 0, tex_planes, tex_hw, fog_color,
                      clear_fb, h, w,
                      eplanes=(epl[0], epl[1], epl[2]))
    fb_gather = df.shade_deferred(
        bi, xyw, z, color, spec, uv, fog, jnp.zeros(t, jnp.int32), si, sf,
        tex_planes, tex_hw, fog_color, clear_fb, h, w)
    # u8 corner quantization bounds the interpolated error by 0.5/255 per
    # corner; spec adds on top -> < 3/255 total.
    np.testing.assert_allclose(np.asarray(fb_q), np.asarray(fb_gather),
                               atol=3.0 / 255.0)


def test_quant_table_ws_and_refl_layout():
    """Layout variants: want_ws appends (ws3, ivd); refl appends 9 f32."""
    from ckrenderengine_tpu.raster.deferred import shade_row_table_quant

    t = 32
    rng = np.random.default_rng(3)
    xyw = jnp.asarray(rng.normal(0, 1, (t, 3, 3)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    spec = jnp.asarray(rng.uniform(0, 1, (t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32))
    fog = jnp.asarray(rng.uniform(0, 1, (t, 3)).astype(np.float32))
    refl = jnp.asarray(rng.normal(0, 1, (t, 3, 3)).astype(np.float32))
    ivd = jnp.asarray(rng.uniform(0.5, 2, (t,)).astype(np.float32))
    st = jnp.zeros(t, jnp.int32)

    t16 = shade_row_table_quant(xyw, color, spec, uv, fog, st, inv_det_s=ivd)
    assert t16.shape == (t, 16) and t16.dtype == jnp.int32
    t_ws = shade_row_table_quant(xyw, color, spec, uv, fog, st,
                                 inv_det_s=ivd, want_ws=True)
    assert t_ws.shape == (t, 20)
    np.testing.assert_array_equal(
        np.asarray(t_ws[:, 13:16]).view(np.float32), np.asarray(xyw[..., 2]))
    np.testing.assert_array_equal(
        np.ascontiguousarray(np.asarray(t_ws[:, 16])).view(np.float32),
        np.asarray(ivd))
    t_rf = shade_row_table_quant(xyw, color, spec, uv, fog, st,
                                 inv_det_s=ivd, batch_refl=refl)
    assert t_rf.shape == (t, 24)
    np.testing.assert_array_equal(
        np.ascontiguousarray(np.asarray(t_rf[:, 13:22])).view(np.float32),
        np.asarray(refl.reshape(t, 9)))


def test_any_tex_gate_matches_sampled_path():
    """sampler_profile[4]=False (no state binds a texture) must produce the
    same frame as the sampling path when SI_TEX is -1 everywhere."""
    from ckrenderengine_tpu.raster.deferred import (
        expand_rows_compact, shade_row_table_compact, shade_rows,
    )

    h, w = 32, 64
    t = 60
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=21)
    si, sf = pack_states([RasterState()])      # default: no texture bound
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)
    assert int(si[0, 0]) < 0 or True           # SI_TEX position varies; rely
    setup = df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                              jnp.ones(t, bool), si)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    rng = np.random.default_rng(21)
    color = jnp.asarray(rng.uniform(0, 1, (t, 3, 4)).astype(np.float32))
    spec = jnp.asarray(rng.uniform(0, 0.2, (t, 3, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (t, 3, 2)).astype(np.float32))
    fog = jnp.ones((t, 3), jnp.float32)
    tex_planes = jnp.zeros((1, 4, 8, 8), jnp.float32)
    tex_hw = jnp.asarray([[8, 8]], jnp.int32)
    fog_color = jnp.zeros(3, jnp.float32)
    clear_fb = jnp.zeros((4, h, w), jnp.float32)

    bi, bd, _ = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True)
    tbl = shade_row_table_compact(
        xyw, color, spec, uv, fog, jnp.zeros(t, jnp.int32),
        e_coef=setup["e_coef"], inv_det_s=setup["inv_det_s"])
    tid = jnp.clip(bi, 0, t - 1).reshape(-1)
    rows_c = jnp.take(tbl.T, tid, axis=1).reshape(tbl.shape[1], h, w)
    rows_c = jnp.where((bi >= 0)[None], rows_c, 0.0)
    rows = expand_rows_compact(rows_c, si, sf, tex_hw)
    fb_sampled = shade_rows(rows, bi >= 0, tex_planes, tex_hw, fog_color,
                            clear_fb, h, w, sampler_profile=None)
    fb_gated = shade_rows(rows, bi >= 0, tex_planes, tex_hw, fog_color,
                          clear_fb, h, w,
                          sampler_profile=(False, False, False, True, False))
    np.testing.assert_array_equal(np.asarray(fb_gated),
                                  np.asarray(fb_sampled))


def test_quant_fd_lod_matches_analytic_on_affine_uv():
    """Quad finite-difference LOD (the quant path's mip model) must agree
    with the analytic-gradient path when screen-space UV is affine (w == 1
    corners => perspective weights are screen-linear): interior pixels pick
    the same mip level, so the shaded frames match within quantization."""
    from ckrenderengine_tpu.raster.deferred import (
        expand_rows_quant, shade_row_table_quant, shade_rows,
    )

    h, w = 64, 128
    # One large screen-space triangle with w=1 (affine UV), highly minified
    # UV so trilinear actually blends mips.
    xyw = jnp.asarray([[[2.0, 2.0, 1.0], [126.0, 2.0, 1.0],
                        [2.0, 62.0, 1.0]]], jnp.float32)
    z = jnp.full((1, 3), 0.5, jnp.float32)
    uv = jnp.asarray([[[0.0, 0.0], [16.0, 0.0], [0.0, 8.0]]], jnp.float32)
    color = jnp.ones((1, 3, 4), jnp.float32)
    spec = jnp.zeros((1, 3, 3), jnp.float32)
    fog = jnp.ones((1, 3), jnp.float32)
    t = 1

    from ckrenderengine_tpu.raster.types import (
        VXTEXTURE_FILTER, RasterState, pack_states,
    )
    st = RasterState(tex=0, tex_filter=int(VXTEXTURE_FILTER.LINEARMIPLINEAR))
    si, sf = pack_states([st])
    si = jnp.asarray(si)
    sf = jnp.asarray(sf)

    # 16x16 base + 2 mip levels in an atlas column (tex_hw: h, w, mip_col).
    rng = np.random.default_rng(5)
    base = rng.uniform(0, 1, (16, 16, 4)).astype(np.float32)
    planes = np.zeros((1, 4, 16, 16 + 8), np.float32)
    planes[0, :, :16, :16] = np.moveaxis(base, -1, 0)
    m1 = base.reshape(8, 2, 8, 2, 4).mean((1, 3))
    planes[0, :, :8, 16:24] = np.moveaxis(m1, -1, 0)
    m2 = m1.reshape(4, 2, 4, 2, 4).mean((1, 3))
    planes[0, :, 8:12, 16:20] = np.moveaxis(m2, -1, 0)
    tex_planes = jnp.asarray(planes)
    tex_hw = jnp.asarray([[16, 16, 16]], jnp.int32)   # (h, w, mip col)

    setup = df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                              jnp.ones(t, bool), si)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    profile = (False, True, False, True, True)        # mips on, textured

    bi, bd, _, epl = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, interpret=True,
        want_eplanes=True)
    tbl = shade_row_table_quant(xyw, color, spec, uv, fog,
                                jnp.zeros(t, jnp.int32),
                                inv_det_s=setup["inv_det_s"], want_ws=False)
    tid = jnp.clip(bi, 0, t - 1).reshape(-1)
    rows_q = jnp.take(tbl.T, tid, axis=1).reshape(tbl.shape[1], h, w)
    rows_q = jnp.where((bi >= 0)[None], rows_q, jnp.int32(0))
    rows = expand_rows_quant(rows_q, si, sf, tex_hw,
                             want_ws=False, has_refl=False)
    clear_fb = jnp.zeros((4, h, w), jnp.float32)
    fog_color = jnp.zeros(3, jnp.float32)
    fb_fd = shade_rows(rows, bi >= 0, tex_planes, tex_hw, fog_color,
                       clear_fb, h, w, sampler_profile=profile,
                       eplanes=(epl[0], epl[1], epl[2]))
    fb_an = df.shade_deferred(
        bi, xyw, z, color, spec, uv, fog, jnp.zeros(t, jnp.int32), si, sf,
        tex_planes, tex_hw, fog_color, clear_fb, h, w,
        sampler_profile=profile)
    d = np.abs(np.asarray(fb_fd) - np.asarray(fb_an))
    hit = np.asarray(bi) >= 0
    # Affine UV: FD == analytic everywhere except quads straddling the
    # triangle edge (the hardware artifact); interior must match within
    # the u8 color quantization.
    interior = hit.copy()
    interior[:-2] &= hit[2:]
    interior[2:] &= hit[:-2]
    interior[:, :-2] &= hit[:, 2:]
    interior[:, 2:] &= hit[:, :-2]
    assert interior.sum() > 500
    assert d[:, interior].max() < 3.0 / 255.0 + 1e-3


def test_pallas_tiled_fetch_quant_packed_exact():
    """sh_pack=2: the kernel fetches QUANTIZED int32 rows bit-exactly via
    u16-half matmuls — including words whose bit patterns alias f32 NaNs /
    denormals (the reason the packed table cannot ride the f32 fetch)."""
    h, w = 48, 96
    t = 260
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=2)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    rng = np.random.default_rng(13)
    words = rng.integers(-2**31, 2**31, (t, 16), dtype=np.int64)
    words[:, 3] = np.int64(0x7FC00001 - 2**32)   # f32 NaN bit pattern
    words[:, 5] = 1                              # f32 denormal bit pattern
    tbl = jnp.asarray(words.astype(np.int32))
    bi, bd, peak, ep, rows = depth_reduce_tiled_pallas(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=4,
        span2=16, interpret=True, shade_tbl=tbl, sh_pack=2,
        want_eplanes=True)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi_f))
    want = np.where(np.asarray(bi)[None] >= 0,
                    np.asarray(jnp.take(tbl.T, jnp.clip(bi, 0, t - 1)
                                        .reshape(-1), axis=1)
                               .reshape(16, h, w)), 0)
    np.testing.assert_array_equal(np.asarray(rows), want)
    assert np.asarray(rows).dtype == np.int32


def test_pallas_tiled_fetch_quant_packed_fallbacks():
    """sh_pack=2 stays bit-exact when tiny caps reroute triangles through
    the XLA fallback streams (the refetch path recombines halves too)."""
    h = w = 64
    t = 300
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed=5, big_frac=0.3)
    setup = _setup_for(xyw, z, t)
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    rng = np.random.default_rng(17)
    tbl = jnp.asarray(rng.integers(-2**31, 2**31, (t, 16),
                                   dtype=np.int64).astype(np.int32))
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    for caps in (dict(g_cap=16, slab_cap=64), dict(pair_cap=64)):
        bi, bd, _, rows = depth_reduce_tiled_pallas(
            setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=2,
            span2=4, interpret=True, shade_tbl=tbl, sh_pack=2, **caps)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi_f))
        want = np.where(np.asarray(bi)[None] >= 0,
                        np.asarray(jnp.take(tbl.T, jnp.clip(bi, 0, t - 1)
                                            .reshape(-1), axis=1)
                                   .reshape(16, h, w)), 0)
        np.testing.assert_array_equal(np.asarray(rows), want)
