"""Golden parity: the JAX device rasterizer must match the numpy NULL-device
oracle pixel-for-pixel (within fp tolerance) across the state space.

This is the rebuild's equivalent of the reference's device tests
(SURVEY.md §4: "scene/object-model tests against a numpy reference rasterizer").
"""
import numpy as np
import pytest

from ckrenderengine_tpu.math import vxmath as vx
from ckrenderengine_tpu.raster import batch as B
from ckrenderengine_tpu.raster import types as T
from ckrenderengine_tpu.raster.null_backend import NullRasterizer
from ckrenderengine_tpu.raster.jax_backend import JaxRasterizer

W, H = 64, 48
VIEW = (0, 0, W, H)


def _run_both(batch, states, textures=None, clear=(0.1, 0.2, 0.3, 1.0), fog_color=None):
    si, sf = T.pack_states(states)
    a = NullRasterizer(W, H)
    b = JaxRasterizer(W, H)
    a.clear(clear)
    b.clear(clear)
    if fog_color is not None:
        a.fog_color = np.asarray(fog_color, np.float32)
        import jax.numpy as jnp
        b.fog_color = jnp.asarray(fog_color, jnp.float32)
    a.draw_batch(batch, si, sf, textures or [])
    b.draw_batch(batch, si, sf, textures or [])
    return a, b


def _assert_parity(a, b, atol=2e-3, max_bad_frac=0.002):
    fa = a.fb
    fb = b.framebuffer()
    diff = np.abs(fa - fb).max(axis=-1)
    bad = diff > atol
    # Allow a tiny fraction of edge pixels to differ (fp tie-breaks on edges).
    assert bad.mean() <= max_bad_frac, f"{bad.sum()} pixels differ (max {diff.max()})"
    za = a.zb
    zdiff = np.abs(za - b.zbuffer())
    assert (zdiff > 1e-3).mean() <= max_bad_frac


def _tri_clip(p0, p1, p2, z=0.5, w=1.0):
    """Build a clip-space triangle from NDC-ish 2D points (x,y in [-1,1])."""
    return np.array(
        [[p0[0] * w, p0[1] * w, z * w, w],
         [p1[0] * w, p1[1] * w, z * w, w],
         [p2[0] * w, p2[1] * w, z * w, w]],
        np.float32,
    )[None]


def _screen_cw_tri(z=0.5):
    # Screen-CW (front-facing for CULL_CCW): with y-down viewport mapping,
    # NDC (0,0.8) top, (0.8,-0.8) bottom-right, (-0.8,-0.8) bottom-left.
    return _tri_clip((0, 0.8), (0.8, -0.8), (-0.8, -0.8), z=z)


def test_flat_triangle_matches():
    batch = B.make_batch(_screen_cw_tri(), view=VIEW,
                         color=np.tile(np.array([1.0, 0.0, 0.0, 1.0], np.float32), (1, 3, 1)))
    a, b = _run_both(batch, [T.RasterState()])
    _assert_parity(a, b)
    # And the triangle actually rendered (center pixel red).
    assert a.fb[H // 2, W // 2, 0] == pytest.approx(1.0)
    assert a.fb[2, 2, 2] == pytest.approx(0.3)  # background


def test_backface_culled_both():
    # Reverse winding -> culled under default CULL_CCW.
    tri = _tri_clip((-0.8, -0.8), (0.8, -0.8), (0, 0.8))
    batch = B.make_batch(tri, view=VIEW)
    a, b = _run_both(batch, [T.RasterState()])
    assert np.allclose(a.fb[..., 0], 0.1)
    _assert_parity(a, b)
    # CULL_NONE renders it.
    a2, b2 = _run_both(batch, [T.RasterState(cull=int(T.VXCULL.NONE))])
    assert not np.allclose(a2.fb[..., 0], 0.1)
    _assert_parity(a2, b2)


def test_zbuffer_order_parity():
    # Near triangle drawn FIRST, far triangle second: far must lose.
    near = _screen_cw_tri(z=0.2)
    far = _tri_clip((0, 0.9), (0.9, -0.9), (-0.9, -0.9), z=0.8)
    clip = np.concatenate([near, far])
    color = np.stack([
        np.tile(np.array([0, 1, 0, 1], np.float32), (3, 1)),
        np.tile(np.array([1, 0, 0, 1], np.float32), (3, 1)),
    ])
    batch = B.make_batch(clip, view=VIEW, color=color)
    a, b = _run_both(batch, [T.RasterState()])
    _assert_parity(a, b)
    c = a.fb[H // 2, W // 2]
    assert c[1] == pytest.approx(1.0) and c[0] == pytest.approx(0.0)


def test_lessequal_later_wins_on_equal_z():
    # Two identical-z triangles: the LATER one must win (LESSEQUAL parity with
    # the reference's sequential draw order).
    t1 = _screen_cw_tri(z=0.5)
    clip = np.concatenate([t1, t1])
    color = np.stack([
        np.tile(np.array([0, 1, 0, 1], np.float32), (3, 1)),
        np.tile(np.array([1, 0, 1, 1], np.float32), (3, 1)),
    ])
    batch = B.make_batch(clip, view=VIEW, color=color)
    a, b = _run_both(batch, [T.RasterState()])
    _assert_parity(a, b)
    assert a.fb[H // 2, W // 2, 0] == pytest.approx(1.0)


def test_gouraud_interpolation_parity():
    color = np.array([[[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1]]], np.float32)
    batch = B.make_batch(_screen_cw_tri(), view=VIEW, color=color)
    a, b = _run_both(batch, [T.RasterState()])
    _assert_parity(a, b)


def test_perspective_correct_uv_parity():
    # A quad receding in depth: perspective-correct UVs differ from linear.
    proj = np.asarray(vx.perspective(np.pi / 2, W / H, 0.5, 50.0))
    quad = np.array([
        [-2.0, -1.0, 2.0], [2.0, -1.0, 2.0], [2.0, -1.0, 12.0], [-2.0, -1.0, 12.0],
    ], np.float32)
    hom = np.concatenate([quad, np.ones((4, 1), np.float32)], -1) @ proj
    tris = np.stack([hom[[0, 1, 2]], hom[[0, 2, 3]]])
    uv = np.stack([
        np.array([[0, 0], [4, 0], [4, 4]], np.float32),
        np.array([[0, 0], [4, 4], [0, 4]], np.float32),
    ])
    checker = np.indices((8, 8)).sum(0) % 2
    tex = np.stack([checker, checker, checker, np.ones_like(checker)], -1).astype(np.float32)
    st = T.RasterState(tex=0, cull=int(T.VXCULL.NONE))
    batch = B.make_batch(tris, view=VIEW, uv=uv)
    a, b = _run_both(batch, [st], textures=[tex])
    _assert_parity(a, b, max_bad_frac=0.02)  # texel-boundary ties
    # Without perspective correction the image must differ from corrected.
    st2 = T.RasterState(tex=0, cull=int(T.VXCULL.NONE), perspective=False)
    a2, b2 = _run_both(batch, [st2], textures=[tex])
    _assert_parity(a2, b2, max_bad_frac=0.02)
    assert np.abs(a.fb - a2.fb).max() > 0.5


def test_alpha_blend_parity():
    opaque = _screen_cw_tri(z=0.5)
    blend = _tri_clip((0, 0.9), (0.9, -0.9), (-0.9, -0.9), z=0.3)
    clip = np.concatenate([opaque, blend])
    color = np.stack([
        np.tile(np.array([1, 0, 0, 1], np.float32), (3, 1)),
        np.tile(np.array([0, 0, 1, 0.5], np.float32), (3, 1)),
    ])
    states = [
        T.RasterState(),
        T.RasterState(alpha_blend=True, src_blend=int(T.VXBLEND.SRCALPHA),
                      dst_blend=int(T.VXBLEND.INVSRCALPHA), z_write=False),
    ]
    batch = B.make_batch(clip, view=VIEW, color=color, state_idx=np.array([0, 1], np.int32))
    a, b = _run_both(batch, states)
    _assert_parity(a, b)
    c = a.fb[H // 2, W // 2]
    assert c[0] == pytest.approx(0.5, abs=0.02) and c[2] == pytest.approx(0.5, abs=0.02)


def test_additive_blend_parity():
    t = _screen_cw_tri()
    states = [T.RasterState(alpha_blend=True, src_blend=int(T.VXBLEND.ONE),
                            dst_blend=int(T.VXBLEND.ONE))]
    color = np.tile(np.array([0.25, 0.5, 0.1, 1.0], np.float32), (1, 3, 1))
    batch = B.make_batch(t, view=VIEW, color=color)
    a, b = _run_both(batch, states)
    _assert_parity(a, b)
    assert a.fb[H // 2, W // 2, 1] == pytest.approx(0.7, abs=0.01)


def test_alpha_test_parity():
    # Gradient alpha; alphafunc GREATER ref 0.5 keeps only the high-alpha part.
    color = np.array([[[1, 1, 1, 0.0], [1, 1, 1, 1.0], [1, 1, 1, 1.0]]], np.float32)
    st = T.RasterState(alpha_test=True, alpha_func=int(T.VXCMP.GREATER), alpha_ref=0.5)
    batch = B.make_batch(_screen_cw_tri(), view=VIEW, color=color)
    a, b = _run_both(batch, [st])
    _assert_parity(a, b, max_bad_frac=0.01)
    drawn = (a.fb[..., 0] > 0.9).sum()
    assert 0 < drawn < (a.fb[..., 0] >= 0.0).size * 0.5


def test_fog_parity():
    fogv = np.array([[0.0, 0.5, 1.0]], np.float32)  # 0 = full fog
    st = T.RasterState(fog=True)
    batch = B.make_batch(_screen_cw_tri(), view=VIEW, fog=fogv,
                         color=np.tile(np.array([1, 0, 0, 1], np.float32), (1, 3, 1)))
    a, b = _run_both(batch, [st], fog_color=(0.0, 1.0, 0.0))
    _assert_parity(a, b)


def test_texture_address_modes_parity():
    tex = np.zeros((4, 4, 4), np.float32)
    tex[:2, :2] = (1, 0, 0, 1)
    tex[2:, 2:] = (0, 0, 1, 1)
    uv = np.array([[[-1.5, -1.5], [2.5, -1.5], [2.5, 2.5]]], np.float32)
    for mode in (T.VXTEXTURE_ADDRESS.WRAP, T.VXTEXTURE_ADDRESS.MIRROR,
                 T.VXTEXTURE_ADDRESS.CLAMP, T.VXTEXTURE_ADDRESS.BORDER):
        st = T.RasterState(tex=0, tex_address=int(mode), border_color=(0, 1, 0, 1))
        batch = B.make_batch(_screen_cw_tri(), view=VIEW, uv=uv)
        a, b = _run_both(batch, [st], textures=[tex])
        _assert_parity(a, b, max_bad_frac=0.03)


def test_bilinear_filter_parity():
    tex = np.random.default_rng(1).random((8, 8, 4)).astype(np.float32)
    uv = np.array([[[0.1, 0.1], [0.9, 0.2], [0.5, 0.9]]], np.float32)
    st = T.RasterState(tex=0, tex_filter=int(T.VXTEXTURE_FILTER.LINEAR))
    batch = B.make_batch(_screen_cw_tri(), view=VIEW, uv=uv)
    a, b = _run_both(batch, [st], textures=[tex])
    _assert_parity(a, b, max_bad_frac=0.01)


def test_viewport_scissor_parity():
    a = NullRasterizer(W, H)
    b = JaxRasterizer(W, H)
    a.clear((0, 0, 0, 1)); b.clear((0, 0, 0, 1))
    a.set_viewport(10, 5, 20, 20)
    b.set_viewport(10, 5, 20, 20)
    batch = B.make_batch(_screen_cw_tri(), view=(10, 5, 20, 20))
    si, sf = T.pack_states([T.RasterState()])
    a.draw_batch(batch, si, sf, [])
    b.draw_batch(batch, si, sf, [])
    _assert_parity(a, b)
    assert a.fb[:5, :, :3].max() == 0.0 and a.fb[:, :10, :3].max() == 0.0


def test_near_plane_crossing_triangle():
    # A triangle crossing w=0 (vertex behind the eye): homogeneous raster must
    # draw only the front part in both backends, no wrap-around artifacts.
    proj = np.asarray(vx.perspective(np.pi / 2, W / H, 0.5, 50.0))
    pts = np.array([[-1.0, 0.0, 2.0], [1.0, 0.0, 2.0], [0.0, 0.5, -3.0]], np.float32)
    hom = np.concatenate([pts, np.ones((3, 1), np.float32)], -1) @ proj
    batch = B.make_batch(hom[None], view=VIEW,
                         color=np.tile(np.array([1, 1, 0, 1], np.float32), (1, 3, 1)))
    a, b = _run_both(batch, [T.RasterState(cull=int(T.VXCULL.NONE))])
    _assert_parity(a, b, max_bad_frac=0.02)
    assert (a.fb[..., 0] > 0.9).any()  # part of it rendered


def test_empty_batch_noop():
    batch = B.make_batch(np.zeros((0, 3, 4), np.float32), view=VIEW, pad_to=8)
    a, b = _run_both(batch, [T.RasterState()])
    assert np.allclose(a.fb[..., :3], [0.1, 0.2, 0.3])
    _assert_parity(a, b)


class TestPerspectiveCorrectness:
    def test_uv_interpolation_is_perspective_correct(self):
        """A quad receding in depth: the screen-midpoint UV must match the
        analytic perspective-correct value, not the affine one (SURVEY hard
        part: DX9 raster rules at far/near extremes)."""
        import jax.numpy as jnp
        from ckrenderengine_tpu.objects import (
            CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
        )

        ctx = CKContext()
        mesh = CKMesh(ctx, "q")
        # near edge at z=0, far edge at z=8 (camera at -2: w ratio 1:5)
        mesh.SetPositions(np.array(
            [[-4, -1, 0], [4, -1, 0], [4, 1, 8], [-4, 1, 8]], np.float32))
        mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        mesh.SetUVs(np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32))
        mesh.BuildNormals()
        # v-ramp texture: sampled v is directly readable from the red channel
        tex = CKTexture(ctx, "ramp")
        ramp = np.linspace(0, 1, 256, dtype=np.float32)
        img = np.stack([np.tile(ramp[:, None], (1, 4))] * 3
                       + [np.ones((256, 4), np.float32)], -1)
        tex.SetImage(img)
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((1, 1, 1, 1))
        mat.SetTexture(tex)
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(128, 128)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -2))
        cam.SetFrontPlane(0.5)
        cam.SetBackPlane(100.0)
        rc.AttachViewpointToCamera(cam)
        rc.Render()
        fb = rc.framebuffer()

        # Oracle: exact ray/plane intersection through the sampled pixel.
        cov = fb[..., 3] > 0
        rows = np.where(cov.any(axis=1))[0]
        mid_row = int((rows.min() + rows.max()) // 2)
        px, py = 64.5, mid_row + 0.5
        aspect = 1.0
        proj = cam.projection_matrix(aspect)
        ndc_x = px / 128 * 2 - 1
        ndc_y = 1 - py / 128 * 2
        d = np.array([ndc_x / proj[0, 0], ndc_y / proj[1, 1], 1.0], np.float32)
        origin = np.array([0, 0, -2], np.float32)
        # quad plane through (0,-1,0) with normal from the mesh
        n = mesh.normals[0]
        p0 = np.array([0, -1, 0], np.float32)
        tt = np.dot(p0 - origin, n) / np.dot(d, n)
        hit = origin + tt * d
        v_exact = 1.0 - hit[2] / 8.0            # v is linear in world z
        # affine screen interpolation would give a different value
        t_scr = (py - rows.min()) / max(rows.max() - rows.min(), 1)
        v_affine = 0.0 + t_scr * 1.0            # far(top)=0 .. near(bottom)=1
        sampled_v = fb[mid_row, 64, 0]          # red = ramp(v)
        assert sampled_v == pytest.approx(v_exact, abs=0.05)
        assert abs(v_exact - v_affine) > 0.1    # the distinction is real
        assert abs(sampled_v - v_affine) > 0.05


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_randomized_state_fuzz_parity(seed):
    """Differential fuzz: random triangle soups under random render states
    (blends, z funcs, alpha test, culls, filters, addressing, fog) must match
    the numpy oracle pixel-for-pixel."""
    rng = np.random.default_rng(seed)
    t = 24
    # random clip triangles with varying w and z
    pts = rng.uniform(-1.1, 1.1, (t, 3, 2)).astype(np.float32)
    ws = rng.uniform(0.5, 3.0, (t, 3, 1)).astype(np.float32)
    zs = rng.uniform(0.05, 0.95, (t, 3, 1)).astype(np.float32)
    clip = np.concatenate([pts * ws, zs * ws, ws], axis=-1)
    color = rng.uniform(0, 1, (t, 3, 4)).astype(np.float32)
    uv = rng.uniform(-0.5, 1.5, (t, 3, 2)).astype(np.float32)
    fog = rng.uniform(0, 1, (t, 3)).astype(np.float32)

    n_states = 6
    states = []
    for i in range(n_states):
        states.append(T.RasterState(
            src_blend=int(rng.choice([T.VXBLEND.ONE, T.VXBLEND.SRCALPHA,
                                      T.VXBLEND.SRCCOLOR])),
            dst_blend=int(rng.choice([T.VXBLEND.ZERO, T.VXBLEND.ONE,
                                      T.VXBLEND.INVSRCALPHA])),
            z_func=int(rng.choice([T.VXCMP.LESSEQUAL, T.VXCMP.LESS,
                                   T.VXCMP.ALWAYS])),
            z_write=bool(rng.integers(2)),
            alpha_blend=bool(rng.integers(2)),
            alpha_test=bool(rng.integers(2)),
            alpha_func=int(T.VXCMP.GREATER),
            alpha_ref=float(rng.uniform(0, 1)),
            tex=int(rng.integers(-1, 1)),     # -1 or 0
            tex_address=int(rng.choice([T.VXTEXTURE_ADDRESS.WRAP,
                                        T.VXTEXTURE_ADDRESS.CLAMP,
                                        T.VXTEXTURE_ADDRESS.MIRROR])),
            tex_filter=int(rng.choice([T.VXTEXTURE_FILTER.NEAREST,
                                       T.VXTEXTURE_FILTER.LINEAR])),
            tex_blend=int(rng.choice([T.VXTEXTUREBLEND.MODULATEALPHA,
                                      T.VXTEXTUREBLEND.DECAL,
                                      T.VXTEXTUREBLEND.ADD])),
            fog=bool(rng.integers(2)),
            perspective=bool(rng.integers(2)),
            cull=int(rng.choice([T.VXCULL.NONE, T.VXCULL.CCW, T.VXCULL.CW])),
            blend_op=int(rng.choice([T.VXBLENDOP.ADD, T.VXBLENDOP.SUBTRACT,
                                     T.VXBLENDOP.REVSUBTRACT, T.VXBLENDOP.MIN,
                                     T.VXBLENDOP.MAX])),
        ))
    state_idx = rng.integers(0, n_states, t).astype(np.int32)

    texture = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    batch = B.make_batch(clip, view=VIEW, color=color, uv=uv, fog=fog,
                         state_idx=state_idx)
    a, b = _run_both(batch, states, textures=[texture],
                     fog_color=(0.3, 0.4, 0.5))
    _assert_parity(a, b, atol=4e-3, max_bad_frac=0.004)
