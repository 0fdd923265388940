"""Unconditional peel exactness (round 5): when the layer-peel path reports
phase-A capacity overflow for a presented frame, the fb read re-renders that
frame through the exact sequential ordered pass host-side (outside jit — the
documented-safe side of the Mosaic lax.cond fault) and presents THAT.
Capacity overflow costs time, never pixels.

Reference semantics: the sorted transparent composite,
/root/reference/src/CKSceneGraph.cpp:618-752.

The peel KERNEL itself is parity-gated on live Mosaic every bench run
(bench.py pallas_parity_tpu, checks.peel); these tests exercise the
correction plumbing end to end on the CPU backend, where the sequential
pass is the production path and therefore the exactness oracle.
"""

import numpy as np
import jax.numpy as jnp

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)


def _alpha_scene():
    ctx = CKContext()
    ctx.GetRenderManager().SetRenderOptions("TexturedPeel", 1)
    rc = ctx.GetRenderManager().CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -5.0))
    rc.AttachViewpointToCamera(cam)

    tex = CKTexture(ctx, "t")
    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0] = 0.9
    img[..., 3] = np.linspace(0.2, 0.9, 64).reshape(8, 8)
    tex.SetImage(img)

    # Three overlapping textured alpha sheets at different depths.
    for i, z in enumerate((0.0, 0.6, 1.2)):
        m = CKMesh(ctx, f"sheet{i}")
        s = 1.5 - 0.2 * i
        m.SetPositions(np.array([[-s, -s, z], [s, -s, z],
                                 [s, s, z], [-s, s, z]], np.float32))
        m.SetFaces(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
        m.SetUVs(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
        m.BuildNormals()
        mat = CKMaterial(ctx, f"m{i}")
        mat.SetDiffuse((0.4 + 0.2 * i, 0.5, 0.8, 0.55))
        mat.SetTexture(tex)
        mat.EnableAlphaBlend(True)
        mat.EnableZWrite(False)
        o = CK3dObject(ctx, f"o{i}")
        o.SetCurrentMesh(m)
    return ctx, rc


class TestPeelCorrection:
    def test_overflowed_frame_rerenders_exact(self):
        ctx, rc = _alpha_scene()
        rc.Render()
        fb_exact = np.asarray(rc.fb)

        # Fabricate the overflow situation the TPU peel branch produces:
        # stash this frame's packed inputs with the peel profile bit set
        # and the overflow flag TRUE, and corrupt the presented buffer.
        rc._frame_flags = rc.ResolveRenderFlags(0)
        static, dyn_f, dyn_i, params = rc._fill_packed(*rc._quad_lists())
        sp = list(params["sampler_profile"])
        sp[6] = True                     # pretend the peel path rendered it
        params = dict(params, sampler_profile=tuple(sp))
        rc._fb_val = jnp.zeros_like(rc._fb_val)
        rc._zb_val = jnp.ones_like(rc._zb_val)
        rc._peel_redo = (jnp.asarray(True), static, dyn_f, dyn_i, params,
                         (None, None), None)

        fb = np.asarray(rc.fb)           # the read triggers the correction
        np.testing.assert_array_equal(fb, fb_exact)
        assert rc.stats.OrderedPeelCorrected == 1

    def test_clean_frame_is_untouched(self):
        ctx, rc = _alpha_scene()
        rc.Render()
        rc._frame_flags = rc.ResolveRenderFlags(0)
        static, dyn_f, dyn_i, params = rc._fill_packed(*rc._quad_lists())
        marker = jnp.full_like(rc._fb_val, 0.123)
        rc._fb_val = marker
        rc._peel_redo = (jnp.asarray(False), static, dyn_f, dyn_i, params,
                         (None, None), None)
        fb = np.asarray(rc.fb)           # flag False: no re-render
        np.testing.assert_array_equal(fb, np.asarray(marker))
        assert rc.stats.OrderedPeelCorrected == 0

    def test_new_frame_supersedes_stale_correction(self):
        ctx, rc = _alpha_scene()
        rc.Render()
        rc._frame_flags = rc.ResolveRenderFlags(0)
        static, dyn_f, dyn_i, params = rc._fill_packed(*rc._quad_lists())
        rc._peel_redo = (jnp.asarray(True), static, dyn_f, dyn_i, params,
                         (None, None), None)
        rc.Render()                      # renders a NEW frame
        np.asarray(rc.fb)
        # the stale stash was dropped, not applied to the new frame
        assert rc.stats.OrderedPeelCorrected == 0
