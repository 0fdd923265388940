"""Multi-context batching: ProcessBatched vmaps same-topology contexts and
matches sequential Render; sharded variant runs over the 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)
from ckrenderengine_tpu.parallel.context_batch import make_context_mesh


def _scene(n_contexts=3, size=48):
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    mesh = CKMesh(ctx, "t")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1, 0, 0, 1))
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "tri")
    obj.SetCurrentMesh(mesh)
    rcs = []
    for i in range(n_contexts):
        rc = rm.CreateRenderContext(size, size)
        cam = CKCamera(ctx, f"cam{i}")
        cam.SetPosition((0, 0, -3 - i))       # different view per context
        rc.AttachViewpointToCamera(cam)
        rcs.append(rc)
    return ctx, rm, rcs


class TestProcessBatched:
    def test_matches_sequential_render(self):
        ctx, rm, rcs = _scene()
        for rc in rcs:
            rc.Render()
        seq = [rc.framebuffer().copy() for rc in rcs]
        for rc in rcs:
            rc.Clear()
        rm.ProcessBatched()
        for rc, ref in zip(rcs, seq):
            np.testing.assert_allclose(rc.framebuffer(), ref, atol=2e-5)

    def test_sharded_over_cpu_mesh(self):
        n = min(4, len(jax.devices()))
        ctx, rm, rcs = _scene(n_contexts=n)
        mesh = make_context_mesh(n)
        rm.ProcessBatched(mesh=mesh)
        for i, rc in enumerate(rcs):
            fb = rc.framebuffer()
            assert fb[..., 0].max() > 0.9      # triangle visible per context
        # nearer camera covers more pixels than the farthest
        c0 = (rcs[0].framebuffer()[..., 3] > 0).sum()
        cl = (rcs[-1].framebuffer()[..., 3] > 0).sum()
        assert c0 > cl


class TestPackedBatch:
    """Single-transfer packed batching (_batch_packed): the whole group's
    dynamic state ships as ONE stacked f32 + i32 buffer pair."""

    def test_packed_path_taken_and_matches_sequential(self):
        ctx, rm, rcs = _scene()
        for rc in rcs:
            rc.Render()
        seq = [rc.framebuffer().copy() for rc in rcs]
        for rc in rcs:
            rc.Clear()
        assert rm._batch_packed(rcs)            # eligible group
        for rc, ref in zip(rcs, seq):
            np.testing.assert_allclose(rc.framebuffer(), ref, atol=2e-5)

    def test_ineligible_group_falls_back(self):
        ctx, rm, rcs = _scene(n_contexts=2)
        rcs[0].EnableStereo(True) if hasattr(rcs[0], "EnableStereo") else \
            setattr(rcs[0], "stereo_enabled", True)
        assert not rm._batch_packed(rcs)
        rcs[0].stereo_enabled = False
        # vertex shader also disqualifies
        rcs[1].vertex_shader = lambda p, n, s: (p, n)
        assert not rm._batch_packed(rcs)
        rcs[1].vertex_shader = None
        rm.ProcessBatched()                      # end-to-end still works
        for rc in rcs:
            assert np.asarray(rc.fb).sum() > 0


def test_packed_batch_with_bound_animation():
    """Regression: contexts with a device-bound clip (params carry per-ctx
    ``world_in`` worlds) must still batch through the packed path and match
    sequential rendering at the same clip frames."""
    from ckrenderengine_tpu.anim import (
        CKKeyedAnimation, CKObjectAnimation, CKANIMATION_LINEAR_ROT,
    )

    ctx, rm, rcs = _scene(n_contexts=2)
    obj = ctx.GetObjectByName("tri")
    clip = CKKeyedAnimation(ctx, "spin")
    clip.SetLength(10.0)
    oa = CKObjectAnimation(ctx, "oa")
    oa.Set3dEntity(obj)
    rcn = oa.CreateController(CKANIMATION_LINEAR_ROT)
    for t, ang in ((0.0, 0.0), (10.0, 1.2)):
        q = np.array([0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2)], np.float32)
        rcn.AddKey(t, q)
    clip.AddAnimation(oa)
    for rc in rcs:
        assert rc.BindAnimation(clip)
    clip.SetFrame(4.0)
    for rc in rcs:
        rc.Render()
    seq = [rc.framebuffer().copy() for rc in rcs]
    for rc in rcs:
        rc.Clear()
    assert rm._batch_packed(rcs)
    for rc, ref in zip(rcs, seq):
        np.testing.assert_allclose(rc.framebuffer(), ref, atol=2e-5)
    # and the pose actually differs from frame 0 (the clip is live on device)
    clip.SetFrame(0.0)
    assert rm._batch_packed(rcs)
    assert np.abs(rcs[0].framebuffer() - seq[0]).max() > 0.05


def test_packed_sharded_over_cpu_mesh():
    """Packed batch path sharded over the virtual device mesh: output
    framebuffers carry the ctx sharding and match sequential rendering."""
    n = min(4, len(jax.devices()))
    ctx, rm, rcs = _scene(n_contexts=n)
    for rc in rcs:
        rc.Render()
    seq = [rc.framebuffer().copy() for rc in rcs]
    for rc in rcs:
        rc.Clear()
    mesh = make_context_mesh(n)
    rm.ProcessBatched(mesh=mesh)
    for rc, ref in zip(rcs, seq):
        np.testing.assert_allclose(rc.framebuffer(), ref, atol=2e-5)
