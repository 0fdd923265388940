"""Frame-window pipelining (SetFramePipelining): W frames staged host-side
and dispatched as ONE scan program must produce BIT-IDENTICAL frames to
per-frame dispatch, including lazy flush on early framebuffer reads, scene
motion between frames, and the deferred bound-clip animation batch."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)


def _scene(ctx, w=64, h=64):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(w, h)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    mesh = CKMesh(ctx, "m")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]],
                               np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "mat")
    mat.SetEmissive((1, 0.2, 0.1, 1))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    return rc, obj


def _run_frames(window, n_frames=5, read_each=True):
    ctx = CKContext()
    rc, obj = _scene(ctx)
    rc.SetFramePipelining(window)
    fbs = []
    for f in range(n_frames):
        obj.SetPosition((0.3 * f - 0.6, 0.1 * f, 0))
        rc.Render()
        if read_each:
            fbs.append(np.asarray(rc.framebuffer()))
    if not read_each:
        fbs.append(np.asarray(rc.framebuffer()))
    return fbs


def test_windowed_frames_bit_identical():
    ref = _run_frames(window=1)
    win = _run_frames(window=3)
    assert len(ref) == len(win)
    for a, b in zip(ref, win):
        np.testing.assert_array_equal(a, b)
    assert any(fb[..., :3].sum() > 0 for fb in ref)   # something rendered


def test_windowed_last_frame_without_intermediate_reads():
    ref = _run_frames(window=1)
    win = _run_frames(window=3, read_each=False)
    np.testing.assert_array_equal(win[-1], ref[-1])


def test_window_resets_to_immediate():
    ctx = CKContext()
    rc, obj = _scene(ctx)
    rc.SetFramePipelining(4)
    rc.Render()
    rc.SetFramePipelining(1)       # flushes pending
    assert rc.GetFramePipelining() == 1
    rc.Render()
    assert np.asarray(rc.framebuffer()).shape == (64, 64, 4)


def test_windowed_bound_clip_animation():
    """The window program's deferred anim prologue must match per-frame
    eval_anim_world dispatches."""
    from ckrenderengine_tpu.anim import CKKeyedAnimation, CKObjectAnimation
    from ckrenderengine_tpu.anim.objectanim import CKANIMATION_LINEAR_POS

    def frames(window):
        ctx = CKContext()
        rc, obj = _scene(ctx)
        oa = CKObjectAnimation(ctx, "oa")
        oa.Set3dEntity(obj)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (-1, 0, 0))
        pc.AddKey(10.0, (1, 0.5, 0))
        clip = CKKeyedAnimation(ctx, "ka")
        clip.AddAnimation(oa)
        rc.SetFramePipelining(window)
        assert rc.BindAnimation(clip)
        out = []
        for f in range(4):
            clip.SetFrame(2.5 * f)
            rc.Render()
            out.append(np.asarray(rc.framebuffer()))
        return out

    ref = frames(1)
    win = frames(4)
    moved = any(not np.array_equal(ref[0], r) for r in ref[1:])
    assert moved                       # the clip actually animates pixels
    for a, b in zip(ref, win):
        np.testing.assert_array_equal(a, b)
