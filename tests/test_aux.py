"""Aux subsystem tests: profiler phases, render-to-texture, debug dumps,
extended picking (2D-first, rect, alpha-precise), stereo (SURVEY §5)."""

import os

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)


def _tri_scene(ctx, emissive=(1, 0, 0, 1)):
    mesh = CKMesh(ctx, "t")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 1], [0.5, 0], [1, 1]], np.float32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive(emissive)
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "tri")
    obj.SetCurrentMesh(mesh)
    return obj, mesh, mat


def _rc(ctx, w=64, h=64):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(w, h)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rc


class TestProfiler:
    def test_phase_times_populate(self):
        ctx = CKContext()
        _tri_scene(ctx)
        rc = _rc(ctx)
        rc.Render()
        t = rc.GetPhaseTimes()
        assert t["SceneBuildTime"] > 0
        assert t["DeviceTime"] >= 0
        assert rc.GetStats().NbObjectDrawn >= 1

    def test_time_profiler(self):
        from ckrenderengine_tpu.profiler import VxTimeProfiler

        p = VxTimeProfiler()
        assert p.Current() >= 0
        ms = p.Split()
        assert ms >= 0
        assert p.Current() < ms + 1000


class TestRenderToTexture:
    def test_target_texture_receives_frame(self):
        ctx = CKContext()
        _tri_scene(ctx)
        rc = _rc(ctx)
        tgt = CKTexture(ctx, "rt")
        rc.SetTargetTexture(tgt)
        rc.Render()
        img = tgt.current_image()
        assert img is not None and img.shape == (64, 64, 4)
        assert img[..., 0].max() > 0.9   # the red triangle landed in it

    def test_rtt_texture_usable_on_mesh(self):
        ctx = CKContext()
        _tri_scene(ctx)
        rc = _rc(ctx)
        tgt = CKTexture(ctx, "rt")
        rc.SetTargetTexture(tgt)
        rc.Render()
        rc.SetTargetTexture(None)
        # apply the captured frame to a quad and render again
        mat = ctx.GetObjectByName("m")
        mat.SetTexture(tgt)
        rc.Render()
        assert rc.framebuffer().sum() > 0


class TestDump:
    def test_dump_color_and_z(self, tmp_path):
        ctx = CKContext()
        _tri_scene(ctx)
        rc = _rc(ctx)
        rc.Render()
        p = str(tmp_path / "frame.png")
        rc.DumpToFile(p, "color")
        assert os.path.getsize(p) > 100
        pz = str(tmp_path / "depth.png")
        rc.DumpToFile(pz, "z")
        assert os.path.getsize(pz) > 100


class TestPicking:
    def test_pick_3d_entity(self):
        ctx = CKContext()
        obj, mesh, mat = _tri_scene(ctx)
        rc = _rc(ctx)
        rc.Render()
        hit, dist = rc.Pick(32, 32)
        assert hit is obj
        assert 0 < dist < 10

    def test_pick_2d_takes_priority(self):
        ctx = CKContext()
        obj, mesh, mat = _tri_scene(ctx)
        rc = _rc(ctx)
        hud = CK2dEntity(ctx, "hud")
        hud.SetRect((28, 28, 40, 40))
        rc.Render()
        hit, dist = rc.Pick(32, 32)
        assert hit is hud
        assert dist == 0.0
        # outside the hud -> 3D hit
        hit2, _ = rc.Pick(32, 20)
        assert hit2 is obj

    def test_pick_rect(self):
        ctx = CKContext()
        obj, mesh, mat = _tri_scene(ctx)
        far = CK3dObject(ctx, "far")
        m2 = CKMesh(ctx, "m2")
        m2.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]],
                                 np.float32))
        m2.SetFaces(np.array([[0, 1, 2]], np.int32))
        m2.BuildNormals()
        far.SetCurrentMesh(m2)
        far.SetPosition((50, 0, 0))   # way off screen
        rc = _rc(ctx)
        rc.Render()
        got = rc.PickRect((0, 0, 64, 64))
        assert obj in got
        assert far not in got

    def test_precise_texture_pick_alpha(self):
        ctx = CKContext()
        obj, mesh, mat = _tri_scene(ctx)
        tex = CKTexture(ctx, "alpha")
        img = np.ones((8, 8, 4), np.float32)
        img[..., 3] = 0.0              # fully transparent texture
        tex.SetImage(img)
        mat.SetTexture(tex)
        rc = _rc(ctx)
        rc.Render()
        hit, _ = rc.Pick(32, 32, precise_texture=True)
        assert hit is None             # alpha=0 texel rejects the pick
        hit2, _ = rc.Pick(32, 32, precise_texture=False)
        assert hit2 is obj


class TestStereo:
    def test_stereo_side_by_side(self):
        ctx = CKContext()
        _tri_scene(ctx)
        rc = _rc(ctx)
        rc.SetStereoParameters(0.2, 2.0)
        rc.Render()
        fb = rc.framebuffer()
        assert fb.shape == (64, 64, 4)
        left = fb[:, :32]
        right = fb[:, 32:]
        assert left.sum() > 0 and right.sum() > 0
        # eye offset shifts the image between halves
        assert np.abs(left - right).sum() > 1.0

    def test_stereo_packed_matches_legacy_path(self):
        """Stereo rides the packed 2-frame scan program (round-4); its
        output must match the legacy per-eye SceneDevice path."""
        from ckrenderengine_tpu.pipeline.overlay import build_quad_bank

        ctx = CKContext()
        _tri_scene(ctx)
        rc = _rc(ctx)
        rc.SetStereoParameters(0.2, 2.0)
        rc.Render()                                  # packed stereo path
        fb_packed = rc.framebuffer().copy()
        scene = rc._build_scene_device()
        rc._render_stereo(scene, None, None, rc._sprite3d_bank())
        fb_legacy = rc.framebuffer()
        np.testing.assert_allclose(fb_packed, fb_legacy, atol=1e-5)


def test_state_cache_hit_miss_counters():
    """Scene-compile cache counters (the reference's render-state cache
    hit/miss observability, include/CKRasterizer.h:509-510)."""
    import numpy as np
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh)

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(32, 32)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    mesh = CKMesh(ctx, "t")
    mesh.SetPositions(np.array([[-1, 0, 0], [0, 1, 0], [1, 0, 0]],
                               np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1, 0, 0, 1))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)

    rc.Render()                       # first frame compiles
    assert rc.GetStats().RenderStateCacheMiss == 1
    obj.SetPosition((0.1, 0, 0))      # dynamic-only change
    rc.Render()
    rc.Render()
    st = rc.GetStats()
    assert st.RenderStateCacheMiss == 1
    assert st.RenderStateCacheHit == 2
    mat2 = CKMaterial(ctx, "m2")      # topology change -> miss
    mesh.ApplyGlobalMaterial(mat2)
    rc.Render()
    assert rc.GetStats().RenderStateCacheMiss == 2


class TestDeviceTrace:
    """jax-profiler trace wrapper (SURVEY §5 tracing — Tracy equivalent)."""

    def test_trace_session_produces_dump(self, tmp_path):
        import os

        from ckrenderengine_tpu.objects import CKCamera, CKContext
        from ckrenderengine_tpu.profiler import (DeviceTraceSession,
                                                 trace_annotation)
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(32, 32)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -5))
        rc.AttachViewpointToCamera(cam)
        log = str(tmp_path / "trace")
        assert rm.StartDeviceTrace(log)
        with trace_annotation("fuzz-frame"):
            rc.Render()
        assert rm.StopDeviceTrace()
        assert not rm.StopDeviceTrace()          # idempotent
        dumped = []
        for root, _d, files in os.walk(log):
            dumped += files
        assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz"))
                   or "trace" in f for f in dumped)
        s = DeviceTraceSession(str(tmp_path / "t2"))
        with s:
            rc.Render()
        assert not s._active


class TestDebugObjectStepping:
    """Programmatic object-by-object stepping (reference EnableDebugMode
    Ctrl+Alt+F11 walk, src/CKRenderContext.cpp:657-762)."""

    def test_step_reveals_objects_in_render_order(self):
        import numpy as np

        from ckrenderengine_tpu.objects import (CK3dObject, CKCamera,
                                                CKContext, CKMaterial, CKMesh)
        ctx = CKContext()
        rc = ctx.GetRenderManager().CreateRenderContext(48, 48)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -5))
        rc.AttachViewpointToCamera(cam)

        def tri(name, x):
            mesh = CKMesh(ctx, name + "m")
            mesh.SetPositions(np.array([[x - .8, -1, 0], [x, 1, 0],
                                        [x + .8, -1, 0]], np.float32))
            mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
            mesh.BuildNormals()
            mat = CKMaterial(ctx, name + "mat")
            mat.SetEmissive((1, 1, 1, 1))
            mesh.ApplyGlobalMaterial(mat)
            o = CK3dObject(ctx, name)
            o.SetCurrentMesh(mesh)
            return o

        a = tri("a", -1.5)
        b = tri("b", 1.5)
        rc.Render()
        full = int((rc.framebuffer()[..., :3].sum(-1) > 0.05).sum())
        assert full > 0
        rc.SetDebugObjectCount(0)
        rc.Render()
        assert int((rc.framebuffer()[..., :3].sum(-1) > 0.05).sum()) == 0
        counts = []
        while rc.DebugStep() != -1:
            rc.Render()
            counts.append(
                int((rc.framebuffer()[..., :3].sum(-1) > 0.05).sum()))
        assert counts[-1] == full              # all revealed at the end
        assert all(c2 >= c1 for c1, c2 in zip(counts, counts[1:]))
        # some step shows a strict subset (camera rows draw nothing,
        # so leading steps may be empty)
        assert any(0 < c < full for c in counts)
        rc.Render()                            # cursor wrapped to -1 = all
        assert int((rc.framebuffer()[..., :3].sum(-1) > 0.05).sum()) == full

    def test_debug_mode_draws_step_label(self):
        """With EnableDebugMode on, stepping composites the object
        name/time label into the output (reference GDI overlay,
        src/CKRenderContext.cpp:657-762)."""
        import numpy as np

        from ckrenderengine_tpu.objects import CKCamera, CKContext
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(96, 96)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -5))
        rc.AttachViewpointToCamera(cam)
        rc.Render()
        base = np.asarray(rc.framebuffer())
        assert base[4:20, 4:90, :3].max() < 0.05       # empty corner
        rm.SetRenderOptions("EnableDebugMode", 1)
        rc.SetDebugObjectCount(1)
        rc.Render()
        fb = np.asarray(rc.framebuffer())
        corner = fb[4:20, 4:90]
        assert corner[..., 3].max() > 0.5              # label drawn
        assert (corner[..., :3].max(-1) > 0.8).sum() > 10  # white glyphs
