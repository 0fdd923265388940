"""Draw-kind passes: ZBUFONLY occluders, STENCILONLY masks, wireframe fill,
driver caps, rendered-scene facade."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)
from ckrenderengine_tpu.scene import entity_table as et
from ckrenderengine_tpu.raster.types import VXFILL


def _quad(ctx, name, z, color, fill=None):
    mesh = CKMesh(ctx, f"{name}m")
    mesh.SetPositions(np.array(
        [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, f"{name}mat")
    mat.SetEmissive(color)
    mat.SetTwoSided(True)
    if fill is not None:
        mat.SetFillMode(fill)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj


def _rc(ctx):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return rc


class TestZBufOnly:
    def test_zbufonly_occludes_without_color(self):
        ctx = CKContext()
        rc = _rc(ctx)
        # z-only wall in front, red quad behind it
        wall = _quad(ctx, "wall", 0.0, (0, 1, 0, 1))
        wall.SetMoveableFlags(wall.GetMoveableFlags()
                              | et.VX_MOVEABLE_ZBUFONLY)
        _quad(ctx, "red", 1.0, (1, 0, 0, 1))
        rc.Render()
        fb = rc.framebuffer()
        # the wall leaves background color but occludes the red quad
        assert fb[32, 32, 0] < 0.1
        assert fb[32, 32, 1] < 0.1


class TestStencilOnly:
    def test_stencil_mask_written_not_color(self):
        ctx = CKContext()
        rc = _rc(ctx)
        sten = _quad(ctx, "mask", 0.0, (1, 1, 1, 1))
        sten.GetCurrentMesh().positions[:, :2] *= 0.4   # small center quad
        sten.GetCurrentMesh()._dirty_dynamic()
        sten.SetMoveableFlags(sten.GetMoveableFlags()
                              | et.VX_MOVEABLE_STENCILONLY)
        rc.Render()
        fb = rc.framebuffer()
        sb = rc.stencilbuffer()
        assert fb.sum() == pytest.approx(0.0, abs=1e-5)   # no color written
        assert sb[32, 32] == 1
        assert sb[2, 2] == 0

    def test_stencil_z_tested(self):
        ctx = CKContext()
        rc = _rc(ctx)
        # opaque quad IN FRONT of the stencil quad hides the mask
        _quad(ctx, "front", -1.0, (0, 0, 1, 1))
        sten = _quad(ctx, "mask", 0.5, (1, 1, 1, 1))
        sten.SetMoveableFlags(sten.GetMoveableFlags()
                              | et.VX_MOVEABLE_STENCILONLY)
        rc.Render()
        assert rc.stencilbuffer()[32, 32] == 0


class TestWireframe:
    def test_wireframe_draws_edges_not_fill(self):
        ctx = CKContext()
        rc = _rc(ctx)
        _quad(ctx, "wire", 0.0, (1, 1, 0, 1), fill=int(VXFILL.WIREFRAME))
        rc.Render()
        fb = rc.framebuffer()
        covered = (fb[..., 3] > 0).sum()
        assert 0 < covered < 64 * 64 * 0.3     # edges only, no filled interior
        # the diagonal edge passes through the center (line color = diffuse)
        assert fb[32, 31:34, 0].max() > 0.5


class TestCapsAndFacade:
    def test_driver_enumeration(self):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        assert rm.GetRenderDriverCount() == 2
        hw = rm.GetRenderDriverDescription(0)
        sw = rm.GetRenderDriverDescription(1)
        assert hw.is_hardware and not sw.is_hardware
        caps = rm.GetDriverCaps(0)
        assert caps.max_texture_width >= 4096
        assert caps.supports_render_to_texture

    def test_rendered_scene_facade(self):
        from ckrenderengine_tpu.objects.manager import CKRenderedScene

        ctx = CKContext()
        rc = _rc(ctx)
        _quad(ctx, "q", 0.0, (1, 0, 0, 1))
        scene = CKRenderedScene(rc)
        scene.SetBackgroundColor((0, 0, 0.3, 1))
        assert scene.GetAttachedCamera() is rc.GetAttachedCamera()
        assert len(scene.Get3dEntities()) >= 1
        scene.Draw()
        assert rc.framebuffer()[2, 2, 2] == pytest.approx(0.3, abs=1e-5)


class TestDriverProblems:
    """Buggy-driver database (reference CKDriverProblems +
    LoadVideoCardFile, include/CKRasterizerTypes.h:29-58)."""

    def test_quirks_file_clamps_caps(self, tmp_path):
        from ckrenderengine_tpu.raster.caps import (
            Vx3DCapsDesc, apply_driver_problems, load_video_card_file)

        ini = tmp_path / "cards.ini"
        ini.write_text("[tpu-xla]\nMaxTextureWidth = 2048\n"
                       "MaxTextureHeight = 1024\nClampToEdgeBug = 1\n"
                       "\n[other-driver]\nMaxTextureWidth = 64\n")
        problems = load_video_card_file(str(ini))
        assert len(problems) == 2
        caps = apply_driver_problems(Vx3DCapsDesc(), problems)
        assert caps.max_texture_width == 2048
        assert caps.max_texture_height == 1024   # only [tpu-xla] matches

    def test_version_gating(self):
        from ckrenderengine_tpu.raster.caps import (
            CKDriverProblems, Vx3DCapsDesc, apply_driver_problems)

        p = CKDriverProblems(renderer="tpu-xla", version="1.2",
                             version_must_be_exact=True,
                             real_max_texture_width=512)
        caps = apply_driver_problems(Vx3DCapsDesc(), [p], version="1.2.9")
        assert caps.max_texture_width == 8192     # exact match required
        caps = apply_driver_problems(Vx3DCapsDesc(), [p], version="1.2")
        assert caps.max_texture_width == 512

    def test_missing_file_is_empty(self):
        from ckrenderengine_tpu.raster.caps import load_video_card_file
        assert load_video_card_file("/nonexistent/cards.ini") == []
