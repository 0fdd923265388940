"""Multi-texture material effects: DP3 normal-map lighting, EMBM bump-env,
2/3-texture single-material blends (reference BumpMapEnvEffect / DP3Effect /
BlendTexturesEffect, src/CKMaterial.cpp:1668-2060). Here they lower to
synthesized blended passes over the base draw; DP3's TEXTUREFACTOR light
direction rides the per-draw state-bank constant."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh, CKTexture,
)
from ckrenderengine_tpu.objects.material import (
    CKRST_TOP_ADD, CKRST_TOP_MODULATE, VXEFFECT_2TEXTURES, VXEFFECT_3TEXTURES,
    VXEFFECT_BUMPENV, VXEFFECT_DP3,
)


def _quad_scene(ctx, size=48):
    mesh = CKMesh(ctx, "q")
    mesh.SetPositions(np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1, 1, 1, 1))
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rc = ctx.GetRenderManager().CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -3))
    rc.AttachViewpointToCamera(cam)
    return rc, mat


def _tex(ctx, name, arr):
    t = CKTexture(ctx, name)
    t.SetImage(arr.astype(np.float32))
    return t


def _checker(ctx, name="checker"):
    img = (np.indices((8, 8)).sum(0) % 2).astype(np.float32)
    return _tex(ctx, name, np.stack([img, img * .5, 1 - img,
                                     np.ones_like(img)], -1))


def _flat(ctx, rgba, name="flat"):
    return _tex(ctx, name, np.tile(np.asarray(rgba, np.float32), (8, 8, 1)))


class Test2Textures:
    def test_second_texture_modulates(self):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_flat(ctx, (1, 1, 1, 1), "white"))
        rc.Render()
        base = np.asarray(rc.framebuffer()).copy()
        # modulate by 0.5 gray: lit pixels halve
        mat.SetTexture(_flat(ctx, (0.5, 0.5, 0.5, 1), "gray"), 1)
        mat.SetEffect(VXEFFECT_2TEXTURES)
        mat.SetEffectParameter(op=CKRST_TOP_MODULATE)
        rc.Render()
        fb = np.asarray(rc.framebuffer())
        lit = base[..., :3].sum(-1) > 0.1
        assert lit.any()
        np.testing.assert_allclose(fb[lit][:, :3], base[lit][:, :3] * 0.5,
                                   atol=0.02)

    def test_add_op_brightens(self):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_flat(ctx, (0.3, 0.3, 0.3, 1), "dark"))
        rc.Render()
        base = np.asarray(rc.framebuffer()).copy()
        mat.SetTexture(_flat(ctx, (0.4, 0.1, 0.0, 1), "warm"), 1)
        mat.SetEffect(VXEFFECT_2TEXTURES)
        mat.SetEffectParameter(op=CKRST_TOP_ADD)
        rc.Render()
        fb = np.asarray(rc.framebuffer())
        lit = base[..., :3].sum(-1) > 0.1
        np.testing.assert_allclose(fb[lit][:, 0], base[lit][:, 0] + 0.4,
                                   atol=0.02)
        np.testing.assert_allclose(fb[lit][:, 2], base[lit][:, 2], atol=0.02)

    def test_three_textures(self):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_flat(ctx, (0.2, 0.2, 0.2, 1), "t0"))
        mat.SetTexture(_flat(ctx, (0.3, 0.0, 0.0, 1), "t1"), 1)
        mat.SetTexture(_flat(ctx, (0.0, 0.4, 0.0, 1), "t2"), 2)
        mat.SetEffect(VXEFFECT_3TEXTURES)
        mat.SetEffectParameter(op=CKRST_TOP_ADD, op2=CKRST_TOP_ADD)
        rc.Render()
        fb = np.asarray(rc.framebuffer())
        lit = fb[..., :3].sum(-1) > 0.3
        assert lit.any()
        np.testing.assert_allclose(fb[lit][:, 0], 0.5, atol=0.02)   # .2+.3
        np.testing.assert_allclose(fb[lit][:, 1], 0.6, atol=0.02)   # .2+.4

    def test_2textures_without_second_slot_is_plain(self):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_checker(ctx))
        rc.Render()
        base = np.asarray(rc.framebuffer()).copy()
        mat.SetEffect(VXEFFECT_2TEXTURES)    # textures[1] is None
        rc.Render()
        np.testing.assert_allclose(np.asarray(rc.framebuffer()), base,
                                   atol=1e-5)


class TestDP3:
    def _dp3_scene(self, normal_rgb):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_flat(ctx, (1, 1, 1, 1), "white"))
        # object-space normal map: encoded constant normal
        mat.SetTexture(_flat(ctx, tuple(normal_rgb) + (1.0,), "nmap"), 1)
        mat.SetEffect(VXEFFECT_DP3)
        light = CKLight(ctx, "sun")
        light.SetType(3)                       # directional
        return ctx, rc, mat, light

    def test_facing_light_is_brighter_than_grazing(self):
        # Normal map pointing at encoded +z-ish; directional light along its
        # world z: dot should modulate brightness as the light rotates away.
        ctx, rc, mat, light = self._dp3_scene((0.5, 0.0, 0.5))
        rc.Render()
        bright = np.asarray(rc.framebuffer())[..., :3].sum()
        light.Rotate((1, 0, 0), 1.3)
        rc.Render()
        dim = np.asarray(rc.framebuffer())[..., :3].sum()
        assert bright != pytest.approx(dim, rel=0.01)

    def test_light_parameter_overrides_scene_light(self):
        ctx, rc, mat, light = self._dp3_scene((0.5, 0.0, 0.5))
        other = CKLight(ctx, "other")
        other.SetType(3)
        other.Rotate((1, 0, 0), 0.9)
        rc.Render()
        a = np.asarray(rc.framebuffer()).copy()
        mat.SetEffectParameter(light=other)
        rc.Render()
        b = np.asarray(rc.framebuffer())
        assert np.abs(a - b).sum() > 1.0


class TestBumpEnv:
    def test_bump_perturbs_env_lookup(self):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_flat(ctx, (0.3, 0.3, 0.3, 1), "base"))
        rng = np.random.default_rng(7)
        b = rng.uniform(0.3, 0.7, (8, 8)).astype(np.float32)
        mat.SetTexture(_tex(ctx, "bump", np.stack(
            [b, 1 - b, b, np.ones_like(b)], -1)), 1)
        mat.SetTexture(_checker(ctx, "env"), 2)
        mat.SetEffect(VXEFFECT_BUMPENV)
        rc.Render()
        fb1 = np.asarray(rc.framebuffer()).copy()
        # fractional scale change shifts the dependent env lookup
        mat.SetEffectParameter(bump_scale=1.3)
        rc.Render()
        fb2 = np.asarray(rc.framebuffer())
        assert np.abs(fb2 - fb1).sum() > 1.0
        assert np.isfinite(fb2).all()

    def test_scene_without_bump_unaffected(self):
        # NUM_SI/NUM_SF growth must not disturb plain textured rendering.
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_checker(ctx))
        rc.Render()
        fb = np.asarray(rc.framebuffer())
        assert fb[..., :3].sum() > 0


class TestEffectSerialization:
    def test_effect_parameters_roundtrip(self, tmp_path):
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        mat.SetTexture(_checker(ctx))
        mat.SetTexture(_flat(ctx, (0.5, 0.5, 0.5, 1), "gray"), 1)
        mat.SetEffect(VXEFFECT_2TEXTURES)
        mat.SetEffectParameter(op=CKRST_TOP_ADD, bump_scale=0.25)
        p = str(tmp_path / "fx.ck")
        ctx.Save(p)
        ctx2 = CKContext()
        ctx2.Load(p)
        m2 = ctx2.GetObjectByName("m")
        assert m2.GetEffect() == VXEFFECT_2TEXTURES
        assert m2.GetEffectParameter()["op"] == CKRST_TOP_ADD
        assert m2.GetEffectParameter()["bump_scale"] == pytest.approx(0.25)
        assert m2.GetTexture(1) is not None


class TestEffectsRegistry:
    """Manager effects registry (reference RegisterDefaultEffects /
    AddEffect / GetEffectDescription, src/CKRenderManager.cpp:721-1050;
    custom codes dispatch through the SetAsCurrent default branch,
    src/CKMaterial.cpp:1352-1360)."""

    def test_default_effects_registered(self):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        assert rm.GetEffectCount() == 7
        assert rm.GetEffectDescription(0).summary == "None"
        assert rm.GetEffectDescription(1).summary == "TexGen"
        assert rm.GetEffectDescription(4).summary == "DP3 Mapping"

    def test_custom_effect_callback_adds_pass(self):
        from ckrenderengine_tpu.objects.manager import VxEffectDescription
        from ckrenderengine_tpu.raster.types import (
            TEXGEN_CHROME, VXBLEND, VXTEXTUREBLEND)

        ctx = CKContext()
        rc, mat = _quad_scene(ctx)
        rm = ctx.GetRenderManager()
        calls = []

        def my_effect(dev, material, stage, arg):
            calls.append((material, arg))
            return [dict(slot=1, texgen=TEXGEN_CHROME,
                         src_blend=int(VXBLEND.ONE),
                         dst_blend=int(VXBLEND.ONE),
                         tex_blend=int(VXTEXTUREBLEND.COPY), dp3=False,
                         bump_slot=-1, bump_scale=0.0, ref_entity=None)]

        code = rm.AddEffect(VxEffectDescription(
            summary="MyGlow", set_callback=my_effect, callback_arg=42))
        assert code == 7
        mat.SetTexture(_flat(ctx, (0.2, 0.2, 0.2, 1), "base"))
        rc.Render()
        base = np.asarray(rc.framebuffer()).copy()
        mat.SetTexture(_checker(ctx), 1)
        mat.SetEffect(code)
        rc.Render()
        assert np.abs(np.asarray(rc.framebuffer()) - base).sum() > 1.0
        assert calls and calls[0] == (mat, 42)


class TestExactStageOps:
    """SUBTRACT and ADDSIGNED stage ops are EXACT multi-pass lowerings
    (VXBLENDOP.SUBTRACT / the flat -0.5 bias pass) — not approximations."""

    def _flat_tex(self, ctx, value):
        t = CKTexture(ctx, f"flat{value}")
        img = np.full((4, 4, 4), value, np.float32)
        img[..., 3] = 1.0
        t.SetImage(img)
        return t

    def test_subtract_is_exact(self):
        from ckrenderengine_tpu.objects.material import CKRST_TOP_SUBTRACT
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)        # emissive white: base = texel
        mat.SetDiffuse((0, 0, 0, 1))
        base = self._flat_tex(ctx, 0.25)
        top = self._flat_tex(ctx, 0.75)
        mat.SetTexture(base, 0)
        mat.SetTexture(top, 1)
        mat.SetEffect(VXEFFECT_2TEXTURES)
        mat.SetEffectParameter(op=CKRST_TOP_SUBTRACT)
        rc.Render()
        center = rc.framebuffer()[24, 24, :3]
        # fb' = tex1 - base = 0.75 - 0.25
        np.testing.assert_allclose(center, 0.5, atol=0.03)

    def test_addsigned_is_exact(self):
        from ckrenderengine_tpu.objects.material import CKRST_TOP_ADDSIGNED
        ctx = CKContext()
        rc, mat = _quad_scene(ctx)        # emissive white: base = texel
        mat.SetDiffuse((0, 0, 0, 1))
        base = self._flat_tex(ctx, 0.6)
        top = self._flat_tex(ctx, 0.4)
        mat.SetTexture(base, 0)
        mat.SetTexture(top, 1)
        mat.SetEffect(VXEFFECT_2TEXTURES)
        mat.SetEffectParameter(op=CKRST_TOP_ADDSIGNED)
        passes = mat.effect_passes()
        assert len(passes) == 2 and passes[1]["bias_tex"] is not None
        rc.Render()
        center = rc.framebuffer()[24, 24, :3]
        # fb' = base + tex1 - 0.5 = 0.6 + 0.4 - 0.5
        np.testing.assert_allclose(center, 0.5, atol=0.03)
