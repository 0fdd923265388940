"""Render settings: exhaustive round-trip of the 17 legacy options + INI
parsing + test overrides (reference tests/test_render_settings.cpp:7-57,
CKRenderSettingsSetOverrideForTests)."""

import os

import pytest

from ckrenderengine_tpu import settings
from ckrenderengine_tpu.objects import CKContext


ALL_OPTIONS = [
    "TextureVideoFormat", "SpriteVideoFormat", "EnableScreenDump",
    "EnableDebugMode", "VertexCache", "SortTransparentObjects",
    "TextureCacheManagement", "UseIndexBuffers", "ForceLinearFog",
    "EnsureVertexShader", "ForceSoftware", "DisableFilter",
    "DisableDithering", "Antialias", "DisableMipmap", "DisableSpecular",
    "DisablePerspectiveCorrection",
    # 18th option, beyond the reference's 17: surfaces the g_FogProjectionMode
    # global (reference src/CKMaterial.cpp:49, applied CKRenderedScene.cpp:416)
    # as a settings key, since a headless build has no SetGlobalFogMode export.
    "FogProjectionMode",
    # 19th: textured ordered transparency via iterated layer peeling
    # (default on; exact at any depth) — a TPU-native extension.
    "TexturedPeel",
]


@pytest.fixture(autouse=True)
def _clear_overrides():
    settings.clear_overrides()
    yield
    settings.clear_overrides()


class TestDefaults:
    def test_all_17_options_registered(self):
        opts = settings.default_options()
        assert sorted(opts.keys()) == sorted(ALL_OPTIONS)

    def test_reference_defaults(self):
        opts = settings.default_options()
        assert opts["VertexCache"] == 16
        assert opts["SortTransparentObjects"] == 1
        assert opts["TextureCacheManagement"] == 1
        assert opts["UseIndexBuffers"] == 1
        assert opts["TextureVideoFormat"] == "_32_ARGB8888"
        assert opts["SpriteVideoFormat"] == "_16_ARGB1555"
        for off in ("EnableScreenDump", "EnableDebugMode", "ForceLinearFog",
                    "ForceSoftware", "DisableFilter", "DisableMipmap",
                    "DisableSpecular", "DisablePerspectiveCorrection",
                    "Antialias", "DisableDithering", "EnsureVertexShader"):
            assert int(opts[off]) == 0, off


class TestOverridesRoundtrip:
    def test_every_numeric_option_roundtrips(self):
        for name in ALL_OPTIONS:
            if name.endswith("VideoFormat"):
                continue
            settings.set_override_for_tests(name, 7)
            assert settings.get_dword(name) == 7
        settings.clear_overrides()
        assert settings.get_dword("VertexCache") == 16

    def test_pixel_format_roundtrip(self):
        settings.set_override_for_tests("TextureVideoFormat", "_16_RGB565")
        assert settings.get_pixel_format("TextureVideoFormat") == "_16_RGB565"

    def test_get_string(self):
        settings.set_override_for_tests("TextureVideoFormat", "_24_RGB888")
        assert settings.get_string("TextureVideoFormat") == "_24_RGB888"


class TestManagerRoundtrip:
    def test_set_get_render_options(self):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        for name in ALL_OPTIONS:
            if name.endswith("VideoFormat"):
                continue
            rm.SetRenderOptions(name, 3)
            assert rm.GetRenderOptions(name) == 3

    def test_manager_starts_with_defaults(self):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        assert rm.GetRenderOptions("VertexCache") == 16
        assert rm.GetRenderOptions("SortTransparentObjects") == 1
