"""Render settings: the 17 legacy options + INI-style config + test overrides.

Mirrors the reference's layered config (SURVEY §5): CK2_3D.ini parsed next to
the module (/root/reference/src/CKRenderSettings.cpp:104-172), the VxOption
table registered by the manager ctor (src/CKRenderManager.cpp:79-127), and the
in-memory override table for tests
(CKRenderSettingsSetOverrideForTests, src/CKRenderSettings.cpp:142-172).
"""

from __future__ import annotations

import os

# The 17 options with their reference defaults
# (/root/reference/src/CKRenderManager.cpp:79-127, src/CK2_3D.ini:7-25).
_DEFAULTS = {
    "TextureVideoFormat": "_32_ARGB8888",
    "SpriteVideoFormat": "_16_ARGB1555",
    "EnableScreenDump": 0,
    "EnableDebugMode": 0,
    "VertexCache": 16,
    "SortTransparentObjects": 1,
    "TextureCacheManagement": 1,
    "UseIndexBuffers": 1,
    "ForceLinearFog": 0,
    "EnsureVertexShader": 0,
    "ForceSoftware": 0,
    "DisableFilter": 0,
    "DisableDithering": 0,
    "Antialias": 0,
    "DisableMipmap": 0,
    "DisableSpecular": 0,
    "DisablePerspectiveCorrection": 0,
    # g_FogProjectionMode global in the reference (src/CKMaterial.cpp:49,
    # applied CKRenderedScene.cpp:416-425) — surfaced as an option here.
    "FogProjectionMode": 0,
    # TPU-native extension (no reference equivalent): textured ordered
    # transparency through the ITERATED layer-peel kernel — draw-order
    # layers composite K=4 at a time, re-peeling until every pixel's
    # fragment list drains (exact at any depth; round 4). Default 1: the
    # sequential per-triangle pass it replaces is in the sub-0.1 fps class
    # at 50k ordered triangles, the peel path renders the same scene at
    # ~13 fps with identical output. 0 restores the sequential pass.
    # Phase-A CAPACITY overflow (pair/window caps) is surfaced every peel
    # frame as VxStats.OrderedPeelOverflow and — since round 5 — auto-
    # corrected: an overflowed presented frame re-renders through the
    # exact sequential pass at the fb read (CKRenderContext._peel_correct),
    # so the default-on peel NEVER drops fragments, it only slows the rare
    # overflowing frame (PARITY.md).
    "TexturedPeel": 1,
}

_overrides: dict[str, object] = {}


def default_options() -> dict:
    return dict(_DEFAULTS)


def set_override_for_tests(name: str, value) -> None:
    """In-memory override table (CKRenderSettingsSetOverrideForTests)."""
    _overrides[name] = value


def clear_overrides() -> None:
    _overrides.clear()


def _parse_ini(path: str) -> dict:
    """Parse the reference's `<CK2_3D>` section format
    (src/CKRenderSettings.cpp:42-76): `<Section>` headers, `key=value` lines."""
    values: dict[str, str] = {}
    section = None
    try:
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith(";") or line.startswith("#"):
                    continue
                if line.startswith("<") and line.endswith(">"):
                    section = line[1:-1]
                    continue
                if section == "CK2_3D" and "=" in line:
                    k, v = line.split("=", 1)
                    values[k.strip()] = v.strip()
    except OSError:
        pass
    return values


_ini_cache: dict[str, dict] | None = None


def _ini_values() -> dict:
    global _ini_cache
    if _ini_cache is None:
        path = os.environ.get(
            "CK2_3D_INI",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "CK2_3D.ini"),
        )
        _ini_cache = _parse_ini(path)
    return _ini_cache


def get_string(name: str, default: str | None = None) -> str | None:
    if name in _overrides:
        return str(_overrides[name])
    ini = _ini_values()
    if name in ini:
        return ini[name]
    if default is not None:
        return default
    d = _DEFAULTS.get(name)
    return None if d is None else str(d)


def get_dword(name: str, default: int = 0) -> int:
    v = get_string(name, None)
    if v is None:
        return default
    try:
        return int(str(v), 0)
    except ValueError:
        return default


# Pixel-format token parsing (CKRenderSettingsGetPixelFormat).
_PIXEL_FORMATS = {
    "_32_ARGB8888": 32, "_32_RGB888": 32, "_24_RGB888": 24,
    "_16_RGB565": 16, "_16_RGB555": 16, "_16_ARGB1555": 16, "_16_ARGB4444": 16,
    "_DXT1": 4, "_DXT3": 8, "_DXT5": 8,
}


def get_pixel_format(name: str, default: str = "_32_ARGB8888") -> str:
    v = get_string(name, default)
    return v if v in _PIXEL_FORMATS else default
