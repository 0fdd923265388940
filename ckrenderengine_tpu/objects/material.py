"""CKMaterial: fixed-function material, lowered to a render-state bucket.

API mirror of RCKMaterial (/root/reference/include/RCKMaterial.h,
src/CKMaterial.cpp). The reference's SetAsCurrent "state compiler"
(src/CKMaterial.cpp:1269-1438) becomes :meth:`raster_state` +
:meth:`lighting_params`: the scene compiler packs these into per-draw-segment
state rows consumed branchlessly by the raster kernel.
"""

from __future__ import annotations

import numpy as np

from ..raster.types import (
    RasterState, VXBLEND, VXCMP, VXCULL, VXFILL, VXSHADE, VXTEXTUREBLEND,
    VXTEXTURE_ADDRESS, VXTEXTURE_FILTER,
)
from .base import CKCID_MATERIAL, CKContext, CKObject

# m_Flags bits (reference include/RCKMaterial.h:255-267 packed-flags encoding)
_FLAG_TWOSIDED = 1
_FLAG_PERSPECTIVE = 4
_FLAG_ALPHABLEND = 8
_FLAG_ALPHATEST = 0x10
_FLAG_ZWRITE = 0x20


class CKMaterial(CKObject):
    CLASS_ID = CKCID_MATERIAL

    def __init__(self, context: CKContext, name: str = ""):
        super().__init__(context, name)
        # Lighting colors (D3DMATERIAL9 defaults the reference uses).
        self.diffuse = np.array([0.7, 0.7, 0.7, 1.0], np.float32)
        self.ambient = np.array([0.3, 0.3, 0.3, 1.0], np.float32)
        self.specular = np.array([0.5, 0.5, 0.5, 1.0], np.float32)
        self.emissive = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        self.power = 0.0
        # Modes.
        self.shade_mode = int(VXSHADE.GOURAUD)
        self.fill_mode = int(VXFILL.SOLID)
        self.src_blend = int(VXBLEND.ONE)
        self.dst_blend = int(VXBLEND.ZERO)
        self.z_func = int(VXCMP.LESSEQUAL)
        self.alpha_func = int(VXCMP.ALWAYS)
        self.alpha_ref = 0
        self.textures = [None, None, None, None]
        self.texture_blend_mode = int(VXTEXTUREBLEND.MODULATEALPHA)
        self.texture_min_mode = int(VXTEXTURE_FILTER.LINEAR)
        self.texture_mag_mode = int(VXTEXTURE_FILTER.LINEAR)
        self.texture_address_mode = int(VXTEXTURE_ADDRESS.WRAP)
        self.texture_border_color = np.zeros(4, np.float32)
        self._flags = _FLAG_ZWRITE | _FLAG_PERSPECTIVE
        self.effect = 0
        self.callback = None

    # -- colors -----------------------------------------------------------
    def SetDiffuse(self, rgba):
        self.diffuse = np.asarray(rgba, np.float32)
        self.context._bump_dynamic()

    def GetDiffuse(self):
        return self.diffuse.copy()

    def SetAmbient(self, rgba):
        self.ambient = np.asarray(rgba, np.float32)
        self.context._bump_dynamic()

    def GetAmbient(self):
        return self.ambient.copy()

    def SetSpecular(self, rgba):
        self.specular = np.asarray(rgba, np.float32)
        self.context._bump_dynamic()

    def GetSpecular(self):
        return self.specular.copy()

    def SetEmissive(self, rgba):
        self.emissive = np.asarray(rgba, np.float32)
        self.context._bump_dynamic()

    def GetEmissive(self):
        return self.emissive.copy()

    def SetPower(self, p: float):
        self.power = float(p)
        self.context._bump_dynamic()

    def GetPower(self) -> float:
        return self.power

    # -- flags ------------------------------------------------------------
    def _set_flag(self, bit: int, on: bool):
        if on:
            self._flags |= bit
        else:
            self._flags &= ~bit
        self.context._bump_topology()  # blend on/off changes pass assignment

    def EnableAlphaBlend(self, on: bool = True):
        self._set_flag(_FLAG_ALPHABLEND, on)

    def AlphaBlendEnabled(self) -> bool:
        return bool(self._flags & _FLAG_ALPHABLEND)

    def EnableAlphaTest(self, on: bool = True):
        self._set_flag(_FLAG_ALPHATEST, on)

    def AlphaTestEnabled(self) -> bool:
        return bool(self._flags & _FLAG_ALPHATEST)

    def EnableZWrite(self, on: bool = True):
        self._set_flag(_FLAG_ZWRITE, on)

    def ZWriteEnabled(self) -> bool:
        return bool(self._flags & _FLAG_ZWRITE)

    def EnablePerspectiveCorrection(self, on: bool = True):
        self._set_flag(_FLAG_PERSPECTIVE, on)

    def PerspectiveCorrectionEnabled(self) -> bool:
        return bool(self._flags & _FLAG_PERSPECTIVE)

    def SetTwoSided(self, on: bool = True):
        self._set_flag(_FLAG_TWOSIDED, on)

    def IsTwoSided(self) -> bool:
        return bool(self._flags & _FLAG_TWOSIDED)

    # -- blend / compare --------------------------------------------------
    def SetSourceBlend(self, mode: int):
        self.src_blend = int(mode)
        self.context._bump_dynamic()

    def GetSourceBlend(self) -> int:
        return self.src_blend

    def SetDestBlend(self, mode: int):
        self.dst_blend = int(mode)
        self.context._bump_dynamic()

    def GetDestBlend(self) -> int:
        return self.dst_blend

    def SetZFunc(self, func: int):
        self.z_func = int(func)
        # Changes deferred-vs-ordered classification -> recompile scene.
        self.context._bump_topology()

    def GetZFunc(self) -> int:
        return self.z_func

    def SetAlphaFunc(self, func: int):
        self.alpha_func = int(func)
        self.context._bump_dynamic()

    def GetAlphaFunc(self) -> int:
        return self.alpha_func

    def SetAlphaRef(self, ref: int):
        self.alpha_ref = int(ref)
        self.context._bump_dynamic()

    def GetAlphaRef(self) -> int:
        return self.alpha_ref

    def SetShadeMode(self, mode: int):
        self.shade_mode = int(mode)
        self.context._bump_dynamic()

    def GetShadeMode(self) -> int:
        return self.shade_mode

    def SetFillMode(self, mode: int):
        self.fill_mode = int(mode)
        self.context._bump_dynamic()

    def GetFillMode(self) -> int:
        return self.fill_mode

    # -- textures ---------------------------------------------------------
    def SetTexture(self, texture, slot: int = 0):
        self.textures[slot] = texture
        self.context._bump_topology()

    def SetTexture0(self, texture):
        self.SetTexture(texture, 0)

    def GetTexture(self, slot: int = 0):
        return self.textures[slot]

    def SetTextureBlendMode(self, mode: int):
        self.texture_blend_mode = int(mode)
        self.context._bump_dynamic()

    def GetTextureBlendMode(self) -> int:
        return self.texture_blend_mode

    def SetTextureAddressMode(self, mode: int):
        self.texture_address_mode = int(mode)
        self.context._bump_dynamic()

    def GetTextureAddressMode(self) -> int:
        return self.texture_address_mode

    def SetTextureMinMode(self, mode: int):
        self.texture_min_mode = int(mode)
        self.context._bump_dynamic()

    def SetTextureMagMode(self, mode: int):
        self.texture_mag_mode = int(mode)
        self.context._bump_dynamic()

    def SetTextureBorderColor(self, rgba):
        self.texture_border_color = np.asarray(rgba, np.float32)
        self.context._bump_dynamic()

    def SetEffect(self, effect: int):
        self.effect = int(effect)
        self.context._bump_topology()

    def GetEffect(self) -> int:
        return self.effect

    def SetCallback(self, fct, arg=None):
        self.callback = (fct, arg) if fct else None

    # -- classification ---------------------------------------------------
    def IsAlphaTransparent(self) -> bool:
        """True transparency rule (reference src/CKMaterial.cpp:2066-2077,
        locked by tests/test_material.cpp): alpha-blend on AND dest blend not
        ZERO AND NOT a depth-writing alpha-test cutout."""
        if not self.AlphaBlendEnabled() or self.dst_blend == VXBLEND.ZERO:
            return False
        if self.AlphaTestEnabled() and self.ZWriteEnabled():
            return False
        return True

    # -- lowering (SetAsCurrent equivalent) -------------------------------
    def raster_state(self, texture_slot: int = -1, lit: bool = True,
                     fog: bool = False) -> RasterState:
        """Lower to the per-draw state bucket (the data that in the reference
        flows through SetAsCurrent's SetRenderState calls)."""
        mag = self.texture_mag_mode
        return RasterState(
            src_blend=self.src_blend if self.AlphaBlendEnabled() else int(VXBLEND.ONE),
            dst_blend=self.dst_blend if self.AlphaBlendEnabled() else int(VXBLEND.ZERO),
            z_func=self.z_func,
            z_write=self.ZWriteEnabled(),
            alpha_blend=self.AlphaBlendEnabled(),
            alpha_test=self.AlphaTestEnabled(),
            alpha_func=self.alpha_func,
            alpha_ref=self.alpha_ref / 255.0,
            tex=texture_slot,
            tex_address=self.texture_address_mode,
            tex_filter=mag,
            tex_blend=self.texture_blend_mode,
            fog=fog,
            perspective=self.PerspectiveCorrectionEnabled(),
            cull=int(VXCULL.NONE) if self.IsTwoSided() else int(VXCULL.CCW),
            border_color=tuple(float(c) for c in self.texture_border_color),
            texgen=self._effect_texgen(),
        )

    def _effect_texgen(self) -> int:
        """Map the material effect to a vertex TexGen mode (reference
        TexGenEffect, src/CKMaterial.cpp:1456+). VX_EFFECT: 1=TexGen
        (planar), 2=TexGenRef (reflection), chrome via effect 3+."""
        from ..raster.types import (
            TEXGEN_CHROME, TEXGEN_CUBE, TEXGEN_NONE, TEXGEN_PLANAR,
            TEXGEN_REFLECT,
        )

        eff = self.GetEffect()
        return {1: TEXGEN_PLANAR, 2: TEXGEN_REFLECT, 3: TEXGEN_CHROME,
                4: TEXGEN_CUBE}.get(eff, TEXGEN_NONE)

    def lighting_params(self):
        return dict(
            diffuse=self.diffuse, ambient=self.ambient, specular=self.specular,
            emissive=self.emissive,
            power=self.power if self.power > 0.05 else 0.0,
        )
