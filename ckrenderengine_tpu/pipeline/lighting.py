"""DX9 fixed-function Gouraud vertex lighting, batched over all scene vertices.

Replaces the per-draw SetLight/SetMaterial + GPU fixed-function T&L path of the
reference (RCKLight::Setup, /root/reference/src/CKLight.cpp:592-656;
RCKMaterial::SetAsCurrent, /root/reference/src/CKMaterial.cpp:1269-1438;
device-side D3D9 fixed-function lighting). Lights are a padded SoA array, the
material lighting parameters are per-vertex gathered rows, and one vmapped
evaluation lights every vertex of every entity in the frame at once.

Semantics implemented (D3D9 fixed-function, world-space formulation):

- ``out.rgb = emissive + Ma*(global_ambient + sum La*att*spot)
             + Md * sum Ld * max(N.L, 0) * att * spot``  (saturated)
- ``out.a   = Md.a``
- separate specular ``spec.rgb = Ms * sum Ls * max(N.H, 0)^power * att * spot``
  added AFTER texture blending (D3D SPECULARENABLE path), zeroed when the
  material's specular power <= 0.05 (the reference's strict threshold,
  src/CKMaterial.cpp "SpecularPower > 0.05f").
- attenuation ``1 / (a0 + a1*d + a2*d^2)`` with hard range cutoff; directional
  lights have att = 1 (src/CKLight.cpp attenuation-sum visibility check).
- spot factor: rho = dot(dir, to_vertex); 1 inside the inner cone
  (cos(theta/2)), 0 outside the outer cone (cos(phi/2)), smooth
  ``((rho - cos_phi) / (cos_theta - cos_phi)) ^ falloff`` between.
- light power scaling: diffuse is pre-scaled by power; lights with the
  "specular" flag contribute specular = diffuse * power, else black
  (src/CKLight.cpp:620-640). This scaling is applied by the host light object
  when it fills the SoA row; this kernel just consumes the arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..raster.types import VXLIGHT


class LightArray(NamedTuple):
    """Padded SoA light bank (L rows). All colors are pre-power-scaled."""

    type: jnp.ndarray       # (L,) int32 VXLIGHT
    diffuse: jnp.ndarray    # (L,4) f32
    specular: jnp.ndarray   # (L,4) f32
    ambient: jnp.ndarray    # (L,4) f32
    position: jnp.ndarray   # (L,3) f32 world
    direction: jnp.ndarray  # (L,3) f32 world (normalized)
    range: jnp.ndarray      # (L,) f32
    falloff: jnp.ndarray    # (L,) f32
    attenuation: jnp.ndarray  # (L,3) f32 [a0, a1, a2]
    cos_theta: jnp.ndarray  # (L,) f32 cos(inner/2)
    cos_phi: jnp.ndarray    # (L,) f32 cos(outer/2)
    active: jnp.ndarray     # (L,) bool

    @staticmethod
    def zeros(n: int) -> "LightArray":
        return LightArray(
            type=jnp.ones(n, jnp.int32),
            diffuse=jnp.zeros((n, 4), jnp.float32),
            specular=jnp.zeros((n, 4), jnp.float32),
            ambient=jnp.zeros((n, 4), jnp.float32),
            position=jnp.zeros((n, 3), jnp.float32),
            direction=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1)),
            range=jnp.full(n, 1e8, jnp.float32),
            falloff=jnp.ones(n, jnp.float32),
            attenuation=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1)),
            cos_theta=jnp.ones(n, jnp.float32),
            cos_phi=jnp.zeros(n, jnp.float32),
            active=jnp.zeros(n, bool),
        )


class MaterialLighting(NamedTuple):
    """Per-vertex (already gathered) material lighting rows."""

    diffuse: jnp.ndarray    # (...,4)
    ambient: jnp.ndarray    # (...,4)
    specular: jnp.ndarray   # (...,4)
    emissive: jnp.ndarray   # (...,4)
    power: jnp.ndarray      # (...,)


def compute_vertex_lighting(
    pos: jnp.ndarray,        # (V,3) world-space positions
    normal: jnp.ndarray,     # (V,3) world-space unit normals
    mat: MaterialLighting,   # fields shaped (V,...) — gathered per vertex
    lights: LightArray,
    global_ambient: jnp.ndarray,  # (4,) f32
    cam_pos: jnp.ndarray,    # (3,) f32 world-space eye for specular H
):
    """Returns (diffuse_rgba (V,4), specular_rgb (V,3)), both saturated."""
    eps = jnp.float32(1e-12)
    # (V, L, 3) vertex -> light geometry, broadcast over the light bank.
    to_light = lights.position[None, :, :] - pos[:, None, :]      # point/spot
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_light * to_light, -1), eps))  # (V,L)
    l_point = to_light / dist[..., None]
    is_dir = (lights.type == VXLIGHT.DIREC)[None, :]
    ldir_n = lights.direction / jnp.maximum(
        jnp.linalg.norm(lights.direction, axis=-1, keepdims=True), eps)
    l_vec = jnp.where(is_dir[..., None], -ldir_n[None, :, :], l_point)    # (V,L,3)

    # Attenuation with range cutoff (1 for directional).
    a0 = lights.attenuation[:, 0][None]
    a1 = lights.attenuation[:, 1][None]
    a2 = lights.attenuation[:, 2][None]
    att = 1.0 / jnp.maximum(a0 + a1 * dist + a2 * dist * dist, eps)
    att = jnp.where(dist <= lights.range[None, :], att, 0.0)
    att = jnp.where(is_dir, 1.0, att)

    # Spot factor.
    rho = jnp.sum(ldir_n[None, :, :] * (-l_vec), -1)                      # (V,L)
    denom = jnp.maximum(lights.cos_theta - lights.cos_phi, eps)[None]
    t = jnp.clip((rho - lights.cos_phi[None]) / denom, 0.0, 1.0)
    smooth = jnp.power(jnp.maximum(t, eps), lights.falloff[None])
    spot = jnp.where(rho >= lights.cos_theta[None], 1.0,
                     jnp.where(rho <= lights.cos_phi[None], 0.0, smooth))
    spot = jnp.where((lights.type == VXLIGHT.SPOT)[None], spot, 1.0)

    gate = (att * spot * lights.active[None].astype(jnp.float32))         # (V,L)

    ndotl = jnp.maximum(jnp.sum(normal[:, None, :] * l_vec, -1), 0.0)     # (V,L)
    diff_sum = jnp.sum((gate * ndotl)[..., None] * lights.diffuse[None, :, :3], axis=1)
    amb_sum = jnp.sum(gate[..., None] * lights.ambient[None, :, :3], axis=1)

    # Specular: local-viewer halfway vector.
    view = cam_pos[None, :] - pos
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), eps)
    h = l_vec + view[:, None, :]
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), eps)
    ndoth = jnp.maximum(jnp.sum(normal[:, None, :] * h, -1), 0.0)
    power = jnp.maximum(mat.power, eps)
    spec_gate = jnp.where(ndotl > 0.0, jnp.power(jnp.maximum(ndoth, eps), power[:, None]), 0.0)
    spec_sum = jnp.sum((gate * spec_gate)[..., None] * lights.specular[None, :, :3], axis=1)

    rgb = (
        mat.emissive[..., :3]
        + mat.ambient[..., :3] * (global_ambient[None, :3] + amb_sum)
        + mat.diffuse[..., :3] * diff_sum
    )
    diffuse_rgba = jnp.concatenate(
        [jnp.clip(rgb, 0.0, 1.0), jnp.clip(mat.diffuse[..., 3:4], 0.0, 1.0)], axis=-1)
    # SPECULARENABLE only when power > 0.05 (reference threshold).
    spec_on = (mat.power > 0.05).astype(jnp.float32)[..., None]
    specular_rgb = jnp.clip(mat.specular[..., :3] * spec_sum, 0.0, 1.0) * spec_on
    return diffuse_rgba, specular_rgb


def fog_factor(cam_z: jnp.ndarray, mode: jnp.ndarray, start: jnp.ndarray,
               end: jnp.ndarray, density: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex D3D fog factor (1 = unfogged) from camera-space depth.

    Matches the vertex-fog modes driven by CKRenderedScene::SetDefaultRenderStates
    (/root/reference/src/CKRenderedScene.cpp:383-482): NONE/EXP/EXP2/LINEAR.
    """
    d = jnp.maximum(cam_z, 0.0)
    lin = jnp.clip((end - d) / jnp.maximum(end - start, 1e-12), 0.0, 1.0)
    e1 = jnp.exp(-d * density)
    e2 = jnp.exp(-((d * density) ** 2))
    return jnp.select([mode == 1, mode == 2, mode == 3], [e1, e2, lin],
                      default=jnp.ones_like(d))


def light_row_from_params(
    type: int, diffuse, specular_flag: bool, ambient, position, direction,
    range: float, falloff: float, att0: float, att1: float, att2: float,
    inner_angle: float, outer_angle: float, power: float = 1.0,
    active: bool = True,
):
    """Host helper: build one light row with the reference's Setup semantics
    (power scaling + specular-flag handling, src/CKLight.cpp:620-655)."""
    diffuse = np.asarray(diffuse, np.float32)
    scaled = diffuse.copy()
    if power != 1.0:
        scaled = scaled * np.float32(power)
    if specular_flag:
        spec = np.array([diffuse[0] * power, diffuse[1] * power, diffuse[2] * power, 1.0], np.float32)
    else:
        spec = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    # Non-directional lights with ~zero attenuation sum are dropped.
    if type != int(VXLIGHT.DIREC) and (att0 + att1 + att2) < 1e-5:
        active = False
    return dict(
        type=np.int32(type),
        diffuse=scaled,
        specular=spec,
        ambient=np.asarray(ambient, np.float32),
        position=np.asarray(position, np.float32),
        direction=np.asarray(direction, np.float32),
        range=np.float32(range),
        falloff=np.float32(falloff),
        attenuation=np.asarray([att0, att1, att2], np.float32),
        cos_theta=np.float32(np.cos(inner_angle * 0.5)),
        cos_phi=np.float32(np.cos(outer_angle * 0.5)),
        active=bool(active),
    )
