"""The one-frame device program: animate-ready scene state -> framebuffer.

This is the TPU-native inversion of the reference's per-object draw loop
(CKRenderedScene::Draw -> CKSceneGraph traversal -> RCKMesh::Render ->
rasterizer DrawPrimitive, /root/reference/src/CKRenderedScene.cpp:152-355):
instead of walking a pointer tree and issuing thousands of stateful draw
calls, the whole scene is flat device arrays and ONE jitted program does

    compose transforms -> gather instanced vertices -> light -> project
    -> cull -> order (opaque in priority order, transparent back-to-front)
    -> rasterize

The opaque/transparent two-pass order and back-to-front transparent sort
mirror CKSceneGraphRootNode::SortTransparentObjects
(/root/reference/src/CKSceneGraph.cpp:618-752), realized as a device-side
permutation of the triangle stream instead of an O(n^2) host bubble sort.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import vxmath as vx
from ..raster import jax_backend as rb
from ..raster.types import NUM_SF, NUM_SI, SI_ALPHABLEND, SI_ZWRITE
from ..scene.entity_table import compose_world
from .lighting import LightArray, MaterialLighting, compute_vertex_lighting, fog_factor


class SceneDevice(NamedTuple):
    """Dynamic per-frame scene state (a pytree of device arrays).

    Shapes are static per scene topology; only values change frame-to-frame,
    so the jitted frame program almost never recompiles (SURVEY §7 "recompile
    only on capacity growth").
    """

    # Entity state
    local: jnp.ndarray        # (N,4,4) local transforms
    parent: jnp.ndarray       # (N,) int32
    entity_visible: jnp.ndarray  # (N,) bool

    # Mesh vertex pool (shared, unique geometry)
    positions: jnp.ndarray    # (V,3)
    normals: jnp.ndarray      # (V,3)
    uv: jnp.ndarray           # (V,2)
    prelit: jnp.ndarray       # (V,4) prelit diffuse
    prelit_spec: jnp.ndarray  # (V,3) prelit specular

    # Instanced vertex stream (entity x material-group duplication)
    src_idx: jnp.ndarray      # (IV,) int32 into pool
    vert_entity: jnp.ndarray  # (IV,) int32
    vert_state: jnp.ndarray   # (IV,) int32 state/material bucket
    vert_lit: jnp.ndarray     # (IV,) bool lit (vs prelit)

    # Triangle stream
    tri_idx: jnp.ndarray      # (IT,3) int32 into instanced stream
    tri_state: jnp.ndarray    # (IT,) int32
    tri_valid: jnp.ndarray    # (IT,) bool

    # Material / render-state bank (S rows)
    state_i: jnp.ndarray      # (S, NUM_SI) int32
    state_f: jnp.ndarray      # (S, NUM_SF) f32
    mat_diffuse: jnp.ndarray  # (S,4)
    mat_ambient: jnp.ndarray  # (S,4)
    mat_specular: jnp.ndarray # (S,4)
    mat_emissive: jnp.ndarray # (S,4)
    mat_power: jnp.ndarray    # (S,)

    # Lights + global lighting state
    lights: LightArray
    global_ambient: jnp.ndarray  # (4,)

    # Camera
    view: jnp.ndarray         # (4,4)
    proj: jnp.ndarray         # (4,4)
    cam_pos: jnp.ndarray      # (3,) world-space eye
    viewport: jnp.ndarray     # (4,) f32 [x,y,w,h]

    # Fog
    fog_mode: jnp.ndarray     # () int32 VXFOG
    fog_start: jnp.ndarray    # ()
    fog_end: jnp.ndarray      # ()
    fog_density: jnp.ndarray  # ()
    fog_color: jnp.ndarray    # (3,)

    # Textures
    tex_planes: jnp.ndarray   # (NT,4,TH,TW)
    tex_hw: jnp.ndarray       # (NT,2) int32

    # Clear
    clear_color: jnp.ndarray  # (4,)
    clear_z: jnp.ndarray      # ()


def transform_and_light(scene: SceneDevice, levels: tuple):
    """Vertex stage: world compose -> gather -> transform -> light -> project.

    Returns (clip (IV,4), color (IV,4), spec (IV,3), fog (IV,), world (N,4,4)).
    """
    world = compose_world(scene.local, scene.parent, levels)
    wm = jnp.take(world, scene.vert_entity, axis=0)              # (IV,4,4)
    pos = jnp.take(scene.positions, scene.src_idx, axis=0)       # (IV,3)
    nrm = jnp.take(scene.normals, scene.src_idx, axis=0)

    posw = vx.transform_points(pos, wm)
    nrmw = vx.transform_vectors(nrm, wm)
    nrmw = nrmw / jnp.maximum(jnp.linalg.norm(nrmw, axis=-1, keepdims=True), 1e-12)

    viewproj = jnp.matmul(scene.view, scene.proj)
    posw4 = jnp.concatenate([posw, jnp.ones(posw.shape[:-1] + (1,), posw.dtype)], -1)
    clip = vx.transform_h4(posw4, viewproj)
    cam_z = vx.transform_h4(posw4, scene.view)[..., 2]

    mat = MaterialLighting(
        diffuse=jnp.take(scene.mat_diffuse, scene.vert_state, axis=0),
        ambient=jnp.take(scene.mat_ambient, scene.vert_state, axis=0),
        specular=jnp.take(scene.mat_specular, scene.vert_state, axis=0),
        emissive=jnp.take(scene.mat_emissive, scene.vert_state, axis=0),
        power=jnp.take(scene.mat_power, scene.vert_state, axis=0),
    )
    lit_diffuse, lit_spec = compute_vertex_lighting(
        posw, nrmw, mat, scene.lights, scene.global_ambient, scene.cam_pos)

    lit = scene.vert_lit[:, None]
    color = jnp.where(lit, lit_diffuse, jnp.take(scene.prelit, scene.src_idx, axis=0))
    spec = jnp.where(lit, lit_spec, jnp.take(scene.prelit_spec, scene.src_idx, axis=0))
    fog = fog_factor(cam_z, scene.fog_mode, scene.fog_start, scene.fog_end,
                     scene.fog_density)
    return clip, color, spec, fog, world


def assemble_triangles(scene: SceneDevice, clip, color, spec, fog):
    """Triangle stage: gather per-corner attrs, cull, order. Returns DeviceBatch."""
    i0, i1, i2 = scene.tri_idx[:, 0], scene.tri_idx[:, 1], scene.tri_idx[:, 2]

    flags = vx.clip_flags(clip)
    # Whole-triangle rejection: all three corners outside one plane
    # (the AND-reduction of CKRasterizerContext::TransformVertices,
    # CKRasterizerLib/CKRasterizerContext.cpp:339-392, applied per-triangle).
    reject = (flags[i0] & flags[i1] & flags[i2]) != 0
    # Entity-level visibility gate.
    ent_vis = jnp.take(scene.entity_visible, jnp.take(scene.vert_entity, i0), axis=0)
    valid = scene.tri_valid & jnp.logical_not(reject) & ent_vis

    # Screen-homogeneous coords (raster/types.py convention).
    vxp, vyp, vw_, vh_ = (scene.viewport[0], scene.viewport[1],
                          scene.viewport[2], scene.viewport[3])
    half_w = vw_ * 0.5
    half_h = vh_ * 0.5
    cx = vxp + half_w
    cy = vyp + half_h
    x, y, z, w = clip[:, 0], clip[:, 1], clip[:, 2], clip[:, 3]
    sx = cx * w + x * half_w
    sy = cy * w - y * half_h
    xyw_v = jnp.stack([sx, sy, w], axis=-1)                      # (IV,3)

    def g3(a):
        return jnp.stack([a[i0], a[i1], a[i2]], axis=1)

    xyw = g3(xyw_v)                                              # (IT,3,3)
    zt = g3(z)                                                   # (IT,3)
    colort = g3(color)
    spect = g3(spec)
    uvt = g3(jnp.take(scene.uv, scene.src_idx, axis=0))
    fogt = g3(fog)

    # --- ordering: opaque (stream order = priority order) then transparent
    # back-to-front by mean projected depth -----------------------------------
    it = scene.tri_idx.shape[0]
    transparent = jnp.take(scene.state_i[:, SI_ALPHABLEND], scene.tri_state) != 0
    safe_w = jnp.where(jnp.abs(g3(w)) < 1e-12, 1e-12, g3(w))
    zw = zt / safe_w                                             # (IT,3) depth
    depth_mean = jnp.mean(zw, axis=1)

    arange = jnp.arange(it, dtype=jnp.int32)
    big = jnp.float32(3.0e38)
    o_key = jnp.where(valid & ~transparent, arange.astype(jnp.float32), big)
    o_perm = jnp.argsort(o_key, stable=True).astype(jnp.int32)
    t_key = jnp.where(valid & transparent, -depth_mean, big)     # far first
    t_perm = jnp.argsort(t_key, stable=True).astype(jnp.int32)
    n_opaque = jnp.sum((valid & ~transparent).astype(jnp.int32))
    slot = arange
    t_slot = jnp.clip(slot - n_opaque, 0, it - 1)
    perm = jnp.where(slot < n_opaque, o_perm[slot], t_perm[t_slot])
    # Slots past (n_opaque + n_transparent) pick up invalid triangles from
    # t_perm's tail; their valid=False masks them in the raster stage.

    def take(a):
        return jnp.take(a, perm, axis=0)

    return rb.DeviceBatch(
        xyw=take(xyw), z=take(zt), color=take(colort), specular=take(spect),
        uv=take(uvt), fog=take(fogt), state_idx=take(scene.tri_state),
        valid=take(valid),
    )


def render_frame_impl(scene: SceneDevice, levels: tuple, height: int, width: int,
                      chunk: int = 1):
    """Full frame: clear -> vertex stage -> assemble -> rasterize.

    Equivalent of RCKRenderContext::Render's device work
    (/root/reference/src/CKRenderContext.cpp:767-930) as a single XLA program.
    Unjitted implementation — vmap/pjit-composable (the many-context batch
    axis of parallel/context_batch.py maps over this).
    Returns (fb (4,H,W) f32, zb (H,W) f32).
    """
    fb = jnp.broadcast_to(scene.clear_color[:, None, None].astype(jnp.float32),
                          (4, height, width))
    zb = jnp.full((height, width), scene.clear_z, jnp.float32)

    clip, color, spec, fog, _world = transform_and_light(scene, levels)
    batch = assemble_triangles(scene, clip, color, spec, fog)

    fb, zb = rb.render_pass(
        fb, zb, batch, scene.state_i, scene.state_f,
        scene.tex_planes, scene.tex_hw, scene.fog_color, scene.viewport,
        chunk=chunk,
    )
    return fb, zb


render_frame = functools.partial(
    jax.jit, static_argnames=("levels", "height", "width", "chunk")
)(render_frame_impl)


def frame_stats(scene: SceneDevice, batch_valid: jnp.ndarray | None = None):
    """Device-side VxStats counters (reference include/CKRasterizerTypes.h:63-69)."""
    return {
        "NbTrianglesDrawn": jnp.sum(scene.tri_valid.astype(jnp.int32)),
        "NbVerticesProcessed": jnp.asarray(scene.src_idx.shape[0], jnp.int32),
    }
