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
from ..raster import deferred as df
from ..raster.deferred import take_small
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
    entity_clip: jnp.ndarray  # (N,4) per-entity scissor rect (Place clips)
    entity_priority: jnp.ndarray  # (N,) f32 render priority (transparent sort)

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

    # User clip planes (reference SetUserClipPlane, DX9 context
    # CKDX9RasterizerContext.cpp:3408): world-space plane equations;
    # a point p is kept when dot((p,1), plane) >= 0. None = none active.
    clip_planes: jnp.ndarray | None = None   # (P,4)

    # Fog projection mode 0/1/2 (reference g_FogProjectionMode,
    # src/CKRenderedScene.cpp:416-425). None = mode 0 (view-z fog).
    fog_proj: jnp.ndarray | None = None      # () int32

    # Quad-texel table for one-gather bilinear sampling (see
    # raster/deferred._sample_texture_core / manager._bake_tex_quads).
    tex_quad: jnp.ndarray | None = None      # (NT*TH*TAW, 16)


def transform_and_light(scene: SceneDevice, levels: tuple, world=None,
                        vertex_shader=None, want_bump: bool = False,
                        want_cube: bool = False,
                        corner: tuple = (0, 0, 0),
                        want_texgen: bool = True,
                        want_prelit: bool = True):
    """Vertex stage: world compose -> gather -> transform -> light -> project.

    Returns (clip (IV,4), color (IV,4), spec (IV,3), fog (IV,), world (N,4,4)).
    ``world``: optional precomputed world matrices (skin/anim stage already
    composed them).
    ``vertex_shader``: optional user callable — the TPU-native analogue of
    the reference's vertex shaders (CreateVertexShader,
    CKDX9RasterizerContext.cpp:1445-1553): a traced JAX function
    ``fn(posw, nrmw, scene) -> (posw', nrmw')`` over world-space vertex
    arrays, fused into the frame program (it becomes part of the jit cache
    key, so swapping shaders recompiles — like swapping shader objects).
    """
    if world is None:
        world = compose_world(scene.local, scene.parent, levels)
    # Row N = identity: world-space vertex sources (billboards) bind here.
    world_ext = jnp.concatenate(
        [world, jnp.eye(4, dtype=world.dtype)[None]], axis=0)
    wm = take_small(world_ext, scene.vert_entity)                # (IV,4,4)

    # Corner-major fast path: the first ``nc`` stream rows alias the dense
    # corner-expanded pool block at [p0, p0+nc) — a static slice, not a
    # gather (manager compile post-pass); only the tail (skinned /
    # billboard / line rows) still gathers through src_idx.
    nc, _itc, p0 = corner

    def take_pool(a):
        if not nc:
            return jnp.take(a, scene.src_idx, axis=0)
        tail = jnp.take(a, scene.src_idx[nc:], axis=0)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(a, p0, p0 + nc, axis=0), tail], axis=0)

    # ONE fused (V,8) pool gather for positions+normals+uv: tail-row gather
    # cost is flat per ROW (~7-8 ns regardless of width under 16 words), so
    # three narrow gathers over a skinned/billboard tail cost 3x one wide
    # gather — config 4's 368k-row skinned tail paid that every frame. The
    # (V,8) concat itself is a dense pool-sized write (~free).
    pool_cat = jnp.concatenate(
        [scene.positions, scene.normals, scene.uv], axis=1)      # (V,8)
    cat = take_pool(pool_cat)                                    # (IV,8)
    pos = cat[:, 0:3]                                            # (IV,3)
    nrm = cat[:, 3:6]
    uv_pool = cat[:, 6:8]

    posw = vx.transform_points(pos, wm)
    nrmw = vx.transform_vectors(nrm, wm)
    if vertex_shader is not None:
        posw, nrmw = vertex_shader(posw, nrmw, scene)
    nrmw = nrmw / jnp.maximum(jnp.linalg.norm(nrmw, axis=-1, keepdims=True), 1e-12)

    viewproj = jnp.matmul(scene.view, scene.proj)
    posw4 = jnp.concatenate([posw, jnp.ones(posw.shape[:-1] + (1,), posw.dtype)], -1)
    clip = vx.transform_h4(posw4, viewproj)
    cam_z = vx.transform_h4(posw4, scene.view)[..., 2]

    mat_cat = jnp.concatenate(
        [scene.mat_diffuse, scene.mat_ambient, scene.mat_specular,
         scene.mat_emissive, scene.mat_power[:, None]], axis=1)   # (S, 17)
    mrow = take_small(mat_cat, scene.vert_state)
    mat = MaterialLighting(
        diffuse=mrow[:, 0:4], ambient=mrow[:, 4:8], specular=mrow[:, 8:12],
        emissive=mrow[:, 12:16], power=mrow[:, 16],
    )
    lit_diffuse, lit_spec = compute_vertex_lighting(
        posw, nrmw, mat, scene.lights, scene.global_ambient, scene.cam_pos)

    if want_prelit:
        lit = scene.vert_lit[:, None]
        color = jnp.where(lit, lit_diffuse, take_pool(scene.prelit))
        spec = jnp.where(lit, lit_spec, take_pool(scene.prelit_spec))
    else:
        # Statically gated (sampler_profile[7]): no mesh in the scene uses
        # prelit vertex colors, so the two pool gathers (which jnp.where
        # would evaluate for EVERY stream row) compile away.
        color, spec = lit_diffuse, lit_spec
    if scene.fog_proj is None:
        fog = fog_factor(cam_z, scene.fog_mode, scene.fog_start,
                         scene.fog_end, scene.fog_density)
    else:
        # Fog projection modes (reference CKRenderedScene.cpp:405-425):
        # mode 0 fogs view-space z against (fog_start, fog_end); modes 1/2
        # fog PROJECTED depth z/w against start/end pushed through the
        # projection matrix — mode 1 uses (projStart, projEnd), mode 2 the
        # reference's (1/startW, projStart) pair, reproduced exactly.
        p = scene.proj
        sz = p[2, 2] * scene.fog_start + p[3, 2]
        sw = p[2, 3] * scene.fog_start + p[3, 3]
        ez = p[2, 2] * scene.fog_end + p[3, 2]
        ew = p[2, 3] * scene.fog_end + p[3, 3]

        def sdiv(a, b):
            return a / jnp.where(jnp.abs(b) < 1e-30, 1e-30, b)

        proj_start = sdiv(sz, sw)
        proj_end = sdiv(ez, ew)
        recip_sw = sdiv(jnp.float32(1.0), sw)
        mode = jnp.asarray(scene.fog_proj, jnp.int32)
        fstart = jnp.select([mode == 1, mode == 2],
                            [proj_start, recip_sw], scene.fog_start)
        fend = jnp.select([mode == 1, mode == 2],
                          [proj_end, proj_start], scene.fog_end)
        zndc = sdiv(clip[..., 2], clip[..., 3])
        coord = jnp.where(mode > 0, zndc, cam_z)
        fog = fog_factor(coord, scene.fog_mode, fstart, fend,
                         scene.fog_density)

    # TexGen UV generation (material effects; reference TexGenEffect,
    # src/CKMaterial.cpp:1456+): planar from view-space position, sphere-env
    # from view-space reflection vector / normal.
    from ..raster.types import (
        SI_TEXGEN, TEXGEN_CHROME, TEXGEN_CUBE, TEXGEN_PLANAR, TEXGEN_REFLECT,
    )

    uv = uv_pool                                                 # (IV,2)
    rw = None
    if want_texgen or want_cube:
        # statically gated: scenes without TexGen materials skip the whole
        # view-space/reflection block (it is NOT free at 2M stream rows)
        texgen = take_small(scene.state_i[:, SI_TEXGEN], scene.vert_state)
        pos_v = vx.transform_points(posw, scene.view)            # view space
        nrm_v = vx.transform_vectors(nrmw, scene.view)
        nrm_v = nrm_v / jnp.maximum(
            jnp.linalg.norm(nrm_v, axis=-1, keepdims=True), 1e-12)
        # reflection of the view ray about the normal
        d = pos_v / jnp.maximum(jnp.linalg.norm(pos_v, axis=-1, keepdims=True),
                                1e-12)
        r = d - 2.0 * jnp.sum(d * nrm_v, -1, keepdims=True) * nrm_v
        m = 2.0 * jnp.sqrt(jnp.maximum(
            r[..., 0] ** 2 + r[..., 1] ** 2 + (r[..., 2] + 1.0) ** 2, 1e-12))
        uv_reflect = jnp.stack([r[..., 0] / m + 0.5, -r[..., 1] / m + 0.5], -1)
        uv_chrome = jnp.stack([nrm_v[..., 0] * 0.5 + 0.5,
                               -nrm_v[..., 1] * 0.5 + 0.5], -1)
        uv_planar = pos_v[..., :2]
        # Cube-environment mapping via octahedral parameterization: the
        # WORLD-space reflection vector encodes to a single 2D map (the
        # cube's 6 faces are baked into an octahedral atlas by
        # CKTexture.SetCubeMapFaces) — per-pixel face selection without a
        # cube sampler.
        dw = posw - scene.cam_pos[None, :]
        dw = dw / jnp.maximum(jnp.linalg.norm(dw, axis=-1, keepdims=True),
                              1e-12)
        rw = dw - 2.0 * jnp.sum(dw * nrmw, -1, keepdims=True) * nrmw
        uv_cube = vx.oct_encode(rw)

        tg = texgen[:, None]
        uv = jnp.where(tg == TEXGEN_PLANAR, uv_planar, uv)
        uv = jnp.where(tg == TEXGEN_REFLECT, uv_reflect, uv)
        uv = jnp.where(tg == TEXGEN_CHROME, uv_chrome, uv)
        uv = jnp.where(tg == TEXGEN_CUBE, uv_cube, uv)
    if want_bump and scene.tex_planes.shape[0] > 0:
        # Per-vertex EMBM (VXEFFECT_BUMPENV, reference BumpMapEnvEffect,
        # src/CKMaterial.cpp:1668+): the bump texture's (r,g) channels
        # sampled at the mesh UV perturb the generated env-map UV, scaled by
        # the bump matrix. Vertex granularity here (the D3D stage op is
        # per-pixel); bump offsets are low-frequency, and this keeps the
        # dependent read out of the per-pixel shade. Statically gated —
        # scenes without BumpEnv materials never pay the gathers.
        from ..raster.deferred import sample_texture_pp
        from ..raster.types import (
            SF_BUMP_SCALE, SI_TEX2, VXTEXTURE_ADDRESS, VXTEXTURE_FILTER,
        )

        tex2 = jnp.take(scene.state_i[:, SI_TEX2], scene.vert_state, axis=0)
        bscale = jnp.take(scene.state_f[:, SF_BUMP_SCALE],
                          scene.vert_state, axis=0)
        base_uv = uv_pool
        texel = sample_texture_pp(
            scene.tex_planes, scene.tex_hw, jnp.maximum(tex2, 0),
            base_uv[..., 0], base_uv[..., 1],
            jnp.full(tex2.shape, int(VXTEXTURE_ADDRESS.WRAP), jnp.int32),
            jnp.full(tex2.shape, int(VXTEXTURE_FILTER.LINEAR), jnp.int32),
            [jnp.float32(0.0)] * 4)
        duv = jnp.stack([(texel[0] - 0.5) * bscale,
                         (texel[1] - 0.5) * bscale], -1)
        uv = jnp.where((tex2 >= 0)[:, None], uv + duv, uv)
    # User clip planes: per-vertex signed world-space distances. d is a
    # linear functional of world position (exactly like clip z), so it
    # interpolates with the same screen-space arithmetic as depth.
    clipd_v = None
    if scene.clip_planes is not None and scene.clip_planes.shape[0] > 0:
        clipd_v = posw4 @ scene.clip_planes.T                    # (IV,P)
    # Cube-env per-PIXEL path (statically gated): export the per-vertex
    # WORLD reflection vector; the shade stages interpolate IT and
    # oct-encode per pixel — reflection vectors interpolate continuously
    # across the octahedral fold, so the atlas seam disappears.
    refl_v = None
    if want_cube and rw is not None:
        refl_v = jnp.where((texgen == TEXGEN_CUBE)[:, None], rw,
                           jnp.zeros_like(rw))
    return clip, color, spec, fog, world, uv, clipd_v, refl_v


def compact_scene_chunks(scene: SceneDevice, chunk_idx, chunk_n,
                         corner: tuple, chunk: tuple):
    """Compact the corner-major head to the host-selected chunk list.

    The HOST culls CH-triangle chunks of the static corner block against
    the frustum each frame (the TPU mapping of the reference's
    hierarchical-bbox scene-graph culling, src/CKSceneGraph.cpp:849-888 +
    CK3dEntity::IsInViewFrustrumHierarchic :3297) and ships the surviving
    chunk indices; this function gathers those chunks into a smaller
    stream so every dense per-vertex/per-triangle stage downstream runs on
    the survivors only. Gathers move whole (CH, C) blocks along the chunk
    axis — contiguous-block bandwidth, not the ~8 ns/row element-gather
    cost that killed per-triangle compaction (docs/PERFORMANCE.md round
    3). Culled chunks are fully outside the frustum, so output is
    IDENTICAL (they would be clip-rejected anyway); pad slots beyond
    ``chunk_n`` mask their triangles invalid.

    ``chunk`` = (CH, cap, itc, n_full) static; ``chunk_idx`` (cap,) int32
    ascending survivor list; ``chunk_n`` () live count.
    Returns (scene', corner') with the remainder block (itc - n_full*CH
    triangles) and the gathered tail always kept."""
    CH, cap, itc, n_full = chunk
    nc = 3 * itc
    p0 = corner[2]
    safe = jnp.clip(chunk_idx, 0, n_full - 1)
    live = jnp.arange(cap, dtype=jnp.int32) < chunk_n
    rem = itc - n_full * CH
    itc2 = cap * CH + rem
    nc2 = 3 * itc2

    def chunk_take(a, base, stride):
        """Corner-major head (3 blocks of ``stride`` rows at ``base``) ->
        compacted (3*itc2, ...) head, corner-major order preserved."""
        parts = []
        for k in range(3):
            b0 = base + k * stride
            blk = jax.lax.slice_in_dim(a, b0, b0 + n_full * CH, axis=0)
            blk = blk.reshape((n_full, CH) + a.shape[1:])
            sel = jnp.take(blk, safe, axis=0)
            sel = sel.reshape((cap * CH,) + a.shape[1:])
            if rem:
                t = jax.lax.slice_in_dim(a, b0 + n_full * CH, b0 + stride,
                                         axis=0)
                sel = jnp.concatenate([sel, t], axis=0)
            parts.append(sel)
        return jnp.concatenate(parts, axis=0)

    def pool2(a):
        # new pool = [compacted corner head, whole old pool] — take_pool's
        # head slice reads [0, nc2); tail gathers shift by +nc2.
        return jnp.concatenate([chunk_take(a, p0, itc), a], axis=0)

    def stream2(a):
        head = chunk_take(a, 0, itc)
        tail = jax.lax.slice_in_dim(a, nc, a.shape[0], axis=0)
        return jnp.concatenate([head, tail], axis=0)

    def tri2(a):
        blk = jax.lax.slice_in_dim(a, 0, n_full * CH, axis=0)
        blk = blk.reshape((n_full, CH) + a.shape[1:])
        sel = jnp.take(blk, safe, axis=0).reshape((cap * CH,) + a.shape[1:])
        if rem:
            sel = jnp.concatenate(
                [sel, jax.lax.slice_in_dim(a, n_full * CH, itc, axis=0)],
                axis=0)
        tail = jax.lax.slice_in_dim(a, itc, a.shape[0], axis=0)
        return jnp.concatenate([sel, tail], axis=0)

    src_tail = jax.lax.slice_in_dim(scene.src_idx, nc,
                                    scene.src_idx.shape[0], axis=0) + nc2
    src_idx = jnp.concatenate(
        [jnp.arange(nc2, dtype=jnp.int32), src_tail], axis=0)
    tri_valid = tri2(scene.tri_valid)
    slot_live = jnp.repeat(live, CH)                  # (cap*CH,)
    head_valid = jax.lax.slice_in_dim(tri_valid, 0, cap * CH) & slot_live
    tri_valid = jnp.concatenate(
        [head_valid, jax.lax.slice_in_dim(tri_valid, cap * CH,
                                          tri_valid.shape[0])], axis=0)
    ar = jnp.arange(itc2, dtype=jnp.int32)
    tidx_head = jnp.stack([ar, itc2 + ar, 2 * itc2 + ar], axis=1)
    tidx_tail = jax.lax.slice_in_dim(scene.tri_idx, itc,
                                     scene.tri_idx.shape[0], axis=0) \
        + (nc2 - nc)
    scene2 = scene._replace(
        positions=pool2(scene.positions), normals=pool2(scene.normals),
        uv=pool2(scene.uv), prelit=pool2(scene.prelit),
        prelit_spec=pool2(scene.prelit_spec),
        src_idx=src_idx, vert_entity=stream2(scene.vert_entity),
        vert_state=stream2(scene.vert_state),
        vert_lit=stream2(scene.vert_lit),
        tri_idx=jnp.concatenate([tidx_head, tidx_tail], axis=0),
        tri_state=tri2(scene.tri_state), tri_valid=tri_valid)
    return scene2, (nc2, itc2, 0)


def assemble_triangles(scene: SceneDevice, clip, color, spec, fog, uv=None,
                       clipd_v=None, refl_v=None, corner: tuple = (0, 0, 0)):
    """Triangle stage: gather per-corner attrs + cull. Returns the FULL
    DeviceBatch in stream (priority) order — no permutation: the deferred
    opaque reduce is order-independent (later draw index wins exact-depth
    ties), and the ordered remainder is compacted separately by
    :func:`ordered_subset`.

    ``corner`` = (nc, itc, p0): the first ``itc`` triangles read the first
    ``nc = 3*itc`` stream rows in PLANAR order — rows [k*itc, (k+1)*itc)
    hold corner ``k`` of every head triangle (corner-major compile
    post-pass) — so each per-corner array is a contiguous 2D slice; only
    the tail (skinned / billboard triangles) pays the 3-row gathers.
    Rank-3 (IT,3,C) arrays are built ONLY as lazy stacks of the planar
    slices: on TPU their trailing (3,C) dims pad to native (8,128) tiles
    (16x the traffic), so every hot consumer reads ``batch.planar``."""
    nc, itc, _p0 = corner
    i0, i1, i2 = scene.tri_idx[:, 0], scene.tri_idx[:, 1], scene.tri_idx[:, 2]
    ti0 = i0[itc:]

    def corner_planar(a):
        """(IV, ...) per-stream-row array -> 3 x (IT, ...) per-corner."""
        if not itc:
            return (jnp.take(a, i0, axis=0), jnp.take(a, i1, axis=0),
                    jnp.take(a, i2, axis=0))
        outs = []
        for k, idx in enumerate((i0, i1, i2)):
            head = jax.lax.slice_in_dim(a, k * itc, (k + 1) * itc, axis=0)
            tail = jnp.take(a, idx[itc:], axis=0)
            outs.append(jnp.concatenate([head, tail], axis=0))
        return tuple(outs)

    def corner_take(a):
        """(IV, ...) per-stream-row array -> (IT, 3, ...) per-corner."""
        return jnp.stack(corner_planar(a), axis=1)

    def first_corner_take(a):
        """(IV, ...) -> (IT, ...) value at each triangle's corner 0."""
        if not itc:
            return jnp.take(a, i0, axis=0)
        head = jax.lax.slice_in_dim(a, 0, itc, axis=0)
        return jnp.concatenate([head, jnp.take(a, ti0, axis=0)], axis=0)

    flags = vx.clip_flags(clip)
    # Whole-triangle rejection: all three corners outside one plane
    # (the AND-reduction of CKRasterizerContext::TransformVertices,
    # CKRasterizerLib/CKRasterizerContext.cpp:339-392, applied per-triangle).
    fl0, fl1, fl2 = corner_planar(flags)
    reject = (fl0 & fl1 & fl2) != 0
    # Entity-level visibility gate (identity row N is always visible).
    vis_ext = jnp.concatenate(
        [scene.entity_visible, jnp.ones((1,), bool)], axis=0)
    tri_ent = first_corner_take(scene.vert_entity)
    ent_vis = take_small(vis_ext, tri_ent)
    valid = scene.tri_valid & jnp.logical_not(reject) & ent_vis
    # User clip planes: cull triangles entirely outside any plane here;
    # per-pixel tests for straddlers happen in the ordered pass.
    if clipd_v is not None:
        clipd_p = corner_planar(clipd_v)
        d0, d1, d2 = clipd_p
        valid &= jnp.logical_not(
            jnp.any((d0 < 0) & (d1 < 0) & (d2 < 0), axis=1))
        clipd = jnp.stack(clipd_p, axis=1)
    else:
        clipd_p = None
        clipd = jnp.zeros((scene.tri_idx.shape[0], 3, 0), jnp.float32)

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

    # Per-triangle scissor from the owning entity (Place viewport clips);
    # identity row N gets the open rect.
    open_rect = jnp.array([[-1e9, -1e9, 1e9, 1e9]], jnp.float32)
    clip_ext = jnp.concatenate([scene.entity_clip, open_rect], axis=0)
    tri_rect = take_small(clip_ext, tri_ent)

    if uv is None:
        uv = jnp.take(scene.uv, scene.src_idx, axis=0)
    # Pack every per-vertex attribute into ONE wide row and gather it once
    # per corner: 3 wide gathers instead of ~18 narrow ones (gather cost on
    # this TPU is per ROW, nearly independent of width — docs/PERFORMANCE.md).
    vparts = [jnp.stack([sx, sy, w], axis=-1), z[:, None], color, spec, uv,
              fog[:, None]]
    n_refl = 3 if refl_v is not None else 0
    if n_refl:
        vparts.append(refl_v)
    vrow = jnp.concatenate(vparts, axis=-1)                      # (IV, 14+R)
    cp = corner_planar(vrow)                                     # 3x(IT,14+R)

    def stack3(sl):
        return jnp.stack([c[:, sl] for c in cp], axis=1)

    return rb.DeviceBatch(
        xyw=stack3(slice(0, 3)), z=stack3(3),
        color=stack3(slice(4, 8)), specular=stack3(slice(8, 11)),
        uv=stack3(slice(11, 13)), fog=stack3(13),
        state_idx=scene.tri_state, valid=valid, clip_rect=tri_rect,
        clipd=clipd,
        refl=stack3(slice(14, 14 + n_refl)),
        planar={"c": cp, "clipd": clipd_p},
    )


def ordered_subset(batch: rb.DeviceBatch, defer_tri: jnp.ndarray,
                   transparent: jnp.ndarray, ordered_cap: int,
                   tri_priority=None) -> rb.DeviceBatch:
    """Compact the non-deferred triangles into a (static) ordered_cap-sized
    stream: cutouts/z-overrides first in stream (priority) order, then
    transparent back-to-front — higher scene-graph priority renders first,
    and within a priority band farther triangles render first — the device
    analogue of CKSceneGraphRootNode::SortTransparentObjects
    (/root/reference/src/CKSceneGraph.cpp:618-752: priority primary, then
    projected-Z extents; per-triangle depth subsumes the reference's
    per-object Z-overlap plane-classification tie-breakers).

    ``transparent``: (IT,) bool, true alpha-blend triangles (need depth sort).
    ``tri_priority``: optional (IT,) f32 entity render priority.
    """
    it = batch.valid.shape[0]
    ordered = batch.valid & jnp.logical_not(defer_tri)
    if batch.planar is not None:
        # Planar form: the mean over corners as 1D column math (the rank-3
        # fields are lazy stacks; touching them here would materialize the
        # full-size (IT,3,C) padded arrays just to feed a gather).
        zw = []
        for c in batch.planar["c"]:
            w_ = c[:, 2]
            zw.append(c[:, 3] / jnp.where(jnp.abs(w_) < 1e-12, 1e-12, w_))
        depth_mean = (zw[0] + zw[1] + zw[2]) / 3.0
    else:
        safe_w = jnp.where(jnp.abs(batch.xyw[..., 2]) < 1e-12, 1e-12,
                           batch.xyw[..., 2])
        depth_mean = jnp.mean(batch.z / safe_w, axis=1)

    arange = jnp.arange(it, dtype=jnp.int32)
    big = jnp.float32(3.0e38)
    o_key = jnp.where(ordered & ~transparent, arange.astype(jnp.float32), big)
    o_perm = jnp.argsort(o_key, stable=True).astype(jnp.int32)
    depth01 = jnp.clip(depth_mean, 0.0, 1.0)
    # Composite key: priority bands (integers, scaled past the [0,1] depth
    # term) primary, back-to-front depth secondary.
    sort_val = -depth01
    if tri_priority is not None:
        sort_val = -tri_priority * 4.0 - depth01
    t_key = jnp.where(ordered & transparent, sort_val, big)
    t_perm = jnp.argsort(t_key, stable=True).astype(jnp.int32)
    n_first = jnp.sum((ordered & ~transparent).astype(jnp.int32))
    slot = jnp.arange(ordered_cap, dtype=jnp.int32)
    t_slot = jnp.clip(slot - n_first, 0, it - 1)
    perm = jnp.where(slot < n_first, o_perm[jnp.clip(slot, 0, it - 1)], t_perm[t_slot])
    n_total = jnp.sum(ordered.astype(jnp.int32))
    sel_valid = (slot < n_total) & jnp.take(ordered, perm, axis=0)

    def take(a):
        return jnp.take(a, perm, axis=0)

    if batch.planar is not None:
        # Gather the ordered_cap-sized subset from the 2D planar wide rows
        # (3 row gathers), then stack the small rank-3 fields from those.
        cp = [take(c) for c in batch.planar["c"]]

        def stack3(sl):
            return jnp.stack([c[:, sl] for c in cp], axis=1)

        dp = batch.planar.get("clipd")
        n_refl = batch.refl.shape[-1]
        return rb.DeviceBatch(
            xyw=stack3(slice(0, 3)), z=stack3(3),
            color=stack3(slice(4, 8)), specular=stack3(slice(8, 11)),
            uv=stack3(slice(11, 13)), fog=stack3(13),
            state_idx=take(batch.state_idx), valid=sel_valid,
            clip_rect=take(batch.clip_rect),
            clipd=(jnp.stack([take(d) for d in dp], axis=1) if dp is not None
                   else take(batch.clipd)),
            refl=stack3(slice(14, 14 + n_refl)),
        )
    return rb.DeviceBatch(
        xyw=take(batch.xyw), z=take(batch.z), color=take(batch.color),
        specular=take(batch.specular), uv=take(batch.uv), fog=take(batch.fog),
        state_idx=take(batch.state_idx), valid=sel_valid,
        clip_rect=take(batch.clip_rect), clipd=take(batch.clipd),
        refl=take(batch.refl),
    )


def _composite_peeled(fb, obatch: rb.DeviceBatch, lids, les, scene,
                      sampler_profile, height: int, width: int):
    """Shade + blend the peeled ordered layers (draw order per pixel).

    ``lids``/``les``: ordered_peel_tiled_pallas outputs — per layer the
    covering draw's index and raw edge values. Each layer shades ONCE per
    pixel through the same quantized row machinery as the deferred shade
    (texture sampling included), then composites with the draw's blend mode
    (alpha-over / replace) after its alpha test — the semantics of the
    sequential XLA pass (jax_backend.render_pass), evaluated as K dense
    passes instead of one pass per triangle."""
    from ..raster.types import (
        SF_ALPHAREF, SI_ALPHABLEND, SI_ALPHAFUNC, SI_ALPHATEST,
    )

    t = obatch.valid.shape[0]
    refl = obatch.refl if obatch.refl.shape[-1] else None
    all_persp = (sampler_profile is not None and len(sampler_profile) > 3
                 and bool(sampler_profile[3]))
    if all_persp:
        inv_det_s = None
    else:
        v0, v1, v2 = obatch.xyw[:, 0], obatch.xyw[:, 1], obatch.xyw[:, 2]
        det = jnp.sum(v0 * jnp.cross(v1, v2), axis=-1)
        inv_det_s = 1.0 / jnp.maximum(jnp.abs(det), 1e-30)
    tbl = df.shade_row_table_quant(
        obatch.xyw, obatch.color, obatch.specular, obatch.uv, obatch.fog,
        obatch.state_idx, batch_refl=refl, inv_det_s=inv_det_s,
        want_ws=not all_persp)
    tblT = jax.lax.optimization_barrier(tbl.T)
    # Per-pixel alpha/blend state join (tiny bank, one-hot MXU).
    st4 = jnp.stack([
        (scene.state_i[:, SI_ALPHABLEND] != 0).astype(jnp.float32),
        scene.state_i[:, SI_ALPHAFUNC].astype(jnp.float32),
        scene.state_f[:, SF_ALPHAREF],
        (scene.state_i[:, SI_ALPHATEST] != 0).astype(jnp.float32),
    ], axis=1)                                             # (S, 4)
    k_layers = lids.shape[0]
    for s in range(k_layers):
        hit = lids[s] >= 0
        tid = jnp.clip(lids[s], 0, t - 1).reshape(-1)
        rows_q = jnp.take(tblT, tid, axis=1).reshape(
            tbl.shape[1], height, width)
        rows_q = jnp.where(hit[None], rows_q, jnp.int32(0))
        full = df.expand_rows_quant(rows_q, scene.state_i, scene.state_f,
                                    scene.tex_hw, want_ws=not all_persp,
                                    has_refl=refl is not None)
        src = df.shade_rows(full, hit, scene.tex_planes, scene.tex_hw,
                            scene.fog_color,
                            jnp.zeros((4, height, width), jnp.float32),
                            height, width, sampler_profile=sampler_profile,
                            tex_quad=scene.tex_quad,
                            eplanes=(les[s, 0], les[s, 1], les[s, 2]))
        stidx = rows_q[df.SH_Q_STIDX].reshape(-1)
        oh = (jnp.arange(st4.shape[0], dtype=jnp.int32)[:, None]
              == stidx[None, :])
        stp = jnp.matmul(st4.T, oh.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        stp = stp.reshape(4, height, width)
        blend_on = stp[0] != 0
        at_on = stp[3] != 0
        sa = src[3]
        at_ok = rb.compare_op(stp[1].astype(jnp.int32), sa, stp[2])
        keep = hit & (at_ok | ~at_on)
        # shade_rows zeroed colorwrite-off pixels via its own hit mask;
        # the peel kernel already drops colorwrite-off rows.
        a = jnp.where(keep, jnp.where(blend_on, 1.0 - sa, 0.0), 1.0)
        b = jnp.where(keep[None],
                      jnp.where(blend_on[None], src * sa[None], src), 0.0)
        fb = a[None] * fb + b
    return fb


def render_frame_impl(scene: SceneDevice, levels: tuple, height: int, width: int,
                      ordered_cap: int | None = None, chunk: int = 64,
                      world=None, background=None,
                      sort_transparent: bool = True,
                      want_stencil: bool = False,
                      vertex_shader=None,
                      pixel_shader=None,
                      allow_pallas: bool = True,
                      want_bump: bool = False,
                      want_cube: bool = False,
                      want_stats: bool = False,
                      sampler_profile=None,
                      prev_fb=None, prev_zb=None,
                      corner: tuple = (0, 0, 0),
                      want_texgen: bool = True,
                      row0=0.0,
                      solve_caps: tuple | None = None):
    """Full frame: clear -> vertex stage -> deferred opaque -> ordered rest.

    ``row0``: global row offset of the raster's first pixel row (band
    sharding, parallel/tile_shard.py). XLA paths only — the banded caller
    sets allow_pallas=False; the Pallas kernels always raster at row0=0.

    ``solve_caps``: optional static (pair_cap, slab_cap, g_cap) override of
    the tiled solve's capacity knobs — set by the render context's capacity
    governor from observed bin statistics (SolveLivePairs /
    SolveFallbackRows); None keeps the t_count heuristic.

    ``pixel_shader``: optional traced JAX fn replacing the fixed-function
    texture-blend stage per pixel, fused into both the deferred shade and
    the ordered pass (see raster/deferred.shade_deferred).

    ``want_stats``: append a device-side stats dict to the return tuple
    (currently ``TileBinPeak`` — the densest raster tile's triangle count,
    reference VxStats-style observability; 0 on the non-tiled paths).

    ``prev_fb``/``prev_zb``: last frame's buffers, passed when
    CK_RENDER_CLEARBACKBUFFER / CK_RENDER_CLEARZBUFFER are OFF (reference
    RCKRenderContext::Clear honors the flags, src/CKRenderContext.cpp:
    438-544): rendering then accumulates over the previous frame.

    Equivalent of RCKRenderContext::Render's device work
    (/root/reference/src/CKRenderContext.cpp:767-930) as a single XLA program.
    Unjitted implementation — vmap/pjit-composable (the many-context batch
    axis of parallel/context_batch.py maps over this).

    ``ordered_cap``: static upper bound on triangles needing the ordered
    (sequential) path — transparent / alpha-test / z-override materials.
    None = all triangles ordered (conservative; slow). 0 = skip entirely.
    ``chunk``: triangle-chunk size of the deferred depth reduce.

    Returns (fb (4,H,W) f32, zb (H,W) f32).
    """
    if background is not None:
        clear_fb = background
    elif prev_fb is not None:
        clear_fb = prev_fb
    else:
        clear_fb = jnp.broadcast_to(
            scene.clear_color[:, None, None].astype(jnp.float32),
            (4, height, width))
    z_init = scene.clear_z if prev_zb is None else prev_zb

    peel_bad = jnp.zeros((), bool)
    peel_rounds = jnp.zeros((), jnp.int32)
    want_prelit = (sampler_profile is None or len(sampler_profile) < 8
                   or bool(sampler_profile[7]))
    clip, color, spec, fog, _world, uv, clipd_v, refl_v = transform_and_light(
        scene, levels, world, vertex_shader=vertex_shader,
        want_bump=want_bump, want_cube=want_cube, corner=corner,
        want_texgen=want_texgen, want_prelit=want_prelit)
    batch = assemble_triangles(scene, clip, color, spec, fog, uv, clipd_v,
                               refl_v, corner=corner)

    from ..raster.types import SI_STENCIL
    # One small-table row per triangle for all three bucket bits (the three
    # separate narrow takes cost ~8 ns/row each at 500k triangles).
    bucket_tbl = jnp.stack(
        [df.deferred_mask(scene.state_i).astype(jnp.float32),
         (scene.state_i[:, SI_ALPHABLEND] != 0).astype(jnp.float32),
         (scene.state_i[:, SI_STENCIL] != 0).astype(jnp.float32)], axis=1)
    tri_bits = take_small(bucket_tbl, batch.state_idx)           # (IT,3)
    defer_tri = (tri_bits[:, 0] > 0.5) & batch.valid
    # User clip planes do NOT reroute straddlers to the ordered pass: the
    # per-pixel half-space test rides the deferred reduce (triangle_setup's
    # dplane — a clip-plane'd 500k-tri scene stays at full raster rate).
    transparent = tri_bits[:, 1] > 0.5
    stencil_tri = (tri_bits[:, 2] > 0.5) & batch.valid

    # --- deferred opaque: depth argmin reduce + one shade per pixel --------
    setup = df.triangle_setup(batch.xyw, batch.z, batch.state_idx, batch.valid,
                              scene.state_i, clip_rect=batch.clip_rect,
                              clipd=batch.clipd, planar=batch.planar)
    # Visibility solve: flat reduce for small scenes, tile-binned for large
    # (static shape decision -> part of the jit cache key).
    tile_peak = jnp.int32(0)
    fetched_rows = None
    shade_eplanes = None
    t_count = batch.valid.shape[0]
    on_tpu = allow_pallas and jax.default_backend() == "tpu"
    big = t_count > 4096
    # The binned kernel beats the flat O(T*H*W) reduce well below the 4096
    # triangle cap once the framebuffer is large (config 2: 3k tris at
    # 640x480 measured ~20 ms flat vs ~3 ms binned).
    tiled_on_tpu = on_tpu and (big or t_count * height * width > (1 << 26))
    if tiled_on_tpu:
        # Pallas phase-B solve: per-tile contiguous row streaming with
        # the carry resident in VMEM (raster/pallas_tiled.py). Without a
        # pixel shader, the winner's shade row is fetched AFTER the solve
        # by a per-pixel gather of the compact 44-column table + a
        # per-pixel state re-join (expand_rows_compact). The in-kernel
        # fused one-hot fetch was measured 30 ms SLOWER at 1024x768
        # (65.8 vs 35.6 ms full path: the (n_tiles, 48, 1024) fetched
        # output + per-chunk scratch selects cost far more than the
        # 786k-row gather they replaced); keep the solve lean instead.
        from ..raster.pallas_tiled import depth_reduce_tiled_pallas

        refl = batch.refl if batch.refl.shape[-1] else None
        # Quantized fast fetch: the per-pixel row-gather engine has a width
        # cliff at 16 f32 lanes (118 vs 68 Mrows/s, micro.py probe_cliff),
        # so when no state needs mip LOD the gathered row squeezes to <=16
        # words — colors/spec/fog as u8x4 words (the reference's D3DCOLOR
        # vertex precision) and NO edge coefficients: the kernel exports
        # the winner's (e0, e1, e2) per pixel instead (want_eplanes).
        # Mip frames ride the quant path too when the framebuffer is even-
        # sized: LOD then comes from 2x2-quad finite differences (D3D9's
        # hardware derivative model) instead of the analytic gradients the
        # edge-coefficient path computes (deferred.shade_rows).
        quant = (pixel_shader is None and sampler_profile is not None
                 and (not sampler_profile[1]
                      or (height % 2 == 0 and width % 2 == 0)))
        # Static caps scale with the submitted triangle count: a 2M-tri
        # frame bins ~135k live pairs — past the cap the cut tail replays
        # through the exact-but-slow all-tiles fallback (measured
        # 1.2 s/frame). t_count is static, so bigger scenes simply compile
        # with bigger stream buffers.
        # Live pairs measure ~t/11..t/15 on SPARSE scenes (probe_bins: 46k
        # at 527k submitted, 136k at 2.1M) but a screen-filling character
        # bins ~0.6 pairs/tri (config 4: 73k pairs from 124k tris at some
        # poses — a hard 65536 cap put every animated frame in the
        # all-tiles fallback, 47 -> 14 fps). 96k gives dense mid-size
        # scenes margin for ~0.25 ms of extra stream build.
        if solve_caps is not None:
            caps_kw = dict(pair_cap=solve_caps[0], slab_cap=solve_caps[1],
                           g_cap=solve_caps[2])
        else:
            caps_kw = dict(
                pair_cap=98304 if t_count <= 600_000 else 262144,
                slab_cap=131072 if t_count <= (1 << 21) else 262144)
        caps_kw["want_binstats"] = want_stats
        if quant:
            import os as _os
            all_persp = len(sampler_profile) > 3 and bool(sampler_profile[3])
            shade_tbl = df.shade_row_table_quant(
                batch.xyw, batch.color, batch.specular, batch.uv, batch.fog,
                batch.state_idx, batch_refl=refl,
                inv_det_s=setup["inv_det_s"], planar=batch.planar,
                want_ws=not all_persp)
            if _os.environ.get("CK_FUSED_FETCH"):
                # Experimental: in-kernel one-hot fused winner-row fetch
                # (sh_pack=2) — re-probed per round since the phase-A
                # overhead scales with the (now chunk-culled) stream size.
                out = depth_reduce_tiled_pallas(
                    setup, defer_tri, z_init, scene.viewport, batch.xyw,
                    height, width, planar=batch.planar, want_eplanes=True,
                    shade_tbl=shade_tbl, sh_pack=2, **caps_kw)
                best_id, best_depth, tile_peak, epl, rows_q = out
            else:
                best_id, best_depth, tile_peak, epl = \
                    depth_reduce_tiled_pallas(
                        setup, defer_tri, z_init, scene.viewport, batch.xyw,
                        height, width, planar=batch.planar,
                        want_eplanes=True, **caps_kw)
                # Winner rows via the per-pixel gather of the channel-major
                # table. The Pallas in-kernel fused fetch (sh_pack=2) was
                # REMEASURED round 3 and stays off by default: in situ this
                # gather costs ~1 ms (XLA overlaps it), while carrying the
                # shade columns through the binned stream costs +6 ms of
                # phase-A work (benchmarks/fused_probe.py).
                tblT = jax.lax.optimization_barrier(shade_tbl.T)
                tid = jnp.clip(best_id, 0, t_count - 1).reshape(-1)
                rows_q = jnp.take(tblT, tid, axis=1).reshape(
                    shade_tbl.shape[1], height, width)
                rows_q = jnp.where((best_id >= 0)[None], rows_q,
                                   jnp.int32(0))
            fetched_rows = df.expand_rows_quant(
                rows_q, scene.state_i, scene.state_f, scene.tex_hw,
                want_ws=not all_persp, has_refl=refl is not None)
            shade_eplanes = (epl[0], epl[1], epl[2])
        else:
            best_id, best_depth, tile_peak = depth_reduce_tiled_pallas(
                setup, defer_tri, z_init, scene.viewport, batch.xyw,
                height, width, planar=batch.planar, **caps_kw)
        if pixel_shader is None and not quant:
            # Compact table: per-state columns re-join per PIXEL after the
            # row gather — 44 columns ship through the gather, the 22
            # state columns join from the tiny state bank via one MXU
            # one-hot matmul. (The in-kernel fused one-hot fetch measured
            # 30 ms SLOWER at 1024x768 than this gather.)
            shade_tbl = df.shade_row_table_compact(
                batch.xyw, batch.color, batch.specular, batch.uv, batch.fog,
                batch.state_idx, batch_refl=refl,
                e_coef=setup.get("e9", setup["e_coef"]),
                inv_det_s=setup["inv_det_s"], planar=batch.planar)
            tblT = jax.lax.optimization_barrier(shade_tbl.T)
            tid = jnp.clip(best_id, 0, t_count - 1).reshape(-1)
            rows_c = jnp.take(tblT, tid, axis=1).reshape(
                shade_tbl.shape[1], height, width)
            rows_c = jnp.where((best_id >= 0)[None], rows_c, 0.0)
            fetched_rows = df.expand_rows_compact(
                rows_c, scene.state_i, scene.state_f, scene.tex_hw)
    elif big:
        from ..raster.tiled import depth_reduce_tiled

        best_id, best_depth, tile_peak = depth_reduce_tiled(
            setup, defer_tri, z_init, scene.viewport, batch.xyw,
            height, width, row0=row0)
    elif (allow_pallas and prev_zb is None and batch.clipd.shape[-1] == 0
          and jax.default_backend() == "tpu" and width % 128 == 0):
        # Flat reduce as a Pallas kernel: the (H,W) carry stays in VMEM
        # across triangle chunks instead of round-tripping HBM per scan step.
        from ..raster.pallas_reduce import depth_reduce_pallas

        best_id, best_depth = depth_reduce_pallas(
            setup, defer_tri, scene.clear_z, scene.viewport, height, width)
    else:
        best_id, best_depth = df.depth_reduce(
            setup, defer_tri, z_init, scene.viewport, height, width,
            chunk=chunk, row0=row0)
    if fetched_rows is not None:
        fb = df.shade_rows(
            fetched_rows, best_id >= 0, scene.tex_planes, scene.tex_hw,
            scene.fog_color, clear_fb, height, width,
            sampler_profile=sampler_profile, tex_quad=scene.tex_quad,
            eplanes=shade_eplanes)
    else:
        fb = df.shade_deferred(
            best_id, batch.xyw, batch.z, batch.color, batch.specular,
            batch.uv, batch.fog, batch.state_idx, scene.state_i,
            scene.state_f, scene.tex_planes, scene.tex_hw, scene.fog_color,
            clear_fb, height, width, batch_refl=batch.refl,
            pixel_shader=pixel_shader,
            sampler_profile=sampler_profile, tex_quad=scene.tex_quad,
            row0=row0)
    zb = best_depth

    # --- ordered remainder: cutouts, z-overrides, transparent (sorted) -----
    if ordered_cap is None:
        ordered_cap = batch.valid.shape[0]
    if ordered_cap > 0:
        if not sort_transparent:
            # SortTransparentObjects=0: transparent draws keep stream order
            # (reference option, src/CKRenderManager.cpp options table).
            transparent = jnp.zeros_like(transparent)
        # Stencil-only triangles are consumed by the stencil pass alone.
        prio_ext = jnp.concatenate(
            [scene.entity_priority, jnp.zeros((1,), jnp.float32)], axis=0)
        tri_prio = jnp.take(
            prio_ext, jnp.take(scene.vert_entity, scene.tri_idx[:, 0]), axis=0)
        obatch = ordered_subset(batch, defer_tri | stencil_tri, transparent,
                                ordered_cap, tri_priority=tri_prio)
        # Static cost switch: the flat pass composites the FULL frame once
        # per triangle (fine for small transparent counts); past ~64M
        # pixel-triangles the tile-binned ordered pass wins (order-identical
        # per pixel, work proportional to per-tile occupancy).
        ordered_kernel_ok = (sampler_profile is not None
                             and len(sampler_profile) > 5
                             and bool(sampler_profile[5]))
        if ordered_cap * height * width > (1 << 26):
            tile_o = 64
            while (ordered_cap * (((height + tile_o - 1) // tile_o)
                                  * ((width + tile_o - 1) // tile_o))
                   > (1 << 26) and tile_o < max(height, width)):
                tile_o *= 2
            ordered_peel_ok = (sampler_profile is not None
                               and len(sampler_profile) > 6
                               and bool(sampler_profile[6])
                               and (not sampler_profile[1]
                                    or (height % 2 == 0 and width % 2 == 0)))

            def _xla_replay(opnd):
                fb0, zb0 = opnd
                return rb.render_pass_tiled(
                    fb0, zb0, obatch, scene.state_i, scene.state_f,
                    scene.tex_planes, scene.tex_hw, scene.fog_color,
                    scene.viewport, tile=tile_o,
                    pixel_shader=pixel_shader,
                    sampler_profile=sampler_profile, row0=row0)

            if on_tpu and ordered_kernel_ok and pixel_shader is None:
                # Affine ordered-blend kernel (raster/pallas_ordered.py):
                # full-rate transparency when every ordered state is in the
                # exactness envelope; span/capacity overflow replays the
                # exact XLA pass under lax.cond (zero cost when not taken).
                from ..raster.pallas_ordered import ordered_blend_tiled_pallas

                a_o, b_o, bad_o = ordered_blend_tiled_pallas(
                    obatch.xyw, obatch.z, obatch.valid, obatch.color,
                    obatch.specular, obatch.uv, obatch.fog,
                    obatch.state_idx, obatch.clip_rect, obatch.clipd,
                    scene.state_i, scene.state_f, scene.fog_color, zb,
                    scene.viewport, height, width)

                fb, zb = jax.lax.cond(
                    bad_o, _xla_replay,
                    lambda opnd: (a_o * opnd[0] + b_o, opnd[1]), (fb, zb))
            elif on_tpu and ordered_peel_ok and pixel_shader is None:
                # TEXTURED ordered path (the TexturedPeel option):
                # ITERATED draw-order layer peeling — the Pallas kernel
                # records K layers per round and XLA composites them with
                # full texturing; a while_loop re-peels (window advanced by
                # K) until every pixel's fragment list drains, so the result
                # is EXACT at any transparency depth (ordinary scenes run
                # one round). The exact sequential replay still cannot ride
                # a lax.cond branch next to this kernel (the embedded
                # ~T-step scan faults the TPU worker even unexecuted —
                # round-3 debugging); iteration replaces it. Remaining
                # overflow = phase-A CAPACITY only, surfaced every frame as
                # OrderedPeelOverflow.
                from ..raster.pallas_ordered import ordered_peel_iterate

                def _comp(f, lids, les):
                    return _composite_peeled(f, obatch, lids, les, scene,
                                             sampler_profile, height, width)

                # NO K bump for alpha-test scenes: the VERDICT-r4
                # hypothesis (test-discarded fragments waste layer slots ->
                # record K=8) was MEASURED 66% SLOWER (252.7 vs 152.3
                # ms/frame, 40-sheet staggered-decal stress at 1024x768):
                # the composite runs K dense shade passes per round, and
                # the kernel's per-pixel draw WINDOWS already absorb deep
                # fragment lists without re-rounding (OrderedPeelRounds
                # stayed 1 even at 40 covering sheets). The compile-time
                # alpha-test pre-gate (_atest_prefail_mask) is the lever
                # that survives measurement.
                fb, peel_bad, peel_rounds = ordered_peel_iterate(
                    _comp, fb,
                    obatch.xyw, obatch.z, obatch.valid, obatch.color,
                    obatch.specular, obatch.uv, obatch.fog,
                    obatch.state_idx, obatch.clip_rect, obatch.clipd,
                    scene.state_i, scene.state_f, zb,
                    scene.viewport, height, width)
            else:
                fb, zb = rb.render_pass_tiled(
                    fb, zb, obatch, scene.state_i, scene.state_f,
                    scene.tex_planes, scene.tex_hw, scene.fog_color,
                    scene.viewport, tile=tile_o, pixel_shader=pixel_shader,
                    sampler_profile=sampler_profile, row0=row0)
        else:
            fb, zb = rb.render_pass(
                fb, zb, obatch, scene.state_i, scene.state_f,
                scene.tex_planes, scene.tex_hw, scene.fog_color,
                scene.viewport, chunk=1, pixel_shader=pixel_shader,
                sampler_profile=sampler_profile, row0=row0,
            )
    if want_stats:
        if getattr(tile_peak, "shape", ()) == (7,):
            # Pallas-solve bin statistics (want_binstats): the capacity
            # governor's feed — live pairs vs pair_cap, and the exact
            # fallback row counts per cap (nonzero = caps must bump).
            dev_stats = {
                "TileBinPeak": tile_peak[0],
                "SolveLivePairs": tile_peak[1],
                "SolveFallbackRows": (tile_peak[2] + tile_peak[3]
                                      + tile_peak[4]),
                "SolveBinStats": tile_peak,
                "OrderedPeelOverflow": peel_bad,
                "OrderedPeelRounds": peel_rounds,
            }
        else:
            dev_stats = {"TileBinPeak": tile_peak,
                         "OrderedPeelOverflow": peel_bad,
                         "OrderedPeelRounds": peel_rounds}
    if want_stencil:
        # Stencil mask: z-tested coverage of stencil-only draws
        # (VX_MOVEABLE_STENCILONLY, reference src/CKMesh.cpp:3938-3974).
        s_id, s_depth = df.depth_reduce(
            setup, stencil_tri, 1.0, scene.viewport, height, width,
            chunk=chunk, row0=row0)
        sb = ((s_id >= 0) & (s_depth <= zb + 1e-6)).astype(jnp.uint8)
        if want_stats:
            return fb, zb, sb, dev_stats
        return fb, zb, sb
    if want_stats:
        return fb, zb, dev_stats
    return fb, zb


render_frame = functools.partial(
    jax.jit, static_argnames=("levels", "height", "width", "ordered_cap",
                              "chunk", "vertex_shader", "pixel_shader",
                              "want_bump", "want_cube", "want_stats",
                              "sampler_profile", "corner", "want_texgen",
                              "solve_caps")
)(render_frame_impl)


def render_frame_full_impl(scene: SceneDevice, levels: tuple, height: int,
                           width: int, skin=None, skin_ranges: tuple = (),
                           anim=None, anim_t=0.0,
                           anim_b=None, anim_b_t=0.0, blend=0.0,
                           world_in=None,
                           sprites=None, quads_bg=None, quads_fg=None,
                           lines=None,
                           ordered_cap: int | None = None, chunk: int = 64,
                           sort_transparent: bool = True,
                           want_stencil: bool = False,
                           vertex_shader=None,
                           pixel_shader=None,
                           allow_pallas: bool = True,
                           want_bump: bool = False,
                           want_cube: bool = False,
                           want_stats: bool = False,
                           sampler_profile=None,
                           prev_fb=None, prev_zb=None,
                           corner: tuple = (0, 0, 0),
                           want_texgen: bool = True,
                           row0=0.0,
                           solve_caps: tuple | None = None,
                           cull: tuple | None = None,
                           cull_sel=None):
    """The FULL per-frame device program:
    animate -> compose -> skin -> billboards -> bg 2D -> 3D raster -> fg 2D.

    This is the TPU training-step analogue of the reference's per-tick
    behavior processing + render (SURVEY §3.2/§3.3 combined): track
    evaluation (RCKObjectAnimation::SetStep semantics), world composition,
    skin deformation (RCKSkin::CalcPointsEx semantics), billboard expansion
    (AddSprite3DBatch semantics), the frame raster, and the 2D overlay
    passes (CKRenderedScene::Draw background/foreground trees) fused into
    ONE XLA program.

    ``anim``: AnimBank evaluated at ``anim_t``; with ``anim_b`` a second bank
    blended at factor ``blend`` (warp transitions). ``skin``: SkinBank.
    ``sprites``: Sprite3DBank. ``quads_bg``/``quads_fg``: QuadBanks.
    """
    from ..anim.bank import apply_bank, apply_bank_blended
    from .overlay import apply_billboards, composite_quads
    from .skinning import apply_skin

    local = scene.local
    if world_in is not None:
        # World matrices were produced by a separate device program
        # (eval_anim_world): the tiny animate+compose graph stays out of the
        # frame program, whose XLA compilation is sensitive to upstream
        # graph changes (an embedded anim bank measured 250x slower on TPU
        # with identical flops — see docs/PERFORMANCE.md).
        world = world_in
    else:
        if anim is not None and anim_b is not None:
            local = apply_bank_blended(local, anim, anim_t, anim_b, anim_b_t,
                                       blend)
        elif anim is not None:
            local = apply_bank(local, anim, anim_t)
        world = compose_world(local, scene.parent, levels)
    positions, normals = scene.positions, scene.normals
    if skin is not None:
        positions, normals = apply_skin(world, positions, normals, skin,
                                        ranges=skin_ranges)
    if sprites is not None:
        positions = apply_billboards(world, scene.view, positions, sprites,
                                     scene.entity_visible)
    scene = scene._replace(local=local, positions=positions, normals=normals)
    # Host chunk culling (see compact_scene_chunks): compaction happens
    # AFTER skin/billboard pool writes so the gathered tail sees them; the
    # line pass keeps the uncompacted scene (its bank indexes the original
    # stream rows).
    scene_lines = scene
    if cull is not None and cull_sel is not None:
        scene, corner = compact_scene_chunks(scene, cull_sel[0],
                                             cull_sel[1], corner, cull)

    background = None
    if quads_bg is not None:
        background = prev_fb if prev_fb is not None else jnp.broadcast_to(
            scene.clear_color[:, None, None].astype(jnp.float32),
            (4, height, width))
        background = composite_quads(background, quads_bg, scene.tex_planes,
                                     scene.tex_hw, height, width, row0=row0)
    out = render_frame_impl(scene, levels, height, width, ordered_cap,
                            chunk, world=world, background=background,
                            sort_transparent=sort_transparent,
                            want_stencil=want_stencil,
                            vertex_shader=vertex_shader,
                            pixel_shader=pixel_shader,
                            allow_pallas=allow_pallas,
                            want_bump=want_bump,
                            want_cube=want_cube,
                            want_stats=want_stats,
                            sampler_profile=sampler_profile,
                            prev_fb=prev_fb, prev_zb=prev_zb,
                            corner=corner, want_texgen=want_texgen,
                            row0=row0, solve_caps=solve_caps)
    stats = None
    if want_stats:
        out, stats = out[:-1], out[-1]
    if want_stencil:
        fb, zb, sb = out
    else:
        fb, zb = out
        sb = None
    if lines is not None:
        from .lines import draw_lines

        fb = draw_lines(fb, zb, scene_lines, world, lines, height, width,
                        row0=row0)
    if quads_fg is not None:
        fb = composite_quads(fb, quads_fg, scene.tex_planes, scene.tex_hw,
                             height, width, row0=row0)
    ret = (fb, zb, sb) if want_stencil else (fb, zb)
    return ret + (stats,) if want_stats else ret


render_frame_full = functools.partial(
    jax.jit, static_argnames=("levels", "height", "width", "ordered_cap",
                              "chunk", "sort_transparent", "want_stencil",
                              "vertex_shader", "pixel_shader", "want_bump",
                              "want_cube", "want_stats", "sampler_profile",
                              "corner", "want_texgen", "solve_caps",
                              "cull", "skin_ranges")
)(render_frame_full_impl)


def _apply_tex_patch(static: dict, d: dict, layout: tuple,
                     texdev=None, texdev_rects: tuple = ()):
    """Per-frame texture updates applied INSIDE the frame program:

    - video-texture texels packed in the dyn f32 buffer scatter via
      precomputed indices (zero extra transfers);
    - device-resident images (render-to-texture feeds, ``texdev``) scatter
      directly (zero transfers AND zero extra executables — a separate
      eager/jit scatter adds ~40 ms of dependent-launch latency under the
      tunnel; folded here it is free)."""
    from .packing import has_field
    planes = static["tex_planes"]
    if texdev:
        for img, rect in zip(texdev, texdev_rects):
            pi, oy, ox, h, w, mip_col, levels, chw = rect
            # chw feeds (framebuffers) hand over their RAW (4,H,W) buffer;
            # transpose here, inside the program
            img = (jnp.moveaxis(img, 0, -1) if chw else img).astype(
                planes.dtype)
            planes = planes.at[pi, :, oy:oy + h, ox:ox + w].set(
                jnp.moveaxis(img, -1, 0))
            cur, lh, lw = img, h, w
            for lv in range(1, levels):
                nh, nw = max(lh // 2, 1), max(lw // 2, 1)
                cur = cur[: nh * 2, : nw * 2].reshape(
                    nh, 2, nw, 2, 4).mean(axis=(1, 3))
                y_off = 0 if lv == 1 else h - (h >> (lv - 1))
                planes = planes.at[pi, :, oy + y_off:oy + y_off + nh,
                                   ox + mip_col:ox + mip_col + nw].set(
                    jnp.moveaxis(cur, -1, 0))
                lh, lw = nh, nw
    if not has_field(layout, "tex_patch") or "texpatch_idx" not in static:
        return planes
    idx = static["texpatch_idx"]                  # (VT,)
    vals = d["tex_patch"]                         # (VT,4)
    nt, _ch, th, tw = planes.shape
    cl = planes.transpose(0, 2, 3, 1).reshape(-1, 4)
    cl = cl.at[idx].set(vals.astype(cl.dtype))
    return cl.reshape(nt, th, tw, 4).transpose(0, 3, 1, 2)


def render_frame_packed_impl(static: dict, dyn_f, dyn_i, layout: tuple,
                             levels: tuple, height: int, width: int,
                             skin=None, skin_ranges: tuple = (),
                             anim=None, world_in=None,
                             sprites_static=None, lines=None,
                             ordered_cap: int | None = None, chunk: int = 64,
                             sort_transparent: bool = True,
                             want_stencil: bool = False,
                             vertex_shader=None,
                             pixel_shader=None,
                             want_bump: bool = False,
                             want_cube: bool = False,
                             want_stats: bool = False,
                             sampler_profile=None,
                             prev_fb=None, prev_zb=None,
                             allow_pallas: bool = True,
                             y_shift=None,
                             texdev=None, texdev_rects: tuple = (),
                             corner: tuple = (0, 0, 0),
                             want_texgen: bool = True,
                             ss: int = 1,
                             solve_caps: tuple | None = None,
                             cull: tuple | None = None):
    """Packed-transfer frame entry: ``static`` is the per-compile device
    pytree (no re-transfer), ``dyn_f``/``dyn_i`` are the two per-frame
    buffers (see pipeline/packing.py). Unpacks fields on device and runs the
    full frame program.

    ``y_shift``: traced row offset for framebuffer band sharding
    (parallel/tile_shard.py): renders rows [y_shift, y_shift+height) of the
    logical frame by shifting every pixel-space quantity (viewport, entity
    scissors, 2D quad rects) — the raster math itself is unchanged.

    ``ss``: Antialias supersample factor (see unpack_scene): the frame
    renders at (ss*height, ss*width) and box-resolves to (height, width) —
    the ordered-supersample mapping of the reference's multisample option
    (src/CKRenderManager.cpp:117,668). zb resolves by window MIN (nearest
    covered sample keeps overlay z-tests conservative), the stencil mask by
    window MAX (any covered sample)."""
    from .overlay import QuadBank
    from .packing import has_field

    scene, sprites, d = unpack_scene(
        static, dyn_f, dyn_i, layout, sprites_static=sprites_static,
        y_shift=y_shift, texdev=texdev, texdev_rects=texdev_rects, ss=ss)

    def quad_bank(prefix):
        if not has_field(layout, f"{prefix}_rect"):
            return None
        return QuadBank(
            rect=d[f"{prefix}_rect"], uvrect=d[f"{prefix}_uvrect"],
            color=d[f"{prefix}_color"], tex=d[f"{prefix}_tex"],
            blend=d[f"{prefix}_blend"], valid=d[f"{prefix}_valid"] != 0)

    rh, rw = height * ss, width * ss
    if ss > 1:
        # Accumulate-mode buffers arrive at display size; repeat-upsample so
        # box-resolve(render over repeat(prev)) == prev where untouched.
        if prev_fb is not None:
            prev_fb = jnp.repeat(jnp.repeat(prev_fb, ss, axis=-2), ss, axis=-1)
        if prev_zb is not None:
            prev_zb = jnp.repeat(jnp.repeat(prev_zb, ss, axis=-2), ss, axis=-1)

    # Device animation: the bound clip's bank evaluates INSIDE the frame
    # program at the packed scalar time (host cost per frame = 4 bytes).
    anim_t = d["anim_t"] if (anim is not None
                             and has_field(layout, "anim_t")) else 0.0
    row0 = 0.0 if y_shift is None else jnp.asarray(y_shift,
                                                   jnp.float32) * ss
    cull_sel = None
    if cull is not None and has_field(layout, "chunk_idx"):
        cull_sel = (d["chunk_idx"], d["chunk_n"])
    out = render_frame_full_impl(
        scene, levels, rh, rw, skin=skin, skin_ranges=skin_ranges,
        sprites=sprites,
        anim=anim, anim_t=anim_t, world_in=world_in,
        quads_bg=quad_bank("qbg"), quads_fg=quad_bank("qfg"), lines=lines,
        ordered_cap=ordered_cap, chunk=chunk,
        sort_transparent=sort_transparent, want_stencil=want_stencil,
        vertex_shader=vertex_shader, pixel_shader=pixel_shader,
        want_bump=want_bump,
        want_cube=want_cube, want_stats=want_stats,
        sampler_profile=sampler_profile,
        prev_fb=prev_fb, prev_zb=prev_zb, allow_pallas=allow_pallas,
        corner=corner, want_texgen=want_texgen, row0=row0,
        solve_caps=solve_caps, cull=cull, cull_sel=cull_sel)
    if ss == 1:
        return out

    def _win(x):
        return x.reshape(x.shape[:-2] + (height, ss, width, ss))

    stats = None
    if want_stats:
        out, stats = out[:-1], out[-1]
    fb = _win(out[0]).mean(axis=(-3, -1))
    zb = _win(out[1]).min(axis=(-3, -1))
    ret = (fb, zb)
    if want_stencil:
        ret = ret + (_win(out[2]).max(axis=(-3, -1)),)
    return ret + (stats,) if want_stats else ret


def unpack_scene(static: dict, dyn_f, dyn_i, layout: tuple,
                 sprites_static=None, y_shift=None,
                 texdev=None, texdev_rects: tuple = (), ss: int = 1):
    """Packed buffers -> (SceneDevice, Sprite3DBank | None, raw field dict).

    The device-side inverse of CKRenderContext._fill_packed; also used by
    the staged perf probe (benchmarks/stages.py).

    ``ss``: supersample factor (the Antialias option, reference
    src/CKRenderManager.cpp:117,668 -> multisample setup in
    CKDX9RasterizerContext.cpp:469-491; the TPU mapping is ordered ss x ss
    supersampling with a box resolve). Every pixel-space dynamic quantity
    (viewport, entity scissors, 2D quad rects) scales by ss so the frame
    renders at (ss*H, ss*W); the raster math itself is unchanged."""
    from .overlay import Sprite3DBank
    from .packing import has_field, unpack

    d = unpack(dyn_f, dyn_i, layout)
    if ss > 1:
        d = dict(d)
        d["viewport"] = d["viewport"] * np.float32(ss)
        d["entity_clip"] = d["entity_clip"] * np.float32(ss)
        for prefix in ("qbg", "qfg"):
            if has_field(layout, f"{prefix}_rect"):
                d[f"{prefix}_rect"] = d[f"{prefix}_rect"] * np.float32(ss)
    # Band sharding (y_shift) no longer shifts any pixel-space quantity:
    # vertices project and scissors compare in GLOBAL screen coordinates,
    # and the raster stages receive the band's row offset (``row0``) on
    # their pixel iotas instead — an integer offset on the iota is exact in
    # f32, so band pixels are BIT-IDENTICAL to the unbanded render's rows
    # (a viewport shift re-rounds every edge coefficient).
    lights = LightArray(
        type=d["lt_type"], diffuse=d["lt_diffuse"], specular=d["lt_specular"],
        ambient=d["lt_ambient"], position=d["lt_position"],
        direction=d["lt_direction"], range=d["lt_range"],
        falloff=d["lt_falloff"], attenuation=d["lt_attenuation"],
        cos_theta=d["lt_cos_theta"], cos_phi=d["lt_cos_phi"],
        active=d["lt_active"] != 0)
    scene = SceneDevice(
        local=d["local"], parent=static["parent"],
        entity_visible=d["entity_visible"] != 0,
        entity_clip=d["entity_clip"],
        entity_priority=d["entity_priority"],
        positions=static["positions"], normals=static["normals"],
        uv=static["uv"], prelit=static["prelit"],
        prelit_spec=static["prelit_spec"], src_idx=static["src_idx"],
        vert_entity=static["vert_entity"], vert_state=static["vert_state"],
        vert_lit=static["vert_lit"], tri_idx=static["tri_idx"],
        tri_state=static["tri_state"], tri_valid=static["tri_valid"],
        state_i=d["state_i"], state_f=d["state_f"],
        mat_diffuse=d["mat_diffuse"], mat_ambient=d["mat_ambient"],
        mat_specular=d["mat_specular"], mat_emissive=d["mat_emissive"],
        mat_power=d["mat_power"], lights=lights,
        global_ambient=d["global_ambient"], view=d["view"], proj=d["proj"],
        cam_pos=d["cam_pos"], viewport=d["viewport"],
        fog_mode=d["fog_mode"], fog_start=d["fog_start"],
        fog_end=d["fog_end"], fog_density=d["fog_density"],
        fog_color=d["fog_color"], tex_planes=_apply_tex_patch(
            static, d, layout, texdev, texdev_rects),
        tex_hw=static["tex_hw"], clear_color=d["clear_color"],
        clear_z=d["clear_z"],
        clip_planes=(d["clip_planes"]
                     if has_field(layout, "clip_planes") else None),
        fog_proj=(d["fog_proj"] if has_field(layout, "fog_proj") else None),
        tex_quad=static.get("tex_quad"))
    sprites = None
    if sprites_static is not None:
        sprites = Sprite3DBank(
            entity_row=sprites_static["entity_row"], size=d["sp_size"],
            offset=d["sp_offset"], mode=d["sp_mode"],
            pool_base=sprites_static["pool_base"],
            valid=sprites_static["valid"])
    return scene, sprites, d


@functools.partial(jax.jit, static_argnames=("levels",))
def eval_anim_world(local, parent, anim, anim_t, levels,
                    anim_b=None, anim_b_t=0.0, blend=0.0):
    """Standalone device program: bound-clip track evaluation + world
    composition -> (N,4,4) world matrices.

    Kept OUT of the frame program deliberately: XLA's global optimization of
    the ~10k-op frame graph is fragile to upstream additions (embedding this
    ~1.2k-op bank eval made the whole compiled frame 250x slower on TPU with
    identical flop counts). As its own executable it costs ~0.5 ms of
    pipelined dispatch and its output feeds render_frame_packed via
    ``world_in`` — still zero host round trips per frame."""
    from ..anim.bank import apply_bank, apply_bank_blended

    if anim_b is not None:
        local = apply_bank_blended(local, anim, anim_t, anim_b, anim_b_t,
                                   blend)
    else:
        local = apply_bank(local, anim, anim_t)
    return compose_world(local, parent, levels)


render_frame_packed = functools.partial(
    jax.jit,
    static_argnames=("layout", "levels", "height", "width", "ordered_cap",
                     "chunk", "sort_transparent", "want_stencil",
                     "vertex_shader", "pixel_shader", "want_bump",
                     "want_cube", "want_stats", "sampler_profile",
                     "allow_pallas", "texdev_rects", "corner",
                     "want_texgen", "ss", "solve_caps", "cull", "skin_ranges"))(
    render_frame_packed_impl)


@functools.partial(
    jax.jit,
    static_argnames=("layout", "levels", "height", "width", "ordered_cap",
                     "chunk", "sort_transparent", "want_stencil",
                     "vertex_shader", "pixel_shader", "want_bump",
                     "want_cube", "texdev_rects", "sampler_profile",
                     "corner", "want_texgen", "ss", "solve_caps", "cull", "skin_ranges"))
def render_frames_packed_batched(static: dict, dyn_f, dyn_i, layout: tuple,
                                 levels: tuple, height: int, width: int,
                                 skin=None, skin_ranges: tuple = (),
                                 anim=None,
                                 sprites_static=None, lines=None,
                                 ordered_cap: int | None = None,
                                 chunk: int = 64,
                                 sort_transparent: bool = True,
                                 want_stencil: bool = False,
                                 vertex_shader=None,
                                 pixel_shader=None,
                                 want_bump: bool = False,
                                 want_cube: bool = False,
                                 texdev=None, texdev_rects: tuple = (),
                                 world_in=None, sampler_profile=None,
                                 corner: tuple = (0, 0, 0),
                                 want_texgen: bool = True,
                                 ss: int = 1,
                                 solve_caps: tuple | None = None,
                                 cull: tuple | None = None):
    """Batched packed frames: ``dyn_f``/``dyn_i`` carry a leading context
    axis; statics (streams, pools, textures, banks topology) broadcast. This
    is the multi-context scale path with ONE f32 + ONE i32 host->device
    transfer for the WHOLE batch — the per-leaf stacked-pytree path costs a
    tunnel round trip per leaf instead. Pallas is disabled (vmap).

    ``world_in``: optional (B, N, 4, 4) per-context precomposed world
    matrices (the device-bound-animation path, see eval_anim_world)."""

    def one(df, di, wi):
        return render_frame_packed_impl(
            static, df, di, layout, levels, height, width, skin=skin,
            skin_ranges=skin_ranges,
            anim=anim, world_in=wi, sprites_static=sprites_static,
            lines=lines,
            ordered_cap=ordered_cap, chunk=chunk,
            sort_transparent=sort_transparent, want_stencil=want_stencil,
            vertex_shader=vertex_shader, pixel_shader=pixel_shader,
            want_bump=want_bump,
            want_cube=want_cube, texdev=texdev, texdev_rects=texdev_rects,
            sampler_profile=sampler_profile, allow_pallas=False,
            corner=corner, want_texgen=want_texgen, ss=ss,
            solve_caps=solve_caps, cull=cull)

    if world_in is None:
        return jax.vmap(lambda df, di: one(df, di, None))(dyn_f, dyn_i)
    return jax.vmap(one)(dyn_f, dyn_i, world_in)


@functools.partial(
    jax.jit,
    static_argnames=("layout", "levels", "height", "width", "ordered_cap",
                     "chunk", "sort_transparent", "want_stencil",
                     "vertex_shader", "pixel_shader", "want_bump",
                     "want_cube", "want_stats", "sampler_profile",
                     "corner", "want_texgen", "ss", "solve_caps", "cull", "skin_ranges"))
def render_frame_packed_window(static: dict, dyn_fs, dyn_is, layout: tuple,
                               levels: tuple, height: int, width: int,
                               skin=None, skin_ranges: tuple = (),
                               anim=None, world_in=None,
                               anim_win=None,
                               sprites_static=None, lines=None,
                               ordered_cap: int | None = None,
                               chunk: int = 64,
                               sort_transparent: bool = True,
                               want_stencil: bool = False,
                               vertex_shader=None, pixel_shader=None,
                               want_bump: bool = False,
                               want_cube: bool = False,
                               want_stats: bool = False,
                               sampler_profile=None,
                               corner: tuple = (0, 0, 0),
                               want_texgen: bool = True,
                               ss: int = 1,
                               solve_caps: tuple | None = None,
                               cull: tuple | None = None):
    """W whole frames in ONE device program (frame-window pipelining).

    ``dyn_fs``/``dyn_is`` stack W frames' packed buffers on a leading axis;
    ``world_in`` optionally stacks W precomposed (N,4,4) world-matrix
    sets. A ``lax.scan`` renders the frames in order —
    one dispatch, one transfer — amortizing the tunnel's ~4-5 ms
    per-program floor to ~1 ms/frame (benchmarks/window_probe.py: config 5
    27.1 -> 23.6 ms/frame at W=4; a trivial body measures 4.93 -> 0.96).
    The reference analogue is present-queue pipelining: Render() returns
    when the frame is QUEUED, not displayed (SURVEY §3.2 BackToFront).

    Returns the per-frame outputs stacked on a leading W axis.

    ``anim_win``: optional (locals_w (W,N,4,4), bank, frames_w (W,)) —
    the bound-clip evals run as a PROLOGUE of this same program (one
    dispatch per window instead of two; the scan boundary keeps the anim
    graph out of the frame body, avoiding the round-2 pathology where
    embedding the bank per frame compiled 250x slower)."""
    if anim_win is not None:
        from ..anim.bank import apply_bank

        locals_w, bank, frames_w = anim_win

        def one(local, t):
            return compose_world(apply_bank(local, bank, t),
                                 static["parent"], levels)

        world_in = jax.vmap(one)(locals_w, frames_w)

    def body(carry, xs):
        wi = None
        if world_in is not None:
            f, i, wi = xs
        else:
            f, i = xs
        out = render_frame_packed_impl(
            static, f, i, layout, levels, height, width, skin=skin,
            skin_ranges=skin_ranges,
            anim=anim, world_in=wi, sprites_static=sprites_static,
            lines=lines, ordered_cap=ordered_cap, chunk=chunk,
            sort_transparent=sort_transparent, want_stencil=want_stencil,
            vertex_shader=vertex_shader, pixel_shader=pixel_shader,
            want_bump=want_bump, want_cube=want_cube, want_stats=want_stats,
            sampler_profile=sampler_profile, corner=corner,
            want_texgen=want_texgen, ss=ss, solve_caps=solve_caps,
            cull=cull)
        return carry, out

    xs = (dyn_fs, dyn_is) if world_in is None else (dyn_fs, dyn_is, world_in)
    _, ys = jax.lax.scan(body, jnp.int32(0), xs)
    return ys


@functools.partial(
    jax.jit,
    static_argnames=("layout", "levels", "height", "width", "ordered_cap",
                     "chunk", "sort_transparent", "want_stencil",
                     "vertex_shader", "pixel_shader", "want_bump",
                     "want_cube", "want_stats", "sampler_profile",
                     "corner", "want_texgen", "ss", "solve_caps", "cull",
                     "skin_ranges", "lf", "li", "nloc"))
def render_frame_window_fused(static: dict, dyn_c, layout: tuple,
                              levels: tuple, height: int, width: int,
                              lf: int = 0, li: int = 0, nloc: int = 0,
                              bank=None,
                              skin=None, skin_ranges: tuple = (),
                              anim=None,
                              sprites_static=None, lines=None,
                              ordered_cap: int | None = None,
                              chunk: int = 64,
                              sort_transparent: bool = True,
                              want_stencil: bool = False,
                              vertex_shader=None, pixel_shader=None,
                              want_bump: bool = False,
                              want_cube: bool = False,
                              want_stats: bool = False,
                              sampler_profile=None,
                              corner: tuple = (0, 0, 0),
                              want_texgen: bool = True,
                              ss: int = 1,
                              solve_caps: tuple | None = None,
                              cull: tuple | None = None):
    """Frame-window program with ONE fused input transfer and NO stacked
    framebuffer outputs — the round-5 tunnel-latency diet.

    The driver tunnel charges ~5-15 ms of serialized latency PER host->
    device transfer RPC regardless of size (a 1.3 KB pair measured 10-33
    ms; bandwidth is irrelevant at these sizes). The round-4 window path
    paid per window: two buffer uploads + anim locals/frames uploads + the
    program + two post-hoc slice dispatches (fbs[-1]/zbs[-1]) + a fence
    program — ~7 RPCs. This entry collapses them to TWO (one upload, one
    program):

    - ``dyn_c`` is ONE int32 (W, lf+li+16*nloc+(1 if nloc else 0)) buffer:
      per frame the f32 packed buffer bitcast to i32, the i32 packed
      buffer, then (bound-clip windows) the 4x4 local matrices bitcast
      flat and the clip frame time. Split + bitcast back on device.
    - the ``lax.scan`` carries the LAST frame's (fb, zb[, sb]) instead of
      stacking all W framebuffers (less HBM traffic, no [-1] slice
      program), and emits a per-frame f32 checksum ``fence`` (W,): every
      frame's framebuffer feeds its checksum, so reading ``fence`` proves
      the whole window truly rendered — the 4*W-byte honest completion
      token (GetFrameFence), no separate fence program needed.

    Returns (fb, zb[, sb], fence[, stats]) where stats (want_stats) is the
    per-frame stacked device-stats dict, as render_frame_packed_window.
    """
    W = dyn_c.shape[0]
    dyn_fs = jax.lax.bitcast_convert_type(dyn_c[:, :lf], jnp.float32)
    dyn_is = dyn_c[:, lf:lf + li]
    world_in = None
    if nloc:
        from ..anim.bank import apply_bank

        flat = jax.lax.bitcast_convert_type(
            dyn_c[:, lf + li:lf + li + nloc * 16], jnp.float32)
        locals_w = flat.reshape(W, nloc, 4, 4)
        frames_w = jax.lax.bitcast_convert_type(dyn_c[:, lf + li + nloc * 16],
                                                jnp.float32)

        def one(local, t):
            return compose_world(apply_bank(local, bank, t),
                                 static["parent"], levels)

        world_in = jax.vmap(one)(locals_w, frames_w)

    def frame_one(f, i, wi):
        out = render_frame_packed_impl(
            static, f, i, layout, levels, height, width, skin=skin,
            skin_ranges=skin_ranges,
            anim=anim, world_in=wi, sprites_static=sprites_static,
            lines=lines, ordered_cap=ordered_cap, chunk=chunk,
            sort_transparent=sort_transparent, want_stencil=want_stencil,
            vertex_shader=vertex_shader, pixel_shader=pixel_shader,
            want_bump=want_bump, want_cube=want_cube, want_stats=want_stats,
            sampler_profile=sampler_profile, corner=corner,
            want_texgen=want_texgen, ss=ss, solve_caps=solve_caps,
            cull=cull)
        stats = None
        if want_stats:
            out, stats = tuple(out[:-1]), out[-1]
        return tuple(out), stats

    # The scan STACKS the per-frame outputs (ys) rather than carrying the
    # last frame through the loop: a big (4,H,W) f32 carry measured +7
    # ms/frame at Ballance scale (the carry ping-pong defeats the raster's
    # output aliasing), while the W-stacked HBM writes are ~free. The last
    # frame's buffers and the per-frame checksum fence are sliced/reduced
    # INSIDE this same program, so the host still pays no extra dispatch.
    def body(carry, xs):
        if world_in is not None:
            f, i, wi = xs
        else:
            (f, i), wi = xs, None
        out, stats = frame_one(f, i, wi)
        return carry, ((out, stats) if want_stats else out)

    xs = (dyn_fs, dyn_is) if world_in is None else (dyn_fs, dyn_is, world_in)
    _, ys = jax.lax.scan(body, jnp.int32(0), xs)
    outs, stats_w = (ys if want_stats else (ys, None))
    fence_w = jnp.sum(outs[0].astype(jnp.float32),
                      axis=tuple(range(1, outs[0].ndim)))
    last = tuple(o[-1] for o in outs)
    if want_stats:
        return last + (fence_w, stats_w)
    return last + (fence_w,)


def frame_stats(scene: SceneDevice, batch_valid: jnp.ndarray | None = None):
    """Device-side VxStats counters (reference include/CKRasterizerTypes.h:63-69)."""
    return {
        "NbTrianglesDrawn": jnp.sum(scene.tri_valid.astype(jnp.int32)),
        "NbVerticesProcessed": jnp.asarray(scene.src_idx.shape[0], jnp.int32),
    }
