"""CKRenderContext: one drawable surface -> the one-frame device program
(reference RCKRenderContext, /root/reference/src/CKRenderContext.cpp).
Split out of the former objects/manager.py monolith (round-3 VERDICT #8);
behavior is unchanged — every name is re-exported from .manager.
"""

from .rendertypes import *          # noqa: F401,F403 (shared prelude)
from .rendertypes import (          # explicit: names the body references
    _pad_to, _mip_chain, _dc, CompiledScene, VxStats, VxEffectDescription,
)

class CKRenderContext(CKObject):
    CLASS_ID = CKCID_RENDERCONTEXT

    def __init__(self, context: CKContext, name: str = "", width: int = 256,
                 height: int = 256):
        super().__init__(context, name)
        self.width = int(width)
        self.height = int(height)
        self.viewport = (0, 0, self.width, self.height)
        self.attached_camera: CKCamera | None = None
        self.mask = 1
        # Per-context scene state (CKRenderedScene equivalents,
        # reference src/CKRenderedScene.cpp:20-40 defaults).
        self.background_color = np.array([0.0, 0.0, 0.0, 0.0], np.float32)
        self.background_material: CKMaterial | None = None
        self.ambient_light = np.array([0x0F / 255.0] * 3 + [1.0], np.float32)
        self.fog_mode = int(VXFOG.NONE)
        self.fog_start = 1.0
        self.fog_end = 100.0
        self.fog_density = 1.0
        self.fog_color = np.zeros(3, np.float32)
        self.clear_z = 1.0
        self.clip_rect = None      # context-level scissor (SetClipRect)
        self.render_flags = CK_RENDER_DEFAULTSETTINGS
        self.vertex_shader = None  # user vertex-stage hook (jax fn)
        self.pixel_shader = None   # user per-pixel stage hook (jax fn)
        self.portal_traversal = False
        # Output
        # Frame-window pipelining (SetFramePipelining): W frames' packed
        # buffers accumulate host-side and dispatch as ONE scan program,
        # amortizing the tunnel's ~4-5 ms per-program floor
        # (benchmarks/window_probe.py). fb/zb are properties that flush the
        # pending window lazily on first read.
        self._win_size = 1
        self._win_slots: list = []
        self._win_ctx = None
        self._win_fence = None
        self._anim_req = None
        # Capacity governor: solve caps derived from observed bin stats
        # (initial shrink plan on frame 1, bump on fallback/near-cap).
        self._solve_caps = None
        self._gov_frames = 0
        # Host chunk-cull survivor cap (bumps pre-dispatch; never drops).
        self._chunk_cap = None
        self.fb = jnp.zeros((4, self.height, self.width), jnp.float32)
        self.zb = jnp.ones((self.height, self.width), jnp.float32)
        self.sb = jnp.zeros((self.height, self.width), jnp.uint8)
        # Compile cache
        self._compiled = CompiledScene()
        self._tex_planes = jnp.zeros((1, 4, 1, 1), jnp.float32)
        self._tex_quad = None
        self._tex_hw = jnp.ones((1, 2), jnp.int32)
        # Stats
        self.stats = VxStats()
        self._fps_window_start = time.monotonic()
        self._fps_frames = 0
        # Object membership: entities added via AddObject; empty = everything.
        self._objects: list | None = None
        self.pre_render_callbacks: list = []
        self.post_render_callbacks: list = []
        self.post_sprite_callbacks: list = []
        # Packed-transfer frame state (pipeline/packing.py)
        self._layout_sig = None
        self._layout = None
        self._buf_f = None
        self._buf_i = None
        self._packed_static: dict | None = None
        self._packed_static_vers = None
        self._sprites_static = None
        # Aux subsystems
        from ..profiler import FramePhases
        self.phases = FramePhases()
        self.target_texture = None         # render-to-texture target
        self.stereo_enabled = False
        # User clip planes (reference CKRasterizerContext::SetUserClipPlane,
        # DX9 backend CKDX9RasterizerContext.cpp:3408): index -> (plane eq,
        # enabled). World-space a,b,c,d; kept side is dot((p,1),eq) >= 0.
        self.user_clip_planes: dict[int, tuple] = {}
        # Framebuffer band sharding over a device mesh (tile_shard.py).
        self._tile_mesh = None
        # Device-bound keyed animation (BindAnimation): the clip's track
        # bank evaluates inside the frame program at a packed scalar time.
        self._bound_clip = None
        # API-surface state: stencil bit allocator, global render mode,
        # immediate-mode DrawPrimitive transforms/material/staging.
        self._stencil_used_mask = 0
        self._global_render_mode = (2, True, False)   # (shading, tex, wire)
        self._dp_world = np.eye(4, dtype=np.float32)
        self._dp_view = None
        self._dp_proj = None
        self._dp_material = None
        self._dp_texture = None
        self._dp_struct = None
        self._driver_index = 0
        self.eye_separation = 0.06         # world units between eyes
        self.focal_length = 2.0

    # -- framebuffer windowing (frame-window pipelining) -------------------
    @property
    def fb(self):
        if getattr(self, "_win_slots", None):
            self._flush_window()
            # A direct fb read is a sync point (the caller is about to
            # materialize the frame): resolve any stashed governor sample.
            self._governor_resolve()
        # Peel exactness: correct the presented frame if the peel path
        # reported capacity overflow (no-op otherwise).
        self._peel_correct()
        if self._fb_val is None and getattr(self, "_fb_src", None) is not None:
            # Deferred batch slice: ProcessBatched leaves the stacked batch
            # output in place and each context slices its frame lazily —
            # an eager jnp slice costs ~1 ms of dispatch per context per
            # frame on the tunnel (measured 14 ms/batch for 8 contexts).
            arr, i = self._fb_src
            self._fb_val = arr[i]
            self._fb_src = None
        return self._fb_val

    @fb.setter
    def fb(self, v):
        self._fb_val = v
        self._fb_src = None
        self._win_fence = None

    @property
    def zb(self):
        if getattr(self, "_win_slots", None):
            self._flush_window()
        self._peel_correct()
        if self._zb_val is None and getattr(self, "_zb_src", None) is not None:
            arr, i = self._zb_src
            self._zb_val = arr[i]
            self._zb_src = None
        return self._zb_val

    @zb.setter
    def zb(self, v):
        self._zb_val = v
        self._zb_src = None

    def SetFramePipelining(self, window: int = 1):
        """Render up to ``window`` frames per device program: Render()
        stages the frame's packed buffers and dispatches a W-frame scan
        program when the window fills (or on first framebuffer read). The
        TPU mapping of present-queue pipelining — the reference's Render()
        also returns at QUEUE time, frames complete at Present
        (src/CKRenderContext.cpp:576-765). Amortizes the ~4-5 ms
        per-program dispatch floor to ~1 ms/frame (window_probe.py).
        window=1 restores strict per-frame dispatch."""
        self._flush_window()
        self._win_size = max(1, int(window))
        # Restart the stats-sampling cadence so the FIRST window at the new
        # size is a stats window: both program variants (with/without stats
        # outputs) compile during warmup instead of a surprise multi-second
        # compile at the 32nd window of a timed/live run.
        self._stat_tick_win = -1

    def GetFramePipelining(self) -> int:
        return self._win_size

    def GetFrameFence(self):
        """Honest completion token: a tiny device array whose host readback
        cannot produce bytes until every queued frame has truly rendered.

        In frame-window mode this is the window program's per-frame f32
        checksum vector (4*W bytes — each frame's framebuffer feeds its
        entry, and the device executes programs in order, so reading it
        proves all earlier windows completed too). Otherwise it is the
        framebuffer itself. One `jax.device_get` of this token replaces the
        round-4 fence (a separate sum program + readback = 2 tunnel RPCs)."""
        if getattr(self, "_win_slots", None):
            self._flush_window()
        self._governor_resolve()
        f = getattr(self, "_win_fence", None)
        return f if f is not None else self.fb

    # -- render callbacks (reference AddPreRenderCallBack /
    # AddPostRenderCallBack, include/RCKRenderContext.h) -------------------
    def AddPreRenderCallBack(self, fct, arg=None, temp: bool = False):
        self.pre_render_callbacks.append(("pre", fct, arg, temp))

    def RemovePreRenderCallBack(self, fct):
        self.pre_render_callbacks = [
            cb for cb in self.pre_render_callbacks if cb[1] is not fct]

    def AddPostRenderCallBack(self, fct, arg=None, temp: bool = False):
        self.post_render_callbacks.append(("post", fct, arg, temp))

    def RemovePostRenderCallBack(self, fct):
        self.post_render_callbacks = [
            cb for cb in self.post_render_callbacks if cb[1] is not fct]

    # -- camera -----------------------------------------------------------
    def AttachViewpointToCamera(self, camera: CKCamera):
        self.attached_camera = camera

    def GetAttachedCamera(self) -> CKCamera | None:
        return self.attached_camera

    # -- object membership (RCKRenderContext::AddObject) ------------------
    def AddObject(self, obj):
        if self._objects is None:
            self._objects = []
        if obj not in self._objects:
            self._objects.append(obj)
            obj._in_render_context_mask |= self.mask
            self.context._bump_topology()

    def RemoveObject(self, obj):
        if self._objects and obj in self._objects:
            self._objects.remove(obj)
            obj._in_render_context_mask &= ~self.mask
            self.context._bump_topology()

    def AddObjectWithHierarchy(self, obj):
        self.AddObject(obj)
        for i in range(obj.GetChildrenCount()):
            self.AddObjectWithHierarchy(obj.GetChild(i))

    # -- scene state ------------------------------------------------------
    def SetBackgroundColor(self, rgba):
        self.background_color = np.asarray(rgba, np.float32)

    def GetBackgroundColor(self):
        return self.background_color.copy()

    def SetBackgroundMaterial(self, mat: CKMaterial | None):
        self.background_material = mat

    def SetAmbientLight(self, r, g=None, b=None):
        if g is None:
            rgba = np.asarray(r, np.float32)
        else:
            rgba = np.array([r, g, b, 1.0], np.float32)
        self.ambient_light = rgba

    def GetAmbientLight(self):
        return self.ambient_light.copy()

    def SetFogMode(self, mode: int):
        self.fog_mode = int(mode)

    def GetFogMode(self) -> int:
        return self.fog_mode

    def SetFogStart(self, v: float):
        self.fog_start = float(v)

    def SetFogEnd(self, v: float):
        self.fog_end = float(v)

    def SetFogDensity(self, v: float):
        self.fog_density = float(v)

    def SetFogColor(self, rgb):
        self.fog_color = np.asarray(rgb, np.float32)[:3]

    def SetViewRect(self, x, y, w, h):
        self.viewport = (int(x), int(y), int(w), int(h))

    def GetViewRect(self):
        return self.viewport

    # -- render options (reference src/CKRenderContext.cpp:1405-1456) ------
    def SetCurrentRenderOptions(self, flags: int):
        self.render_flags = int(flags)

    def GetCurrentRenderOptions(self) -> int:
        return self.render_flags

    def AddCurrentRenderOptions(self, add: int):
        self.render_flags |= int(add)

    def RemoveCurrentRenderOptions(self, remove: int):
        self.render_flags &= ~int(remove)

    def ResolveRenderFlags(self, flags: int) -> int:
        """No option bits in the low 16 -> use the context's stored flags
        (reference ResolveRenderFlags, src/CKRenderContext.cpp:222-229)."""
        return self.render_flags if (flags & CK_RENDER_OPTIONSMASK) == 0 \
            else int(flags)

    def _effective_viewport(self):
        """Viewport after camera aspect-ratio letterboxing (reference
        CKRenderedScene::UpdateViewportSize, src/CKRenderedScene.cpp:538-618:
        CK_RENDER_USECAMERARATIO centers a camera-aspect rect in the window).
        Deviation: applies only when SetAspectRatio was called explicitly —
        the 4:3 ctor default tracks the window instead of letterboxing it."""
        vp = self.viewport
        cam = self.attached_camera
        flags = getattr(self, "_frame_flags", self.render_flags)
        if (cam is None or not (flags & CK_RENDER_USECAMERARATIO)
                or not getattr(cam, "_aspect_set", False)
                or getattr(cam, "ignore_aspect", False)):
            return vp
        x, y, w, h = vp
        cw, ch = cam.GetAspectRatio()
        cw, ch = max(int(cw), 1), max(int(ch), 1)
        if w * ch >= h * cw:              # window wider than camera: pillarbox
            vw, vh = cw * h // ch, h
        else:                             # window taller: letterbox
            vw, vh = w, ch * w // cw
        return (x + (w - vw) // 2, y + (h - vh) // 2, max(vw, 1), max(vh, 1))

    def GetWidth(self) -> int:
        return self.width

    def GetHeight(self) -> int:
        return self.height

    def Resize(self, width: int, height: int):
        self.width = int(width)
        self.height = int(height)
        self.viewport = (0, 0, self.width, self.height)
        self.fb = jnp.zeros((4, self.height, self.width), jnp.float32)
        self.zb = jnp.ones((self.height, self.width), jnp.float32)

    # -- scene compilation -------------------------------------------------
    def _scene_entities(self) -> list[CK3dEntity]:
        if self._objects is not None:
            ents = [o for o in self._objects if isinstance(o, CK3dEntity)]
        else:
            ents = [o for o in self.context._objects.values()
                    if isinstance(o, CK3dEntity)]
        # Scene-graph priority order (CKSceneGraphNode::SortNodes semantics:
        # higher priority renders first; ties keep creation order).
        ents.sort(key=lambda e: (-e.render_priority, e.id))
        return ents

    def _compile(self):
        c = CompiledScene()
        c.topology_version = self.context._topology_version
        ctx = self.context
        table = ctx.entity_table
        # New topology invalidates governed solve caps (scene scale changed).
        self._solve_caps = None
        self._gov_frames = 0
        self._chunk_cap = None

        entities = self._scene_entities()
        c.n_entities = table.count
        c.levels = table.level_schedule()

        # Material/state buckets: one per distinct material (+ default).
        # Sprite3D draws get their own bucket per material (cull forced off).
        default_mat = getattr(ctx.render_manager, "default_material", None)
        mat_to_bucket: dict[tuple, int] = {}
        tex_to_slot = c.tex_slot

        def tex_slot_for(tex) -> int:
            tkey = id(tex)
            if tkey not in tex_to_slot:
                tex_to_slot[tkey] = len(c.textures)
                c.textures.append(tex)
            return tex_to_slot[tkey]

        def bucket_for(mat: CKMaterial | None, kind: str = "mesh",
                       blends=None) -> int:
            key = (id(mat), kind, blends)
            if key in mat_to_bucket:
                return mat_to_bucket[key]
            if mat is not None and mat.GetTexture(0) is not None:
                tex_slot_for(mat.GetTexture(0))
            mat_to_bucket[key] = len(c.materials)
            c.materials.append((mat, kind, blends))
            return mat_to_bucket[key]

        pool_pos, pool_nrm, pool_uv, pool_col, pool_spec = [], [], [], [], []
        mesh_offset: dict[int, int] = {}
        pool_count = 0

        src, vent, vstate, vlit = [], [], [], []
        tidx, tstate = [], []
        iv = 0

        skin_descs = []
        for ent in entities:
            mesh = ent.GetCurrentMesh()
            if mesh is None or (mesh.GetFaceCount() == 0
                                and mesh.GetLineCount() == 0):
                continue
            # A custom render callback REPLACES the default mesh render
            # (reference RCKMesh::SetRenderCallBack): skip its triangles;
            # the callback fires after the frame program (immediate draws).
            if getattr(mesh, "render_callback", None) is not None:
                continue
            # Skinned entities get a private pool block (their pool vertices
            # are overwritten per-frame by the device skin stage).
            mesh_key = (id(mesh), ent.row if ent.skin is not None else -1)
            if mesh_key not in mesh_offset:
                mesh_offset[mesh_key] = pool_count
                c.pool_sources.append((mesh, -1))
                pool_pos.append(mesh.positions)
                pool_nrm.append(mesh.normals)
                pool_uv.append(mesh.uvs)
                pool_col.append(mesh.colors)
                pool_spec.append(mesh.specular_colors)
                if ent.skin is not None:
                    skin_descs.append(ent.skin.bank_descriptor(pool_count))
                pool_count += mesh.positions.shape[0]
            moff = mesh_offset[mesh_key]
            lit = not mesh.IsPreLitMode()
            # Z-only / stencil-only entities draw through dedicated buckets
            # (VX_MOVEABLE_ZBUFONLY / STENCILONLY, reference draw-flag
            # assembly src/CKMesh.cpp:3938-3974).
            eflags = int(table.flags[ent.row])
            draw_kind = "mesh"
            if eflags & et.VX_MOVEABLE_STENCILONLY:
                draw_kind = "stencil"
            elif eflags & et.VX_MOVEABLE_ZBUFONLY:
                draw_kind = "zbufonly"
            for grp in mesh.GetRenderGroups():
                mat = grp.material if grp.material is not None else default_mat
                # Wireframe fill mode draws the triangle edges through the
                # line pass (reference VXFILL_WIREFRAME / wireframe overlay,
                # src/CKMesh.cpp:4134-4153).
                from ..raster.types import VXFILL
                if mat is not None and mat.GetFillMode() == int(VXFILL.WIREFRAME):
                    nv = grp.vertex_map.shape[0]
                    base_iv = iv
                    src.append(moff + grp.vertex_map)
                    vent.append(np.full(nv, ent.row, np.int32))
                    vstate.append(np.zeros(nv, np.int32))
                    vlit.append(np.zeros(nv, bool))
                    col = tuple(np.asarray(mat.GetDiffuse()).tolist())
                    edges = set()
                    for (a, b_, cc) in grp.local_faces:
                        for e0, e1 in ((a, b_), (b_, cc), (cc, a)):
                            key = (min(e0, e1), max(e0, e1))
                            if key not in edges:
                                edges.add(key)
                                c.line_segments.append(dict(
                                    i0=base_iv + int(key[0]),
                                    i1=base_iv + int(key[1]), color=col))
                    iv += nv
                    continue
                b = bucket_for(mat, kind=draw_kind)
                nv = grp.vertex_map.shape[0]
                src.append(moff + grp.vertex_map)
                vent.append(np.full(nv, ent.row, np.int32))
                vstate.append(np.full(nv, b, np.int32))
                vlit.append(np.full(nv, lit, bool))
                gfaces = grp.local_faces
                if draw_kind == "mesh":
                    # Alpha-test pre-gate: faces whose conservative alpha
                    # upper bound provably fails the test never enter the
                    # stream (they cannot waste peel layer slots or solve
                    # work) — see _atest_prefail_mask.
                    drop = self._atest_prefail_mask(mat, mesh, grp)
                    if drop is not None and drop.any():
                        gfaces = gfaces[~drop]
                        c.atest_pregated += int(drop.sum())
                tidx.append(iv + gfaces)
                tstate.append(np.full(gfaces.shape[0], b, np.int32))
                iv += nv
                # Multi-texture effects synthesize blended passes re-drawing
                # the group over its base draw (BumpEnv/DP3/2-3Textures,
                # reference src/CKMaterial.cpp:1668-2060).
                if mat is None or draw_kind != "mesh":
                    continue
                for pi, pdesc in enumerate(self._effect_passes_for(mat)):
                    for s in (pdesc["slot"], pdesc["bump_slot"]):
                        if s >= 0 and mat.GetTexture(s) is not None:
                            tex_slot_for(mat.GetTexture(s))
                    if pdesc.get("bias_tex") is not None:
                        tex_slot_for(pdesc["bias_tex"])
                    # DP3 constants are per-entity (object-space light dir),
                    # so DP3 buckets split by entity row.
                    row = ent.row if pdesc["dp3"] else -1
                    key = (id(mat), "effectpass", pi, row)
                    if key not in mat_to_bucket:
                        mat_to_bucket[key] = len(c.materials)
                        c.materials.append(
                            (mat, "effectpass",
                             (pdesc, ent if pdesc["dp3"] else None)))
                    b2 = mat_to_bucket[key]
                    src.append(moff + grp.vertex_map)
                    vent.append(np.full(nv, ent.row, np.int32))
                    vstate.append(np.full(nv, b2, np.int32))
                    vlit.append(np.zeros(nv, bool))
                    tidx.append(iv + grp.local_faces)
                    tstate.append(np.full(grp.local_faces.shape[0], b2,
                                          np.int32))
                    iv += nv
            # Material channels: extra UV sets re-drawing the mesh triangles
            # blended over the base pass (RCKMesh::RenderChannels, reference
            # src/CKMesh.cpp:4390+; multi-pass path). Each channel gets a
            # private pool block carrying its own UVs.
            for ci, chan in enumerate(mesh.channels):
                if not chan["active"] or chan["material"] is None:
                    continue
                ckey = (id(mesh), f"chan{ci}",
                        ent.row if ent.skin is not None else -1)
                if ckey not in mesh_offset:
                    mesh_offset[ckey] = pool_count
                    c.pool_sources.append((mesh, ci))
                    pool_pos.append(mesh.positions)
                    pool_nrm.append(mesh.normals)
                    pool_uv.append(chan["uvs"])
                    pool_col.append(mesh.colors)
                    pool_spec.append(mesh.specular_colors)
                    pool_count += mesh.positions.shape[0]
                coff = mesh_offset[ckey]
                b = bucket_for(chan["material"], kind="channel",
                               blends=(chan["src_blend"], chan["dst_blend"]))
                nv = mesh.positions.shape[0]
                src.append(coff + np.arange(nv, dtype=np.int32))
                vent.append(np.full(nv, ent.row, np.int32))
                vstate.append(np.full(nv, b, np.int32))
                vlit.append(np.full(nv, lit, bool))
                tidx.append(iv + mesh.faces.astype(np.int32))
                tstate.append(np.full(mesh.faces.shape[0], b, np.int32))
                iv += nv
            # Mesh line list -> device line pass (RCKMesh line pass,
            # reference src/CKMesh.cpp:4168-4192). Endpoints get their own
            # stream block (full mesh vertex range).
            if mesh.GetLineCount() > 0:
                nv = mesh.positions.shape[0]
                lmat = mesh.GetMaterial(0) if mesh.GetMaterialCount() else None
                lcolor = (np.asarray(lmat.GetDiffuse(), np.float32)
                          if lmat is not None else None)
                src.append(moff + np.arange(nv, dtype=np.int32))
                vent.append(np.full(nv, ent.row, np.int32))
                vstate.append(np.zeros(nv, np.int32))
                vlit.append(np.zeros(nv, bool))
                for (a0, a1) in np.asarray(mesh.lines):
                    col = (lcolor if lcolor is not None
                           else mesh.colors[a0] if mesh.colors.shape[0] > a0
                           else (1, 1, 1, 1))
                    c.line_segments.append(
                        dict(i0=iv + int(a0), i1=iv + int(a1),
                             color=tuple(np.asarray(col).tolist())))
                iv += nv

        # Sprite3D billboards: 4 reserved pool rows + 2 triangles per sprite,
        # corners computed on device per frame (pipeline/overlay.py). The
        # stream verts bind to the identity entity row (= table.count).
        from .sprite3d import CKSprite3D

        ident_row = table.count
        for ent in entities:
            if not isinstance(ent, CKSprite3D):
                continue
            mat = ent.material if ent.material is not None else default_mat
            b = bucket_for(mat, kind="sprite")
            pool_base = pool_count
            c.sprite3d_list.append((ent, pool_base, b))
            u0, v0, u1, v1 = ent.uv_rect
            pool_pos.append(np.zeros((4, 3), np.float32))
            pool_nrm.append(np.zeros((4, 3), np.float32))
            pool_uv.append(np.array([[u0, v1], [u1, v1], [u1, v0], [u0, v0]],
                                    np.float32))
            diff = (mat.GetDiffuse() if mat is not None
                    else np.array([1, 1, 1, 1], np.float32))
            pool_col.append(np.tile(np.asarray(diff, np.float32), (4, 1)))
            pool_spec.append(np.zeros((4, 3), np.float32))
            pool_count += 4
            src.append(pool_base + np.arange(4, dtype=np.int32))
            vent.append(np.full(4, ident_row, np.int32))
            vstate.append(np.full(4, b, np.int32))
            vlit.append(np.zeros(4, bool))
            tidx.append(iv + np.array([[0, 1, 2], [0, 2, 3]], np.int32))
            tstate.append(np.full(2, b, np.int32))
            iv += 4
        c.extra_pool = 4 * len(c.sprite3d_list)

        # 2D overlay entities: register their textures in the shared stack.
        from .entity2d import CK2dEntity

        for obj in ctx._objects.values():
            if isinstance(obj, CK2dEntity):
                t = obj.texture()
                if t is not None and t.current_image() is not None:
                    tex_slot_for(t)
        # Background material texture (Clear draws it as a full-screen quad,
        # reference src/CKRenderContext.cpp:465-519).
        if (self.background_material is not None
                and self.background_material.GetTexture(0) is not None):
            tex_slot_for(self.background_material.GetTexture(0))

        if pool_count == 0:
            pool_pos = [np.zeros((1, 3), np.float32)]
            pool_nrm = [np.zeros((1, 3), np.float32)]
            pool_uv = [np.zeros((1, 2), np.float32)]
            pool_col = [np.ones((1, 4), np.float32)]
            pool_spec = [np.zeros((1, 3), np.float32)]
            pool_count = 1
        c.positions = np.concatenate(pool_pos).astype(np.float32)
        c.normals = np.concatenate(pool_nrm).astype(np.float32)
        c.uv = np.concatenate(pool_uv).astype(np.float32)
        c.prelit = np.concatenate(pool_col).astype(np.float32)
        c.prelit_spec = np.concatenate(pool_spec).astype(np.float32)
        c._mesh_pool_count = pool_count - c.extra_pool
        c._pool_version = sum(getattr(m, "data_version", 0)
                              for m, _ci in c.pool_sources)

        if not c.materials:
            bucket_for(default_mat)

        iv_pad = _pad_to(max(iv, 1))
        it = sum(a.shape[0] for a in tidx) if tidx else 0
        it_pad = _pad_to(max(it, 1))

        def cat_pad(parts, n, dtype, fill=0, shape=()):
            if parts:
                a = np.concatenate(parts).astype(dtype)
            else:
                a = np.zeros((0,) + shape, dtype)
            out = np.full((n,) + a.shape[1:], fill, dtype)
            out[: a.shape[0]] = a
            return out

        c.src_idx = cat_pad(src, iv_pad, np.int32)
        c.vert_entity = cat_pad(vent, iv_pad, np.int32)
        c.vert_state = cat_pad(vstate, iv_pad, np.int32)
        c.vert_lit = cat_pad(vlit, iv_pad, bool)
        # Static: does any REAL stream row use prelit colors? (pad rows are
        # "unlit" but belong to no valid triangle.) Gates the prelit pool
        # gathers out of the vertex stage via sampler_profile[7].
        c.any_prelit = bool(np.any(~np.concatenate(vlit))) if vlit else False
        c.tri_idx = cat_pad(tidx, it_pad, np.int32, shape=(3,))
        c.tri_state = cat_pad(tstate, it_pad, np.int32)
        valid = np.zeros(it_pad, bool)
        valid[:it] = True
        c.tri_valid = valid
        c.n_valid_tris = int(valid.sum())   # cached: stats read per frame

        # --- corner-major post-pass (device gather elimination) ------------
        # Triangles whose three stream vertices come from pool rows that no
        # DEVICE stage rewrites (skins, billboards) are re-pointed at a
        # corner-expanded static pool block appended to the pool: their
        # vertex data then streams DENSELY through the vertex stage and
        # triangle assembly becomes a reshape — removing the two ~3*IT-row
        # gathers that dominated the frame at Ballance scale (~32 ms).
        # Host-refreshed meshes (morphs, patch tessellation) stay eligible:
        # _refresh_pool re-expands the corner rows from corner_src_pool.
        # (Round-3 note: making skinned rows corner-eligible by extending
        # the skin bank to the expanded copies was tried and measured 4x
        # SLOWER — the duplicated bone table left take_small's <=128-row
        # one-hot envelope and the 3x skin stream outweighed the gathers it
        # removed. Skinned rows stay on the gathered tail.)
        written = np.zeros(pool_count, bool)
        for d in skin_descs:
            off = d["pool_offset"]
            written[off:off + d["rest_pos"].shape[0]] = True
        if c.extra_pool:
            written[pool_count - c.extra_pool:] = True
        if it:
            src_tri = c.src_idx[c.tri_idx[:it]]              # (it, 3)
            # Out-of-range stream/pool refs (inconsistent user meshes — the
            # device path clamps them) stay on the gathered tail.
            oob = (src_tri < 0) | (src_tri >= pool_count)
            hit = written[np.clip(src_tri, 0, pool_count - 1)] | oob
            eligible = ~hit.any(axis=1)
        else:
            eligible = np.zeros(0, bool)
        itc = int(eligible.sum())
        if itc:
            elig_idx = np.nonzero(eligible)[0]
            if itc >= 8192:
                # Spatial (Morton) sort of the corner block per entity: the
                # cache-optimizer reorder scrambles locality, which would
                # make every cull chunk span the whole mesh. Morton order
                # keeps each CH-triangle chunk spatially tight so host
                # frustum culling (chunk_meta below) can actually reject
                # chunks. Deferred-opaque output is order-independent up to
                # exact-depth ties; same-key transparent draws of one
                # entity may reorder (the reference leaves that order
                # undefined too — its own optimizers reorder faces).
                src_e = c.src_idx[c.tri_idx[elig_idx]]        # (itc, 3)
                cent = c.positions[src_e].mean(axis=1)        # (itc, 3)
                ent_e = c.vert_entity[c.tri_idx[elig_idx, 0]]
                lo = cent.min(0)
                # one COMMON scale for all axes: a near-flat axis (terrain
                # y) then maps to a constant instead of amplified noise
                # that would scramble the interleave
                span = max(float((cent.max(0) - lo).max()), 1e-6)
                q = np.clip((cent - lo) / span * 1023, 0,
                            1023).astype(np.uint32)

                def spread(v):
                    v = (v | (v << 16)) & 0x030000FF
                    v = (v | (v << 8)) & 0x0300F00F
                    v = (v | (v << 4)) & 0x030C30C3
                    v = (v | (v << 2)) & 0x09249249
                    return v
                morton = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
                          | (spread(q[:, 2]) << 2))
                elig_idx = elig_idx[np.lexsort((morton, ent_e))]
            order = np.concatenate([
                elig_idx, np.nonzero(~eligible)[0],
                np.arange(it, it_pad)])
            c.tri_state = c.tri_state[order]
            c.tri_valid = c.tri_valid[order]
            tri_idx = c.tri_idx[order]
            nc = 3 * itc
            # PLANAR corner order: stream rows [0,itc) are corner 0 of every
            # eligible triangle, [itc,2*itc) corner 1, [2*itc,3*itc) corner 2.
            # Per-corner vertex data is then a contiguous 2D SLICE of the
            # stream — rank-3 (IT,3,C) corner arrays never materialize on
            # device (their trailing (3,C) dims pad to native (8,128) tiles,
            # a 16x traffic blow-up measured at ~12 ms/frame at 527k tris).
            corner_src = c.src_idx[tri_idx[:itc]].T.reshape(-1)
            c.corner_src_pool = corner_src.astype(np.int32)
            p0 = c.positions.shape[0]
            for attr in ("positions", "normals", "uv", "prelit",
                         "prelit_spec"):
                a = getattr(c, attr)
                setattr(c, attr, np.concatenate([a, a[corner_src]]))
            corner_iv = tri_idx[:itc].T.reshape(-1)          # old stream rows
            # Trim the old stream to rows something still references (tail
            # triangle corners, line endpoints) — every per-vertex op runs
            # over the whole stream, so dead rows are pure vertex-stage cost.
            used = np.zeros(iv_pad, bool)
            if itc < it:
                used[tri_idx[itc:it].reshape(-1)] = True
            for seg in c.line_segments:
                used[seg["i0"]] = True
                used[seg["i1"]] = True
            remap = np.full(iv_pad, -1, np.int32)
            n_used = int(used.sum())
            remap[used] = np.arange(n_used, dtype=np.int32)
            new_iv_pad = _pad_to(max(nc + n_used, 1))

            def restream(a, corner_vals):
                out = np.zeros((new_iv_pad,) + a.shape[1:], a.dtype)
                out[:nc] = corner_vals
                out[nc:nc + n_used] = a[used]
                return out

            c.src_idx = restream(
                c.src_idx, (p0 + np.arange(nc)).astype(np.int32))
            c.vert_entity = restream(c.vert_entity, c.vert_entity[corner_iv])
            c.vert_state = restream(c.vert_state, c.vert_state[corner_iv])
            c.vert_lit = restream(c.vert_lit, c.vert_lit[corner_iv])
            tri_new = np.where(tri_idx >= 0, nc + remap[tri_idx], 0)
            ar = np.arange(itc, dtype=np.int32)
            tri_new[:itc] = np.stack([ar, itc + ar, 2 * itc + ar], axis=1)
            tri_new[it:] = 0                       # pad tris: dead anyway
            c.tri_idx = tri_new.astype(np.int32)
            for seg in c.line_segments:
                seg["i0"] = nc + int(remap[seg["i0"]])
                seg["i1"] = nc + int(remap[seg["i1"]])
            c.corner_nc = nc
            c.corner_itc = itc
            c.corner_p0 = p0

        # --- chunk-cull metadata (host frustum culling at stream-chunk
        # granularity) -------------------------------------------------------
        # The TPU mapping of the reference's scene-graph culling
        # (CKSceneGraphNode::ComputeHierarchicalBox + IsInViewFrustrumHierarchic,
        # /root/reference/src/CKSceneGraph.cpp:849-888, CK3dEntity.cpp:3297):
        # the corner-major head splits into CH-triangle chunks; the HOST
        # tests each chunk's conservative world bbox against the frustum
        # every frame (numpy, ~100 parts) and ships the surviving chunk
        # list; the device compacts the stream to the static chunk cap by
        # chunk-axis takes (contiguous blocks - bandwidth, not per-row
        # gather cost). Culling only ever REMOVES fully-offscreen chunks,
        # so output is bit-identical; the cap bumps (recompile) BEFORE
        # dispatch whenever more chunks survive, so no frame ever drops
        # visible geometry.
        CH = 4096
        c.chunk_meta = None
        if itc >= 2 * CH:
            c.chunk_meta = {
                "ch": CH, "n_full": itc // CH, "itc": itc,
                "parts": None, "pool_version": None,
            }

        # Static ordered-path cap: triangles of materials that cannot take the
        # deferred opaque reduce (mirror of raster/deferred.deferred_mask).
        from ..raster.types import VXCMP

        def needs_ordered(mat: CKMaterial | None) -> bool:
            if mat is None:
                return False
            return (mat.AlphaBlendEnabled() or mat.AlphaTestEnabled()
                    or not mat.ZWriteEnabled()
                    or mat.z_func not in (int(VXCMP.LESS), int(VXCMP.LESSEQUAL)))

        ordered_buckets = {i for i, (m, kind, _b) in enumerate(c.materials)
                           if kind in ("channel", "effectpass")
                           or needs_ordered(m)}
        if ordered_buckets and it:
            n_ordered = int(np.isin(c.tri_state[:it], list(ordered_buckets)).sum())
        else:
            n_ordered = 0
        # User clip planes no longer inflate this: straddlers take the
        # per-pixel half-space test inside the deferred reduce
        # (raster/deferred.triangle_setup dplane), not the ordered pass.
        c.ordered_cap = 0 if n_ordered == 0 else _pad_to(n_ordered, 64)

        c.has_stencil = any(kind == "stencil" for _m, kind, _b in c.materials)
        # Static gate for the vertex-stage EMBM fetch (BumpEnv effect).
        c.want_bump = any(
            kind == "effectpass" and b[0]["bump_slot"] >= 0
            for _m, kind, b in c.materials)
        # Static gate for the per-pixel cube-env reflection path.
        from ..raster.types import TEXGEN_CUBE

        def _tg(m, kind, b):
            if kind == "effectpass":
                return b[0]["texgen"]
            return m._effect_texgen() if m is not None else 0
        c.want_cube = any(_tg(m, kind, b) == TEXGEN_CUBE
                          for m, kind, b in c.materials)
        # Static gate for the whole vertex-stage TexGen/reflection block.
        c.want_texgen = any(_tg(m, kind, b) != 0 for m, kind, b in c.materials)

        from ..pipeline.skinning import build_skin_bank
        c.skin_bank = build_skin_bank(skin_descs)
        # Static contiguity metadata: every skin's pool rows are
        # pool_offset + arange(v) (anim/skin.py bank_descriptor), so the
        # device skin write is a dense dynamic_update_slice per skin
        # instead of a ~8 ns/element row scatter (see apply_skin).
        ranges = []
        vo = 0
        for s in skin_descs:
            v = int(s["rest_pos"].shape[0])
            ranges.append((vo, int(s["pool_offset"]), v))
            vo += v
        c.skin_ranges = tuple(ranges)
        from ..pipeline.lines import build_line_bank
        c.line_bank = build_line_bank(c.line_segments)
        self._compiled = c

        self._refresh_textures(force=True)

    def _refresh_textures(self, force: bool = False):
        """(Re)build the padded texture-plane stack; per-frame same-shape
        image updates (video textures, re-rastered sprite text) re-upload
        without recompiling."""
        c = self._compiled
        v = sum(getattr(t, "data_version", 0) for t in c.textures)
        if not force and v == c._tex_version:
            return
        # Incremental path: when only a few textures changed and their
        # shapes are stable (video textures stepping movie slots, sprite
        # text re-rasters), update just their atlas sub-rects on device
        # (.at[].set — a small transfer) instead of rebuilding + re-
        # uploading the whole stack every frame.
        meta = getattr(c, "_tex_meta", None)
        if not force and meta is not None and c.textures:
            vers = [getattr(t, "data_version", 0) for t in c.textures]
            changed = [i for i, (a, b) in
                       enumerate(zip(vers, meta["versions"])) if a != b]
            if changed and len(changed) <= 8:
                ok = True
                for i in changed:
                    shp = c.textures[i].image_shape()
                    rec = meta["rects"][i]
                    if shp is None or shp[:2] != (rec[3], rec[4]):
                        ok = False
                        break
                if ok:
                    # Device-resident images (render-to-texture feeds)
                    # scatter straight into the stack: device-to-device,
                    # no transfers, no video registration needed.
                    dev_changed = [i for i in changed
                                   if c.textures[i].device_image() is not None]
                    if dev_changed:
                        # Device-resident feeds register once; their CURRENT
                        # image is passed as a per-frame arg into the frame
                        # program and scattered THERE (folding avoids ~40 ms
                        # of dependent-executable launch latency under the
                        # tunnel; see pipeline/frame._apply_tex_patch).
                        devs = getattr(c, "dev_ids", set())
                        c.dev_ids = devs | set(dev_changed)
                        for i in dev_changed:
                            meta["versions"][i] = vers[i]
                        changed = [i for i in changed
                                   if i not in dev_changed]
                        if not changed:
                            c._tex_version = v
                            return
                    # Register per-frame updaters as VIDEO textures: their
                    # texels ride the packed dyn buffer from now on (one
                    # transfer pair per frame, scattered on device) — the
                    # .at[].set below is only the bridge for THIS frame.
                    vids = getattr(c, "video_ids", set())
                    new_vids = [i for i in changed if i not in vids]
                    if new_vids:
                        c.video_ids = vids | set(new_vids)
                        self._layout_sig = None     # grow the patch segment
                    already = [i for i in changed if i in vids]
                    for i in already:
                        meta["versions"][i] = vers[i]
                    changed = new_vids
                    if not changed:
                        c._tex_version = v
                        return
                    planes = self._tex_planes
                    for i in changed:
                        t = c.textures[i]
                        pi, oy, ox, h, w, mip_col, levels = meta["rects"][i]
                        img = np.asarray(t.current_image(), np.float32)
                        planes = planes.at[pi, :, oy:oy + h, ox:ox + w].set(
                            jnp.asarray(np.moveaxis(img, -1, 0),
                                        planes.dtype))
                        for lv, nh, nw, y_off, cur in _mip_chain(
                                img, t, levels):
                            planes = planes.at[
                                pi, :, oy + y_off:oy + y_off + nh,
                                ox + mip_col:ox + mip_col + nw].set(
                                jnp.asarray(np.moveaxis(cur, -1, 0),
                                            planes.dtype))
                        meta["versions"][i] = vers[i]
                    self._tex_planes = planes
                    c._tex_version = v
                    return
        c._tex_version = v
        rm = self.context.render_manager
        mips_off = bool(int(rm.options.get("DisableMipmap", 0))) \
            if rm is not None else False
        if c.textures:
            imgs = [t.current_image() for t in c.textures]
            imgs = [i if i is not None else np.zeros((1, 1, 4), np.float32) for i in imgs]
            th = max(i.shape[0] for i in imgs)
            tw = max(i.shape[1] for i in imgs)
            want_mips = (not mips_off) and any(
                t.mipmap and t.current_image() is not None
                and min(t.current_image().shape[:2]) >= 2 for t in c.textures)
            # Mixed-size texture sets: the per-texture-plane layout pads
            # every texture to the max size. When that wastes >1.5x the
            # actual texel area, shelf-pack the per-texture blocks (base +
            # its mip column) into ONE atlas plane instead; tex_hw grows
            # (off_y, off_x) columns that the samplers apply per texel.
            blocks_w = [i.shape[1] + (i.shape[1] // 2 if want_mips else 0)
                        for i in imgs]
            pad_area = len(imgs) * th * (tw + (tw // 2 if want_mips else 0))
            used_area = sum(i.shape[0] * bw
                            for i, bw in zip(imgs, blocks_w))
            use_atlas = (getattr(self, "_atlas_enabled", True)
                         and len(imgs) > 1 and pad_area > 1.5 * used_area)
            if use_atlas:
                atlas_w_pack = max(128, max(blocks_w))
                order = sorted(range(len(imgs)),
                               key=lambda i: -imgs[i].shape[0])
                offs = [None] * len(imgs)
                shelf_y = 0
                cur_x, cur_y, shelf_h = 0, 0, 0
                for i in order:
                    bh, bw = imgs[i].shape[0], blocks_w[i]
                    if cur_x + bw > atlas_w_pack:
                        cur_y += shelf_h
                        cur_x, shelf_h = 0, 0
                    offs[i] = (cur_y, cur_x)
                    cur_x += bw
                    shelf_h = max(shelf_h, bh)
                atlas_h = cur_y + shelf_h
                planes = np.zeros((1, 4, atlas_h, atlas_w_pack), np.float32)
                hw = np.zeros((len(imgs), 5 if want_mips else 4), np.int32)
            else:
                atlas_w = tw + (tw // 2 if want_mips else 0)
                planes = np.zeros((len(imgs), 4, th, atlas_w), np.float32)
                # 3 columns (h, w, n_levels) statically signals a mip atlas.
                hw = np.zeros((len(imgs), 3 if want_mips else 2), np.int32)
            rects = []
            for i, (t, img) in enumerate(zip(c.textures, imgs)):
                h, w = img.shape[0], img.shape[1]
                if use_atlas:
                    oy, ox = offs[i]
                    pi = 0
                else:
                    oy, ox = 0, 0
                    pi = i
                planes[pi, :, oy:oy + h, ox:ox + w] = np.moveaxis(img, -1, 0)
                levels = 1
                if want_mips and t.mipmap and min(h, w) >= 2:
                    # Mip atlas: level L at cols [tw, tw + w>>L), rows
                    # [h - (h >> (L-1)), ...). Box-filtered chain (or user
                    # mip levels when provided, reference user mips).
                    cur = img
                    lh, lw = h, w
                    mip_col = w if use_atlas else tw
                    while min(lh, lw) >= 2:
                        user = (t.user_mip_levels[levels - 1]
                                if len(t.user_mip_levels) >= levels else None)
                        nh, nw = max(lh // 2, 1), max(lw // 2, 1)
                        if user is not None and user.shape[:2] == (nh, nw):
                            cur = np.asarray(user, np.float32)
                        else:
                            cur = cur[: nh * 2, : nw * 2].reshape(
                                nh, 2, nw, 2, 4).mean(axis=(1, 3))
                        y_off = 0 if levels == 1 else h - (h >> (levels - 1))
                        planes[pi, :, oy + y_off:oy + y_off + nh,
                               ox + mip_col:ox + mip_col + nw] = \
                            np.moveaxis(cur, -1, 0)
                        lh, lw = nh, nw
                        levels += 1
                if use_atlas:
                    hw[i] = ((h, w, levels, oy, ox) if want_mips
                             else (h, w, oy, ox))
                else:
                    hw[i] = (h, w, levels) if want_mips else (h, w)
                rects.append((pi, oy, ox, h, w,
                              (w if use_atlas else tw) if want_mips else 0,
                              levels))
            # 16-bit texture video formats (reference TextureVideoFormat
            # option / per-texture SetDesiredVideoFormat: _16_RGB565 etc.)
            # store the device stack in bfloat16 — half the texture HBM and
            # gather bandwidth, with quantization comparable to 16-bit
            # hardware formats. 32-bit formats keep float32.
            fmt = str((rm.options.get("TextureVideoFormat", "")
                       if rm is not None else "") or "")
            per_tex_16 = c.textures and all(
                "_16" in str(t.desired_video_format or "")
                or "16_" in str(t.desired_video_format or "")
                for t in c.textures)
            use_16 = "_16" in fmt or fmt.startswith("16") or per_tex_16
            dtype = jnp.bfloat16 if use_16 else jnp.float32
            self._tex_planes = jnp.asarray(planes, dtype)
            self._tex_hw = jnp.asarray(hw)
            self._bake_tex_quads(c, planes, rects, dtype)
            c._tex_meta = {
                "versions": [getattr(t, "data_version", 0)
                             for t in c.textures],
                "rects": rects,
            }
        else:
            self._tex_planes = jnp.zeros((1, 4, 1, 1), jnp.float32)
            self._tex_hw = jnp.ones((1, 2), jnp.int32)
            c._tex_meta = None
            self._tex_quad = None
            c._quad_ok = False


    def _bake_tex_quads(self, c, planes, rects, dtype):
        """Quad-texel table for one-gather bilinear sampling: each (y, x)
        row holds the 2x2 block [c00, c10, c01, c11] with the +1 neighbors
        baked per the texture's addressing mode (wrap rolls inside the
        texture's own level region; clamp/border resolve to the edge texel
        for the +1 neighbor — see raster/deferred's quad path). Disabled
        (quad_ok False) when a texture is used with conflicting wrap-vs-
        clamp modes, with MIRROR/MIRRORONCE, or the stack is too large."""
        from ..raster.types import VXTEXTURE_ADDRESS as _TA

        if planes.size * 16 > 512 * 1024 * 1024:       # quad table > 512 MB
            self._tex_quad = None
            c._quad_ok = False
            return
        slot_modes: dict[int, set] = {}
        for mat, _kind, _b in c.materials:
            if mat is None:
                continue
            am = int(mat.texture_address_mode)
            for s in range(4):
                t = mat.GetTexture(s)
                if t is not None and id(t) in c.tex_slot:
                    slot_modes.setdefault(c.tex_slot[id(t)], set()).add(am)
        wrap_like = {int(_TA.WRAP)}
        # MIRROR is NOT clamp-like for the +1 neighbor: in odd periods the
        # adjacent tap is x-1, so a single baked neighbor cannot serve it.
        clampish = {int(_TA.CLAMP), int(_TA.BORDER)}
        quad = np.zeros(planes.shape[:1] + planes.shape[2:] + (16,),
                        np.float32)                    # (NP, TH, TAW, 16)
        for i, (pi, oy, ox, h, w, mip_col, levels) in enumerate(rects):
            ms = slot_modes.get(i, set())
            if not ms or ms <= clampish:
                wrap = False
            elif ms <= wrap_like:
                wrap = True
            else:
                self._tex_quad = None
                c._quad_ok = False
                return
            regions = [(oy, ox, h, w)]
            lh, lw = h, w
            for lv in range(1, levels):
                nh, nw = max(lh // 2, 1), max(lw // 2, 1)
                y_off = 0 if lv == 1 else h - (h >> (lv - 1))
                regions.append((oy + y_off, ox + mip_col, nh, nw))
                lh, lw = nh, nw
            for (ry, rx, rh, rw) in regions:
                sub = planes[pi, :, ry:ry + rh, rx:rx + rw]   # (4, rh, rw)
                if wrap:
                    xp = np.roll(sub, -1, axis=2)
                    yp = np.roll(sub, -1, axis=1)
                    xyp = np.roll(xp, -1, axis=1)
                else:
                    xp = np.concatenate([sub[:, :, 1:], sub[:, :, -1:]], 2)
                    yp = np.concatenate([sub[:, 1:, :], sub[:, -1:, :]], 1)
                    xyp = np.concatenate([xp[:, 1:, :], xp[:, -1:, :]], 1)
                blk = np.concatenate([sub, xp, yp, xyp], axis=0)  # (16,..)
                quad[pi, ry:ry + rh, rx:rx + rw, :] = np.moveaxis(blk, 0, -1)
        self._tex_quad = jnp.asarray(quad.reshape(-1, 16), dtype)
        c._quad_ok = True

    # -- per-frame dynamic state -----------------------------------------
    def _light_rows_np(self) -> dict:
        """Numpy light bank (padded to 8; packed per frame).

        Cached on (topology, appearance, per-light world matrices): light
        parameter setters bump the appearance version and transforms are in
        the key bytes, so static-light scenes skip the per-frame rebuild
        (~0.1 ms host at 2 lights) while moving/retargeted lights refresh."""
        lights = list(self.context._lights.values())
        key_parts = []
        for l in lights:
            prep = getattr(l, "prepare", None)
            if prep is not None:
                prep()
            key_parts.append((l.id, l.GetWorldMatrix().tobytes()))
        ctx = self.context
        key = (ctx._topology_version, ctx._appearance_version,
               tuple(key_parts))
        cached = getattr(self, "_light_rows_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        rows = []
        for l in lights:
            row = l.setup_row()
            if row is not None:
                rows.append(row)
        n = _pad_to(max(len(rows), 1), 8)
        arrs = dict(
            type=np.ones(n, np.int32),
            diffuse=np.zeros((n, 4), np.float32),
            specular=np.zeros((n, 4), np.float32),
            ambient=np.zeros((n, 4), np.float32),
            position=np.zeros((n, 3), np.float32),
            direction=np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1)),
            range=np.full(n, 1e8, np.float32),
            falloff=np.ones(n, np.float32),
            attenuation=np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1)),
            cos_theta=np.ones(n, np.float32),
            cos_phi=np.zeros(n, np.float32),
            active=np.zeros(n, bool),
        )
        for i, row in enumerate(rows):
            for k, v in row.items():
                arrs[k][i] = v
            arrs["active"][i] = row["active"]
        self._light_rows_cache = (key, arrs)
        return arrs

    def _light_bank(self) -> LightArray:
        arrs = self._light_rows_np()
        return LightArray(**{k: jnp.asarray(v) for k, v in arrs.items()})

    def _material_banks(self, c: CompiledScene):
        from ..raster.types import VXCULL, VXTEXTURE_FILTER

        # Cache: the lowering only depends on scene topology + material/
        # light PARAMETERS (appearance version) + options — not on entity
        # motion. Materials with callbacks disable the cache (the callback
        # fires at lowering time each frame, reference SetAsCurrent hook).
        rm_ = self.context.render_manager
        key = (id(c), c.topology_version,
               self.context._appearance_version,
               self._global_render_mode,
               tuple(sorted(rm_.options.items())) if rm_ is not None else (),
               self.fog_mode)
        cached = getattr(self, "_matbank_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]

        # Global render options that rewrite packed state
        # (ApplyRenderOptionChange, reference src/CKRenderManager.cpp:639+).
        rm = self.context.render_manager
        opts = rm.options if rm is not None else {}
        disable_filter = bool(int(opts.get("DisableFilter", 0)))
        disable_persp = bool(int(opts.get("DisablePerspectiveCorrection", 0)))
        disable_specular = bool(int(opts.get("DisableSpecular", 0)))

        states = []
        diffuse, ambient, specular, emissive, power = [], [], [], [], []
        fog_on = self.fog_mode != int(VXFOG.NONE)
        for mat, kind, blends in c.materials:
            # Material callbacks fire when the material is lowered for the
            # frame (the SetAsCurrent hook, reference src/CKMaterial.cpp
            # material callback).
            if mat is not None and mat.callback is not None:
                fct, arg = mat.callback
                fct(self, mat, arg)
            is_sprite = kind == "sprite"
            if mat is None:
                st = RasterState(fog=fog_on)
                diffuse.append([0.7, 0.7, 0.7, 1.0])
                ambient.append([0.3, 0.3, 0.3, 1.0])
                specular.append([0.5, 0.5, 0.5, 1.0])
                emissive.append([0.0, 0.0, 0.0, 1.0])
                power.append(0.0)
            else:
                slot = c.tex_slot.get(id(mat.GetTexture(0)), -1)
                st = mat.raster_state(texture_slot=slot, fog=fog_on)
                lp = mat.lighting_params()
                diffuse.append(lp["diffuse"])
                ambient.append(lp["ambient"])
                specular.append(lp["specular"])
                emissive.append(lp["emissive"])
                power.append(lp["power"])
            import dataclasses
            repl = {}
            if is_sprite:
                repl["cull"] = int(VXCULL.NONE)
            if kind == "zbufonly":
                repl["color_write"] = False
            if kind == "stencil":
                repl["color_write"] = False
                repl["z_write"] = False
                repl["stencil"] = True
            if kind == "channel":
                # Channel passes blend over the base geometry and never
                # write Z (reference RenderChannels draw flags).
                from ..raster.types import VXBLEND
                repl["alpha_blend"] = True
                repl["z_write"] = False
                src_b = blends[0] if blends and blends[0] is not None \
                    else int(VXBLEND.SRCALPHA)
                dst_b = blends[1] if blends and blends[1] is not None \
                    else int(VXBLEND.INVSRCALPHA)
                repl["src_blend"] = src_b
                repl["dst_blend"] = dst_b
            if kind == "effectpass":
                # Synthesized multi-texture effect pass (BumpEnv/DP3/2-3TEX,
                # reference src/CKMaterial.cpp:1668-2060): blends over the
                # base draw; COPY/DOT3 stage math ignores vertex lighting
                # (the reference stages chain off ARG2=CURRENT/TFACTOR).
                pdesc, pent = blends
                if pdesc.get("bias_tex") is not None:
                    repl["tex"] = c.tex_slot.get(id(pdesc["bias_tex"]), -1)
                elif pdesc["slot"] >= 0:
                    repl["tex"] = c.tex_slot.get(
                        id(mat.GetTexture(pdesc["slot"])), -1)
                else:
                    repl["tex"] = -1
                repl["texgen"] = pdesc["texgen"]
                repl["alpha_blend"] = True
                repl["z_write"] = False
                repl["src_blend"] = pdesc["src_blend"]
                repl["dst_blend"] = pdesc["dst_blend"]
                repl["blend_op"] = pdesc.get("blend_op", 1)
                repl["tex_blend"] = pdesc["tex_blend"]
                if pdesc["bump_slot"] >= 0:
                    bt = mat.GetTexture(pdesc["bump_slot"])
                    repl["tex2"] = c.tex_slot.get(id(bt), -1)
                    repl["bump_scale"] = pdesc["bump_scale"]
                if pdesc["dp3"]:
                    repl["const_color"] = self._dp3_const(pdesc, pent)
            if disable_filter:
                repl["tex_filter"] = int(VXTEXTURE_FILTER.NEAREST)
            if disable_persp:
                repl["perspective"] = False
            if not self._global_render_mode[1]:
                # SetGlobalRenderMode(texture=False) kills all texturing
                # (reference SetGlobalRenderMode).
                repl["tex"] = -1
                repl["tex2"] = -1
            if repl:
                st = dataclasses.replace(st, **repl)
            states.append(st)
        if disable_specular:
            specular = [[0.0, 0.0, 0.0, 1.0]] * len(specular)
        si, sf = pack_states(states)
        out = (si, sf,
               np.asarray(diffuse, np.float32),
               np.asarray(ambient, np.float32),
               np.asarray(specular, np.float32),
               np.asarray(emissive, np.float32),
               np.asarray(power, np.float32))
        cacheable = not any(
            (m is not None and m.callback is not None)
            # DP3 const_color tracks a moving light/entity pair per frame
            or (k == "effectpass" and b[0].get("dp3"))
            for m, k, b in c.materials)
        if cacheable:
            self._matbank_cache = (key, out)
        return out

    def _effect_passes_for(self, mat) -> list:
        """Built-in effect passes, else the registered custom effect's
        set_callback (reference GetEffectDescription default branch,
        src/CKMaterial.cpp:1352-1360)."""
        passes = mat.effect_passes()
        if passes:
            return passes
        eff = mat.GetEffect()
        rm = self.context.render_manager
        if rm is not None and 0 <= eff < len(rm.effects):
            desc = rm.effects[eff]
            if desc.set_callback is not None:
                return desc.set_callback(self, mat, 0,
                                         desc.callback_arg) or []
        return []

    def _dp3_const(self, pdesc, ent) -> tuple:
        """Object-space light direction encoded as the per-draw constant
        color (reference DP3Effect, src/CKMaterial.cpp:1838-1886: light z
        axis for directional / obj-light vector otherwise, transformed to
        object space, y/z swapped+negated, mapped [-1,1] -> [0,1])."""
        light = pdesc.get("ref_entity")
        if light is None:
            for obj in self.context._objects.values():
                if isinstance(obj, CKLight) and obj.GetActivity():
                    light = obj
                    break
        d = np.array([0.0, 0.0, 1.0], np.float32)
        if light is not None:
            lw = light.GetWorldMatrix()
            if isinstance(light, CKLight) and light.GetType() == 3:  # DIREC
                d = lw[2, :3].astype(np.float32)
            else:
                ow = ent.GetWorldMatrix() if ent is not None \
                    else np.eye(4, dtype=np.float32)
                d = (ow[3, :3] - lw[3, :3]).astype(np.float32)
        if ent is not None:
            inv = ent.GetInverseWorldMatrix()
            d = d @ inv[:3, :3]
        d = np.array([d[0], -d[2], -d[1]], np.float32)   # swap y/z, negate
        n = np.linalg.norm(d)
        d = d / n if n > 1e-9 else np.array([0, 0, 1], np.float32)
        return tuple((d * 0.5 + 0.5).tolist())

    def _refresh_pool(self, c: CompiledScene):
        """Re-gather vertex-pool arrays when any source mesh's data changed
        since compile (morph targets, billboards, geomorph LOD) — dynamic
        updates re-upload arrays without recompiling the frame program."""
        if not c.pool_sources:
            return
        v = sum(getattr(m, "data_version", 0) for m, _ci in c.pool_sources)
        if v == c._pool_version:
            return
        mc = c._mesh_pool_count

        def regather(attr, old, chan_key=None):
            parts = []
            for m, ci in c.pool_sources:
                if chan_key is not None and ci >= 0:
                    parts.append(m.channels[ci][chan_key])
                else:
                    parts.append(getattr(m, attr))
            # static billboard tail, then the corner-expanded block rebuilt
            # from the refreshed base rows (corner-major post-pass)
            parts.append(old[mc:mc + c.extra_pool])
            base = np.concatenate(parts).astype(np.float32)
            if c.corner_nc:
                base = np.concatenate([base, base[c.corner_src_pool]])
            return base

        c.positions = regather("positions", c.positions)
        c.normals = regather("normals", c.normals)
        c.uv = regather("uvs", c.uv, chan_key="uvs")
        c.prelit = regather("colors", c.prelit)
        c.prelit_spec = regather("specular_colors", c.prelit_spec)
        c._pool_version = v

    def _build_scene_device(self) -> fr.SceneDevice:
        ctx = self.context
        table = ctx.entity_table
        c = self._compiled
        self._refresh_pool(c)
        n = max(table.count, 1)

        view, proj, cam_pos = self._camera_np()

        si, sf, md, ma, ms, me, mp = self._material_banks(c)
        visible = (table.flags[:n] & et.VX_MOVEABLE_VISIBLE) != 0

        # Per-entity scissor rects: CKPlace viewport clips apply to their
        # hierarchies (reference src/CKSceneGraph.cpp:113-128).
        big = 1.0e9
        entity_clip = np.tile(np.array([-big, -big, big, big], np.float32),
                              (n, 1))
        from .place import CKPlace
        for obj in ctx._objects.values():
            if isinstance(obj, CKPlace) and obj.clip_rect is not None:
                rect = np.asarray(obj.clip_rect, np.float32)
                for d in obj.descendants():
                    if d.row < n:
                        entity_clip[d.row] = rect

        # Cached device uploads: the stream topology is static per compile,
        # the vertex pool per pool-version (morphs/billboard rows), so these
        # jnp.asarray transfers happen once, not per frame.
        if c._dev_static is None:
            c._dev_static = dict(
                src_idx=jnp.asarray(c.src_idx),
                vert_entity=jnp.asarray(c.vert_entity),
                vert_state=jnp.asarray(c.vert_state),
                vert_lit=jnp.asarray(c.vert_lit),
                tri_idx=jnp.asarray(c.tri_idx),
                tri_state=jnp.asarray(c.tri_state),
                tri_valid=jnp.asarray(c.tri_valid),
            )
        if c._dev_pool_version != c._pool_version:
            c._dev_pool = dict(
                positions=jnp.asarray(c.positions),
                normals=jnp.asarray(c.normals),
                uv=jnp.asarray(c.uv),
                prelit=jnp.asarray(c.prelit),
                prelit_spec=jnp.asarray(c.prelit_spec),
            )
            c._dev_pool_version = c._pool_version

        # Dynamic leaves stay NUMPY: jit converts them in one bulk transfer
        # per call, and batched paths (ProcessBatched) can np.stack them
        # host-side before a single upload per field. Static leaves (pools,
        # streams, textures) are cached device arrays.
        lights_np = self._light_rows_np()
        lights = LightArray(**lights_np)
        return fr.SceneDevice(
            local=table.local[:n].copy(),
            parent=jnp.asarray(table.parent[:n]),
            entity_visible=visible,
            entity_clip=entity_clip,
            entity_priority=self._entity_priority_np(n),
            **c._dev_pool,
            **c._dev_static,
            state_i=si, state_f=sf,
            mat_diffuse=md, mat_ambient=ma, mat_specular=ms, mat_emissive=me,
            mat_power=mp,
            lights=lights,
            global_ambient=np.asarray(self.ambient_light, np.float32),
            view=np.asarray(view, np.float32),
            proj=np.asarray(proj, np.float32),
            cam_pos=np.asarray(cam_pos, np.float32),
            viewport=np.asarray(self._effective_viewport(), np.float32),
            fog_mode=np.int32(self._effective_fog_mode()),
            fog_proj=np.int32(self._effective_fog_proj()),
            fog_start=np.float32(self.fog_start),
            fog_end=np.float32(self.fog_end),
            fog_density=np.float32(self.fog_density),
            fog_color=np.asarray(self.fog_color, np.float32),
            tex_planes=self._tex_planes,
            tex_hw=self._tex_hw,
            tex_quad=getattr(self, "_tex_quad", None),
            clear_color=np.asarray(self.background_color, np.float32),
            clear_z=np.float32(self.clear_z),
            clip_planes=(lambda p: p if p.shape[0] else None)(
                self._active_clip_planes()),
        )

    # -- per-frame overlay/billboard banks ---------------------------------
    def _sprite3d_bank(self):
        """Sprite3DBank rebuilt per frame (sizes/offsets/modes are dynamic;
        counts/pool layout are static per compile)."""
        from ..pipeline.overlay import Sprite3DBank

        c = self._compiled
        if not c.sprite3d_list:
            return None
        s = len(c.sprite3d_list)
        row = np.zeros(s, np.int32)
        size = np.zeros((s, 2), np.float32)
        off = np.zeros((s, 2), np.float32)
        mode = np.zeros(s, np.int32)
        base = np.zeros(s, np.int32)
        for i, (ent, pool_base, _b) in enumerate(c.sprite3d_list):
            row[i] = ent.row
            size[i] = ent.size2d
            off[i] = ent.offset
            mode[i] = ent.mode
            base[i] = pool_base
        return Sprite3DBank(
            entity_row=jnp.asarray(row), size=jnp.asarray(size),
            offset=jnp.asarray(off), mode=jnp.asarray(mode),
            pool_base=jnp.asarray(base),
            valid=jnp.ones(s, bool))

    def _quad_lists(self):
        """(background, foreground) quad-descriptor lists from the 2D entity
        trees (CKRenderedScene::Draw 2D passes, reference :166-179, :314-327)."""
        from .entity2d import CK2dEntity

        c = self._compiled
        vw, vh = self.width, self.height
        roots = [o for o in self.context._objects.values()
                 if isinstance(o, CK2dEntity) and o.GetParent() is None]
        back, fore = [], []
        for r in sorted(roots, key=lambda e: e.zorder):
            (back if r.IsBackground() else fore).append(r)
        lists = []
        for group in (back, fore):
            flat: list[CK2dEntity] = []
            for r in group:
                r.collect_tree(flat)
            quads = []
            for e in flat:
                t = e.texture()
                slot = c.tex_slot.get(id(t), -1) if t is not None else -1
                quads += e.quad_descriptors(vw, vh, slot)
            lists.append(quads)
        # Background material full-screen quad renders under everything
        # (reference Clear's TRIANGLEFAN, src/CKRenderContext.cpp:465-519).
        bm = self.background_material
        if bm is not None and bm.GetTexture(0) is not None:
            slot = c.tex_slot.get(id(bm.GetTexture(0)), -1)
            lists[0].insert(0, dict(rect=(0, 0, vw, vh), uvrect=(0, 0, 1, 1),
                                    color=(1, 1, 1, 1), tex=slot, blend=0))
        return lists[0], lists[1]

    def _quad_banks(self):
        from ..pipeline.overlay import build_quad_bank

        bg, fg = self._quad_lists()
        return build_quad_bank(bg), build_quad_bank(fg)

    # -- packed-transfer frame path -----------------------------------------
    def EnablePortalTraversal(self, on: bool = True):
        """Automatic portal culling: the camera's place renders fully,
        neighbor places clip to their portals' projected screen rects, and
        unconnected places hide (the reference's Place/portal traversal,
        src/CKSceneGraph.cpp:113-128,569-584)."""
        self.portal_traversal = bool(on)
        self.context._bump_dynamic()

    def _portal_place_rects(self):
        """place -> pixel rect (or None=hidden) for the current camera."""
        from .place import CKPlace

        places = [o for o in self.context._objects.values()
                  if isinstance(o, CKPlace)]
        if not places:
            return {}
        cam = self.attached_camera
        cam_place = None
        if cam is not None:
            for p in places:
                if p.Contains(cam):
                    cam_place = p
                    break
            if cam_place is None:
                cam_pos = cam.GetWorldMatrix()[3, :3]
                for p in places:
                    if p.ContainsPoint(cam_pos):
                        cam_place = p
                        break
        if cam_place is None:
            return {}                      # camera outside: no portal culling
        big = 1.0e9
        full = (-big, -big, big, big)
        rects = {p: None for p in places}  # None = hidden
        rects[cam_place] = full
        # breadth-first through portals, intersecting rects along the path
        frontier = [(cam_place, full)]
        for _depth in range(4):
            nxt = []
            for place, rect in frontier:
                for entry in place.portals:
                    dst = entry.place
                    if dst is None:
                        continue
                    prect = place.portal_screen_rect(entry.portal, self)
                    if prect is None:
                        continue
                    r = (max(rect[0], prect[0]), max(rect[1], prect[1]),
                         min(rect[2], prect[2]), min(rect[3], prect[3]))
                    if r[2] <= r[0] or r[3] <= r[1]:
                        continue
                    old = rects.get(dst)
                    if old is None:
                        rects[dst] = r
                        nxt.append((dst, r))
            frontier = nxt
        return rects

    def _entity_clip_np(self, n: int) -> np.ndarray:
        big = 1.0e9
        # No places with clips, no portals, no context scissor (the common
        # case): one cached open-rect array per (n) instead of a per-frame
        # object scan + tile.
        from .place import CKPlace
        simple = (self.clip_rect is None
                  and not getattr(self, "portal_traversal", False)
                  and not any(isinstance(o, CKPlace) and o.clip_rect is not None
                              for o in self.context._objects.values()))
        if simple:
            cached = getattr(self, "_open_clip_cache", None)
            if cached is None or cached.shape[0] != n:
                cached = np.tile(
                    np.array([-big, -big, big, big], np.float32), (n, 1))
                self._open_clip_cache = cached
            return cached
        entity_clip = np.tile(np.array([-big, -big, big, big], np.float32),
                              (n, 1))
        for obj in self.context._objects.values():
            if isinstance(obj, CKPlace) and obj.clip_rect is not None:
                rect = np.asarray(obj.clip_rect, np.float32)
                for d in obj.descendants():
                    if d.row < n:
                        entity_clip[d.row] = rect
        if getattr(self, "portal_traversal", False):
            hidden = np.array([0, 0, 0, 0], np.float32)   # empty rect
            for place, rect in self._portal_place_rects().items():
                r = hidden if rect is None else np.asarray(rect, np.float32)
                for d in place.descendants():
                    if d.row < n:
                        # intersect with any manual place clip
                        e = entity_clip[d.row]
                        entity_clip[d.row] = (
                            max(e[0], r[0]), max(e[1], r[1]),
                            min(e[2], r[2]), min(e[3], r[3]))
        # Context-level clip rect (RCKRenderContext::SetClipRect, reference
        # src/CKRenderContext.cpp:2743-2781) intersects every entity rect.
        if self.clip_rect is not None:
            r = np.asarray(self.clip_rect, np.float32)
            entity_clip[:, 0] = np.maximum(entity_clip[:, 0], r[0])
            entity_clip[:, 1] = np.maximum(entity_clip[:, 1], r[1])
            entity_clip[:, 2] = np.minimum(entity_clip[:, 2], r[2])
            entity_clip[:, 3] = np.minimum(entity_clip[:, 3], r[3])
        return entity_clip

    def SetVertexShader(self, fn):
        """User vertex shader: traced JAX fn(posw, nrmw, scene) ->
        (posw', nrmw') fused into the frame program (the TPU analogue of
        the reference's CreateVertexShader path). None clears."""
        self.vertex_shader = fn
        self.context._bump_dynamic()

    def GetVertexShader(self):
        return self.vertex_shader

    def SetPixelShader(self, fn):
        """User per-pixel stage: traced JAX fn(inputs dict) -> (...,4) rgba
        replacing the fixed-function texture-blend stage in BOTH the
        deferred shade and the ordered pass — the TPU analogue of the
        reference's CreatePixelShader/SetPixelShader
        (CKDX9RasterizerContext.cpp:1445-1553). Inputs: ``color`` (...,4)
        interpolated lit vertex color, ``texel`` (...,4), ``uv`` (...,2),
        ``xy`` (...,2), ``si``/``sf`` state rows. Specular add, fog, and
        blending stay fixed-function after it. None clears."""
        self.pixel_shader = fn
        self.context._bump_dynamic()

    def GetPixelShader(self):
        return self.pixel_shader

    def SetClipRect(self, rect=None):
        """Pixel clip rect applied to the whole 3D scene (None clears)."""
        self.clip_rect = None if rect is None else tuple(float(v) for v in rect)
        self.context._bump_dynamic()

    def GetClipRect(self):
        return self.clip_rect

    def _video_patch_info(self, c):
        """Video-texture patch plan: (total_texels, flat channel-last texel
        indices into the plane stack, per-texture fill plan). The indices
        are STATIC per layout; per-frame texel values ride the packed dyn
        f32 buffer and are scattered on device (no extra transfers)."""
        vids = sorted(getattr(c, "video_ids", set()))
        meta = getattr(c, "_tex_meta", None)
        if not vids or meta is None:
            return 0, None, []
        key = (id(meta), tuple(vids), self._tex_planes.shape)
        cached = getattr(self, "_video_patch_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        _nt, _ch, TH, TW = self._tex_planes.shape
        idx_parts, plan = [], []
        for i in vids:
            pi, oy, ox, h, w, mip_col, levels = meta["rects"][i]
            ys, xs = np.meshgrid(np.arange(oy, oy + h),
                                 np.arange(ox, ox + w), indexing="ij")
            idx_parts.append(((pi * TH + ys) * TW + xs).reshape(-1))
            lh, lw = h, w
            for lv in range(1, levels):
                nh, nw = max(lh // 2, 1), max(lw // 2, 1)
                y0 = (0 if lv == 1 else h - (h >> (lv - 1))) + oy
                x0 = ox + mip_col
                ys, xs = np.meshgrid(np.arange(y0, y0 + nh),
                                     np.arange(x0, x0 + nw), indexing="ij")
                idx_parts.append(((pi * TH + ys) * TW + xs).reshape(-1))
                lh, lw = nh, nw
            plan.append((i, levels))
        idx = np.concatenate(idx_parts).astype(np.int32)
        out = (int(idx.shape[0]), idx, plan)
        self._video_patch_cache = (key, out)
        return out

    def BindAnimation(self, clip) -> bool:
        """Run ``clip`` (a CKKeyedAnimation) on DEVICE: its track bank fuses
        into the frame program (animate -> compose -> skin -> render) and
        ``clip.SetFrame(t)`` costs one packed f32 scalar per frame instead
        of host-side track evaluation — the TPU inversion of the reference's
        per-tick CPU controller loop (src/CKObjectAnimation.cpp:1674).

        Host-side entity matrices stop tracking the clip while bound; call
        ``clip.SyncToHost()`` before host queries that must see the pose.
        Returns False (no binding) if any member animation needs host-only
        features (morph / merge / scale-axis) or lacks an entity."""
        if clip is None or not clip.device_eligible():
            return False
        if self._bound_clip is not None and self._bound_clip is not clip:
            self.UnbindAnimation()
        self._bound_clip = clip
        clip._device_rc = self
        clip._host_stale = True
        self.context._bump_dynamic()
        return True

    def UnbindAnimation(self):
        """Return the bound clip (if any) to host evaluation, syncing the
        entity table to its current frame."""
        clip, self._bound_clip = self._bound_clip, None
        if clip is not None:
            clip._device_rc = None
            clip.SyncToHost()
            self.context._bump_dynamic()

    def GetBoundAnimation(self):
        return self._bound_clip

    def _ensure_packed_layout(self, n, s, l, sp, qb, qf, cp=0, vt=0, ab=0,
                              ck=0):
        from ..pipeline.packing import DynLayout

        sig = (n, s, l, sp, qb, qf, cp, vt, ab, ck)
        if self._layout_sig == sig:
            return
        self._layout_sig = sig
        lay = DynLayout()
        if ab:
            lay.add_f("anim_t", ())
        if vt:
            lay.add_f("tex_patch", (vt, 4))
        if cp:
            lay.add_f("clip_planes", (cp, 4))
        lay.add_f("local", (n, 4, 4))
        lay.add_i("entity_visible", (n,))
        lay.add_f("entity_clip", (n, 4))
        lay.add_f("entity_priority", (n,))
        lay.add_f("state_f", (s, NUM_SF))
        lay.add_i("state_i", (s, NUM_SI))
        for name in ("mat_diffuse", "mat_ambient", "mat_specular",
                     "mat_emissive"):
            lay.add_f(name, (s, 4))
        lay.add_f("mat_power", (s,))
        lay.add_i("lt_type", (l,))
        lay.add_i("lt_active", (l,))
        for name in ("lt_diffuse", "lt_specular", "lt_ambient"):
            lay.add_f(name, (l, 4))
        for name in ("lt_position", "lt_direction", "lt_attenuation"):
            lay.add_f(name, (l, 3))
        for name in ("lt_range", "lt_falloff", "lt_cos_theta", "lt_cos_phi"):
            lay.add_f(name, (l,))
        lay.add_f("global_ambient", (4,))
        lay.add_f("view", (4, 4))
        lay.add_f("proj", (4, 4))
        lay.add_f("cam_pos", (3,))
        lay.add_f("viewport", (4,))
        lay.add_i("fog_mode", ())
        lay.add_i("fog_proj", ())
        for name in ("fog_start", "fog_end", "fog_density"):
            lay.add_f(name, ())
        lay.add_f("fog_color", (3,))
        lay.add_f("clear_color", (4,))
        lay.add_f("clear_z", ())
        if sp:
            lay.add_f("sp_size", (sp, 2))
            lay.add_f("sp_offset", (sp, 2))
            lay.add_i("sp_mode", (sp,))
        for prefix, q in (("qbg", qb), ("qfg", qf)):
            if q:
                lay.add_f(f"{prefix}_rect", (q, 4))
                lay.add_f(f"{prefix}_uvrect", (q, 4))
                lay.add_f(f"{prefix}_color", (q, 4))
                lay.add_i(f"{prefix}_tex", (q,))
                lay.add_i(f"{prefix}_blend", (q,))
                lay.add_i(f"{prefix}_valid", (q,))
        if ck:
            # host-culled stream-chunk survivors (compact_scene_chunks)
            lay.add_i("chunk_idx", (ck,))
            lay.add_i("chunk_n", ())
        self._layout = lay.freeze()
        self._buf_f, self._buf_i = lay.make_buffers()

    def _packed_static_dict(self, c: CompiledScene, n: int) -> dict:
        vp = getattr(self, "_video_patch", (0, None, []))
        # id(self._tex_planes): stable across video-texture frames (their
        # texels ride the dyn patch), changes on any full stack rebuild.
        vers = (id(c), c._pool_version, id(self._tex_planes),
                vp[0], id(vp[1]))
        if self._packed_static is not None and self._packed_static_vers == vers:
            return self._packed_static
        if c._dev_static is None:
            c._dev_static = dict(
                src_idx=jnp.asarray(c.src_idx),
                vert_entity=jnp.asarray(c.vert_entity),
                vert_state=jnp.asarray(c.vert_state),
                vert_lit=jnp.asarray(c.vert_lit),
                tri_idx=jnp.asarray(c.tri_idx),
                tri_state=jnp.asarray(c.tri_state),
                tri_valid=jnp.asarray(c.tri_valid),
            )
        if c._dev_pool_version != c._pool_version:
            c._dev_pool = dict(
                positions=jnp.asarray(c.positions),
                normals=jnp.asarray(c.normals),
                uv=jnp.asarray(c.uv),
                prelit=jnp.asarray(c.prelit),
                prelit_spec=jnp.asarray(c.prelit_spec),
            )
            c._dev_pool_version = c._pool_version
        ctx = self.context
        static = dict(parent=jnp.asarray(ctx.entity_table.parent[:n]),
                      tex_planes=self._tex_planes, tex_hw=self._tex_hw,
                      **c._dev_pool, **c._dev_static)
        if getattr(self, "_tex_quad", None) is not None:
            static["tex_quad"] = self._tex_quad
        if vp[0]:
            static["texpatch_idx"] = jnp.asarray(vp[1])
        self._packed_static = static
        self._packed_static_vers = vers
        # Sprite3D static arrays (entity rows / pool bases fixed per compile)
        if c.sprite3d_list:
            self._sprites_static = dict(
                entity_row=jnp.asarray(
                    np.asarray([e.row for e, _, _ in c.sprite3d_list], np.int32)),
                pool_base=jnp.asarray(
                    np.asarray([pb for _, pb, _ in c.sprite3d_list], np.int32)),
                valid=jnp.ones(len(c.sprite3d_list), bool))
        else:
            self._sprites_static = None
        return static

    def _entity_priority_np(self, n: int) -> np.ndarray:
        # Cached per topology version (SetRenderPriority bumps topology).
        cached = getattr(self, "_prio_cache", None)
        if cached is not None and cached[0] == (self.context._topology_version, n):
            return cached[1]
        out = np.zeros(n, np.float32)
        from .entity import CK3dEntity
        for obj in self.context._objects.values():
            if isinstance(obj, CK3dEntity) and obj.row < n:
                out[obj.row] = float(obj.render_priority)
        self._prio_cache = ((self.context._topology_version, n), out)
        return out

    def _effective_fog_mode(self) -> int:
        """ForceLinearFog option maps exp/exp2 fog to linear
        (reference ApplyRenderOptionChange)."""
        rm = self.context.render_manager
        if rm is not None and int(rm.options.get("ForceLinearFog", 0)):
            if self.fog_mode in (int(VXFOG.EXP), int(VXFOG.EXP2)):
                return int(VXFOG.LINEAR)
        return self.fog_mode

    def _effective_fog_proj(self) -> int:
        """Fog projection mode 0/1/2 (reference g_FogProjectionMode,
        src/CKMaterial.cpp:49 + CKRenderedScene.cpp:416-425): 0 = view-z
        distances, 1 = projected-depth fog with projected start/end, 2 =
        projected-depth fog against (1/startW, projected start)."""
        rm = self.context.render_manager
        return int(rm.options.get("FogProjectionMode", 0)) if rm else 0

    def _camera_np(self):
        cam = self.attached_camera
        vp = self._effective_viewport()
        if cam is not None:
            prep = getattr(cam, "prepare", None)
            if prep is not None:
                prep()
            # Static-camera fast path: view/proj depend only on the camera's
            # world matrix + lens params + viewport — key on those bytes.
            wm = cam.GetWorldMatrix()
            key = (id(cam), wm.tobytes(), float(cam.fov),
                   float(cam.front_plane), float(cam.back_plane),
                   getattr(cam, "projection_type", 0),
                   getattr(cam, "orthographic_zoom", 1.0), tuple(vp))
            cached = getattr(self, "_cam_np_cache", None)
            if cached is not None and cached[0] == key:
                return cached[1]
            view = cam.view_matrix()
            aspect = vp[2] / max(vp[3], 1)
            proj = cam.projection_matrix(aspect)
            cam_pos = wm[3, :3]
            view = np.asarray(view, np.float32)
            proj = np.asarray(proj, np.float32)
            self._last_cam = (view, proj, vp)
            self._cam_np_cache = (key, (view, proj, cam_pos))
            return view, proj, cam_pos
        else:
            view = np.eye(4, dtype=np.float32)
            proj = np.eye(4, dtype=np.float32)
            cam_pos = np.zeros(3, np.float32)
        view = np.asarray(view, np.float32)
        proj = np.asarray(proj, np.float32)
        # Cached for lazy render-extents queries (GetObjectExtents).
        self._last_cam = (view, proj, vp)
        return view, proj, cam_pos

    def _fill_packed(self, quads_bg_list, quads_fg_list,
                     defer_anim: bool = False):
        """Build this frame's packed buffers; returns
        (static, dyn_f, dyn_i, params) with params = the static-ish kwargs
        of render_frame_packed."""
        from ..pipeline.packing import fill

        ctx = self.context
        table = ctx.entity_table
        c = self._compiled
        self._refresh_pool(c)
        n = max(table.count, 1)
        si, sf, md, ma, ms, me, mp = self._material_banks(c)
        lt = self._light_rows_np()
        sp = len(c.sprite3d_list)

        def pad4(k):
            return 0 if k == 0 else max(4, ((k + 3) // 4) * 4)

        qb = pad4(len(quads_bg_list))
        qf = pad4(len(quads_fg_list))
        planes = self._active_clip_planes()
        vt, vt_idx, vt_plan = self._video_patch_info(c)
        self._video_patch = (vt, vt_idx, vt_plan)
        clip = self._bound_clip
        view, proj, cam_pos = self._camera_np()
        # Host chunk culling: pick surviving stream chunks for this frame's
        # frustum; the cap (static) bumps BEFORE dispatch when more chunks
        # survive than last compiled for — no frame ever drops geometry.
        cull_idx = self._chunk_select(c, view, proj)
        cull_static = None
        ck = 0
        if cull_idx is not None:
            cm = c.chunk_meta
            needed = int(cull_idx.shape[0])
            cap = self._chunk_cap
            if cap is None or needed > cap:
                cap = min(cm["n_full"],
                          max(8, -(-int(needed * 1.25) // 8) * 8))
                self._chunk_cap = cap
            ck = cap
            cull_static = (cm["ch"], cap, cm["itc"], cm["n_full"])
        self._ensure_packed_layout(n, si.shape[0], lt["type"].shape[0], sp,
                                   qb, qf, planes.shape[0], vt, 0, ck)
        static = self._packed_static_dict(c, n)

        visible = (table.flags[:n] & et.VX_MOVEABLE_VISIBLE) != 0
        # Debug object stepping (reference EnableDebugMode Ctrl+Alt+F11
        # walks the scene object-by-object, src/CKRenderContext.cpp:657-762):
        # SetDebugObjectCount(k) renders only the first k entities in
        # render order; DebugStep() advances. Programmatic here — the
        # interactive hotkey loop is the host app's job.
        dbg = getattr(self, "_debug_object_count", -1)
        if dbg >= 0:
            order = np.argsort(-self._entity_priority_np(n), kind="stable")
            cut = order[dbg:]
            visible = visible.copy()
            visible[cut] = False
        vals = dict(
            local=table.local[:n],
            entity_visible=visible,
            entity_clip=self._entity_clip_np(n),
            entity_priority=self._entity_priority_np(n),
            state_f=sf, state_i=si, mat_diffuse=md, mat_ambient=ma,
            mat_specular=ms, mat_emissive=me, mat_power=mp,
            lt_type=lt["type"], lt_active=lt["active"],
            lt_diffuse=lt["diffuse"], lt_specular=lt["specular"],
            lt_ambient=lt["ambient"], lt_position=lt["position"],
            lt_direction=lt["direction"], lt_attenuation=lt["attenuation"],
            lt_range=lt["range"], lt_falloff=lt["falloff"],
            lt_cos_theta=lt["cos_theta"], lt_cos_phi=lt["cos_phi"],
            global_ambient=self.ambient_light, view=view, proj=proj,
            cam_pos=cam_pos, viewport=np.asarray(self._effective_viewport(), np.float32),
            fog_mode=self._effective_fog_mode(),
            fog_proj=self._effective_fog_proj(), fog_start=self.fog_start,
            fog_end=self.fog_end, fog_density=self.fog_density,
            fog_color=self.fog_color, clear_color=self.background_color,
            clear_z=self.clear_z,
        )
        if planes.shape[0]:
            vals["clip_planes"] = planes
        if vt:
            parts = []
            meta = c._tex_meta
            for ti, levels in vt_plan:
                t = c.textures[ti]
                img = np.asarray(t.current_image(), np.float32)
                parts.append(img.reshape(-1, 4))
                for _lv, _nh, _nw, _yo, cur in _mip_chain(img, t, levels):
                    parts.append(np.asarray(cur, np.float32).reshape(-1, 4))
                meta["versions"][ti] = getattr(t, "data_version", 0)
            vals["tex_patch"] = np.concatenate(parts)
        if sp:
            vals["sp_size"] = np.asarray(
                [e.size2d for e, _, _ in c.sprite3d_list], np.float32)
            vals["sp_offset"] = np.asarray(
                [e.offset for e, _, _ in c.sprite3d_list], np.float32)
            vals["sp_mode"] = np.asarray(
                [e.mode for e, _, _ in c.sprite3d_list], np.int32)
        for prefix, cap, quads in (("qbg", qb, quads_bg_list),
                                   ("qfg", qf, quads_fg_list)):
            if not cap:
                continue
            rect = np.zeros((cap, 4), np.float32)
            uvrect = np.tile(np.array([0, 0, 1, 1], np.float32), (cap, 1))
            color = np.ones((cap, 4), np.float32)
            tex = np.full(cap, -1, np.int32)
            blend = np.zeros(cap, np.int32)
            valid = np.zeros(cap, np.int32)
            for i, dq in enumerate(quads):
                rect[i] = dq["rect"]
                uvrect[i] = dq.get("uvrect", (0, 0, 1, 1))
                color[i] = dq.get("color", (1, 1, 1, 1))
                tex[i] = dq.get("tex", -1)
                blend[i] = int(dq.get("blend", 1))
                valid[i] = 1
            vals[f"{prefix}_rect"] = rect
            vals[f"{prefix}_uvrect"] = uvrect
            vals[f"{prefix}_color"] = color
            vals[f"{prefix}_tex"] = tex
            vals[f"{prefix}_blend"] = blend
            vals[f"{prefix}_valid"] = valid
        if ck:
            idx_pad = np.full(ck, c.chunk_meta["n_full"], np.int32)
            idx_pad[:cull_idx.shape[0]] = cull_idx
            vals["chunk_idx"] = idx_pad
            vals["chunk_n"] = np.int32(cull_idx.shape[0])

        fill(self._buf_f, self._buf_i, self._layout, vals)
        rm = ctx.render_manager
        sort_t = bool(int(rm.options.get("SortTransparentObjects", 1))) \
            if rm is not None else True
        texdev, texdev_rects = [], []
        meta_d = getattr(c, "_tex_meta", None)
        for i in sorted(getattr(c, "dev_ids", set())):
            dimg = c.textures[i].device_image()
            if dimg is None or meta_d is None:
                continue
            pi, oy, ox, h, w, mip_col, levels = meta_d["rects"][i]
            texdev.append(dimg)
            texdev_rects.append((pi, oy, ox, h, w, mip_col, levels,
                                 c.textures[i].device_image_chw()))
        # Bound-clip animation: evaluate tracks + compose world matrices in
        # their own tiny device program (pipeline/frame.py eval_anim_world);
        # the frame program receives the (N,4,4) result via ``world_in``.
        # (Embedding the bank in the frame program compiled 250x slower —
        # the executable is identical-flops but XLA schedules it badly.)
        # In frame-window mode the eval DEFERS to the flush, where W frames'
        # evals run as a prologue of the window program itself.
        world_in = None
        self._anim_req = None
        if clip is not None:
            if defer_anim:
                self._anim_req = (table.local[:n].copy(),
                                  clip.bank(n_entities=n),
                                  np.float32(clip.frame))
            else:
                world_in = fr.eval_anim_world(
                    table.local[:n].copy(), static["parent"],
                    clip.bank(n_entities=n), np.float32(clip.frame),
                    self._compiled.levels)
        # Static sampler profile (any_nearest, any_mip) from this frame's
        # state bank: lets the shade skip the nearest-filter fetch and the
        # second mip level when no material needs them — the reference's
        # render-state-cache idea applied at the jit-signature level
        # (SURVEY §7); a material switching filter modes recompiles, like
        # swapping a D3D state block.
        from ..raster.types import SI_TEX, SI_TEXFILTER
        from ..raster.types import VXTEXTURE_FILTER as _TF
        _texd = si[:, SI_TEX] >= 0
        _filt = si[:, SI_TEXFILTER]
        _lin = ((_filt == _TF.LINEAR) | (_filt == _TF.LINEARMIPNEAREST)
                | (_filt == _TF.LINEARMIPLINEAR)
                | (_filt == _TF.ANISOTROPIC))
        _mip = ((_filt == _TF.MIPNEAREST) | (_filt == _TF.MIPLINEAR)
                | (_filt == _TF.LINEARMIPNEAREST)
                | (_filt == _TF.LINEARMIPLINEAR)
                | (_filt == _TF.ANISOTROPIC))
        quad_ok = (getattr(c, "_quad_ok", False)
                   and getattr(self, "_tex_quad", None) is not None
                   and not getattr(c, "video_ids", None)
                   and not getattr(c, "dev_ids", None)
                   and not texdev)
        from ..raster.types import (
            SI_ALPHABLEND, SI_ALPHATEST, SI_BLENDOP, SI_DSTBLEND,
            SI_PERSPECTIVE, SI_SRCBLEND, SI_STENCIL, SI_ZFUNC, SI_ZWRITE,
            VXBLEND, VXBLENDOP, VXCMP,
        )
        # 4th element: every state interpolates perspective-correct — the
        # quantized shade row then drops its (ws3, ivd) words entirely.
        # 5th: any state binds a texture at all — false compiles the whole
        # per-pixel sampling stage away (deferred.shade_rows).
        # 6th: every potentially-ORDERED state (not deferred-eligible, not
        # stencil-only) is inside the affine ordered-blend kernel's
        # exactness envelope — untextured, zwrite-off, and alpha-over
        # (SRCALPHA, INVSRCALPHA, ADD) or blend-off replace
        # (raster/pallas_ordered.py); the frame then blends transparency
        # at full rate instead of the sequential XLA composite.
        _deferred_ok = ((si[:, SI_ALPHABLEND] == 0)
                        & (si[:, SI_ALPHATEST] == 0)
                        & (si[:, SI_ZWRITE] != 0)
                        & ((si[:, SI_ZFUNC] == int(VXCMP.LESSEQUAL))
                           | (si[:, SI_ZFUNC] == int(VXCMP.LESS))))
        _ordered = ~_deferred_ok & (si[:, SI_STENCIL] == 0)
        _blend_over = ((si[:, SI_SRCBLEND] == int(VXBLEND.SRCALPHA))
                       & (si[:, SI_DSTBLEND] == int(VXBLEND.INVSRCALPHA))
                       & (si[:, SI_BLENDOP] == int(VXBLENDOP.ADD)))
        _okernel = ((si[:, SI_ZWRITE] == 0) & ~_texd
                    & ((si[:, SI_ALPHABLEND] == 0) | _blend_over))
        ordered_kernel_ok = bool(np.all(~_ordered | _okernel))
        # 7th: the TEXTURED ordered envelope — same as the affine kernel's
        # minus the untextured requirement: the layer-peel path
        # (pallas_ordered.ordered_peel_tiled_pallas) handles textured
        # alpha-over/replace/alpha-test draws at K bounded per-pixel layers
        # with exact fallback on overflow.
        _opeel = ((si[:, SI_ZWRITE] == 0)
                  & ((si[:, SI_ALPHABLEND] == 0) | _blend_over))
        _rm0 = self.context.render_manager
        _peel_opt = int(_rm0.options.get("TexturedPeel", 0) or 0) if _rm0 \
            else 0
        ordered_peel_ok = bool(_peel_opt) and bool(np.all(~_ordered | _opeel))
        # 8th: any stream vertex uses PRELIT colors (unlit materials) —
        # false compiles the two per-row prelit pool gathers away
        # (transform_and_light want_prelit).
        sampler_profile = (bool(np.any(_texd & ~_lin)),
                           bool(np.any(_texd & _mip)), quad_ok,
                           bool(np.all(si[:, SI_PERSPECTIVE] != 0)),
                           bool(np.any(_texd)), ordered_kernel_ok,
                           ordered_peel_ok,
                           bool(getattr(c, "any_prelit", True)))
        # Antialias option -> ordered 2x2 supersample + box resolve (the TPU
        # mapping of the reference's multisample device setup,
        # /root/reference/src/CKRenderManager.cpp:117,668 ->
        # CKDX9RasterizerContext.cpp:469-491). Nonzero option = 4 ordered
        # samples per pixel; part of the jit cache key, like a device reset.
        _rm = self.context.render_manager
        _aa = int(_rm.options.get("Antialias", 0) or 0) if _rm else 0
        params = dict(
            ss=2 if _aa else 1,
            sampler_profile=sampler_profile,
            texdev=tuple(texdev) if texdev else None,
            texdev_rects=tuple(texdev_rects),
            layout=self._layout, levels=self._compiled.levels,
            height=self.height, width=self.width, skin=c.skin_bank,
            skin_ranges=getattr(c, "skin_ranges", ()),
            anim=None, world_in=world_in,
            sprites_static=self._sprites_static, lines=c.line_bank,
            ordered_cap=c.ordered_cap, sort_transparent=sort_t,
            want_stencil=c.has_stencil, vertex_shader=self.vertex_shader,
            pixel_shader=self.pixel_shader,
            want_bump=getattr(c, "want_bump", False),
            want_cube=getattr(c, "want_cube", False),
            corner=(c.corner_nc, c.corner_itc, c.corner_p0),
            want_texgen=getattr(c, "want_texgen", True),
            solve_caps=self._solve_caps,
            cull=cull_static)
        # Fresh copies: the staging buffers are reused next frame while this
        # frame's host->device transfer may still be in flight (async tunnel).
        return static, self._buf_f.copy(), self._buf_i.copy(), params

    def _render_packed(self, quads_bg_list, quads_fg_list):
        """One frame through the two-buffer packed path (fast path)."""
        static, dyn_f, dyn_i, params = self._fill_packed(quads_bg_list,
                                                         quads_fg_list)
        accumulate = not (self._frame_flags & CK_RENDER_CLEARBACKBUFFER) \
            or not (self._frame_flags & CK_RENDER_CLEARZBUFFER)
        if (self._tile_mesh is not None and not params["want_stencil"]
                and not accumulate):
            # Banded sharding composes with Antialias since round 4: each
            # band renders at ss x and box-resolves locally (global-pixel
            # row0 keeps band output bit-exact either way).
            from ..parallel.tile_shard import render_frame_packed_banded_jit

            p = dict(params)
            p.pop("want_stencil")
            return render_frame_packed_banded_jit(
                static, dyn_f, dyn_i, mesh=self._tile_mesh, **p)
        rm = self.context.render_manager
        debug_stats = (bool(int(rm.options.get("EnableDebugMode", 0)))
                       if rm is not None else False)
        # Stats are NOT free: extra program outputs cost ~7 ms/frame on the
        # tunnel at W=1 (config 1 measured 84 vs 197 fps), and even
        # DISPATCHING the stats variant costs ~60 ms. So: always-on stats
        # ONLY when the frame actually takes the layer-peel branch (those
        # frames are slow anyway, and its capacity overflow must surface —
        # advisor finding); otherwise the governor samples every 256th
        # frame. Tick 0 is a warmup render, so both program variants
        # compile before any timed window.
        peel_branch = (bool(params["sampler_profile"][6])
                       and (params["ordered_cap"] or 0)
                       * self.height * self.width
                       * params.get("ss", 1) ** 2 > (1 << 26))
        self._stat_tick = getattr(self, "_stat_tick", -1) + 1
        # Big scenes keep stats ON every frame (one executable, no ~60 ms
        # variant switches; the outputs amortize into their ~25 ms frames
        # and the governor stays responsive). Small scenes sample rarely.
        big_scene = int(self._compiled.tri_idx.shape[0]) > 100_000
        gov_sample = (self._gov_enabled()
                      and (big_scene or (self._stat_tick % 256) == 0))
        want_stats = debug_stats or peel_branch or gov_sample
        # Resolve the previous frame's stashed governor sample before
        # dispatching (blocks at most one frame behind; W=1 samples are
        # rare for small scenes so the cost is amortized).
        self._governor_resolve()
        # CLEARBACK/CLEARZ off -> accumulate over last frame's buffers
        # (reference Clear flag handling, src/CKRenderContext.cpp:438-544;
        # the buffers already live on device, so this costs no transfer).
        prev_fb = (None if (self._frame_flags & CK_RENDER_CLEARBACKBUFFER)
                   else self.fb)
        prev_zb = (None if (self._frame_flags & CK_RENDER_CLEARZBUFFER)
                   else self.zb)
        out = fr.render_frame_packed(
            static, dyn_f, dyn_i, **params, want_stats=want_stats,
            prev_fb=prev_fb, prev_zb=prev_zb)
        if want_stats:
            out, dev_stats = out[:-1], out[-1]
            if debug_stats:
                self.stats.TileBinPeak = int(dev_stats["TileBinPeak"])
                self.stats.OrderedPeelOverflow = bool(
                    dev_stats.get("OrderedPeelOverflow", False))
                self.stats.OrderedPeelRounds = int(
                    dev_stats.get("OrderedPeelRounds", 0))
            else:
                # No forced device sync on the fast path: keep the raw
                # device scalar; bool()/int() on access blocks only the
                # caller that asks (by then the frame has completed).
                self.stats.OrderedPeelOverflow = dev_stats.get(
                    "OrderedPeelOverflow", False)
                self.stats.OrderedPeelRounds = dev_stats.get(
                    "OrderedPeelRounds", 0)
            self._governor_tick(dev_stats)
            ovf = dev_stats.get("OrderedPeelOverflow")
            if peel_branch and ovf is not None:
                # Exactness insurance: stash this frame's inputs; the fb
                # read (the present) re-renders through the exact
                # sequential ordered pass if the flag reads true
                # (_peel_correct).
                self._peel_redo = (ovf, static, dyn_f, dyn_i, params,
                                   (prev_fb, prev_zb), None)
        if params["want_stencil"]:
            fb, zb, self.sb = out
            return fb, zb
        return out

    def _peel_correct(self):
        """Unconditional peel exactness (round-5): if the layer-peel path
        reported phase-A CAPACITY overflow for the presented frame, re-render
        that frame HOST-SIDE through the exact sequential ordered pass
        (sampler_profile[6] off) and present that instead — capacity
        overflow costs time, never pixels. Runs outside jit at the fb read,
        the documented-safe side of the Mosaic lax.cond fault that forbids
        embedding the sequential replay next to the peel kernel
        (docs/PERFORMANCE.md round 3). Reference semantics: the sorted
        transparent composite, /root/reference/src/CKSceneGraph.cpp:618-752."""
        r = getattr(self, "_peel_redo", None)
        if r is None:
            return
        self._peel_redo = None
        ovf, static, dyn_f, dyn_i, params, prev, anim_req = r
        if not bool(np.asarray(ovf).any()):
            return
        p = dict(params)
        sp = list(p["sampler_profile"])
        sp[6] = False                       # peel off -> sequential ordered
        p["sampler_profile"] = tuple(sp)
        if anim_req is not None:
            # Deferred bound-clip frame: re-evaluate its world matrices
            # from the stashed anim request (only paid on actual overflow).
            local, bank, frame_t = anim_req
            p["world_in"] = fr.eval_anim_world(
                local, static["parent"], bank, frame_t, p["levels"])
        out = fr.render_frame_packed(
            static, dyn_f, dyn_i, **p, want_stats=False,
            prev_fb=prev[0], prev_zb=prev[1])
        if params["want_stencil"]:
            fb, zb, self.sb = out
        else:
            fb, zb = out
        self._fb_val = fb
        self._zb_val = zb
        self.stats.OrderedPeelCorrected += 1

    def _atest_prefail_mask(self, mat, mesh, grp):
        """Compile-time conservative alpha-test pre-gate (round 5).

        Alpha-tested fragments consume peel layer slots BEFORE their test
        runs (the test needs the sampled texel — raster/pallas_ordered.py),
        so alpha-test-heavy content peels extra rounds. A triangle whose
        conservative alpha UPPER BOUND provably fails the test contributes
        nothing to any pass — drop it from the stream at compile. The bound
        is max(texels in the face's UV bbox, via the texture's MAX-mip
        pyramid, +-1 texel for bilinear taps) x max vertex alpha.

        Returns a bool (F,) drop mask over grp.local_faces, or None when
        the gate does not apply (no alpha test, non-GREATER funcs, TexGen,
        pixel shaders, wrap bboxes crossing tile seams fall back to the
        texture-global max). Reference semantics: D3DRS_ALPHATESTENABLE /
        ALPHAREF / ALPHAFUNC, CKDX9RasterizerContext.cpp render-state
        table (:1042).
        """
        from ..raster.types import VXCMP, VXTEXTURE_ADDRESS

        if mat is None or not mat.AlphaTestEnabled():
            return None
        func = int(mat.GetAlphaFunc())
        if func not in (int(VXCMP.GREATER), int(VXCMP.GREATEREQUAL)):
            return None
        if self.pixel_shader is not None or mat._effect_texgen() != 0:
            return None
        ref = mat.GetAlphaRef() / 255.0

        def fails(ub):
            return (ub <= ref) if func == int(VXCMP.GREATER) else (ub < ref)

        if mesh.IsPreLitMode() and mesh.colors.size:
            va = float(mesh.colors[grp.vertex_map, 3].max())
        else:
            va = float(np.asarray(mat.GetDiffuse())[3])
        nfaces = grp.local_faces.shape[0]
        tex = mat.GetTexture(0)
        if tex is None:
            return np.full(nfaces, fails(va), bool)
        pyr = tex.max_alpha_pyramid()
        if pyr is None or mesh.uvs.shape[0] == 0:
            return None
        th, tw = pyr[0].shape
        uv = mesh.uvs[grp.vertex_map]
        fuv = uv[grp.local_faces]                       # (F,3,2)
        u0, u1 = fuv[..., 0].min(1), fuv[..., 0].max(1)
        v0, v1 = fuv[..., 1].min(1), fuv[..., 1].max(1)
        addr = int(mat.GetTextureAddressMode())
        glob = float(pyr[-1][0, 0])
        if addr == int(VXTEXTURE_ADDRESS.CLAMP):
            u0, u1 = np.clip(u0, 0.0, 1.0), np.clip(u1, 0.0, 1.0)
            v0, v1 = np.clip(v0, 0.0, 1.0), np.clip(v1, 0.0, 1.0)
            local = np.ones(nfaces, bool)
        elif addr == int(VXTEXTURE_ADDRESS.WRAP):
            # same-tile bboxes shift into [0,1); cross-seam faces use the
            # global max (conservative)
            local = (np.floor(u0) == np.floor(u1)) & \
                    (np.floor(v0) == np.floor(v1))
            u1 = u1 - np.floor(u0)
            u0 = u0 - np.floor(u0)
            v1 = v1 - np.floor(v0)
            v0 = v0 - np.floor(v0)
        else:                                           # mirror/border: global
            local = np.zeros(nfaces, bool)
        # Texel bbox covering every tap the sampler can take: bilinear taps
        # at coordinate t span [floor(t*W - 0.5), floor(t*W - 0.5) + 1],
        # nearest taps floor(t*W) — both inside [floor(u0*W - 0.5),
        # floor(u1*W + 0.5)]. Then the pyramid level where the bbox spans
        # <= 2 cells per dim: max of the <= 4 covering cells.
        rx0 = np.floor(u0 * tw - 0.5).astype(np.int64)
        rx1 = np.floor(u1 * tw + 0.5).astype(np.int64)
        ry0 = np.floor(v0 * th - 0.5).astype(np.int64)
        ry1 = np.floor(v1 * th + 0.5).astype(np.int64)
        if addr == int(VXTEXTURE_ADDRESS.WRAP):
            # a wrap bilinear tap at the seam reaches the OPPOSITE edge,
            # which a clipped bbox query would miss: those faces take the
            # global max instead.
            local &= (rx0 >= 0) & (rx1 <= tw - 1) & \
                     (ry0 >= 0) & (ry1 <= th - 1)
        tx0 = np.clip(rx0, 0, tw - 1)
        tx1 = np.clip(rx1, 0, tw - 1)
        ty0 = np.clip(ry0, 0, th - 1)
        ty1 = np.clip(ry1, 0, th - 1)
        # Level where the bbox spans <= 4 cells per dim (one level below
        # the 2-cell level: square pyramid cells lose anisotropic bboxes'
        # narrow-axis resolution otherwise), queried as a masked 4x4 grid.
        span = np.maximum(tx1 - tx0 + 1, ty1 - ty0 + 1)
        lvl = np.clip(np.ceil(np.log2(np.maximum(span, 1))).astype(np.int64)
                      - 1, 0, len(pyr) - 1)
        ub = np.full(nfaces, glob, np.float32)
        off = np.arange(4)
        for li in np.unique(lvl[local]):
            sel = local & (lvl == li)
            p = pyr[li]
            ph, pw = p.shape
            cx0 = tx0[sel] >> li
            cx1 = np.clip(tx1[sel] >> li, 0, pw - 1)
            cy0 = ty0[sel] >> li
            cy1 = np.clip(ty1[sel] >> li, 0, ph - 1)
            cx = np.minimum(cx0[:, None] + off[None, :], cx1[:, None])
            cy = np.minimum(cy0[:, None] + off[None, :], cy1[:, None])
            cx = np.clip(cx, 0, pw - 1)
            cy = np.clip(cy, 0, ph - 1)
            m = p[cy[:, :, None], cx[:, None, :]].max(axis=(1, 2))
            ub[sel] = m
        return fails(ub * va)

    def _refresh_chunk_parts(self, c):
        """(Re)build per-chunk conservative local bboxes — per (chunk,
        entity) part over the corner-major head — lazily and again whenever
        the pool refreshes (morphs / patch re-tessellation move vertices)."""
        cm = c.chunk_meta
        if cm["parts"] is not None and cm["pool_version"] == c._pool_version:
            return
        CH, n_full, itc = cm["ch"], cm["n_full"], cm["itc"]
        head_ent = c.vert_entity[:itc]
        pos_head = c.positions[c.corner_p0:c.corner_p0 + 3 * itc]
        parts = []
        for ci in range(n_full):
            sl = slice(ci * CH, (ci + 1) * CH)
            seg = head_ent[sl]
            for er in np.unique(seg):
                rows = np.nonzero(seg == er)[0] + ci * CH
                pts = np.concatenate([pos_head[k * itc + rows]
                                      for k in range(3)])
                parts.append((ci, int(er), pts.min(0), pts.max(0)))
        if len(parts) > 6 * n_full:
            # Chunks average >6 entities (many-small-entity scenes like the
            # 1000-node hierarchy): per-part host culling would cost more
            # than the compaction saves, and per-chunk bboxes degenerate to
            # entity unions anyway. Disable chunk culling for this scene.
            c.chunk_meta = None
            return
        from .entity import CK3dEntity
        rows_needed = {er for _ci, er, _lo, _hi in parts}
        row_obj = {}
        for obj in self.context._objects.values():
            if isinstance(obj, CK3dEntity) \
                    and getattr(obj, "row", None) in rows_needed:
                row_obj[obj.row] = obj
        cm["parts"] = parts
        cm["row_obj"] = row_obj
        cm["pool_version"] = c._pool_version

    def _chunk_select(self, c, view, proj):
        """HOST frustum culling at stream-chunk granularity (the TPU form
        of the reference's hierarchical-bbox scene-graph culling,
        /root/reference/src/CKSceneGraph.cpp:849-888 +
        CK3dEntity::IsInViewFrustrumHierarchic :3297): returns the
        ascending list of chunk indices whose conservative world bbox
        touches the frustum, or None when chunk culling is off. The device
        then compacts the dense stream to these survivors
        (pipeline/frame.compact_scene_chunks) — culling only removes
        fully-offscreen chunks, so pixels are identical."""
        cm = getattr(c, "chunk_meta", None)
        if cm is None or self._bound_clip is not None or self.stereo_enabled:
            return None
        self._refresh_chunk_parts(c)
        cm = c.chunk_meta                    # parts build may disable it
        if cm is None:
            return None
        m = np.asarray(view, np.float32) @ np.asarray(proj, np.float32)
        cols = m.T                          # row-vector: clip = p @ m
        w = cols[3]
        pl = np.stack([w + cols[0], w - cols[0], w + cols[1], w - cols[1],
                       cols[2], w - cols[2]])          # (6,4) inward planes
        pl = pl / np.maximum(
            np.linalg.norm(pl[:, :3], axis=1, keepdims=True), 1e-12)
        eps = 0.5                           # world-unit conservative slack
        vis = np.zeros(cm["n_full"], bool)
        wm_cache: dict = {}
        for ci, er, lo, hi in cm["parts"]:
            if vis[ci]:
                continue
            obj = cm["row_obj"].get(er)
            if obj is None:                 # unknown source: keep the chunk
                vis[ci] = True
                continue
            wm = wm_cache.get(er)
            if wm is None:
                wm = wm_cache[er] = np.asarray(obj.GetWorldMatrix(),
                                               np.float32)
            corners = np.array(
                [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
                 for z in (lo[2], hi[2])], np.float32)
            wpts = corners @ wm[:3, :3] + wm[3, :3]
            h4 = np.concatenate([wpts, np.ones((8, 1), np.float32)], 1)
            d = h4 @ pl.T                                  # (8,6)
            if (d.max(axis=0) < -eps).any():
                continue                    # fully outside one plane
            vis[ci] = True
        return np.nonzero(vis)[0].astype(np.int32)

    def _gov_enabled(self) -> bool:
        """Capacity governor runs where the Pallas tiled solve does."""
        import jax
        if getattr(self, "_gov_on", None) is None:
            self._gov_on = jax.default_backend() == "tpu"
        return self._gov_on

    def _default_solve_caps(self) -> tuple:
        """Mirror of frame.py's t_count cap heuristic (pair, slab, g)."""
        t = int(self._compiled.tri_idx.shape[0]) if \
            self._compiled.tri_idx is not None else 0
        return (98304 if t <= 600_000 else 262144,
                131072 if t <= (1 << 21) else 262144,
                8192)

    def _governor_tick(self, dev_stats):
        """Derive/adjust the tiled solve's capacity caps from observed bin
        statistics (the round-3 verdict's 'capacity planning instead of
        hand-tuned cliffs'; reference analogue: render-state/cap clamping,
        include/CKRasterizerTypes.h:29-58).

        Frame 1: plan the caps from the first frame's live counts with a
        GENEROUS margin (2.5x small/live, 4x mid; never above the static
        defaults). Later samples (cadence: every window for big scenes
        until settled, then every 8th; every 32nd window / 256th frame for
        small scenes) stash their device handle here and apply at the next
        sync point (_governor_resolve): BUMP any cap whose fallback ran or
        whose load exceeds 95%, and once per compile SHRINK to 1.25x the
        observed peak — the pair-sort diet. A config-4-class silent 3x
        regression is impossible: the fallback surfaces in
        VxStats.SolveFallbackRows and the next frames recompile with
        headroom."""
        bs = dev_stats.get("SolveBinStats")
        if bs is None:
            return
        self._gov_frames += 1
        if self._gov_frames == 1 and self._solve_caps is None:
            # Frame-1 plan: one blocking readback at startup is fine.
            self._gov_apply(np.asarray(bs))
            return
        # Never block the dispatch pipeline mid-window (a blocking
        # np.asarray behind a deep queue measured 1.35 s). Round-4 polled
        # handle.is_ready() here — but on the axon tunnel is_ready() NEVER
        # reports True (r5 measurement: False even straight after a drained
        # fence), which silently killed every bump/shrink in window mode.
        # Instead: stash the newest handle and resolve it at the next SYNC
        # POINT (_governor_resolve from GetFrameFence / the fb property),
        # where the caller is already blocking on the device and the
        # readback is effectively free.
        self._gov_stash = bs

    def _governor_resolve(self):
        """Apply the newest stashed bin-stats sample (called where the host
        already synchronizes with the device)."""
        bs = getattr(self, "_gov_stash", None)
        if bs is None:
            return
        self._gov_stash = None
        self._gov_apply(np.asarray(bs))

    def _gov_apply(self, b):
        first = self._solve_caps is None
        if b.ndim == 2:                       # window-stacked: worst frame
            b = b.max(axis=0)
        _peak, live, cut, g_over, s_over, n_small, n_mid = (
            int(x) for x in b)
        s = self.stats
        s.SolveLivePairs = live
        s.SolveFallbackRows = cut + g_over + s_over
        pair0, slab0, g0 = self._default_solve_caps()
        pair, slab, gcap = self._solve_caps or (pair0, slab0, g0)

        def up16k(v):
            return int(-(-int(v) // 16384) * 16384)

        if first:
            # Generous first plan: a single pose says little about the
            # scene's bin swing (config 4's waving character bins 33-73k
            # pairs across its clip — a x1.75 frame-1 margin put EVERY
            # later frame in the all-tiles fallback, 63 -> 8.6 fps). The
            # x2.5 margin survives the swing; the SHRINK pass below tightens
            # caps from OBSERVED peaks once real history exists.
            pair = min(pair0, up16k(max(49152, live * 2.5)))
            slab = min(slab0, up16k(max(32768, n_small * 2.5)))
            gp = 1024
            while gp < max(n_mid * 4, 512):
                gp *= 2
            gcap = min(g0, max(gp, 1024))
            self._solve_caps = (pair, slab, gcap)
            self._gov_hist = []
            self._gov_shrunk = False
            return
        # Bump on OVERFLOW (the fallback actually ran) or >95% occupancy.
        # Riding near-full is the point of governed caps: the old 85%
        # pre-emptive bump re-fattened config 4's pair cap to 131072 at 89%
        # occupancy with zero overflow (64 -> 55 fps); the fallback path
        # below the cap is the safety net, not a place to avoid at 11%
        # margin.
        changed = False
        if cut > 0 or live > 0.95 * pair:
            pair = up16k(max(pair * 1.5, live * 1.75))
            changed = True
        if s_over > 0 or n_small > 0.95 * slab:
            slab = up16k(max(slab * 1.5, n_small * 1.75))
            changed = True
        if g_over > 0 or n_mid > 0.95 * gcap:
            gcap = max(2 * gcap, 1024)
            changed = True
        if changed:
            self._solve_caps = (pair, slab, gcap)
            s.SolveCapBumps += 1
            # A bump after a shrink means the observed-peak window was too
            # short for this scene's pose swing: stop shrinking it.
            self._gov_hist = []
            if getattr(self, "_gov_shrunk", False):
                self._gov_shrunk = None      # disabled for this compile
            return
        # Observed-peak shrink: tighter caps shrink the pair-key sort
        # directly (~2 ms at 229k keys; config 5 measured +1.8 fps going
        # slab/g 49k/8192 -> 33k/4096). Margins over the PEAK of the last 6
        # samples, one shrink per compile, disabled if it ever causes a
        # bump. An over-shrink costs one fallback window + a bump recompile,
        # never pixels.
        if getattr(self, "_gov_shrunk", False) is None or \
                getattr(self, "_gov_shrunk", False):
            return
        hist = getattr(self, "_gov_hist", None)
        if hist is None:
            hist = self._gov_hist = []
        hist.append((live, n_small, n_mid))
        if len(hist) < 6:
            return
        pl = max(h[0] for h in hist)
        ps = max(h[1] for h in hist)
        pm = max(h[2] for h in hist)
        tp = min(pair, up16k(max(49152, pl * 1.25)))
        ts = min(slab, up16k(max(32768, ps * 1.25)))
        gp = 1024
        while gp < max(pm * 1.5, 512):
            gp *= 2
        tg = min(gcap, max(gp, 1024))
        if tp <= pair - 16384 or ts <= slab - 16384 or tg <= gcap // 2:
            self._solve_caps = (tp, ts, tg)
            s.SolveCapShrinks += 1
            self._gov_shrunk = True
        self._gov_hist = []

    def _render_windowed(self, quads_bg_list, quads_fg_list):
        """Stage this frame into the pipelining window; dispatch the whole
        window as one scan program when full (SetFramePipelining)."""
        accumulate = not (self._frame_flags & CK_RENDER_CLEARBACKBUFFER) \
            or not (self._frame_flags & CK_RENDER_CLEARZBUFFER)
        c = self._compiled
        eligible = (self._tile_mesh is None and not accumulate
                    and not getattr(c, "dev_ids", set())
                    and self.target_texture is None)
        if not eligible:
            self._flush_window()
            self.fb, self.zb = self._render_packed(quads_bg_list,
                                                   quads_fg_list)
            return
        key = (c, self._frame_flags, self._bound_clip)
        if self._win_slots and self._win_ctx[0] is not None \
                and self._win_ctx[0] != key:
            self._flush_window()
        static, dyn_f, dyn_i, params = self._fill_packed(
            quads_bg_list, quads_fg_list, defer_anim=True)
        if params.get("texdev"):
            self._flush_window()
            self.fb, self.zb = self._render_packed(quads_bg_list,
                                                   quads_fg_list)
            return
        if self._win_slots and (
                self._win_ctx[2]["layout"] is not params["layout"]
                or self._win_ctx[2].get("cull") != params.get("cull")
                or self._win_ctx[1] is not static
                or self._win_ctx[2].get("sampler_profile")
                != params.get("sampler_profile")
                or self._win_ctx[2].get("ordered_cap")
                != params.get("ordered_cap")
                or self._win_ctx[2].get("solve_caps")
                != params.get("solve_caps")):
            # Mid-window state change (packed layout / chunk cap / static
            # texture stack rebuild / sampler profile / ordered cap /
            # governed solve caps): staged frames keep their own consistent
            # program; this frame starts a new window. Without the static-
            # dict identity check a same-count SetImage with a new shape
            # rendered the window's remaining frames with frame-1 textures
            # (advisor r4).
            self._flush_window()
        if not self._win_slots:
            self._win_ctx = (key, static, params)
        self._win_slots.append((dyn_f, dyn_i, self._anim_req))
        self._fb_val = None
        self._zb_val = None
        if len(self._win_slots) >= self._win_size:
            self._flush_window()

    def _flush_window(self):
        """Dispatch all staged frames as ONE scan program; fb/zb become the
        last frame's slices of the stacked outputs (device-resident)."""
        slots = self._win_slots
        if not slots:
            return
        self._win_slots = []
        _key, static, params = self._win_ctx
        if len(slots) < self._win_size:
            # Pad to the full window by repeating the last frame: ONE
            # compiled scan length regardless of flush point (each extra
            # scan length would cost a full frame-program compile), and the
            # repeated frames render identically so slot -1 stays correct.
            slots = slots + [slots[-1]] * (self._win_size - len(slots))
        W = len(slots)
        dyn_fs = np.stack([s[0] for s in slots])
        dyn_is = np.stack([s[1] for s in slots])
        # ONE fused int32 upload per window: the tunnel charges ~5-15 ms of
        # serialized latency per transfer RPC regardless of size, so every
        # per-window host->device array merges into a single buffer
        # (render_frame_window_fused docstring has the RPC ledger).
        parts = [dyn_fs.view(np.int32), dyn_is]
        nloc = 0
        bank = None
        if slots[0][2] is not None:
            locals_w = np.stack([s[2][0] for s in slots])
            frames = np.asarray([s[2][2] for s in slots], np.float32)
            bank = slots[0][2][1]
            nloc = int(locals_w.shape[1])
            # anim evals ride the window program itself as a prologue
            # (one dispatch per window instead of two)
            parts += [locals_w.reshape(W, -1).view(np.int32),
                      frames.reshape(W, 1).view(np.int32)]
        dyn_c = np.concatenate(parts, axis=1)
        rm = self.context.render_manager
        debug_stats = (bool(int(rm.options.get("EnableDebugMode", 0)))
                       if rm is not None else False)
        # Same stats economics as _render_packed (extra outputs cost ~1.7
        # ms/frame even amortized over W=8): peel-branch windows always
        # carry stats; otherwise every 32nd window (~256 frames at W=8).
        # Window ticks 0 and 1 are the honest-fps probe windows, so both
        # variants compile before the timed windows.
        peel_branch = (bool(params["sampler_profile"][6])
                       and (params["ordered_cap"] or 0)
                       * self.height * self.width
                       * params.get("ss", 1) ** 2 > (1 << 26))
        self._stat_tick_win = getattr(self, "_stat_tick_win", -1) + 1
        # Cadence scales with scene size AND settles over time: big scenes
        # need per-window governor feedback while caps are being learned
        # (rotating poses overflow the frame-1-planned caps; without bumps
        # config 5 sat in sustained fallback, 62 -> 43 fps), but the stats
        # outputs + fence-time readback measured 1.1 ms/frame at Ballance
        # scale — so once the observed-peak shrink has fired (or been
        # disabled), sampling decays to every 8th window, still catching a
        # sustained fallback within ~1 s. Small scenes sample rarely.
        big_scene = int(self._compiled.tri_idx.shape[0]) > 100_000
        settled = getattr(self, "_gov_shrunk", False) is not False
        _every = (8 if settled else 1) if big_scene else 32
        gov_sample = (self._gov_enabled()
                      and (self._stat_tick_win % _every) == 0)
        want_stats = debug_stats or peel_branch or gov_sample
        p = {k: v for k, v in params.items()
             if k not in ("world_in", "texdev", "texdev_rects")}
        out = fr.render_frame_window_fused(
            static, dyn_c, lf=int(dyn_fs.shape[1]), li=int(dyn_is.shape[1]),
            nloc=nloc, bank=bank, want_stats=want_stats, **p)
        if want_stats:
            out, dev_stats = out[:-1], out[-1]
            ovf = dev_stats.get("OrderedPeelOverflow")
            rnds = dev_stats.get("OrderedPeelRounds")
            if debug_stats:
                self.stats.TileBinPeak = int(
                    np.asarray(dev_stats["TileBinPeak"])[-1])
                self.stats.OrderedPeelOverflow = bool(
                    np.asarray(ovf).any()) if ovf is not None else False
                self.stats.OrderedPeelRounds = int(
                    np.asarray(rnds).max()) if rnds is not None else 0
            else:
                # lazy device scalar: any frame in the window overflowed
                self.stats.OrderedPeelOverflow = (
                    jnp.any(ovf) if ovf is not None else False)
                self.stats.OrderedPeelRounds = (
                    jnp.max(rnds) if rnds is not None else 0)
            self._governor_tick(dev_stats)
            if peel_branch and ovf is not None:
                # Peel exactness insurance for the PRESENTED (last) frame
                # of the window: see _peel_correct. (Windows never
                # accumulate — eligibility excludes it — so prev is None.)
                self._peel_redo = (ovf, static, slots[-1][0], slots[-1][1],
                                   params, (None, None), slots[-1][2])
        fence = out[-1]
        out = out[:-1]
        if params["want_stencil"]:
            fb, zb, sb = out
            self.sb = sb
        else:
            fb, zb = out
        self._fb_val = fb
        self._zb_val = zb
        self._win_fence = fence

    # -- render -----------------------------------------------------------
    def Render(self, flags: int = 0):
        """One frame (RCKRenderContext::Render,
        /root/reference/src/CKRenderContext.cpp:767-930)."""
        from ..profiler import PhaseTimer

        self._frame_flags = self.ResolveRenderFlags(int(flags))
        # A new frame supersedes any unread peel correction for the
        # previous one (it is no longer the presented frame).
        self._peel_redo = None

        t0 = time.monotonic()
        ph = self.phases
        ph.reset()
        with PhaseTimer(ph, "CallbacksTime"):
            for kind, fct, arg, _t in self.pre_render_callbacks:
                fct(self, arg)
            # Per-object pre-render callbacks (reference RCK3dEntity::Render
            # callback hooks; here they run before the one-frame program).
            # Registry scan, not an all-objects scan (O(entities) host time).
            for obj in list(self.context._cb_objects.values()):
                for kind, fct, arg, _t in obj.callbacks:
                    if kind == "pre":
                        fct(self, obj, arg)
        # Dirty curves regenerate their line meshes before compilation
        # (RCKCurve::Render = update-if-dirty then render); mesh pre-render
        # callbacks (patch meshes hook BuildRenderMesh here).
        from .curve import CKCurve
        for obj in list(self.context._prerender_objects.values()):
            if isinstance(obj, CKCurve):
                if obj.IsDirty():
                    obj.Update()
            else:
                for cb in list(obj.pre_render_callbacks):
                    cb(self, obj)
        # The reference's render-state cache hit/miss counters
        # (include/CKRasterizer.h:509-510) map to the scene-compile cache
        # here: a miss is a frame that had to recompile the draw streams.
        if self._compiled.topology_version != self.context._topology_version:
            self._compile()
            self.stats.RenderStateCacheMiss += 1
        else:
            self.stats.RenderStateCacheHit += 1
        # Quad banks first: lazy sprite-text rasters bump texture versions,
        # which the stack refresh below then picks up this same frame.
        with PhaseTimer(ph, "BankBuildTime"):
            quads_bg_list, quads_fg_list = self._quad_lists()
            # CK_RENDER_BACKGROUNDSPRITES / FOREGROUNDSPRITES gate the 2D
            # passes (reference CKRenderedScene::Draw honors the flags for
            # the background/foreground 2D trees).
            if not (self._frame_flags & CK_RENDER_BACKGROUNDSPRITES):
                quads_bg_list = []
            if not (self._frame_flags & CK_RENDER_FOREGROUNDSPRITES):
                quads_fg_list = []
        self._refresh_textures()
        if self.stereo_enabled:
            # Flush any frames staged by a pipelining window BEFORE the
            # stereo render: a later fb/zb property read would otherwise
            # run _flush_window and overwrite the stereo frame with the
            # older windowed one (advisor r4).
            self._flush_window()
            accumulate = not (self._frame_flags & CK_RENDER_CLEARBACKBUFFER) \
                or not (self._frame_flags & CK_RENDER_CLEARZBUFFER)
            # Render-to-texture feeds (dev_ids) must go through the eager
            # path: _render_stereo_packed strips texdev, so a packed stereo
            # frame would sample STALE texture contents (advisor r4).
            texdev_live = bool(getattr(self._compiled, "dev_ids", None))
            if self._tile_mesh is None and not accumulate and not texdev_live:
                # Stereo rides the packed fast path: both eyes in ONE
                # 2-frame scan program (round-3 verdict #9 — the eager
                # per-eye SceneDevice path paid the host costs the packed
                # path was built to kill).
                with PhaseTimer(ph, "DeviceTime"):
                    self._render_stereo_packed(quads_bg_list, quads_fg_list)
            else:
                from ..pipeline.overlay import build_quad_bank

                # Fallback path builds SceneDevice directly (no packed
                # anim_t slot); a bound clip needs host evaluation here.
                # Surfaced in VxStats: flipping on accumulation / banded
                # sharding / RTT feeds silently restores the eager host-
                # heavy cost structure (round-4 verdict #7) — the stat
                # makes the cliff observable.
                self.stats.StereoEagerFallback = True
                if self._bound_clip is not None:
                    self._bound_clip.SyncToHost()
                with PhaseTimer(ph, "SceneBuildTime"):
                    scene = self._build_scene_device()
                self._render_stereo(scene, build_quad_bank(quads_bg_list),
                                    build_quad_bank(quads_fg_list),
                                    self._sprite3d_bank())
        else:
            with PhaseTimer(ph, "SceneBuildTime"):
                pass
            with PhaseTimer(ph, "DeviceTime"):
                if self._win_size > 1:
                    self._render_windowed(quads_bg_list, quads_fg_list)
                else:
                    self.fb, self.zb = self._render_packed(quads_bg_list,
                                                           quads_fg_list)
        # Render-to-texture (reference SetTargetTexture/CopyContext,
        # src/CKRenderContext.cpp:606-638).
        if self.target_texture is not None:
            # Device-resident copy: no host round trip (reference
            # SetTargetTexture/CopyContext). The RAW (4,H,W) fb buffer is
            # handed over as-is — any derived array (e.g. a moveaxis) is a
            # NEW buffer whose hand-off into another program costs a ~35 ms
            # relayout under the tunnel; consumers transpose in-program.
            self.target_texture.SetDeviceImage(self.fb, chw=True)
        # Debug stepping overlay: composite the current object's name + last
        # frame time into the output, like the reference's GDI text while
        # stepping (src/CKRenderContext.cpp:657-762). Debug mode only.
        rm0 = self.context.render_manager
        if (rm0 is not None and int(rm0.options.get("EnableDebugMode", 0))
                and self.GetDebugObjectCount() >= 0):
            self._composite_debug_label()
        with PhaseTimer(ph, "CallbacksTime"):
            # Custom mesh render callbacks draw now (they REPLACE the
            # default render; immediate DrawPrimitive composites onto fb),
            # then mesh post-render callbacks, then context/object posts.
            for obj in list(self.context._prerender_objects.values()):
                rcb = getattr(obj, "render_callback", None)
                if rcb is not None:
                    rcb[0](self, obj, rcb[1])
                for cb in list(getattr(obj, "post_render_callbacks", ())):
                    cb(self, obj)
            # Post-sprite callbacks fire right after the fg 2D pass
            # (reference CKRenderedScene::Draw :331-344), i.e. before the
            # context post-render callbacks.
            for kind, fct, arg, _t in self.post_sprite_callbacks:
                fct(self, arg)
            for kind, fct, arg, _t in self.post_render_callbacks:
                fct(self, arg)
            for obj in list(self.context._cb_objects.values()):
                for kind, fct, arg, _t in obj.callbacks:
                    if kind == "post":
                        fct(self, obj, arg)
        # Debug mode: validate frame output + compiled-stream invariants
        # (reference EnableDebugMode option; jit purity + NaN checks stand in
        # for the interactive object-stepping debugger, SURVEY §5).
        rm_opts = (self.context.render_manager.options
                   if self.context.render_manager else {})
        if int(rm_opts.get("EnableDebugMode", 0)):
            fbnp = np.asarray(self.fb)
            if not np.isfinite(fbnp).all():
                raise FloatingPointError(
                    "render produced non-finite framebuffer values")
            c = self._compiled
            v = c.positions.shape[0]
            assert c.src_idx.max(initial=0) < v, "stream index out of pool"
            assert c.tri_idx.max(initial=0) < c.src_idx.shape[0], \
                "triangle index out of stream"
        # stats + FPS EMA over >=1s windows (reference :898-908)
        # NOTE: getattr's default evaluates EAGERLY — spelling this as
        # getattr(c, 'n_valid_tris', tri_valid.sum()) summed 527k bools
        # every frame (~0.3 ms of pure host waste at Ballance scale).
        nvt = getattr(self._compiled, "n_valid_tris", None)
        if nvt is None:
            nvt = self._compiled.n_valid_tris = int(
                self._compiled.tri_valid.sum())
        self.stats.NbTrianglesDrawn = nvt
        self.stats.NbVerticesProcessed = int(self._compiled.src_idx.shape[0])
        self.stats.NbObjectDrawn = self._compiled.n_entities
        self.stats.NbLinesDrawn = len(self._compiled.line_segments)
        self.stats.FrameTime = (time.monotonic() - t0) * 1000.0
        ph.ObjectsRenderTime = self.stats.FrameTime - ph.CallbacksTime
        # Mirror phase timers into VxStats fields (reference per-phase times,
        # include/RCKRenderContext.h:269-280 accumulated into VxStats).
        self.stats.SceneTraversalTime = ph.SceneBuildTime + ph.BankBuildTime
        self.stats.ObjectsRenderTime = ph.DeviceTime
        self.stats.ObjectsCallbacksTime = ph.CallbacksTime
        self._fps_frames += 1
        now = time.monotonic()
        win = now - self._fps_window_start
        if win >= 1.0:
            fps = self._fps_frames / win
            s = self.stats
            s.SmoothedFps = fps if s.SmoothedFps == 0 else 0.9 * fps + 0.1 * s.SmoothedFps
            self._fps_frames = 0
            self._fps_window_start = now
        return True

    def _stereo_eye_views(self, view: np.ndarray):
        """Per-eye view matrices: world translated opposite each eye's
        shift along the camera right axis (reference stereo branch,
        src/CKRenderContext.cpp:814-886)."""
        cam = self.attached_camera
        right = (cam.GetWorldMatrix()[0, :3] if cam is not None
                 else np.array([1, 0, 0], np.float32))
        right = right / max(np.linalg.norm(right), 1e-12)
        half = self.eye_separation * 0.5
        out = []
        for sign in (-1.0, 1.0):
            v = view.copy()
            v[3, :3] = view[3, :3] - (right * (half * sign)) @ view[:3, :3]
            out.append(v)
        return out

    def _render_stereo_packed(self, quads_bg_list, quads_fg_list):
        """Stereo through the packed fast path: the two eyes render as a
        2-frame scan program (ONE transfer pair, one dispatch) instead of
        two eager SceneDevice builds — the round-3 verdict's stereo gap.
        The per-eye view matrices patch the packed f32 buffer in place."""
        static, dyn_f, dyn_i, params = self._fill_packed(quads_bg_list,
                                                         quads_fg_list)
        entries_f, _ = self._layout
        off = next(o for (n, o, _s, _sh) in entries_f if n == "view")
        view = dyn_f[off:off + 16].reshape(4, 4).copy()
        eyes = []
        for v in self._stereo_eye_views(view):
            df = dyn_f.copy()
            df[off:off + 16] = v.reshape(-1)
            eyes.append(df)
        dyn_fs = np.stack(eyes)
        dyn_is = np.stack([dyn_i, dyn_i])
        w = params.get("world_in")
        worlds = jnp.stack([w, w]) if w is not None else None
        p = {k: v for k, v in params.items()
             if k not in ("world_in", "texdev", "texdev_rects",
                          "want_stencil")}
        out = fr.render_frame_packed_window(
            static, dyn_fs, dyn_is, world_in=worlds, want_stencil=False,
            want_stats=False, **p)
        fbs, zbs = out[0], out[1]
        half_w = self.width // 2
        left = fbs[0][:, :, ::2][:, :, :half_w]
        right_fb = fbs[1][:, :, ::2][:, :, :half_w]
        self.fb = jnp.concatenate([left, right_fb], axis=2)
        self.zb = zbs[1]

    def _render_stereo(self, scene, quads_bg, quads_fg, sprites):
        """Stereo pair: per-eye view offset along the camera right axis,
        composited side-by-side (reference stereo branch,
        src/CKRenderContext.cpp:814-886 — per-eye world-matrix offset)."""
        cam = self.attached_camera
        right = (cam.GetWorldMatrix()[0, :3] if cam is not None
                 else np.array([1, 0, 0], np.float32))
        right = right / max(np.linalg.norm(right), 1e-12)
        half = self.eye_separation * 0.5
        fbs = []
        for sign in (-1.0, 1.0):
            offset = right * (half * sign)
            view = np.asarray(scene.view)
            eye_view = view.copy()
            # translate the world opposite to the eye shift
            eye_view[3, :3] = view[3, :3] - offset @ view[:3, :3]
            eye_scene = scene._replace(view=jnp.asarray(eye_view, jnp.float32))
            fb, zb = fr.render_frame_full(
                eye_scene, self._compiled.levels, self.height, self.width,
                skin=self._compiled.skin_bank,
                skin_ranges=getattr(self._compiled, "skin_ranges", ()),
                sprites=sprites,
                quads_bg=quads_bg, quads_fg=quads_fg,
                lines=self._compiled.line_bank,
                ordered_cap=self._compiled.ordered_cap,
                vertex_shader=self.vertex_shader,
                pixel_shader=self.pixel_shader,
                want_bump=getattr(self._compiled, "want_bump", False),
                want_cube=getattr(self._compiled, "want_cube", False),
                corner=(self._compiled.corner_nc, self._compiled.corner_itc,
                        self._compiled.corner_p0),
                want_texgen=getattr(self._compiled, "want_texgen", True))
            fbs.append(fb)
        half_w = self.width // 2
        left = fbs[0][:, :, ::2][:, :, :half_w]
        right_fb = fbs[1][:, :, ::2][:, :, :half_w]
        self.fb = jnp.concatenate([left, right_fb], axis=2)
        self.zb = zb

    # -- render-to-texture (reference SetTargetTexture) --------------------
    def SetTargetTexture(self, texture):
        self.target_texture = texture

    def GetTargetTexture(self):
        return self.target_texture

    # -- API-surface parity batch (reference include/RCKRenderContext.h) ---
    # Fog getters (reference GetFog*, :121-131).
    def GetFogStart(self) -> float:
        return float(self.fog_start)

    def GetFogEnd(self) -> float:
        return float(self.fog_end)

    def GetFogDensity(self) -> float:
        return float(self.fog_density)

    def GetFogColor(self):
        return np.asarray(self.fog_color, np.float32).copy()

    # Clear-flag toggles (reference SetClearBackground/SetClearZBuffer —
    # they rewrite the context's stored render flags).
    def SetClearBackground(self, on: bool = True):
        if on:
            self.render_flags |= CK_RENDER_CLEARBACKBUFFER
        else:
            self.render_flags &= ~CK_RENDER_CLEARBACKBUFFER

    def GetClearBackground(self) -> bool:
        return bool(self.render_flags & CK_RENDER_CLEARBACKBUFFER)

    def SetClearZBuffer(self, on: bool = True):
        if on:
            self.render_flags |= CK_RENDER_CLEARZBUFFER
        else:
            self.render_flags &= ~CK_RENDER_CLEARZBUFFER

    def GetClearZBuffer(self) -> bool:
        return bool(self.render_flags & CK_RENDER_CLEARZBUFFER)

    # Viewpoint management (reference AttachViewpointToCamera family).
    def DetachViewpointFromCamera(self):
        self.attached_camera = None

    def GetViewpoint(self):
        """The entity serving as the viewpoint — the attached camera here
        (the reference's root entity is a camera proxy,
        src/CKRenderedScene.cpp:36-40)."""
        return self.attached_camera

    def ForceCameraSettingsUpdate(self):
        cam = self.attached_camera
        if cam is not None and hasattr(cam, "prepare"):
            cam.prepare()
        self.context._bump_dynamic()

    # Scene queries.
    def GetBoundingBox(self):
        """World bbox union of all 3D entities in this context
        (reference GetBoundingBox). Returns (min (3,), max (3,)) or None."""
        from .entity import CK3dEntity

        lo, hi = None, None
        for obj in self.context._objects.values():
            if isinstance(obj, CK3dEntity) and obj.GetCurrentMesh() is not None:
                bb = obj.GetBoundingBox()
                if bb is None:
                    continue
                bmin, bmax = np.asarray(bb[0]), np.asarray(bb[1])
                lo = bmin if lo is None else np.minimum(lo, bmin)
                hi = bmax if hi is None else np.maximum(hi, bmax)
        return None if lo is None else (lo, hi)

    def Get2dRoot(self, background: bool = True) -> list:
        """Root 2D entities of the background or foreground tree
        (reference Get2dRoot / m_2DRootBack / m_2DRootFore)."""
        from .entity2d import CK2dEntity

        return [o for o in self.context._objects.values()
                if isinstance(o, CK2dEntity) and o.GetParent() is None
                and o.IsBackground() == bool(background)]

    def GetBackgroundMaterial(self):
        return getattr(self, "background_material", None)

    # Transform helpers (reference Transform / TransformVertices -> the
    # rasterizer's TransformVertices, CKRasterizerLib/
    # CKRasterizerContext.cpp:316-392).
    def TransformVertices(self, points, ref=None):
        """Project local/world points to screen. Returns (screen (N,2),
        clip_flags (N,) uint32, all_offscreen bool)."""
        from ..math import vxmath as vx
        import jax.numpy as jnp

        pts = np.asarray(points, np.float32).reshape(-1, 3)
        world = (np.asarray(ref.GetWorldMatrix(), np.float32)
                 if ref is not None else np.eye(4, dtype=np.float32))
        view, proj, _ = self._camera_np()
        m = world @ view @ proj
        h = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], -1)
        clip = h @ m
        flags = np.asarray(vx.clip_flags(jnp.asarray(clip)))
        vx0, vy0, vw, vh = self._effective_viewport()
        w = np.where(np.abs(clip[:, 3]) < 1e-12, 1e-12, clip[:, 3])
        sx = vx0 + vw * 0.5 + clip[:, 0] / w * (vw * 0.5)
        sy = vy0 + vh * 0.5 - clip[:, 1] / w * (vh * 0.5)
        screen = np.stack([sx, sy], -1).astype(np.float32)
        offscreen = bool(np.bitwise_and.reduce(flags.astype(np.uint32)) != 0) \
            if flags.size else False
        return screen, flags, offscreen

    def Transform(self, point, ref=None):
        """One point -> screen (reference Transform)."""
        return self.TransformVertices([point], ref)[0][0]

    # Windowing stubs (no OS window on TPU; reference fullscreen state
    # machine is D3D9 device management).
    def GoFullScreen(self, *a, **kw) -> bool:
        return False

    def StopFullScreen(self) -> bool:
        return False

    def IsFullScreen(self) -> bool:
        return False

    def GetWindowHandle(self):
        return None

    def GetWindowRect(self, screen_relative: bool = False):
        return (0, 0, self.width, self.height)

    def SetWindowRect(self, rect, flags: int = 0):
        return None

    def ScreenToClient(self, pt):
        return tuple(pt)

    def ClientToScreen(self, pt):
        return tuple(pt)

    # Stencil bit allocation (reference GetStencilFreeMask/UsedStencilBits/
    # GetFirstFreeStencilBits, src/CKRenderContext.cpp:2331-2347).
    def GetStencilFreeMask(self) -> int:
        return self._stencil_used_mask

    def UsedStencilBits(self, stencil_bits: int):
        self._stencil_used_mask |= int(stencil_bits)

    def GetFirstFreeStencilBits(self) -> int:
        for i in range(32):
            if not (self._stencil_used_mask >> i) & 1:
                return i
        return -1

    # Global render mode (reference SetGlobalRenderMode: force shading /
    # texture off / wireframe across all materials).
    def SetGlobalRenderMode(self, shading: int = 2, texture: bool = True,
                            wireframe: bool = False):
        self._global_render_mode = (int(shading), bool(texture),
                                    bool(wireframe))
        self.context._bump_topology()

    def GetGlobalRenderMode(self):
        return self._global_render_mode

    # Misc introspection.
    def GetMemoryOccupation(self) -> int:
        """Approximate device-state bytes held by this context."""
        total = 0
        c = self._compiled
        for name in ("positions", "normals", "uv", "prelit", "src_idx",
                     "tri_idx"):
            a = getattr(c, name, None)
            if a is not None:
                total += int(np.asarray(a).nbytes)
        for b in (self.fb, self.zb):
            if b is not None:
                total += int(np.prod(b.shape)) * 4
        return total

    def GetPixelFormat(self):
        """(bpp, zbpp, stencil_bpp) — f32 RGBA planes + f32 depth here."""
        return (32, 32, 8)

    def GetDriverIndex(self) -> int:
        return getattr(self, "_driver_index", 0)

    def ChangeDriver(self, index: int) -> bool:
        from ..raster.caps import enumerate_drivers

        drivers = enumerate_drivers()
        if not (0 <= index < len(drivers)):
            return False
        self._driver_index = int(index)
        return True

    def GetRasterizerContext(self):
        """The device context IS this object (the HAL boundary is the jitted
        frame program)."""
        return self

    def GetDirectXInfo(self):
        return None

    def SetTransparentMode(self, trans: bool):
        self._transparent_mode = bool(trans)

    def GetTransparentMode(self) -> bool:
        return getattr(self, "_transparent_mode", False)

    def DrawScene(self, flags: int = 0):
        """Draw the scene WITHOUT clearing (reference DrawScene is the
        middle of Render: BeginScene -> scene draw -> EndScene,
        src/CKRenderContext.cpp:546-574); accumulates over current buffers."""
        flags = self.ResolveRenderFlags(int(flags))
        flags &= ~(CK_RENDER_CLEARBACKBUFFER | CK_RENDER_CLEARZBUFFER)
        return self.Render(flags | CK_RENDER_PLAYERCONTEXT)

    def RectPick(self, rect, intersect: bool = True):
        return self.PickRect(rect, intersect)

    def DumpToMemory(self, what: str = "color") -> np.ndarray:
        """Framebuffer ('color'), depth ('z'), or stencil ('stencil') as a
        numpy array (reference DumpToMemory)."""
        if what == "z":
            return np.asarray(self.zbuffer())
        if what == "stencil":
            return np.asarray(self.stencilbuffer())
        return self.framebuffer()

    # Immediate-mode user DrawPrimitive (reference
    # GetDrawPrimitiveStructure src/CKRenderContext.cpp:967 + DrawPrimitive;
    # draws composite onto the framebuffer NOW, outside the scene program).
    def SetWorldTransformationMatrix(self, m):
        self._dp_world = np.asarray(m, np.float32).reshape(4, 4)

    def GetWorldTransformationMatrix(self):
        return self._dp_world.copy()

    def SetViewTransformationMatrix(self, m):
        self._dp_view = np.asarray(m, np.float32).reshape(4, 4)

    def GetViewTransformationMatrix(self):
        m = self._dp_view
        if m is not None:
            return m.copy()
        view, _, _ = self._camera_np()
        return np.asarray(view, np.float32)

    def SetProjectionTransformationMatrix(self, m):
        self._dp_proj = np.asarray(m, np.float32).reshape(4, 4)

    def GetProjectionTransformationMatrix(self):
        m = self._dp_proj
        if m is not None:
            return m.copy()
        _, proj, _ = self._camera_np()
        return np.asarray(proj, np.float32)

    def SetCurrentMaterial(self, material):
        self._dp_material = material

    def SetTexture(self, texture, stage: int = 0):
        self._dp_texture = texture

    def GetDrawPrimitiveStructure(self, transformed: bool = True,
                                  vertex_count: int = 0) -> dict:
        """Staging structure for user DrawPrimitive: numpy views the caller
        fills (positions are clip-space xyzw when ``transformed``, local
        xyz otherwise)."""
        n = max(int(vertex_count), 1)
        self._dp_struct = {
            "transformed": bool(transformed),
            "positions": np.zeros((n, 4 if transformed else 3), np.float32),
            "colors": np.ones((n, 4), np.float32),
            "uvs": np.zeros((n, 2), np.float32),
        }
        return self._dp_struct

    def DrawPrimitive(self, prim_type, indices=None, data: dict | None = None):
        """Composite user geometry onto the framebuffer immediately
        (reference RCKRenderContext::DrawPrimitive). ``data`` defaults to the
        last GetDrawPrimitiveStructure; untransformed positions go through
        the current DP world/view/projection matrices."""
        from ..raster.types import RasterState, VXCULL

        data = data if data is not None else self._dp_struct
        if data is None:
            return False
        pos = np.asarray(data["positions"], np.float32)
        if indices is not None:
            idx = np.asarray(indices, np.int64).reshape(-1)
            pos = pos[idx]
            colors = np.asarray(data["colors"], np.float32)[idx]
            uvs = np.asarray(data["uvs"], np.float32)[idx]
        else:
            colors = np.asarray(data["colors"], np.float32)
            uvs = np.asarray(data["uvs"], np.float32)
        tm = getattr(self, "_texture_matrices", {}).get(0)
        if tm is not None:
            # DX9 2D texture transform: (u,v,0,1) @ M, keep xy
            uvh = np.concatenate(
                [uvs, np.zeros((uvs.shape[0], 1), np.float32),
                 np.ones((uvs.shape[0], 1), np.float32)], -1)
            uvs = (uvh @ tm)[:, :2].astype(np.float32)
        if not data.get("transformed", True):
            h = np.concatenate(
                [pos[:, :3], np.ones((pos.shape[0], 1), np.float32)], -1)
            view, proj, _ = self._camera_np()
            if self._dp_view is not None:
                view = self._dp_view
            if self._dp_proj is not None:
                proj = self._dp_proj
            pos = h @ (self._dp_world @ view @ proj)
        from .vertexbuffer import CKVertexBuffer

        vb = CKVertexBuffer(self.context, "__dp", max_vertices=pos.shape[0])
        p, c, u = vb.Lock(0, pos.shape[0])
        p[:] = pos
        c[:] = colors
        u[:] = uvs
        vb.Unlock()
        mat = self._dp_material
        state = getattr(self, "_dp_state", None)   # material state appliers
        tex = self._dp_texture
        if mat is not None:
            state = mat.raster_state() if hasattr(mat, "raster_state") else None
            tex = mat.GetTexture() if mat.GetTexture() is not None else tex
        try:
            return vb.Draw(self, int(prim_type), 0, pos.shape[0],
                           state=state, texture=tex)
        finally:
            self.context.DestroyObject(vb)

    # -- thread warnings (reference WarnEnterThread/WarnExitThread,
    # include/RCKRenderContext.h:149-150 — no-op hooks kept for API parity;
    # the engine is single-threaded by design, SURVEY §5) ------------------
    def WarnEnterThread(self):
        return None

    def WarnExitThread(self):
        return None

    # -- API-surface parity batch (reference include/RCKRenderContext.h) ---
    def Activate(self, active: bool = True):
        """Active contexts render during RenderManager::Process (reference
        Activate); Render() can still be called directly either way."""
        self._active = bool(active)

    def IsActive(self) -> bool:
        return getattr(self, "_active", True)

    def SetFullViewport(self):
        """Reset the viewport to the whole surface (reference
        SetFullViewport)."""
        self.SetViewRect(0, 0, self.width, self.height)

    def GetCurrentExtents(self):
        """The running 2D extents rect accumulated this frame (reference
        Get/SetCurrentExtents)."""
        return getattr(self, "_current_extents",
                       (0.0, 0.0, float(self.width), float(self.height)))

    def SetCurrentExtents(self, rect):
        self._current_extents = tuple(float(v) for v in rect)

    def AddExtents2D(self, rect, obj=None):
        """Merge a screen rect into the current extents; with ``obj``, also
        record it for 2D picking (reference AddExtents2D)."""
        x0, y0, x1, y1 = (float(v) for v in rect)
        cx0, cy0, cx1, cy1 = self.GetCurrentExtents()
        self._current_extents = (min(cx0, x0), min(cy0, y0),
                                 max(cx1, x1), max(cy1, y1))
        if obj is not None:
            if not hasattr(self, "_extents_2d"):
                self._extents_2d = []
            self._extents_2d.append(((x0, y0, x1, y1), obj))

    # Dirty rects (reference AddDirtyRect/ResetDirtyRects — partial-present
    # hints; the TPU present is always full-frame, the list is bookkeeping
    # for API parity and user inspection).
    def AddDirtyRect(self, rect=None):
        if not hasattr(self, "_dirty_rects"):
            self._dirty_rects = []
        self._dirty_rects.append(
            tuple(rect) if rect is not None
            else (0, 0, self.width, self.height))

    def ResetDirtyRects(self):
        self._dirty_rects = []

    def GetDirtyRects(self) -> list:
        return list(getattr(self, "_dirty_rects", []))

    def AddPostSpriteRenderCallBack(self, fct, arg=None, temp: bool = False):
        """Fires after the foreground 2D/sprite pass (reference
        AddPostSpriteRenderCallBack)."""
        self.post_sprite_callbacks.append(("postsprite", fct, arg, temp))

    def RemovePostSpriteRenderCallBack(self, fct):
        self.post_sprite_callbacks = [
            cb for cb in self.post_sprite_callbacks if cb[1] is not fct]

    def ExecutePreRenderCallbacks(self):
        for kind, fct, arg, _t in list(self.pre_render_callbacks):
            fct(self, arg)

    def ExecutePostRenderCallbacks(self):
        for kind, fct, arg, _t in list(self.post_render_callbacks):
            fct(self, arg)

    def ExecutePostSpriteCallbacks(self):
        for kind, fct, arg, _t in list(self.post_sprite_callbacks):
            fct(self, arg)

    def ChangeCurrentRenderOptions(self, add: int = 0, remove: int = 0):
        """Add/remove render-flag bits in one call (reference
        ChangeCurrentRenderOptions)."""
        self.render_flags = (self.render_flags | int(add)) & ~int(remove)
        return self.render_flags

    def CheckObjectExtents(self, ent) -> bool:
        """True when the entity has valid extents recorded for this frame
        (reference CheckObjectExtents)."""
        return self.GetObjectExtents(ent) is not None

    def Compute3dRootObjects(self) -> list:
        """Parentless 3D entities attached to this context (reference
        Compute3dRootObjects)."""
        from .entity import CK3dEntity
        return [o for o in self._scene_entities()
                if isinstance(o, CK3dEntity) and o.GetParent() is None]

    def Compute2dRootObjects(self) -> list:
        """Parentless 2D entities, background roots first (reference
        Compute2dRootObjects)."""
        from .entity2d import CK2dEntity
        roots = [o for o in self.context._objects.values()
                 if isinstance(o, CK2dEntity) and o.GetParent() is None]
        roots.sort(key=lambda e: (not e.IsBackground(), e.zorder, e.id))
        return roots

    def DetachAll(self):
        """Detach every object from THIS context (reference DetachAll);
        switches to explicit empty membership."""
        from .entity import CKRenderObject
        for obj in self.context._objects.values():
            if isinstance(obj, CKRenderObject):
                obj._in_render_context_mask &= ~self.mask
        self._objects = []
        self.context._bump_topology()

    def AddRemoveSequence(self, begin: bool):
        """Bracket a burst of AddObject/RemoveObject calls so the scene
        recompiles once (reference AddRemoveSequence)."""
        if begin:
            self.context.BeginAddRemoveSequence()
        else:
            self.context.EndAddRemoveSequence()

    def PrepareCameras(self, flags: int = 0):
        """Apply target-camera/-light LookAts + refresh the projection
        (reference PrepareCameras, src/CKRenderedScene.cpp:484-536 — the
        frame program recomputes view/proj each Render; this forces the
        host-side targets now)."""
        from .camera import CKTargetCamera
        from .light import CKTargetLight
        for o in list(self.context._objects.values()):
            if isinstance(o, (CKTargetCamera, CKTargetLight)):
                o.prepare()
        self.UpdateProjection(True)

    def UpdateProjection(self, force: bool = False) -> bool:
        """Recompute the cached projection matrix from the attached camera
        (reference UpdateProjection, src/CKRenderContext.cpp:2783-2808)."""
        self._proj_cache = None
        _, proj, _ = self._camera_np()
        return proj is not None

    def SetRenderTarget(self, texture) -> bool:
        """Alias of SetTargetTexture (reference SetRenderTarget /
        render-to-texture)."""
        self.SetTargetTexture(texture)
        return True

    def RestoreScreenBackup(self):
        """Restore the pre-frame framebuffer backup (reference
        RestoreScreenBackup — transparent-context screen restore). A backup
        is captured by BackupScreen()."""
        bak = getattr(self, "_screen_backup", None)
        if bak is None:
            return False
        return self.CopyFromMemoryBuffer(bak)

    def BackupScreen(self):
        self._screen_backup = self.framebuffer().copy()

    # Texture stage state (reference SetTextureStageState /
    # SetTextureMatrix, CKDX9RasterizerContext.cpp:1226,975+): stored per
    # stage; the texture matrix transforms immediate-mode UVs.
    def SetTextureMatrix(self, m, stage: int = 0):
        if not hasattr(self, "_texture_matrices"):
            self._texture_matrices = {}
        self._texture_matrices[int(stage)] = np.asarray(m, np.float32)
        return True

    def GetTextureMatrix(self, stage: int = 0):
        return getattr(self, "_texture_matrices", {}).get(int(stage))

    def SetTextureStageState(self, stage: int, state: int, value) -> bool:
        if not hasattr(self, "_texture_stage_states"):
            self._texture_stage_states = {}
        self._texture_stage_states[(int(stage), int(state))] = value
        return True

    def GetTextureStageState(self, stage: int, state: int):
        return getattr(self, "_texture_stage_states", {}).get(
            (int(stage), int(state)))

    # Debug render-state dump (reference FillStateString /
    # AppendState*Line, src/CKRenderContext.cpp:287 — the EnableDebugMode
    # overlay's state listing).
    def FillStateString(self, material=None) -> str:
        from ..raster.types import RasterState
        st = material.raster_state() if material is not None \
            else getattr(self, "_dp_state", None) or RasterState()
        lines = []
        self.AppendStateOnOffLine(lines, "AlphaBlend", st.alpha_blend)
        self.AppendStateOnOffLine(lines, "AlphaTest", st.alpha_test)
        self.AppendStateOnOffLine(lines, "ZWrite", st.z_write)
        self.AppendStateOnOffLine(lines, "Fog", st.fog)
        self.AppendStateEnumLine(lines, "SrcBlend", st.src_blend)
        self.AppendStateEnumLine(lines, "DestBlend", st.dst_blend)
        self.AppendStateEnumLine(lines, "ZFunc", st.z_func)
        self.AppendStateEnumLine(lines, "Cull", st.cull)
        self.AppendStateUIntLine(lines, "Texture", max(st.tex, 0))
        return "\n".join(lines)

    @staticmethod
    def AppendStateOnOffLine(lines: list, name: str, value) -> None:
        lines.append(f"{name}: {'On' if value else 'Off'}")

    @staticmethod
    def AppendStateEnumLine(lines: list, name: str, value) -> None:
        lines.append(f"{name}: {int(value)}")

    @staticmethod
    def AppendStateUIntLine(lines: list, name: str, value) -> None:
        lines.append(f"{name}: {int(value) & 0xFFFFFFFF}")

    # -- DrawPrimitive staging helpers (reference AllocateStructure /
    # ClearStructure / GetStructure / GetDrawPrimitiveIndices /
    # LockCurrentVB / ReleaseCurrentVB, include/RCKRenderContext.h) --------
    def AllocateStructure(self, vertex_count: int = 0,
                          transformed: bool = True) -> dict:
        return self.GetDrawPrimitiveStructure(transformed, vertex_count)

    def GetStructure(self) -> dict | None:
        return self._dp_struct

    def ClearStructure(self):
        self._dp_struct = None

    def GetDrawPrimitiveIndices(self, count: int) -> np.ndarray:
        """Shared sequential index buffer (reference GetDrawPrimitiveIndices
        — the dynamic 16-bit index buffer; 32-bit here, no 65k cap)."""
        cached = getattr(self, "_dp_indices", None)
        if cached is None or cached.shape[0] < count:
            self._dp_indices = np.arange(max(count, 128), dtype=np.int32)
        return self._dp_indices[:count]

    def LockCurrentVB(self, vertex_count: int):
        """Lock a pooled staging VB (reference LockCurrentVB); returns
        (positions, colors, uvs) views. Draw with ReleaseCurrentVB."""
        from .vertexbuffer import CKVertexBuffer
        vb = getattr(self, "_current_vb", None)
        if vb is None:
            vb = CKVertexBuffer(self.context, "__rc_vb",
                                max_vertices=max(vertex_count, 256))
            self._current_vb = vb
        views = vb.Lock(0, vertex_count)
        self._current_vb_count = vertex_count
        return views

    def ReleaseCurrentVB(self, prim_type: int | None = None) -> bool:
        """Unlock the staging VB; with ``prim_type``, draw it immediately."""
        vb = getattr(self, "_current_vb", None)
        if vb is None:
            return False
        vb.Unlock()
        if prim_type is not None:
            mat = self._dp_material
            state = (mat.raster_state() if mat is not None
                     else getattr(self, "_dp_state", None))
            tex = (mat.GetTexture() if mat is not None
                   and mat.GetTexture() is not None else self._dp_texture)
            return vb.Draw(self, int(prim_type), 0,
                           self._current_vb_count, state=state, texture=tex)
        return True

    # -- Sprite3D immediate batches (reference AddSprite3DBatch /
    # CallSprite3DBatches / FlushSprite3DBatchesIfNeeded,
    # src/CKRenderContext.cpp:2821-2921; the frame program expands all
    # sprites on device — these drive the immediate path) ------------------
    def AddSprite3DBatch(self, sprite3d) -> bool:
        mat = sprite3d.GetMaterial()
        if mat is None:
            return False
        mat.AddSprite3DBatch(sprite3d)
        if not hasattr(self, "_sprite3d_mats"):
            self._sprite3d_mats = []
        if mat not in self._sprite3d_mats:
            self._sprite3d_mats.append(mat)
        return True

    def CallSprite3DBatches(self) -> int:
        """Draw every pending material batch NOW (camera-space billboard
        fill + one DrawPrimitive per material). Returns sprites drawn."""
        mats = getattr(self, "_sprite3d_mats", [])
        total = 0
        view, proj, _ = self._camera_np()
        for mat in mats:
            sprites = mat.GetSprite3DBatch()
            if not sprites:
                continue
            pos_l, uv_l, idx_l = [], [], []
            base = 0
            cam_world = np.linalg.inv(np.asarray(view, np.float32))
            for sp in sprites:
                verts, uvs, indices = sp.FillBatch(cam_world)
                pos_l.append(verts)
                uv_l.append(uvs)
                idx_l.append(indices + base)
                base += 4
            verts = np.concatenate(pos_l)
            h = np.concatenate([verts, np.ones((verts.shape[0], 1),
                                               np.float32)], -1)
            clip = h @ (np.asarray(view, np.float32)
                        @ np.asarray(proj, np.float32))
            s = self.GetDrawPrimitiveStructure(transformed=True,
                                               vertex_count=clip.shape[0])
            s["positions"][:] = clip
            s["uvs"][:] = np.concatenate(uv_l)
            s["colors"][:] = np.asarray(mat.GetDiffuse(), np.float32)
            # Sprites never cull (the reference's sprite batches draw with
            # culling off — billboard winding depends on the view).
            import dataclasses
            from ..raster.types import VXCULL
            saved_state = getattr(self, "_dp_state", None)
            saved_tex = self._dp_texture
            self._dp_state = dataclasses.replace(
                mat.raster_state(), cull=int(VXCULL.NONE))
            self._dp_texture = mat.GetTexture() or saved_tex
            try:
                self.DrawPrimitive(2, np.concatenate(idx_l), s)
            finally:
                self._dp_state = saved_state
                self._dp_texture = saved_tex
            total += len(sprites)
            mat.FlushSprite3DBatch()
        self._sprite3d_mats = []
        return total

    def FlushSprite3DBatchesIfNeeded(self, mat=None) -> int:
        """Flush when a state change would interleave wrongly (reference
        FlushSprite3DBatchesIfNeeded); flushes everything here."""
        if getattr(self, "_sprite3d_mats", []):
            return self.CallSprite3DBatches()
        return 0

    def ClassifyTransparentOrder(self, ent_a, ent_b) -> int:
        """Plane-classification tie-breaker for transparent objects with
        overlapping Z extents (reference ClassifyTransparentOrder,
        src/CKSceneGraph.cpp:49-80): when one box lies entirely on one side
        of the other's nearest face plane, the box on the camera's side
        draws LAST. Returns -1 (a first), +1 (b first), 0 (no decision)."""
        cam = self.GetAttachedCamera()
        if cam is None:
            return 0
        cam_pos = cam.GetWorldMatrix()[3, :3]
        amin, amax = ent_a.GetBoundingBox()
        bmin, bmax = ent_b.GetBoundingBox()

        def classify(outer_min, outer_max, inner_min, inner_max):
            # separating axis-plane of the OUTER box that the INNER box is
            # fully beyond; returns draw order or 0
            for axis in range(3):
                if inner_min[axis] >= outer_max[axis]:     # inner on + side
                    cam_side = cam_pos[axis] >= outer_max[axis]
                    return +1 if cam_side else -1          # inner last/first
                if inner_max[axis] <= outer_min[axis]:
                    cam_side = cam_pos[axis] <= outer_min[axis]
                    return +1 if cam_side else -1
            return 0

        r = classify(amin, amax, bmin, bmax)   # +1: b draws after a
        if r:
            return -1 if r > 0 else +1         # convert to "who first"
        r = classify(bmin, bmax, amin, amax)   # +1: a draws after b
        if r:
            return +1 if r > 0 else -1
        return 0

    def RenderTransparents(self, flags: int = 0) -> int:
        """Immediate back-to-front draw of all transparent entities
        (reference RenderTransparents; the frame program performs this
        per-triangle on device — this is the host path for callbacks)."""
        cam = self.GetAttachedCamera()
        view = (cam.view_matrix() if cam is not None
                else np.eye(4, dtype=np.float32))
        ents = [e for e in self._scene_entities()
                if e.IsVisible() and e.GetCurrentMesh() is not None
                and e.GetCurrentMesh().IsTransparent()]

        def depth(e):
            p = e.GetWorldMatrix()[3, :3]
            return float((np.append(p, 1.0) @ view)[2])

        ents.sort(key=depth, reverse=True)      # far first
        n = 0
        for e in ents:
            if e.GetCurrentMesh().Render(self, e):
                n += 1
        return n

    # -- misc lifecycle ----------------------------------------------------
    # -- debug object stepping (reference debug render mode, SURVEY §5.3) --
    def SetDebugObjectCount(self, k: int = -1):
        """Render only the first ``k`` entities in render order (-1 = all);
        the programmatic form of the reference's object-stepping debugger."""
        self._debug_object_count = int(k)
        self.context._bump_dynamic()

    def GetDebugObjectCount(self) -> int:
        return getattr(self, "_debug_object_count", -1)

    def _composite_debug_label(self):
        """Draw '<object name> (<k>/<n>) <ms>' into the framebuffer during
        object stepping (reference drew it via GDI per stepped object,
        /root/reference/src/CKRenderContext.cpp:657-762)."""
        from ..pipeline.overlay import composite_label, raster_label

        k = self.GetDebugObjectCount()
        n = self.context.entity_table.count
        name = "(none)"
        if k >= 1:
            order = np.argsort(-self._entity_priority_np(n), kind="stable")
            row = int(order[min(k, n) - 1])
            for obj in self.context._objects.values():
                if getattr(obj, "row", None) == row:
                    name = obj.GetName() or f"row {row}"
                    break
        text = f"{name} ({k}/{n}) {self.stats.FrameTime:.1f} ms"
        cached = getattr(self, "_dbg_label_cache", (None, None))
        if cached[0] != text:
            img = raster_label(text, max_w=max(self.width - 8, 1))
            self._dbg_label_cache = (text, img)
        img = self._dbg_label_cache[1]
        if img.shape[0] + 4 <= self.height and img.shape[1] + 4 <= self.width:
            self.fb = composite_label(self.fb, img, 4, 4)

    def DebugStep(self, delta: int = 1) -> int:
        """Advance the object-stepping cursor (Ctrl+Alt+F11 equivalent);
        wraps past the entity count back to 'all'."""
        n = self.context.entity_table.count
        cur = self.GetDebugObjectCount()
        cur = 0 if cur < 0 else cur + delta
        if cur > n:
            cur = -1
        self.SetDebugObjectCount(cur)
        return cur

    def GetState(self) -> int:
        """Context state word (reference GetState/SetState)."""
        return getattr(self, "_state", 0)

    def SetState(self, state: int):
        self._state = int(state)

    def DestroyDevice(self) -> bool:
        """Tear down device-side arrays (reference DestroyDevice); the next
        Render() recreates them."""
        self._compiled = CompiledScene()
        return True

    def OnClearAll(self):
        """CKContext ClearAll notification (reference OnClearAll): drop
        per-frame registries and callbacks."""
        self.ClearCallbacks()
        self._objects = None
        self._compiled = CompiledScene()
        self.context._bump_topology()

    def ClearCallbacks(self):
        self.pre_render_callbacks = []
        self.post_render_callbacks = []
        self.post_sprite_callbacks = []

    def IsObjectAttached(self, obj) -> bool:
        """Explicit-membership test (reference IsObjectAttached)."""
        if self._objects is None:
            from .entity import CKRenderObject
            return isinstance(obj, CKRenderObject)
        return obj in self._objects

    def CopyToVideo(self) -> np.ndarray:
        """System -> video copy (reference CopyToVideo); the framebuffer IS
        device memory here, so this is the present view."""
        return self.framebuffer()

    def RestoreStereoRenderState(self):
        """Drop any per-eye overrides installed by a stereo pass (reference
        RestoreStereoRenderState)."""
        self._stereo_eye = None
        self._dp_view = None
        self._dp_proj = None

    # -- PV information watermark (reference LoadPVInformationTexture /
    # DrawPVInformationWatermark — the player-version overlay) -------------
    def LoadPVInformationTexture(self) -> bool:
        from .texture import CKTexture
        tex = getattr(self, "_pv_texture", None)
        if tex is None:
            tex = CKTexture(self.context, "__pv_watermark")
            img = np.zeros((8, 32, 4), np.float32)
            img[1:7, 1:31] = (1.0, 1.0, 1.0, 0.35)   # translucent bar
            img[3:5, 2:30, :3] = 0.1                 # dark stripe = "text"
            tex.SetImage(img)
            self._pv_texture = tex
        return True

    def DrawPVInformationWatermark(self) -> bool:
        if not self.LoadPVInformationTexture():
            return False
        img = self._pv_texture.GetImage()
        fb = self.framebuffer().copy()
        h, w = img.shape[0], img.shape[1]
        y0 = self.height - h - 2
        x0 = 2
        a = img[..., 3:4]
        fb[y0:y0 + h, x0:x0 + w, :3] = (
            fb[y0:y0 + h, x0:x0 + w, :3] * (1 - a) + img[..., :3] * a)
        return self.CopyFromMemoryBuffer(fb)

    # -- user clip planes (reference SetUserClipPlane/GetUserClipPlane,
    # include/CKRasterizer.h + CKDX9RasterizerContext.cpp:3408) -------------
    MAX_CLIP_PLANES = 6

    def _active_clip_planes(self) -> np.ndarray:
        """(P,4) enabled plane equations, index-ordered."""
        rows = [eq for i, (eq, on) in sorted(self.user_clip_planes.items())
                if on]
        if not rows:
            return np.zeros((0, 4), np.float32)
        return np.stack(rows).astype(np.float32)

    def SetUserClipPlane(self, index: int, plane) -> bool:
        """World-space plane equation (a,b,c,d); geometry on the side where
        a·x+b·y+c·z+d >= 0 is kept. Setting a plane enables it."""
        index = int(index)
        if not (0 <= index < self.MAX_CLIP_PLANES):
            return False
        eq = np.asarray(plane, np.float32).reshape(4)
        prev = self._active_clip_planes().shape[0]
        self.user_clip_planes[index] = (eq, True)
        if self._active_clip_planes().shape[0] != prev:
            self.context._bump_topology()   # P changes shapes/layout
        else:
            self.context._bump_dynamic()
        return True

    def GetUserClipPlane(self, index: int):
        entry = self.user_clip_planes.get(int(index))
        return None if entry is None else entry[0].copy()

    def EnableUserClipPlane(self, index: int, enable: bool = True) -> bool:
        entry = self.user_clip_planes.get(int(index))
        if entry is None:
            return False
        self.user_clip_planes[int(index)] = (entry[0], bool(enable))
        self.context._bump_topology()
        return True

    # -- framebuffer band sharding (parallel/tile_shard.py) -----------------
    def SetTileSharding(self, n_bands: int = 0, devices=None) -> bool:
        """Shard THIS context's framebuffer into n_bands horizontal bands,
        one per device (0 disables). The frame height must divide evenly.
        Falls back to single-device for stencil / accumulate frames."""
        import jax as _jax

        if n_bands <= 1:
            self._tile_mesh = None
            return True
        devs = list(devices) if devices is not None else _jax.devices()
        if len(devs) < n_bands or self.height % n_bands:
            return False
        from jax.sharding import Mesh

        self._tile_mesh = Mesh(np.asarray(devs[:n_bands]), ("band",))
        return True

    def GetTileSharding(self) -> int:
        return 0 if self._tile_mesh is None else self._tile_mesh.shape["band"]

    # -- stereo -------------------------------------------------------------
    def SetStereoParameters(self, eye_separation: float, focal_length: float):
        self.eye_separation = float(eye_separation)
        self.focal_length = float(focal_length)
        self.stereo_enabled = eye_separation > 0

    def GetStereoParameters(self):
        return self.eye_separation, self.focal_length

    # -- debug dumps (reference Ctrl+Alt+F10 screen dump,
    # src/CKRenderContext.cpp:589-603) ------------------------------------
    def DumpToFile(self, path: str, what: str = "color") -> bool:
        """Write the framebuffer ('color'), depth ('z'), or both to PNG."""
        from PIL import Image

        if what in ("color", "both"):
            rgba = self.BackToFront()
            Image.fromarray(rgba, "RGBA").save(
                path if what == "color" else path.replace(".png", "_color.png"))
        if what in ("z", "both"):
            z = np.asarray(self.zb)
            z8 = np.clip(z * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(z8, "L").save(
                path if what == "z" else path.replace(".png", "_z.png"))
        if what in ("stencil", "both") and getattr(self, "sb", None) is not None:
            s8 = (np.asarray(self.sb) * 255).astype(np.uint8)
            Image.fromarray(s8, "L").save(
                path if what == "stencil"
                else path.replace(".png", "_stencil.png"))
        return True

    def GetPhaseTimes(self) -> dict:
        return self.phases.as_dict()

    def Clear(self, flags: int = 0):
        self.fb = jnp.broadcast_to(
            jnp.asarray(self.background_color, jnp.float32)[:, None, None],
            self.fb.shape)
        self.zb = jnp.full_like(self.zb, self.clear_z)

    def BackToFront(self) -> np.ndarray:
        """uint8 RGBA snapshot of the framebuffer."""
        fb = np.moveaxis(np.asarray(self.fb), 0, -1)
        return np.clip(fb * 255.0 + 0.5, 0, 255).astype(np.uint8)

    def framebuffer(self) -> np.ndarray:
        return np.moveaxis(np.asarray(self.fb), 0, -1)

    def zbuffer(self) -> np.ndarray:
        return np.asarray(self.zb)

    def stencilbuffer(self) -> np.ndarray:
        """Stencil mask from STENCILONLY draws (uint8 0/1)."""
        return np.asarray(self.sb)

    # -- framebuffer blits (reference CopyTo/FromMemoryBuffer,
    # CKDX9RasterizerContext.cpp:~2900-3400) --------------------------------
    def CopyToMemoryBuffer(self, rect=None) -> np.ndarray:
        """(h,w,4) f32 copy of the framebuffer region (None = full)."""
        fb = self.framebuffer()
        if rect is None:
            return fb.copy()
        x0, y0, x1, y1 = (int(v) for v in rect)
        return fb[y0:y1, x0:x1].copy()

    def CopyFromMemoryBuffer(self, image, rect=None) -> bool:
        """Blit a host image into the framebuffer (uint8 or f32 RGB/RGBA)."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones(img.shape[:-1] + (1,), np.float32)], -1)
        fb = np.moveaxis(np.asarray(self.fb), 0, -1).copy()
        if rect is None:
            x0, y0 = 0, 0
        else:
            x0, y0 = int(rect[0]), int(rect[1])
        h = min(img.shape[0], fb.shape[0] - y0)
        w = min(img.shape[1], fb.shape[1] - x0)
        if h <= 0 or w <= 0:
            return False
        fb[y0:y0 + h, x0:x0 + w] = img[:h, :w]
        self.fb = jnp.asarray(np.moveaxis(fb, -1, 0))
        return True

    def GetStats(self) -> VxStats:
        return self.stats

    def GetFps(self) -> float:
        """Smoothed FPS (0.9/0.1 EMA over >=1s windows, reference
        src/CKRenderContext.cpp:898-908)."""
        return self.stats.SmoothedFps

    # -- picking (RCKRenderContext::Pick, src/CKRenderContext.cpp:1661-1900)
    def _pick_ray(self, x: float, y: float):
        """World-space eye ray through pixel (x,y), or None without camera."""
        cam = self.attached_camera
        if cam is None:
            return None
        vxp, vyp, vw, vh = self._effective_viewport()
        ndc_x = (x - vxp) / vw * 2.0 - 1.0
        ndc_y = 1.0 - (y - vyp) / vh * 2.0
        aspect = vw / max(vh, 1)
        proj = cam.projection_matrix(aspect)
        dir_cam = np.array([ndc_x / proj[0, 0], ndc_y / proj[1, 1], 1.0], np.float32)
        w = cam.GetWorldMatrix()
        return w[3, :3], dir_cam @ w[:3, :3]

    def Pick2D(self, x: float, y: float):
        """Front-most 2D entity under the pixel (reference Pick2D,
        src/CKRenderContext.cpp:1638-1659)."""
        from .entity2d import CK2dEntity

        roots = [o for o in self.context._objects.values()
                 if isinstance(o, CK2dEntity) and o.GetParent() is None]
        # foreground before background, high zorder first
        roots.sort(key=lambda e: (e.IsBackground(), -e.zorder))
        for r in roots:
            hit = r.Pick(x, y, self.width, self.height)
            if hit is not None:
                return hit
        return None

    def Pick3D(self, x: float, y: float, precise_texture: bool = False):
        """Nearest 3D hit: (entity, distance) or (None, inf). With
        ``precise_texture``, alpha-tested texels don't pick
        (PreciseTexturePick, reference src/CKMeshUtils.cpp:35+)."""
        ray = self._pick_ray(x, y)
        if ray is None:
            return None, float("inf")
        origin, direction = ray
        best = (None, float("inf"))
        for ent in self._scene_entities():
            if not ent.IsVisible() or ent.GetCurrentMesh() is None:
                continue
            hit = ent.RayIntersection(origin, direction)
            if hit is None or hit[0] >= best[1]:
                continue
            if precise_texture and self._alpha_rejects(ent, hit, origin,
                                                       direction):
                continue
            best = (ent, hit[0])
        return best

    # -- render extents (reference RCK3dEntity::GetRenderExtents,
    # src/CK3dEntity.cpp:2713; extents are updated during Render via the
    # rasterizer's ComputeBoxVisibility screen extents. Here they are
    # computed lazily from the camera matrices cached at the last Render,
    # so CK_RENDER_DONOTUPDATEEXTENTS costs nothing either way.) ----------
    def GetObjectExtents(self, ent) -> tuple | None:
        """Screen-space (left, top, right, bottom) of `ent`'s world bbox at
        the last rendered frame, clipped to the viewport; None when fully
        behind the camera or no frame was rendered yet."""
        cam = getattr(self, "_last_cam", None)
        if cam is None or ent.GetCurrentMesh() is None:
            return None
        view, proj, (vxp, vyp, vw, vh) = cam
        bmin, bmax = ent.GetBoundingBox()
        corners = np.array([[x, y, z, 1.0] for x in (bmin[0], bmax[0])
                            for y in (bmin[1], bmax[1])
                            for z in (bmin[2], bmax[2])], np.float32)
        clip = corners @ view @ proj
        w = clip[:, 3]
        front = w > 1e-6
        if not front.any():
            return None
        ndc = clip[front, :2] / w[front, None]
        sx = vxp + (ndc[:, 0] + 1.0) * 0.5 * vw
        sy = vyp + (1.0 - ndc[:, 1]) * 0.5 * vh
        # A bbox straddling the near plane extends to the viewport edge.
        if not front.all():
            return (float(vxp), float(vyp), float(vxp + vw), float(vyp + vh))
        left = max(float(sx.min()), float(vxp))
        top = max(float(sy.min()), float(vyp))
        right = min(float(sx.max()), float(vxp + vw))
        bottom = min(float(sy.max()), float(vyp + vh))
        if left >= right or top >= bottom:
            return None
        return (left, top, right, bottom)

    def _alpha_rejects(self, ent, hit, origin, direction) -> bool:
        """True when the hit texel's alpha fails the material alpha test."""
        dist, face = hit
        mesh = ent.GetCurrentMesh()
        if mesh.uvs.shape[0] == 0:
            return False
        mat = mesh.GetFaceMaterial(face)
        tex = mat.GetTexture(0) if mat is not None else None
        if tex is None:
            return False
        img = tex.current_image()
        if img is None:
            return False
        inv = ent.GetInverseWorldMatrix()
        o = np.asarray(origin, np.float32) @ inv[:3, :3] + inv[3, :3]
        d = np.asarray(direction, np.float32) @ inv[:3, :3]
        p = o + d * dist
        a, b, c = mesh.faces[face]
        va, vb, vc = mesh.positions[[a, b, c]]
        # barycentric coords of p
        v0, v1, v2 = vb - va, vc - va, p - va
        d00, d01 = v0 @ v0, v0 @ v1
        d11 = v1 @ v1
        d20, d21 = v2 @ v0, v2 @ v1
        den = d00 * d11 - d01 * d01
        if abs(den) < 1e-12:
            return False
        v = (d11 * d20 - d01 * d21) / den
        w_ = (d00 * d21 - d01 * d20) / den
        u = 1.0 - v - w_
        uv = u * mesh.uvs[a] + v * mesh.uvs[b] + w_ * mesh.uvs[c]
        h, w = img.shape[0], img.shape[1]
        tx = int(np.clip(uv[0] % 1.0 * w, 0, w - 1))
        ty = int(np.clip(uv[1] % 1.0 * h, 0, h - 1))
        return img[ty, tx, 3] < 0.5

    def Pick(self, x: int, y: int, precise_texture: bool = False):
        """2D entities first (front-to-back), then nearest 3D hit. Returns
        (object, distance) — distance 0 for 2D hits."""
        hit2d = self.Pick2D(x, y)
        if hit2d is not None:
            return hit2d, 0.0
        return self.Pick3D(x, y, precise_texture)

    def PickRect(self, rect) -> list:
        """Entities whose projected bbox intersects the pixel rect
        (RectPick, reference include/RCKRenderContext.h)."""
        cam = self.attached_camera
        if cam is None:
            return []
        x0, y0, x1, y1 = rect
        vxp, vyp, vw, vh = self._effective_viewport()
        aspect = vw / max(vh, 1)
        view = cam.view_matrix()
        proj = cam.projection_matrix(aspect)
        vp = view @ proj
        out = []
        for ent in self._scene_entities():
            if not ent.IsVisible() or ent.GetCurrentMesh() is None:
                continue
            bmin, bmax = ent.GetBoundingBox()
            corners = np.array([[x, y, z, 1.0] for x in (bmin[0], bmax[0])
                                for y in (bmin[1], bmax[1])
                                for z in (bmin[2], bmax[2])], np.float32)
            clip = corners @ vp
            w = clip[:, 3]
            front = w > 1e-6
            if not front.any():
                continue
            sx = vxp + vw * 0.5 + clip[front, 0] / w[front] * vw * 0.5
            sy = vyp + vh * 0.5 - clip[front, 1] / w[front] * vh * 0.5
            if sx.max() < x0 or sx.min() > x1 or sy.max() < y0 or sy.min() > y1:
                continue
            out.append(ent)
        return out

