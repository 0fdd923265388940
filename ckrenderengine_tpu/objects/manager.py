"""CKRenderManager + CKRenderedScene facade (reference RCKRenderManager,
/root/reference/src/CKRenderManager.cpp; CKRenderedScene
src/CKRenderedScene.cpp). The render layer was split round 3
(VERDICT #8): shared types live in .rendertypes, the context in
.rendercontext; this module keeps the full legacy surface by re-export.
"""

from .rendertypes import *          # noqa: F401,F403
from .rendertypes import (          # noqa: F401
    _pad_to, _mip_chain, _dc, CompiledScene, VxStats, VxEffectDescription,
)
from .rendercontext import CKRenderContext    # noqa: F401

class CKRenderManager(CKObject):
    """Owner of render contexts + global options
    (reference src/CKRenderManager.cpp:77-246)."""

    def __init__(self, context: CKContext, name: str = "RenderManager"):
        super().__init__(context, name)
        context.render_manager = self
        self.render_contexts: list[CKRenderContext] = []
        self._context_mask_free = 0xFFFFFFFF
        self._moved_entities: set[int] = set()
        self._last_frame_entities: set[int] = set()
        self._vertex_buffers: list = []
        self._object_index_next = 1
        self._object_index_free: list[int] = []
        self.default_material = CKMaterial(context, "DefaultMat")
        # The 17 legacy options (reference src/CKRenderManager.cpp:79-127).
        from ..settings import default_options
        self.options = default_options()
        self.effects: list[VxEffectDescription] = []
        self._register_default_effects()

    # -- effects registry (reference RegisterDefaultEffects/AddEffect/
    # GetEffectDescription, src/CKRenderManager.cpp:721-1050) -------------
    def _register_default_effects(self):
        for summary, max_tex in (("None", 0), ("TexGen", 0),
                                 ("TexGen with referential", 0),
                                 ("Bump Env Mapping", 3), ("DP3 Mapping", 2),
                                 ("2 Textures Blend", 2),
                                 ("3 Textures Blend", 3)):
            self.AddEffect(VxEffectDescription(summary=summary,
                                               max_texture_count=max_tex))

    def AddEffect(self, desc: "VxEffectDescription") -> int:
        """Register an effect; returns its VX_EFFECT code. Custom effects
        (codes past the built-ins) supply ``set_callback`` returning pass
        descriptors — the TPU-native form of the reference's stage-setup
        callback (the default branch of the SetAsCurrent effect switch,
        src/CKMaterial.cpp:1352-1360)."""
        self.effects.append(desc)
        return len(self.effects) - 1

    def GetEffectCount(self) -> int:
        return len(self.effects)

    def GetEffectDescription(self, i: int) -> "VxEffectDescription":
        return self.effects[i]

    def CreateRenderContext(self, width: int = 256, height: int = 256,
                            name: str = "RenderContext") -> CKRenderContext:
        rc = CKRenderContext(self.context, name, width, height)
        # Allocate a context mask bit (32 max in the reference; we grow).
        for bit in range(64):
            if self._context_mask_free & (1 << bit):
                self._context_mask_free &= ~(1 << bit)
                rc.mask = 1 << bit
                break
        self.render_contexts.append(rc)
        return rc

    def DestroyRenderContext(self, rc: CKRenderContext):
        if rc in self.render_contexts:
            self.render_contexts.remove(rc)
            self._context_mask_free |= rc.mask
        self.context.DestroyObject(rc)

    def CreateVertexBuffer(self, name: str = "", max_vertices: int = 1024):
        """User dynamic vertex buffer (reference
        RCKRenderManager::CreateVertexBuffer)."""
        from .vertexbuffer import CKVertexBuffer

        vb = CKVertexBuffer(self.context, name, max_vertices)
        self._vertex_buffers.append(vb)
        return vb

    def DestroyVertexBuffer(self, vb):
        """(reference DestroyVertexBuffer)"""
        if vb in self._vertex_buffers:
            self._vertex_buffers.remove(vb)
        self.context.DestroyObject(vb)

    def DeleteAllVertexBuffers(self):
        for vb in list(self._vertex_buffers):
            self.DestroyVertexBuffer(vb)

    # -- API-surface parity batch (reference include/RCKRenderManager.h) ---
    def GetDefaultMaterial(self):
        return self.default_material

    def GetRenderContextMaskFree(self) -> int:
        """Free context-mask bits (reference m_RenderContextMaskFree,
        src/CKRenderManager.cpp:131)."""
        return self._context_mask_free

    def ReleaseRenderContextMaskFree(self, mask: int):
        self._context_mask_free |= int(mask)

    def GetDesiredTexturesVideoFormat(self):
        return self.options.get("TextureVideoFormat", "32_ARGB8888")

    def SetDesiredTexturesVideoFormat(self, fmt):
        self.options["TextureVideoFormat"] = fmt

    def GetFullscreenContext(self):
        return None        # no OS fullscreen device on TPU

    def GetRenderContextFromPoint(self, pt):
        """Context whose viewport contains the point (reference
        GetRenderContextFromPoint — window hit test; viewport test here)."""
        x, y = float(pt[0]), float(pt[1])
        for rc in self.render_contexts:
            vx0, vy0, vw, vh = rc.viewport
            if vx0 <= x < vx0 + vw and vy0 <= y < vy0 + vh:
                return rc
        return None

    def GetPreferredSoftwareDriver(self) -> int:
        """Index of the software (numpy NULL) driver in the driver table."""
        from ..raster.caps import enumerate_drivers

        for i, d in enumerate(enumerate_drivers()):
            if not getattr(d, "hardware", True):
                return i
        return 0

    def GetDriver(self, index: int):
        return self.GetRenderDriverDescription(index)

    def AddMovedEntity(self, ent):
        """(reference AddMovedEntity — entities flag themselves on move;
        public hook kept for parity)."""
        self._moved_entities.add(ent.id)

    def RegisterLastFrameEntity(self, ent):
        self._last_frame_entities.add(ent.id)

    def UnregisterLastFrameEntity(self, ent):
        self._last_frame_entities.discard(ent.id)

    def FlushTextures(self):
        """Invalidate cached device texture stacks so the next frame
        re-uploads (reference FlushTextures — frees video memory copies)."""
        for rc in self.render_contexts:
            rc._compiled._tex_version = -1

    def RegisterDefaultEffects(self):
        self._register_default_effects()

    def PreClearAll(self):
        """Reset per-level state before a level clear (reference
        PreClearAll, src/CKRenderManager.cpp:273-309): detach objects from
        every context and drop temp callbacks."""
        for rc in self.render_contexts:
            rc.DetachViewpointFromCamera()
        self.CleanTemporaryCallbacks()
        self._moved_entities.clear()

    def OnCKEnd(self):
        self.DeleteAllVertexBuffers()

    def OnCKPause(self):
        return None

    # Shared object-index allocator (reference CKRasterizer::
    # CreateObjectIndex/ReleaseObjectIndex — textures/sprites/VB/IB/shaders
    # share one index space across rasterizers; handles are Python objects
    # here, so this is a plain counter table kept for API parity).
    def CreateObjectIndex(self, kind: int = 0) -> int:
        idx = self._object_index_free[-1] if self._object_index_free \
            else self._object_index_next
        if self._object_index_free:
            self._object_index_free.pop()
        else:
            self._object_index_next += 1
        return idx

    def ReleaseObjectIndex(self, index: int):
        self._object_index_free.append(int(index))

    def GetRenderContextCount(self) -> int:
        return len(self.render_contexts)

    def GetRenderContext(self, i: int) -> CKRenderContext:
        return self.render_contexts[i]

    def Process(self):
        """Render every active context (reference
        src/CKRenderManager.cpp:521-527; Activate(False) skips one)."""
        for rc in self.render_contexts:
            if rc.IsActive():
                rc.Render()

    def ProcessBatched(self, mesh=None):
        """Render every same-shape context as ONE vmapped (optionally
        mesh-sharded) device program — the TPU scale story for BASELINE
        config 5's '64 contexts across a slice' (SURVEY §5: contexts map to
        a batch axis; zero collectives).

        Contexts must share framebuffer size and scene topology signature
        (same compiled stream shapes); falls back to sequential Render for
        non-conforming contexts. ``mesh``: optional jax.sharding.Mesh with a
        'ctx' axis; None = single-device vmap.
        """
        from ..parallel.context_batch import (
            render_frames_batched, render_frames_sharded, stack_scenes,
        )

        if mesh is not None and not hasattr(mesh, "devices"):
            raise TypeError(
                "ProcessBatched(mesh=...) expects a jax.sharding.Mesh; it "
                "renders this manager's own contexts (like the reference's "
                "Process) — there is no context-list parameter")
        if not self.render_contexts:
            return
        groups: dict[tuple, list] = {}
        for rc in self.render_contexts:
            if rc._compiled.topology_version != rc.context._topology_version:
                rc._compile()
            rc._refresh_textures()
            sig = (rc.width, rc.height, rc._compiled.levels,
                   rc._compiled.ordered_cap,
                   rc._compiled.src_idx.shape, rc._compiled.tri_idx.shape)
            groups.setdefault(sig, []).append(rc)
        for sig, rcs in groups.items():
            if len(rcs) == 1:
                rcs[0].Render()
                continue
            if self._batch_packed(rcs, mesh=mesh):
                continue
            scenes = stack_scenes([rc._build_scene_device() for rc in rcs])
            w, h = sig[0], sig[1]
            if mesh is not None:
                fb, zb = render_frames_sharded(
                    scenes, mesh, sig[2], h, w, ordered_cap=sig[3])
            else:
                fb, zb = render_frames_batched(
                    scenes, sig[2], h, w, ordered_cap=sig[3])
            for i, rc in enumerate(rcs):
                rc.fb = fb[i]
                rc.zb = zb[i]

    def _batch_packed(self, rcs, mesh=None) -> bool:
        """Packed batch fast path: ONE f32 + ONE i32 transfer for the
        whole group via render_frames_packed_batched (the stacked-pytree
        fallback costs a tunnel round trip per pytree leaf); with ``mesh``
        the batch axis shards over the device mesh (zero collectives).
        Returns False when the group can't share one program (different
        packed layouts or params, stereo, no-clear flags)."""
        def membership(rc):
            return None if rc._objects is None else tuple(
                sorted(id(o) for o in rc._objects))

        filled = []
        for rc in rcs:
            if rc.stereo_enabled or rc.vertex_shader is not None \
                    or rc.target_texture is not None \
                    or getattr(rc._compiled, "dev_ids", None) \
                    or membership(rc) != membership(rcs[0]):
                return False
            if rc._compiled.topology_version != rc.context._topology_version:
                rc._compile()
            rc._frame_flags = rc.ResolveRenderFlags(0)
            if not (rc._frame_flags & CK_RENDER_CLEARBACKBUFFER) or \
               not (rc._frame_flags & CK_RENDER_CLEARZBUFFER):
                return False
            quads_bg, quads_fg = rc._quad_lists()
            if not (rc._frame_flags & CK_RENDER_BACKGROUNDSPRITES):
                quads_bg = []
            if not (rc._frame_flags & CK_RENDER_FOREGROUNDSPRITES):
                quads_fg = []
            rc._refresh_textures()
            filled.append(rc._fill_packed(quads_bg, quads_fg))
        key0 = (filled[0][3]["layout"], tuple(sorted(filled[0][3].keys())),
                filled[0][1].shape, filled[0][2].shape)
        for st, df, di, params in filled[1:]:
            if (params["layout"], tuple(sorted(params.keys())),
                    df.shape, di.shape) != key0:
                return False
            if params["ordered_cap"] != filled[0][3]["ordered_cap"] or \
               params["want_stencil"] != filled[0][3]["want_stencil"] or \
               params["want_bump"] != filled[0][3]["want_bump"] or \
               params["want_cube"] != filled[0][3]["want_cube"] or \
               params["pixel_shader"] is not filled[0][3]["pixel_shader"] or \
               params["anim"] is not filled[0][3]["anim"] or \
               params["sampler_profile"] != filled[0][3]["sampler_profile"] or \
               params.get("ss", 1) != filled[0][3].get("ss", 1) or \
               params.get("solve_caps") != filled[0][3].get("solve_caps") or \
               params["sort_transparent"] != filled[0][3]["sort_transparent"]:
                return False
        static, _f0, _i0, params = filled[0]
        dyn_f = np.stack([f for _s, f, _i, _p in filled])
        dyn_i = np.stack([i for _s, _f, i, _p in filled])
        # Bound-anim worlds (eval_anim_world outputs) stack on the ctx axis.
        worlds = [p.get("world_in") for _s, _f, _i, p in filled]
        params = dict(params)
        if any(w is not None for w in worlds):
            if any(w is None for w in worlds):
                return False
            import jax.numpy as jnp
            params["world_in"] = jnp.stack(worlds)
        else:
            params["world_in"] = None
        if mesh is not None:
            from ..parallel.context_batch import render_frames_packed_sharded
            out = render_frames_packed_sharded(static, dyn_f, dyn_i, mesh,
                                               **params)
        else:
            # Single-chip batch: lax.scan over the ctx axis with the Pallas
            # solve per context — measured 29.7 vs 41.9 ms for 8x256^2 vs
            # the vmapped XLA solve (benchmarks/batch_probe.py; vmap can't
            # carry Pallas kernels, so it pays the gather-bound XLA reduce).
            # The sharded multi-chip path keeps vmap (one context per chip
            # partition slot).
            w = params.pop("world_in", None)
            p = {k: v for k, v in params.items()
                 if k not in ("texdev", "texdev_rects")}
            # Stats outputs cost real tunnel time (see
            # CKRenderContext._render_packed): sample every 32nd batch;
            # batch ticks 0/1 are warmup so both variants precompile.
            rc0 = rcs[0]
            rc0._stat_tick_win = getattr(rc0, "_stat_tick_win", -1) + 1
            want_stats = (rc0._gov_enabled()
                          and (rc0._stat_tick_win % 32) == 0)
            out = fr.render_frame_packed_window(static, dyn_f, dyn_i,
                                                world_in=w,
                                                want_stats=want_stats, **p)
            if want_stats:
                out, dev_stats = out[:-1], out[-1]
                # batch-wide capacity governor: caps live on the group's
                # first context and propagate to the members (the group
                # compat check requires identical solve_caps)
                rcs[0]._governor_tick(dev_stats)
                for rc in rcs[1:]:
                    rc._solve_caps = rcs[0]._solve_caps
        if params["want_stencil"]:
            fb, zb, sb = out
        else:
            fb, zb = out
            sb = None
        for i, rc in enumerate(rcs):
            # Lazy slice handoff (rc.fb property): an eager fb[i]/zb[i]
            # dispatch pair costs ~1 ms/context on the tunnel.
            rc._fb_val = None
            rc._fb_src = (fb, i)
            rc._zb_val = None
            rc._zb_src = (zb, i)
            if sb is not None:
                rc.sb = sb[i]
        return True

    def PreProcess(self):
        """Save last-frame matrices + clear the moved list (reference
        RCKRenderManager::PreProcess, src/CKRenderManager.cpp:311-335 and
        SaveLastFrameMatrix :808)."""
        self.SaveLastFrameMatrix()
        self._moved_entities.clear()

    def PostProcess(self):
        self.CleanMovedEntities()
        self.CleanTemporaryCallbacks()

    def SaveLastFrameMatrix(self):
        from .entity import CK3dEntity

        for obj in self.context._objects.values():
            if isinstance(obj, CK3dEntity):
                obj._last_frame_matrix = obj.GetWorldMatrix()

    def CleanMovedEntities(self):
        """Clear HASMOVED flags (reference CleanMovedEntities :825)."""
        tbl = self.context.entity_table
        tbl.flags[: tbl.count] &= ~np.uint32(et.VX_MOVEABLE_HASMOVED)

    def GetMovedEntities(self) -> list:
        return [self.context.GetObject(i) for i in self._moved_entities]

    def CleanTemporaryCallbacks(self):
        """Drop temp callbacks after the frame (reference manager temp
        callback cleanup)."""
        for oid, obj in list(self.context._cb_objects.items()):
            obj.callbacks = [cb for cb in obj.callbacks if not cb[3]]
            if not obj.callbacks:
                self.context._cb_objects.pop(oid, None)
        for rc in self.render_contexts:
            rc.pre_render_callbacks = [
                cb for cb in rc.pre_render_callbacks if not cb[3]]
            rc.post_render_callbacks = [
                cb for cb in rc.post_render_callbacks if not cb[3]]
            rc.post_sprite_callbacks = [
                cb for cb in rc.post_sprite_callbacks if not cb[3]]

    # -- API-surface parity batch (reference include/RCKRenderManager.h) ---
    def AddTemporaryPreRenderCallback(self, fct, arg=None, rc=None):
        """Register a pre-render callback dropped after the next frame
        (reference AddTemporaryCallback; the manager clears temps in
        PostProcess)."""
        for target in ([rc] if rc is not None else self.render_contexts):
            target.AddPreRenderCallBack(fct, arg, temp=True)

    def AddTemporaryPostRenderCallback(self, fct, arg=None, rc=None):
        for target in ([rc] if rc is not None else self.render_contexts):
            target.AddPostRenderCallBack(fct, arg, temp=True)

    # reference naming aliases
    def AddTemporaryCallback(self, fct, arg=None, pre: bool = True):
        if pre:
            self.AddTemporaryPreRenderCallback(fct, arg)
        else:
            self.AddTemporaryPostRenderCallback(fct, arg)

    def RemoveTemporaryCallback(self, fct):
        for rc in self.render_contexts:
            rc.RemovePreRenderCallBack(fct)
            rc.RemovePostRenderCallBack(fct)

    def RemoveAllTemporaryCallbacks(self):
        """Drop every temp callback NOW, without waiting for PostProcess."""
        for rc in self.render_contexts:
            rc.pre_render_callbacks = [
                cb for cb in rc.pre_render_callbacks if not cb[3]]
            rc.post_render_callbacks = [
                cb for cb in rc.post_render_callbacks if not cb[3]]
            rc.post_sprite_callbacks = [
                cb for cb in rc.post_sprite_callbacks if not cb[3]]

    def ClearTemporaryCallbacks(self):
        self.CleanTemporaryCallbacks()

    def RemoveRenderContext(self, rc: "CKRenderContext"):
        """Detach a context from the manager without destroying the object
        (reference RemoveRenderContext; DestroyRenderContext also deletes)."""
        if rc in self.render_contexts:
            self.render_contexts.remove(rc)
            self._context_mask_free |= rc.mask

    def DetachAllObjects(self):
        """Remove every render object from every context (reference
        DetachAllObjects). Contexts in implicit everything-renders mode
        (``_objects is None``) switch to an explicit empty membership."""
        from .entity import CKRenderObject
        for rc in self.render_contexts:
            for obj in list(self.context._objects.values()):
                if isinstance(obj, CKRenderObject):
                    rc.RemoveObject(obj)
                    obj._in_render_context_mask &= ~rc.mask
            rc._objects = []
            self.context._bump_topology()

    def GetRootNode(self):
        """Scene-graph root facade (reference GetRootNode —
        CKSceneGraphRootNode; here a VIEW over the flat entity table,
        scene/scenegraph.py)."""
        from ..scene.scenegraph import CKSceneGraphRootNode
        if getattr(self, "_root_node", None) is None:
            self._root_node = CKSceneGraphRootNode(self)
        return self._root_node

    def CreateNode(self, entity=None):
        """Node view for an entity (reference CreateNode allocated real
        per-entity nodes; views are free)."""
        from ..scene.scenegraph import CKSceneGraphNode
        return CKSceneGraphNode(self, entity)

    def DeleteNode(self, node):
        """No-op: nodes are views (reference freed the allocation)."""

    def DestroyingDevice(self):
        """Device teardown notification (reference DestroyingDevice —
        D3D lost-device path): drop compiled scenes + device textures so the
        next Render() rebuilds from system memory."""
        self.FlushTextures()
        for rc in self.render_contexts:
            rc._compiled = CompiledScene()    # stale: next Render recompiles

    def GetValidFunctionsMask(self) -> int:
        """Which manager notifications are implemented (reference
        CKManagerImplementation mask): PreProcess | PostProcess |
        OnCKEnd | OnCKPause | PreClearAll | SequenceToBeDeleted |
        SequenceDeleted."""
        return 0x7F

    # CK2 sequence notifications (reference SequenceAddedToScene /
    # SequenceRemovedFromScene / SequenceToBeDeleted / SequenceDeleted):
    # scene membership changed or objects are dying — recompile.
    def SequenceAddedToScene(self, obj_ids=None):
        self.context._bump_topology()

    def SequenceRemovedFromScene(self, obj_ids=None):
        self.context._bump_topology()

    def SequenceToBeDeleted(self, obj_ids=None):
        for oid in (obj_ids or []):
            obj = self.context.GetObject(oid)
            if obj is not None:
                obj._to_be_deleted = True

    def SequenceDeleted(self, obj_ids=None):
        self.context._bump_topology()

    def StartDeviceTrace(self, log_dir: str) -> bool:
        """Begin a jax profiler trace covering subsequent frames (SURVEY §5
        tracing — the Tracy-equivalent; view in TensorBoard/Perfetto)."""
        from ..profiler import DeviceTraceSession
        self._trace_session = DeviceTraceSession(log_dir)
        return self._trace_session.Start()

    def StopDeviceTrace(self) -> bool:
        sess = getattr(self, "_trace_session", None)
        if sess is None:
            return False
        ok = sess.Stop()
        self._trace_session = None
        return ok

    def SetRenderOptions(self, name: str, value):
        self.options[name] = value

    def GetRenderOptions(self, name: str):
        return self.options.get(name)

    # -- driver enumeration (reference driver table, HW first then SW,
    # src/CKRenderManager.cpp:190-226) -------------------------------------
    def GetRenderDriverCount(self) -> int:
        from ..raster.caps import enumerate_drivers
        return len(enumerate_drivers())

    def GetRenderDriverDescription(self, i: int):
        from ..raster.caps import enumerate_drivers
        return enumerate_drivers()[i]

    def GetDriverCaps(self, i: int = 0):
        return self.GetRenderDriverDescription(i).caps


class CKRenderedScene:
    """Per-context scene-state facade (reference CKRenderedScene,
    include/CKRenderedScene.h:13-49 — camera/light/fog state + the per-frame
    Draw). The TPU build folds the per-frame Draw into the render context's
    one-program frame; this facade exposes the same state surface for API
    parity."""

    def __init__(self, rc: CKRenderContext):
        self.rc = rc

    def GetBackgroundColor(self):
        return self.rc.GetBackgroundColor()

    def SetBackgroundColor(self, rgba):
        self.rc.SetBackgroundColor(rgba)

    def GetAmbientLight(self):
        return self.rc.GetAmbientLight()

    def SetAmbientLight(self, rgba):
        self.rc.SetAmbientLight(rgba)

    def GetFogMode(self):
        return self.rc.GetFogMode()

    def GetAttachedCamera(self):
        return self.rc.GetAttachedCamera()

    def GetLights(self) -> list:
        from .light import CKLight
        return [o for o in self.rc.context._objects.values()
                if isinstance(o, CKLight)]

    def Get3dEntities(self) -> list:
        return self.rc._scene_entities()

    def Draw(self, flags: int = 0):
        """One frame (delegates to the fused frame program)."""
        return self.rc.Render(flags)
