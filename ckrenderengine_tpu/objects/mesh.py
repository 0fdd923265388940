"""CKMesh: geometry container with per-face materials and material groups.

API mirror of RCKMesh (/root/reference/include/RCKMesh.h, src/CKMesh.cpp):
vertex arrays (positions/normals/uvs/colors), faces with per-face material,
lines, prelit-vs-lit mode, normals building, and material-group construction
(CreateRenderGroups, src/CKMesh.cpp:4519-4810). TPU-first difference: a
"render group" here is just a face bucket + local vertex remap feeding the
scene compiler's instanced SoA stream — no strips, no HW vertex buffers
(tile binning on device subsumes vertex-cache optimization; the classic
striper/optimizer utilities live in ckrenderengine_tpu/geometry for API and
test parity).
"""

from __future__ import annotations

import numpy as np

from .base import CKCID_MESH, CKContext, CKObject

# VXMESH flags (public Virtools SDK values used by the reference)
VXMESH_BOUNDINGUPTODATE = 0x00000001
VXMESH_VISIBLE = 0x00000002
VXMESH_OPTIMIZED = 0x00000004
VXMESH_RENDERCHANNELS = 0x00000008
VXMESH_HASTRANSPARENCY = 0x00000010
VXMESH_PRELITMODE = 0x00000020
VXMESH_WRAPU = 0x00000040
VXMESH_WRAPV = 0x00000080
VXMESH_FORCETRANSPARENCY = 0x00001000
VXMESH_STRIPIFY = 0x00002000
VXMESH_PROCEDURALUV = 0x00004000
VXMESH_PROCEDURALPOS = 0x00008000


class MaterialGroup:
    """One per-material face bucket with local vertex remap — the CKVBuffer
    equivalent (reference include/CKRenderEngineTypes.h:589-602)."""

    def __init__(self, material, face_indices: np.ndarray, mesh: "CKMesh"):
        self.material = material
        self.face_indices = face_indices
        faces = mesh.faces[face_indices]          # (F,3) global indices
        uniq, inv = np.unique(faces.reshape(-1), return_inverse=True)
        self.vertex_map = uniq.astype(np.int32)   # local -> global
        self.local_faces = inv.reshape(-1, 3).astype(np.int32)


class CKMesh(CKObject):
    CLASS_ID = CKCID_MESH

    def __init__(self, context: CKContext, name: str = ""):
        super().__init__(context, name)
        self.positions = np.zeros((0, 3), np.float32)
        self.normals = np.zeros((0, 3), np.float32)
        self.uvs = np.zeros((0, 2), np.float32)
        self.colors = np.ones((0, 4), np.float32)       # prelit diffuse
        self.specular_colors = np.zeros((0, 3), np.float32)
        self.faces = np.zeros((0, 3), np.int32)
        self.face_materials = np.zeros(0, np.int32)      # index into material slots
        self.face_normals = np.zeros((0, 3), np.float32)
        self.face_channel_mask = np.zeros(0, np.uint32)
        self.lines = np.zeros((0, 2), np.int32)
        self.materials: list = [None]                    # slot 0 = default material
        self.channels: list = []                         # extra-UV material channels
        self.flags = VXMESH_VISIBLE
        self._groups: list[MaterialGroup] | None = None
        self._bbox: tuple[np.ndarray, np.ndarray] | None = None
        self._radius: float = 0.0
        self.weights = None                              # PM vertex weights
        self.pre_render_callbacks: list = []             # patch meshes hook here
        self.post_render_callbacks: list = []
        self.render_callback = None      # replaces default render when set

    # -- vertex API -------------------------------------------------------
    def SetVertexCount(self, n: int):
        def resize(a, fill=0.0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            m = min(n, a.shape[0])
            out[:m] = a[:m]
            return out

        self.positions = resize(self.positions)
        self.normals = resize(self.normals)
        self.uvs = resize(self.uvs)
        self.colors = resize(self.colors, 1.0)
        self.specular_colors = resize(self.specular_colors)
        self._dirty()

    def GetVertexCount(self) -> int:
        return int(self.positions.shape[0])

    def SetVertexPosition(self, i: int, pos):
        self.positions[i] = pos
        self._dirty()

    def GetVertexPosition(self, i: int) -> np.ndarray:
        return self.positions[i].copy()

    def SetVertexNormal(self, i: int, n):
        self.normals[i] = n
        self._dirty_dynamic()

    def GetVertexNormal(self, i: int) -> np.ndarray:
        return self.normals[i].copy()

    def SetVertexTextureCoordinates(self, i: int, u: float, v: float, channel: int = -1):
        if channel < 0:
            self.uvs[i] = (u, v)
        else:
            self.channels[channel]["uvs"][i] = (u, v)
        self._dirty_dynamic()

    def GetVertexTextureCoordinates(self, i: int, channel: int = -1):
        return tuple(self.uvs[i] if channel < 0 else self.channels[channel]["uvs"][i])

    def SetVertexColor(self, i: int, rgba):
        self.colors[i] = rgba
        self._dirty_dynamic()

    def GetVertexColor(self, i: int):
        return self.colors[i].copy()

    def SetVertexSpecularColor(self, i: int, rgb):
        self.specular_colors[i] = rgb[:3]
        self._dirty_dynamic()

    # Batch setters (the TPU-native fast path).
    def SetPositions(self, pos: np.ndarray):
        pos = np.asarray(pos, np.float32)
        if pos.shape[0] != self.positions.shape[0]:
            self.SetVertexCount(pos.shape[0])
            self.positions = pos.copy()
            self._dirty()
        else:
            # Same-shape update (morph targets, billboards, geomorph LOD):
            # dynamic-only — the compiled scene re-gathers the vertex pool
            # per frame without recompiling the frame program.
            self.positions = pos.copy()
            self._dirty_dynamic()

    def SetNormals(self, n: np.ndarray):
        self.normals = np.asarray(n, np.float32).copy()
        self._dirty_dynamic()

    def SetUVs(self, uv: np.ndarray):
        self.uvs = np.asarray(uv, np.float32).copy()
        self._dirty_dynamic()

    def SetColors(self, c: np.ndarray):
        self.colors = np.asarray(c, np.float32).copy()
        self._dirty_dynamic()

    # -- face API ---------------------------------------------------------
    def SetFaceCount(self, n: int):
        def resize(a, fill=0):
            out = np.full((n,) + a.shape[1:], fill, a.dtype)
            m = min(n, a.shape[0])
            out[:m] = a[:m]
            return out

        self.faces = resize(self.faces)
        self.face_materials = resize(self.face_materials)
        self.face_normals = resize(self.face_normals, 0.0)
        self.face_channel_mask = resize(self.face_channel_mask)
        self._dirty()

    def GetFaceCount(self) -> int:
        return int(self.faces.shape[0])

    def SetFaceVertexIndex(self, f: int, a: int, b: int, c: int):
        self.faces[f] = (a, b, c)
        self._dirty()

    def GetFaceVertexIndex(self, f: int):
        return tuple(int(v) for v in self.faces[f])

    def SetFaces(self, faces: np.ndarray):
        faces = np.asarray(faces, np.int32)
        if faces.shape[0] != self.faces.shape[0]:
            self.SetFaceCount(faces.shape[0])
        self.faces = faces.copy()
        self._dirty()

    def SetFaceMaterial(self, f, material):
        slot = self._material_slot(material)
        self.face_materials[f] = slot
        self._dirty()

    def GetFaceMaterial(self, f: int):
        return self.materials[self.face_materials[f]]

    def SetLineCount(self, n: int):
        out = np.zeros((n, 2), np.int32)
        m = min(n, self.lines.shape[0])
        out[:m] = self.lines[:m]
        self.lines = out
        self._dirty()

    def GetLineCount(self) -> int:
        return int(self.lines.shape[0])

    def SetLine(self, i: int, a: int, b: int):
        self.lines[i] = (a, b)
        self._dirty()

    def _material_slot(self, material) -> int:
        for i, m in enumerate(self.materials):
            if m is material:
                return i
        self.materials.append(material)
        return len(self.materials) - 1

    def ApplyGlobalMaterial(self, material):
        self.materials = [material]
        self.face_materials[:] = 0
        self._dirty()

    def GetMaterialCount(self) -> int:
        return len(self.materials)

    def GetMaterial(self, i: int):
        return self.materials[i]

    # -- channels (extra UV sets; reference RCKMesh channels) -------------
    def AddChannel(self, material, copy_uvs: bool = True) -> int:
        uvs = self.uvs.copy() if copy_uvs else np.zeros_like(self.uvs)
        self.channels.append({"material": material, "uvs": uvs, "active": True,
                              "src_blend": None, "dst_blend": None})
        self._dirty()
        return len(self.channels) - 1

    def RemoveChannel(self, idx: int):
        del self.channels[idx]
        self._dirty()

    def GetChannelCount(self) -> int:
        return len(self.channels)

    def ActivateChannel(self, idx: int, active: bool = True):
        self.channels[idx]["active"] = bool(active)
        self._dirty()

    def IsChannelActive(self, idx: int) -> bool:
        return self.channels[idx]["active"]

    def GetChannelMaterial(self, idx: int):
        return self.channels[idx]["material"]

    def SetChannelMaterial(self, idx: int, material):
        self.channels[idx]["material"] = material
        self._dirty()

    def SetChannelSourceBlend(self, idx: int, mode: int):
        """(reference RCKMesh::SetChannelSourceBlend)"""
        self.channels[idx]["src_blend"] = int(mode)
        self._dirty()

    def SetChannelDestBlend(self, idx: int, mode: int):
        self.channels[idx]["dst_blend"] = int(mode)
        self._dirty()

    def GetChannelSourceBlend(self, idx: int):
        return self.channels[idx]["src_blend"]

    def GetChannelDestBlend(self, idx: int):
        return self.channels[idx]["dst_blend"]

    # -- progressive mesh (reference RCKMesh::CreatePM src/CKMesh.cpp:3579+,
    # BuildRenderMesh LOD + geomorph :2580-2720) ---------------------------
    # -- PM vertex weights (reference RCKMesh::SetVertexWeightsCount /
    # SetVertexWeight / GetVertexWeightsPtr, include/RCKMesh.h:75-78,146:
    # per-vertex protection weights consumed by the PM collapse cost) -----
    def SetVertexWeightsCount(self, count: int):
        count = int(count)
        if count <= 0:
            self.weights = None
        else:
            w = np.zeros(count, np.float32)
            if self.weights is not None:
                n = min(count, self.weights.shape[0])
                w[:n] = self.weights[:n]
            self.weights = w
        self.data_version += 1

    def GetVertexWeightsCount(self) -> int:
        return 0 if self.weights is None else int(self.weights.shape[0])

    def SetVertexWeight(self, index: int, w: float):
        if self.weights is None:
            self.SetVertexWeightsCount(self.positions.shape[0])
        self.weights[index] = float(w)

    def GetVertexWeight(self, index: int) -> float:
        return 0.0 if self.weights is None else float(self.weights[index])

    def GetVertexWeightsPtr(self):
        return self.weights

    def CreatePM(self):
        """Compute the edge-collapse sequence (cost = distance x curvature)."""
        from ..utils.progressive import compute_collapse_order

        self._pm_full_positions = self.positions.copy()
        self._pm_full_faces = self.faces.copy()
        self._pm_full_face_materials = self.face_materials.copy()
        self._pm_rank, self._pm_collapse = compute_collapse_order(
            self.positions, self.faces, weights=self.weights)
        self._pm_vertex_count = self.positions.shape[0]
        self._pm_geomorph = 0.0
        return True

    def DestroyPM(self):
        if not self.IsPM():
            return
        self.SetPositions(self._pm_full_positions)
        self.SetFaces(self._pm_full_faces)
        self.face_materials = self._pm_full_face_materials.copy()
        self._pm_rank = None
        self._dirty()

    def IsPM(self) -> bool:
        return getattr(self, "_pm_rank", None) is not None

    def SetPMVertexCount(self, n: int):
        """Rebuild the render mesh at an n-vertex budget."""
        from ..utils.progressive import faces_at_lod, lod_remap

        if not self.IsPM():
            return
        self._pm_vertex_count = int(n)
        remap = lod_remap(self._pm_rank, self._pm_collapse, n)
        full_faces = self._pm_full_faces
        f = remap[full_faces]
        keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        self.faces = f[keep].astype(np.int32)
        self.face_materials = self._pm_full_face_materials[keep]
        self.face_normals = np.zeros((self.faces.shape[0], 3), np.float32)
        self.face_channel_mask = np.zeros(self.faces.shape[0], np.uint32)
        self._dirty()

    def GetPMVertexCount(self) -> int:
        return getattr(self, "_pm_vertex_count", self.positions.shape[0])

    def SetPMGeoMorphStep(self, step: float):
        """Geomorph lerp toward the collapsed representatives (dynamic-only:
        no recompile)."""
        from ..utils.progressive import geomorph_positions

        if not self.IsPM():
            return
        self._pm_geomorph = float(np.clip(step, 0.0, 1.0))
        self.positions = geomorph_positions(
            self._pm_full_positions, self._pm_rank, self._pm_collapse,
            self._pm_vertex_count, self._pm_geomorph)
        self._dirty_dynamic()

    def GetPMGeoMorphStep(self) -> float:
        return getattr(self, "_pm_geomorph", 0.0)

    # -- normals ----------------------------------------------------------
    def BuildFaceNormals(self):
        """Per-face unit normals (reference g_BuildFaceNormals,
        src/CKMeshUtils.cpp / src/CKMesh.cpp:537-560)."""
        if self.faces.shape[0] == 0:
            return
        v0 = self.positions[self.faces[:, 0]]
        e1 = self.positions[self.faces[:, 1]] - v0
        e2 = self.positions[self.faces[:, 2]] - v0
        n = np.cross(e1, e2)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        self.face_normals = (n / np.maximum(ln, 1e-30)).astype(np.float32)
        self._dirty_dynamic()

    def BuildNormals(self):
        """Area-weighted vertex normals from face normals."""
        self.BuildFaceNormals()
        acc = np.zeros_like(self.positions)
        for c in range(3):
            np.add.at(acc, self.faces[:, c], self.face_normals)
        ln = np.linalg.norm(acc, axis=-1, keepdims=True)
        self.normals = (acc / np.maximum(ln, 1e-30)).astype(np.float32)
        self._dirty_dynamic()

    # -- topology helpers (reference RCKMesh API) -------------------------
    def InverseWinding(self):
        self.faces = self.faces[:, ::-1].copy()
        self._dirty()

    def Clean(self):
        """Drop degenerate faces (repeated indices)."""
        f = self.faces
        keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        self.faces = f[keep].copy()
        self.face_materials = self.face_materials[keep].copy()
        self.face_normals = self.face_normals[keep].copy() if self.face_normals.shape[0] == keep.shape[0] else self.face_normals
        self.face_channel_mask = self.face_channel_mask[keep].copy()
        self._dirty()

    def Consolidate(self):
        """Weld identical vertices (position+normal+uv) and remap faces."""
        key = np.concatenate([self.positions, self.normals, self.uvs, self.colors], -1)
        uniq, idx, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
        order = np.argsort(idx)
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        sel = idx[order]
        self.positions = self.positions[sel].copy()
        self.normals = self.normals[sel].copy()
        self.uvs = self.uvs[sel].copy()
        self.colors = self.colors[sel].copy()
        self.specular_colors = self.specular_colors[sel].copy()
        self.faces = rank[inv][self.faces].astype(np.int32)
        self._dirty()

    def UnOptimize(self):
        self.flags &= ~VXMESH_OPTIMIZED
        self._groups = None
        self.context._bump_topology()

    # -- material groups --------------------------------------------------
    def CreateRenderGroups(self):
        """Bucket faces per material (reference src/CKMesh.cpp:4519-4810).

        Per-group face order follows the reference's optimize step: with
        VXMESH_STRIPIFY the stripifier's emission order (NvStripifier branch,
        :4743-4793), otherwise vertex-cache-optimized order (:4795+). On TPU
        the order only affects exact-depth ties and transparent draws — the
        deferred reduce is order-independent — but the cache-friendly order
        also improves the host-side gather locality of the instanced stream.
        """
        groups = []
        if self.faces.shape[0]:
            for slot in np.unique(self.face_materials):
                fi = np.nonzero(self.face_materials == slot)[0]
                mat = self.materials[slot] if slot < len(self.materials) else None
                fi = self._optimize_group_order(fi)
                groups.append(MaterialGroup(mat, fi, self))
        self._groups = groups
        self.flags |= VXMESH_OPTIMIZED
        return groups

    def _optimize_group_order(self, face_indices: np.ndarray) -> np.ndarray:
        if face_indices.shape[0] < 3:
            return face_indices
        from ..utils.geometry import (
            MeshStriper, VertexCacheOptimizer, strip_to_triangles,
        )
        from ..settings import get_dword

        faces = self.faces[face_indices]
        if self.flags & VXMESH_STRIPIFY:
            ms = MeshStriper()
            ms.Compute(faces)
            tris = np.concatenate(
                [strip_to_triangles(s) for s in ms.strips]) \
                if ms.strips else faces
            # map stripified triangles back to original face rows
            key = {tuple(sorted(f)): i for i, f in enumerate(map(tuple, faces))}
            order = []
            seen = set()
            for t in map(tuple, tris):
                i = key.get(tuple(sorted(t)))
                if i is not None and i not in seen:
                    seen.add(i)
                    order.append(i)
            for i in range(faces.shape[0]):
                if i not in seen:
                    order.append(i)
            return face_indices[np.asarray(order, np.int64)]
        cache = get_dword("VertexCache", 16)
        opt = VertexCacheOptimizer(cache)
        order = opt.Optimize(faces, self.positions.shape[0])
        return face_indices[order.astype(np.int64)]

    def GetRenderGroups(self) -> list[MaterialGroup]:
        if self._groups is None or not (self.flags & VXMESH_OPTIMIZED):
            self.CreateRenderGroups()
        return self._groups

    # -- bbox -------------------------------------------------------------
    def GetLocalBox(self):
        if self._bbox is None:
            if self.positions.shape[0]:
                self._bbox = (self.positions.min(0), self.positions.max(0))
            else:
                z = np.zeros(3, np.float32)
                self._bbox = (z, z)
        return self._bbox

    def GetRadius(self) -> float:
        bmin, bmax = self.GetLocalBox()
        return float(np.linalg.norm(bmax - bmin) * 0.5)

    def GetBaryCenter(self) -> np.ndarray:
        if self.positions.shape[0] == 0:
            return np.zeros(3, np.float32)
        return self.positions.mean(0)

    # -- modes ------------------------------------------------------------
    def SetLitMode(self, prelit: bool):
        if prelit:
            self.flags |= VXMESH_PRELITMODE
        else:
            self.flags &= ~VXMESH_PRELITMODE
        self.context._bump_topology()

    def IsPreLitMode(self) -> bool:
        return bool(self.flags & VXMESH_PRELITMODE)

    def SetTransparent(self, t: bool):
        if t:
            self.flags |= VXMESH_FORCETRANSPARENCY
        else:
            self.flags &= ~VXMESH_FORCETRANSPARENCY
        self.context._bump_topology()

    def IsTransparent(self) -> bool:
        """Transparent if forced, or any face material is alpha-transparent
        (reference RCKMesh transparency derivation)."""
        if self.flags & VXMESH_FORCETRANSPARENCY:
            return True
        return any(m is not None and m.IsAlphaTransparent() for m in self.materials)

    # -- render callbacks (reference RCKMesh::AddPreRenderCallBack /
    # SetRenderCallBack) ----------------------------------------------------
    def AddPreRenderCallBack(self, fct, arg=None):
        self.pre_render_callbacks.append(
            fct if arg is None else (lambda dev, mesh: fct(dev, mesh, arg)))
        self.context._prerender_objects[self.id] = self

    # -- API-surface parity batch (reference include/RCKMesh.h) ------------
    # Raw array access (reference Get*Ptr — live numpy views; mutations
    # must be followed by the matching *Changed() notifications, exactly
    # like the reference's modifier protocol).
    def GetPositionsPtr(self) -> np.ndarray:
        return self.positions

    def GetNormalsPtr(self) -> np.ndarray:
        return self.normals

    def GetColorsPtr(self) -> np.ndarray:
        return self.colors

    def GetSpecularColorsPtr(self) -> np.ndarray:
        return self.specular_colors

    def GetTextureCoordinatesPtr(self, channel: int = -1) -> np.ndarray:
        return self.uvs if channel < 0 else self.channels[channel]["uvs"]

    def GetFacesIndices(self) -> np.ndarray:
        return self.faces

    def GetFaceVertex(self, face: int, corner: int) -> int:
        return int(self.faces[face, corner])

    def GetFaceNormal(self, face: int) -> np.ndarray:
        a, b, c = self.faces[face]
        n = np.cross(self.positions[b] - self.positions[a],
                     self.positions[c] - self.positions[a])
        ln = np.linalg.norm(n)
        return (n / ln if ln > 1e-30 else n).astype(np.float32)

    def GetFaceNormalsPtr(self) -> np.ndarray:
        a = self.positions[self.faces[:, 0]]
        n = np.cross(self.positions[self.faces[:, 1]] - a,
                     self.positions[self.faces[:, 2]] - a)
        ln = np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
        return (n / ln).astype(np.float32)

    # Modifier protocol (reference GetModifierVertices/VertexMove — the
    # mutable vertex window that skins/morphs write into; here the arrays
    # themselves are the modifier, with explicit dirty notifications).
    def GetModifierVertexCount(self) -> int:
        return self.GetVertexCount()

    def GetModifierVertices(self) -> np.ndarray:
        return self.positions

    def ModifierVertexMove(self, rebuild_normals: bool = True,
                           rebuild_faces: bool = True):
        if rebuild_normals:
            self.BuildNormals()
        self._dirty_dynamic()

    def GetModifierUVCount(self, channel: int = -1) -> int:
        return self.GetVertexCount()

    def GetModifierUVs(self, channel: int = -1) -> np.ndarray:
        return self.GetTextureCoordinatesPtr(channel)

    def ModifierUVMove(self):
        self._dirty_dynamic()

    def VertexMove(self):
        self._dirty_dynamic()

    def NormalChanged(self):
        self._dirty_dynamic()

    def UVChanged(self):
        self._dirty_dynamic()

    def ColorChanged(self):
        self._dirty_dynamic()

    def UpdateBoundingVolumes(self):
        self._dirty_dynamic()
        return self.GetLocalBox()

    # Bulk vertex transforms (reference TranslateVertices/RotateVertices/
    # ScaleVertices).
    def TranslateVertices(self, v):
        self.positions += np.asarray(v, np.float32)
        self._dirty_dynamic()

    def RotateVertices(self, axis, angle: float):
        from ..math.vxmath import np_rotation_axis_angle

        r = np_rotation_axis_angle(axis, float(angle))[:3, :3]
        self.positions = (self.positions @ r).astype(np.float32)
        if self.normals.size:
            self.normals = (self.normals @ r).astype(np.float32)
        self._dirty_dynamic()

    def ScaleVertices(self, s, pivot=None):
        s3 = np.broadcast_to(np.asarray(s, np.float32), (3,))
        p = (np.zeros(3, np.float32) if pivot is None
             else np.asarray(pivot, np.float32))
        self.positions = ((self.positions - p) * s3 + p).astype(np.float32)
        self._dirty_dynamic()

    def ScaleVertices3f(self, sx, sy, sz, pivot=None):
        self.ScaleVertices((sx, sy, sz), pivot)

    # Flags / wrap / lit mode.
    def SetFlags(self, flags: int):
        self.flags = int(flags)
        self._dirty()

    def GetFlags(self) -> int:
        return self.flags

    def SetWrapMode(self, mode: int):
        self._wrap_mode = int(mode)

    def GetWrapMode(self) -> int:
        return getattr(self, "_wrap_mode", 0)

    def GetLitMode(self) -> int:
        return 0 if self.IsPreLitMode() else 1

    # Lines.
    def CreateLineStrip(self, count: int, indices=None):
        """Append a polyline as (count-1) line segments (reference
        CreateLineStrip)."""
        idx = (np.arange(count, dtype=np.int32) if indices is None
               else np.asarray(indices, np.int32))
        segs = np.stack([idx[:-1], idx[1:]], -1)
        base = self.lines.shape[0]
        self.SetLineCount(base + segs.shape[0])
        self.lines[base:] = segs
        self._dirty()
        return base

    def GetLine(self, i: int):
        return tuple(int(x) for x in self.lines[i])

    def GetLineIndices(self) -> np.ndarray:
        return self.lines

    # Channels (extensions of the existing channel API).
    def ActivateAllChannels(self, active: bool = True):
        for ch in self.channels:
            ch["active"] = bool(active)
        self._dirty()

    def GetChannelByMaterial(self, mat) -> int:
        for i, ch in enumerate(self.channels):
            if ch["material"] is mat:
                return i
        return -1

    def RemoveChannelByMaterial(self, mat):
        i = self.GetChannelByMaterial(mat)
        if i >= 0:
            self.RemoveChannel(i)

    def LitChannel(self, idx: int, lit: bool = True):
        self.channels[idx]["lit"] = bool(lit)
        self._dirty()

    def IsChannelLit(self, idx: int) -> bool:
        return bool(self.channels[idx].get("lit", True))

    def SetChannelFlags(self, idx: int, flags: int):
        self.channels[idx]["flags"] = int(flags)
        self._dirty()

    def GetChannelFlags(self, idx: int) -> int:
        return int(self.channels[idx].get("flags", 0))

    def SetFaceChannelMask(self, face: int, mask: int):
        self.face_channel_mask[face] = np.uint32(mask)
        self._dirty()

    def GetFaceChannelMask(self, face: int) -> int:
        return int(self.face_channel_mask[face])

    def ChangeFaceChannelMask(self, face: int, add_mask: int,
                              remove_mask: int = 0):
        m = int(self.face_channel_mask[face])
        self.face_channel_mask[face] = np.uint32((m | int(add_mask))
                                                 & ~int(remove_mask))
        self._dirty()

    # Material groups.
    def GetMaterialGroupIndex(self, mat) -> int:
        for i, m in enumerate(self.materials):
            if m is mat:
                return i
        return -1

    def ReplaceMaterial(self, old, new):
        """Swap a material everywhere it appears (reference
        ReplaceMaterial)."""
        changed = False
        for i, m in enumerate(self.materials):
            if m is old:
                self.materials[i] = new
                changed = True
        for ch in self.channels:
            if ch["material"] is old:
                ch["material"] = new
                changed = True
        if changed:
            self._dirty()
        return changed

    def GetVBuffer(self, group: int = 0):
        """Per-group remap arrays (the CKVBuffer analogue: vertex_map /
        local_faces of the material group)."""
        groups = self.GetRenderGroups()
        return groups[group] if 0 <= group < len(groups) else None

    # HW buffer checks: device arrays ARE the video-memory copies here.
    def CheckHWVertexBuffer(self) -> bool:
        return True

    def CheckHWIndexBuffer(self) -> bool:
        return True

    # Render counters (reference Set/GetVerticesRendered).
    def SetVerticesRendered(self, n: int):
        self._vertices_rendered = int(n)

    def GetVerticesRendered(self) -> int:
        return getattr(self, "_vertices_rendered", self.GetVertexCount())

    # Post-render + sub-mesh callbacks (reference AddPostRenderCallBack /
    # AddSubMesh*RenderCallBack / SetRenderCallBack). The custom render
    # callback REPLACES the default mesh render when set (reference
    # SetRenderCallBack semantics) — the scene compiler skips this mesh's
    # triangles and the callback fires instead.
    def AddPostRenderCallBack(self, fct, arg=None):
        self.post_render_callbacks.append(
            fct if arg is None else (lambda dev, mesh: fct(dev, mesh, arg)))
        self.context._prerender_objects[self.id] = self

    def RemovePostRenderCallBack(self, fct):
        if fct in self.post_render_callbacks:
            self.post_render_callbacks.remove(fct)

    def AddSubMeshPreRenderCallBack(self, fct, arg=None):
        self.AddPreRenderCallBack(fct, arg)

    def AddSubMeshPostRenderCallBack(self, fct, arg=None):
        self.AddPostRenderCallBack(fct, arg)

    def RemoveSubMeshPreRenderCallBack(self, fct):
        if fct in self.pre_render_callbacks:
            self.pre_render_callbacks.remove(fct)

    def RemoveSubMeshPostRenderCallBack(self, fct):
        self.RemovePostRenderCallBack(fct)

    def SetRenderCallBack(self, fct, arg=None):
        self.render_callback = (fct, arg)
        self.context._prerender_objects[self.id] = self
        self._dirty()

    def SetDefaultRenderCallBack(self):
        self.render_callback = None
        self._dirty()

    def RemoveAllCallbacks(self):
        self.pre_render_callbacks.clear()
        self.post_render_callbacks.clear()
        self.render_callback = None
        self._dirty()

    def RemovePreRenderCallBacks(self):
        self.pre_render_callbacks.clear()

    # -- API-surface parity batch 2 (reference include/RCKMesh.h) ----------
    def GetVertexSpecularColor(self, i: int):
        return tuple(float(v) for v in self.specular_colors[i])

    def SetFaceMaterialEx(self, face_indices, material):
        """Set one material on a list of faces in one call (reference
        SetFaceMaterialEx) — vectorized write into the face-material
        column."""
        slot = self._material_slot(material)
        idx = np.asarray(face_indices, np.int64).reshape(-1)
        self.face_materials[idx] = slot
        self._dirty()

    def DissociateAllFaces(self):
        """Unshare every vertex: each face corner gets its own vertex
        (reference DissociateAllFaces, src/CKMesh.cpp — gather by the
        flattened index list, faces become 0..3F-1)."""
        flat = self.faces.reshape(-1).astype(np.int64)
        n = flat.shape[0]
        if n == 0:
            return
        self.positions = self.positions[flat].copy()
        self.normals = self.normals[flat].copy() \
            if self.normals.shape[0] else self.normals
        self.uvs = self.uvs[flat].copy() if self.uvs.shape[0] else self.uvs
        self.colors = self.colors[flat].copy() \
            if self.colors.shape[0] else self.colors
        self.specular_colors = self.specular_colors[flat].copy() \
            if self.specular_colors.shape[0] else self.specular_colors
        if self.weights is not None and len(self.weights):
            self.weights = np.asarray(self.weights,
                                      np.float32)[flat].copy()
        for ch in self.channels:
            if ch["uvs"].shape[0]:
                ch["uvs"] = ch["uvs"][flat].copy()
        self.faces = np.arange(n, dtype=np.int32).reshape(-1, 3)
        self._dirty()

    def EnablePMGeoMorph(self, enable: bool = True):
        """Gate the progressive-mesh geomorph lerp (reference
        EnablePMGeoMorph); disabled = hard LOD pops."""
        self._pm_geomorph = bool(enable)
        self._dirty_dynamic()

    def IsPMGeoMorphEnabled(self) -> bool:
        return getattr(self, "_pm_geomorph", True)

    def SetSaveFlags(self, flags: int):
        """Which streams Save() persists (reference Get/SetSaveFlags)."""
        self._save_flags = int(flags)

    def GetSaveFlags(self) -> int:
        return getattr(self, "_save_flags", 0xFFFFFFFF)

    def LoadVertices(self, chunk) -> bool:
        """Read the vertex streams back from an ID_MESH statechunk
        (reference LoadVertices/ILoadVertices, include/RCKMesh.h:183-188)."""
        from ..io.serialize import ID_MESH
        if not chunk.SeekIdentifier(ID_MESH):
            return False
        self.SetPositions(chunk.ReadArray())
        self.normals = chunk.ReadArray()
        self.uvs = chunk.ReadArray()
        self.colors = chunk.ReadArray()
        self.specular_colors = chunk.ReadArray()
        self._dirty()
        return True

    def UpdateChannelIndices(self):
        """Resize channel UV arrays after a vertex-count change (reference
        UpdateChannelIndices keeps channel data in step with topology)."""
        n = self.GetVertexCount()
        for ch in self.channels:
            uvs = ch["uvs"]
            if uvs.shape[0] != n:
                out = np.zeros((n, 2), np.float32)
                out[:min(n, uvs.shape[0])] = uvs[:min(n, uvs.shape[0])]
                ch["uvs"] = out
        self._dirty()

    def UpdateHasValidPrimitives(self, group=None) -> bool:
        """True when the group (or any group) has triangles to draw
        (reference UpdateHasValidPrimitives)."""
        if group is not None:
            return group.local_faces.shape[0] > 0
        return any(g.local_faces.shape[0] > 0 for g in self.GetRenderGroups())

    def CreateNewMaterialGroup(self, material) -> int:
        """Ensure a material slot exists and rebuild groups (reference
        CreateNewMaterialGroup); returns the slot index."""
        slot = self._material_slot(material)
        self._dirty()
        return slot

    def DeleteRenderGroup(self, i: int) -> bool:
        """Drop one material's group: its faces move to slot 0 (reference
        DeleteRenderGroup)."""
        if not (0 <= i < len(self.materials)) or len(self.materials) <= 1:
            return False
        self.face_materials[self.face_materials == i] = 0
        self.face_materials[self.face_materials > i] -= 1
        self.materials.pop(i)
        self._dirty()
        return True

    def ResetMaterialGroup(self):
        """Collapse every face back to the first material (reference
        ResetMaterialGroup)."""
        self.face_materials[:] = 0
        del self.materials[1:]
        self._dirty()

    def DeleteVBuffer(self):
        """Drop the cached render groups (the CKVBuffer remaps; reference
        DeleteVBuffer) — rebuilt on next use."""
        self._groups = None
        self._dirty()

    def ILoadVertices(self, chunk) -> bool:
        return self.LoadVertices(chunk)

    # CK2 scene-membership notifications (reference AddToScene/
    # RemoveFromScene on CKSceneObject).
    def AddToScene(self, scene=None, dependencies: bool = True):
        self.context._bump_topology()

    def RemoveFromScene(self, scene=None, dependencies: bool = True):
        self.context._bump_topology()

    # -- immediate-mode render entry points (reference RCKMesh::Render ->
    # DefaultRender -> RenderGroup/RenderChannels, src/CKMesh.cpp:3256,
    # 3857, 4210, 4390). The engine's per-frame path compiles the mesh into
    # the frame program; these draw NOW onto rc's framebuffer — the default
    # behavior a custom render callback can invoke. ------------------------
    def Render(self, rc, entity=None) -> bool:
        for cb in list(self.pre_render_callbacks):
            cb(rc, self)
        ok = self.DefaultRender(rc, entity)
        for cb in list(self.post_render_callbacks):
            cb(rc, self)
        return ok

    def DefaultRender(self, rc, entity=None) -> bool:
        if self.GetFaceCount() == 0:
            return False
        world = (entity.GetWorldMatrix() if entity is not None
                 else np.eye(4, dtype=np.float32))
        rc.SetWorldTransformationMatrix(world)
        ok = True
        groups = self.GetRenderGroups()
        # opaque groups first, then transparent (reference :4092-4123)
        order = ([g for g in groups if g.material is None
                  or not g.material.IsAlphaTransparent()]
                 + [g for g in groups if g.material is not None
                    and g.material.IsAlphaTransparent()])
        for g in order:
            ok = self.RenderGroup(rc, g, entity) and ok
        if self.channels:
            ok = self.RenderChannels(rc, entity) and ok
        return ok

    def RenderGroup(self, rc, group, entity=None) -> bool:
        """Draw one material group immediately (reference RenderGroup)."""
        vm = group.vertex_map
        n = vm.shape[0]
        if n == 0 or group.local_faces.shape[0] == 0:
            return True
        s = rc.GetDrawPrimitiveStructure(transformed=False, vertex_count=n)
        s["positions"][:] = self.positions[vm]
        s["uvs"][:] = self.uvs[vm] if self.uvs.shape[0] else 0.0
        mat = group.material
        if self.IsPreLitMode() and self.colors.shape[0]:
            s["colors"][:] = self.colors[vm]
        elif mat is not None:
            s["colors"][:] = np.asarray(mat.GetDiffuse(), np.float32)
        if mat is not None:
            rc.SetCurrentMaterial(mat)
        try:
            return rc.DrawPrimitive(2, group.local_faces.reshape(-1), s)
        finally:
            rc.SetCurrentMaterial(None)

    def RenderChannels(self, rc, entity=None) -> bool:
        """Draw the active material channels as extra blended passes
        (reference RenderChannels, src/CKMesh.cpp:4390+)."""
        ok = True
        for ch in self.channels:
            if not ch.get("active", True):
                continue
            mat = ch.get("material")
            n = self.GetVertexCount()
            s = rc.GetDrawPrimitiveStructure(transformed=False,
                                             vertex_count=n)
            s["positions"][:] = self.positions
            s["uvs"][:] = ch["uvs"] if ch["uvs"].shape[0] else 0.0
            if mat is not None:
                s["colors"][:] = np.asarray(mat.GetDiffuse(), np.float32)
                rc.SetCurrentMaterial(mat)
            try:
                ok = rc.DrawPrimitive(2, self.faces.reshape(-1), s) and ok
            finally:
                rc.SetCurrentMaterial(None)
        return ok

    # -- dirty ------------------------------------------------------------
    def _dirty(self):
        self._groups = None
        self._bbox = None
        self.flags &= ~VXMESH_OPTIMIZED
        self.data_version = getattr(self, "data_version", 0) + 1
        self.context._bump_topology()

    def _dirty_dynamic(self):
        self._bbox = None
        self.data_version = getattr(self, "data_version", 0) + 1
        self.context._bump_dynamic()


# -- mesh math dispatch (reference SetProcessorSpecific_FunctionsPtr /
# g_BuildNormals / g_BuildFaceNormals / g_Normalize / g_RayIntersection,
# src/CKMeshUtils.cpp:9-27 — SSE dispatch is a CPU-era detail; these are
# the generic entry points, vectorized numpy) --------------------------------

def BuildNormalsGenericFunc(mesh: "CKMesh"):
    mesh.BuildNormals()


def BuildFaceNormalsGenericFunc(mesh: "CKMesh") -> np.ndarray:
    return mesh.BuildFaceNormals()


def NormalizeGenericFunc(vectors) -> np.ndarray:
    v = np.asarray(vectors, np.float32)
    ln = np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return (v / ln).astype(np.float32)


def RayIntersectionGenericFunc(origin, direction, entity):
    """Nearest triangle hit (reference g_RayIntersection dispatch)."""
    return entity.RayIntersection(origin, direction)
