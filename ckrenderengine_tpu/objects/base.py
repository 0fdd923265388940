"""CKObject / CKContext: the object registry.

Equivalent of the CK2 SDK's CKContext + CKObject id system the reference
plugs into (class registration in /root/reference/src/CK2_3D.cpp:146-175).
Objects get integer IDs; the context owns the flat entity table and the
render manager.
"""

from __future__ import annotations

import itertools
from typing import Optional

from ..scene.entity_table import EntityTable

# CK class ids (public Virtools values for the classes the plugin registers,
# reference src/CK2_3D.cpp:146-175)
CKCID_OBJECT = 1
CKCID_RENDEROBJECT = 47
CKCID_3DENTITY = 33
CKCID_3DOBJECT = 31
CKCID_CAMERA = 34
CKCID_TARGETCAMERA = 35
CKCID_LIGHT = 36
CKCID_TARGETLIGHT = 37
CKCID_MESH = 43
CKCID_PATCHMESH = 44
CKCID_MATERIAL = 30
CKCID_TEXTURE = 41
CKCID_SPRITE = 28
CKCID_SPRITETEXT = 29
CKCID_2DENTITY = 27
CKCID_SPRITE3D = 24
CKCID_PLACE = 22
CKCID_GRID = 50
CKCID_LAYER = 51
CKCID_CURVE = 8
CKCID_CURVEPOINT = 9
CKCID_CHARACTER = 23
CKCID_BODYPART = 32
CKCID_KINEMATICCHAIN = 25
CKCID_ANIMATION = 15
CKCID_KEYEDANIMATION = 18
CKCID_OBJECTANIMATION = 19
CKCID_RENDERCONTEXT = 48


class CKObject:
    """Base object: id, name, visibility flag."""

    CLASS_ID = CKCID_OBJECT

    def __init__(self, context: "CKContext", name: str = ""):
        self.context = context
        self.id = context._register(self)
        self.name = name
        self._visible = True
        self._to_be_deleted = False

    def GetID(self) -> int:
        return self.id

    def GetName(self) -> str:
        return self.name

    def SetName(self, name: str):
        self.name = name

    def GetClassID(self) -> int:
        return self.CLASS_ID

    def GetClassName(self) -> str:
        """Registered class name (reference GetClassName/CKClassDesc)."""
        from .classreg import CKGetClassName
        return CKGetClassName(self.CLASS_ID)

    def IsChildClassOf(self, parent) -> bool:
        from .classreg import CKIsChildClassOf
        return CKIsChildClassOf(self, parent)

    def GetDependencies(self, modes=None) -> list:
        """Direct object dependencies (reference GetDependencies)."""
        from .classreg import get_dependencies
        return get_dependencies(self, modes)

    def Copy(self, modes=None, suffix: str = ""):
        """Dependency-aware duplicate (reference RCK*::Copy)."""
        return self.context.CopyObject(self, modes, suffix)

    def Show(self, show: bool = True):
        self._visible = bool(show)
        self.context._bump_dynamic()

    def IsVisible(self) -> bool:
        return self._visible

    def IsHiddenByParent(self) -> bool:
        return False


class CKContext:
    """Object registry + shared scene state.

    The CK2 runtime equivalent; tests construct it directly the way the
    reference tests do (``CKContext context(nullptr, 0, 0)``,
    /root/reference/tests/simple_mesh_test.cpp:14).
    """

    def __init__(self):
        self._objects: dict[int, CKObject] = {}
        self._next_id = itertools.count(1)
        self.entity_table = EntityTable()
        self.render_manager = None  # set by CKRenderManager.__init__
        # Version counters driving scene recompiles vs cheap updates.
        self._topology_version = 0  # geometry / parenting / material-group edits
        self._dynamic_version = 0   # matrices / colors / light params
        # Per-frame scan registries: only objects that registered render
        # callbacks / need a pre-render update (curves, meshes with
        # callbacks) are visited by Render() — a full _objects scan is
        # O(entities) host time per frame at 1000+ entities.
        self._cb_objects: dict[int, CKObject] = {}
        self._prerender_objects: dict[int, CKObject] = {}

    # -- registry ---------------------------------------------------------
    def _register(self, obj: CKObject) -> int:
        oid = next(self._next_id)
        self._objects[oid] = obj
        return oid

    def GetObject(self, oid: int) -> Optional[CKObject]:
        return self._objects.get(oid)

    def GetObjectByName(self, name: str) -> Optional[CKObject]:
        for o in self._objects.values():
            if o.name == name:
                return o
        return None

    def GetObjectsByClassID(self, cid: int) -> list:
        return [o for o in self._objects.values() if o.GetClassID() == cid]

    def DestroyObject(self, obj: "CKObject | int"):
        if isinstance(obj, int):
            obj = self._objects.get(obj)
        if obj is None:
            return
        destroy = getattr(obj, "_on_destroy", None)
        if destroy is not None:
            destroy()
        self._objects.pop(obj.id, None)
        self._cb_objects.pop(obj.id, None)
        self._prerender_objects.pop(obj.id, None)
        self._bump_topology()

    # -- factory (CKContext::CreateObject equivalent) ---------------------
    def CreateObject(self, cls, name: str = "", **kw):
        if isinstance(cls, int):
            return self.CreateObjectByClassID(cls, name, **kw)
        return cls(self, name, **kw)

    def CreateObjectByClassID(self, cid: int, name: str = "", **kw):
        """Instantiate by CK class id (reference CreateInstance via the
        registered class table, src/CK2_3D.cpp:146-175)."""
        from .classreg import CKGetClassDesc
        desc = CKGetClassDesc(cid)
        if desc is None:
            raise ValueError(f"unknown CK class id {cid}")
        return desc.cls(self, name, **kw)

    def CopyObject(self, obj: "CKObject", modes=None, suffix: str = ""):
        """Dependency-aware object duplication (reference Copy/
        PrepareDependencies/RemapDependencies — see objects/classreg.py)."""
        from .classreg import copy_object
        return copy_object(self, obj, modes, suffix)

    # -- dirty tracking ---------------------------------------------------
    def Save(self, path: str, objects=None) -> int:
        """Persist the scene (reference CKStateChunk Save path)."""
        from ..io.serialize import SaveScene
        return SaveScene(self, path, objects)

    def Load(self, path: str) -> list:
        """Load a scene file into this context (two-phase id remap)."""
        from ..io.serialize import LoadScene
        return LoadScene(self, path)

    def _bump_topology(self):
        if getattr(self, "_suspend_bumps", 0) > 0:
            self._pending_topology = True
            return
        self._topology_version += 1
        self._dynamic_version += 1

    def _bump_dynamic(self):
        self._dynamic_version += 1

    def BeginAddRemoveSequence(self):
        """Batch a burst of object adds/removes into ONE recompile
        (reference RCKRenderContext::AddRemoveSequence(TRUE))."""
        self._suspend_bumps = getattr(self, "_suspend_bumps", 0) + 1

    def EndAddRemoveSequence(self):
        self._suspend_bumps = max(0, getattr(self, "_suspend_bumps", 0) - 1)
        if self._suspend_bumps == 0 and getattr(self, "_pending_topology",
                                                False):
            self._pending_topology = False
            self._bump_topology()

    def GetRenderManager(self):
        if self.render_manager is None:
            from .manager import CKRenderManager
            CKRenderManager(self)
        return self.render_manager
