"""Scene-graph node facade over the flat entity table.

The reference mirrors the transform hierarchy into per-entity
``CKSceneGraphNode`` objects owned by the render manager, used for render
ordering and culling (reference include/CKSceneGraph.h:38-107,
src/CKSceneGraph.cpp). The TPU build replaces that structure with flat SoA
arrays + device culling (PARITY §2.1 "Inversion"), so these nodes are VIEWS:
they read the live entity hierarchy and expose the reference's node API
(priority-sorted children, render-context masks, hierarchical bboxes,
time-profiler slot) without owning any state the frame program needs.
"""

from __future__ import annotations

import numpy as np


class CKSceneGraphNode:
    """View of one entity's place in the render hierarchy
    (reference CKSceneGraphNode)."""

    def __init__(self, manager, entity=None):
        self._manager = manager
        self.entity = entity
        self.time_profiler_ms = 0.0      # reference per-node VxTimeProfiler

    def GetEntity(self):
        return self.entity

    def GetPriority(self) -> int:
        return self.entity.render_priority if self.entity is not None else 0

    def SetPriority(self, p: int, _context=None):
        if self.entity is not None:
            self.entity.SetRenderPriority(p)

    def _child_entities(self):
        if self.entity is None:          # root: parentless 3D entities
            from ..objects.entity import CK3dEntity
            ents = [o for o in self._manager.context._objects.values()
                    if isinstance(o, CK3dEntity) and o.GetParent() is None]
        else:
            ents = list(self.entity._children)
        # The reference keeps children priority-sorted (bubble sort on the
        # (m_Priority, m_MaxPriority) key, src/CKSceneGraph.cpp:495-529);
        # same order the scene compiler uses: high priority first.
        ents.sort(key=lambda e: (-e.render_priority, e.id))
        return ents

    def GetChildrenCount(self) -> int:
        return len(self._child_entities())

    def GetChild(self, i: int) -> "CKSceneGraphNode":
        return CKSceneGraphNode(self._manager, self._child_entities()[i])

    def GetRenderContextMask(self) -> int:
        ent = self.entity
        return int(getattr(ent, "_in_render_context_mask", 0)) if ent else ~0

    def SetRenderContextMask(self, mask: int):
        if self.entity is not None:
            self.entity._in_render_context_mask = int(mask)

    def IsToBeParsed(self) -> bool:
        """Visible, or has children that could be (the reference's
        parsed-prefix partitioning keeps such nodes in the parsed span,
        src/CKSceneGraph.cpp:379-432)."""
        if self.entity is None:
            return True
        return self.entity.IsVisible() or self.GetChildrenCount() > 0

    def ComputeHierarchicalBox(self):
        """World bbox of this entity and all descendants (reference
        ComputeHierarchicalBox, src/CKSceneGraph.cpp:849-888)."""
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)

        def visit(ent):
            nonlocal lo, hi
            box = ent.GetBoundingBox()
            if box is not None:
                blo, bhi = box
                lo = np.minimum(lo, blo)
                hi = np.maximum(hi, bhi)
            for c in ent._children:
                visit(c)

        if self.entity is not None:
            visit(self.entity)
        else:
            for e in self._child_entities():
                sub = CKSceneGraphNode(self._manager, e).ComputeHierarchicalBox()
                if sub is not None:
                    lo = np.minimum(lo, sub[0])
                    hi = np.maximum(hi, sub[1])
        if not np.isfinite(lo).all():
            return None
        return lo, hi


class CKSceneGraphRootNode(CKSceneGraphNode):
    """The manager's root node (reference CKSceneGraphRootNode): children
    are the parentless entities; transparent-object ordering lives in the
    device sort keys, so the root exposes only the traversal surface."""

    def __init__(self, manager):
        super().__init__(manager, None)

    def AddTransparentObject(self, ent):
        """No-op by design: transparency ordering is a device sort key
        (PARITY §2.1); kept for call-site compatibility."""

    def SortNodes(self):
        """No-op: children are sorted on access (the reference re-sorts
        dirty nodes lazily too)."""
