"""Spatial sectors: CKPlace with portals and viewport clipping.

API mirror of RCKPlace (/root/reference/src/CKPlace.cpp,
include/RCKPlace.h:7-14): portal list (CKPortalEntry = destination place +
optional portal geometry entity), an attached default camera, and a viewport
clipping rect applied to the place's hierarchy during rendering (the
reference patches the projection matrix and sets a device clip rect during
traversal, src/CKSceneGraph.cpp:113-128,569-584 and
src/CKRenderContext.cpp:2743-2781). TPU mapping: the clip rect becomes a
per-entity scissor column in the device scene state, tested per triangle in
the raster coverage (SURVEY §2.4 "per-place scissor rect + masked draw").
"""

from __future__ import annotations

import numpy as np

from .base import CKCID_PLACE, CKContext
from .entity import CK3dEntity


class CKPortalEntry:
    """(reference CKPortalEntry: place + portal geometry)"""

    def __init__(self, place, portal_entity=None):
        self.place = place
        self.portal = portal_entity


class CKPlace(CK3dEntity):
    CLASS_ID = CKCID_PLACE

    def __init__(self, context: CKContext, name: str = ""):
        super().__init__(context, name)
        self.portals: list[CKPortalEntry] = []
        self.default_camera = None
        self.clip_rect = None       # (x0,y0,x1,y1) pixels or None

    # -- portals -------------------------------------------------------------
    def AddPortal(self, place: "CKPlace", portal_entity: CK3dEntity | None = None):
        """Two-way portal registration (reference keeps symmetric entries)."""
        if self.GetPortalIndex(place) < 0:
            self.portals.append(CKPortalEntry(place, portal_entity))
        if place is not None and place.GetPortalIndex(self) < 0:
            place.portals.append(CKPortalEntry(self, portal_entity))

    def RemovePortal(self, place: "CKPlace"):
        i = self.GetPortalIndex(place)
        if i >= 0:
            del self.portals[i]
        if place is not None:
            j = place.GetPortalIndex(self)
            if j >= 0:
                del place.portals[j]

    def GetPortalCount(self) -> int:
        return len(self.portals)

    def GetPortal(self, i: int):
        e = self.portals[i]
        return e.place, e.portal

    def GetPortalIndex(self, place: "CKPlace") -> int:
        for i, e in enumerate(self.portals):
            if e.place is place:
                return i
        return -1

    # -- camera ---------------------------------------------------------------
    def SetDefaultCamera(self, camera):
        self.default_camera = camera

    def GetDefaultCamera(self):
        return self.default_camera

    # -- viewport clipping -----------------------------------------------------
    def ViewportClip(self, rect=None):
        """Set (or clear with None) the pixel clip rect applied to every
        entity under this place (reference RCKPlace::ViewportClip,
        src/CKPlace.cpp:522)."""
        self.clip_rect = None if rect is None else tuple(float(v) for v in rect)
        self.context._bump_dynamic()

    def GetClipRect(self):
        return self.clip_rect

    def descendants(self):
        """All 3d entities under this place (portal-scoped draw set)."""
        out = []

        def rec(e):
            for i in range(e.GetChildrenCount()):
                ch = e.GetChild(i)
                out.append(ch)
                rec(ch)

        rec(self)
        return out
