"""Benchmark: frames/sec on a lit, textured, Z-buffered scene.

BASELINE config 2 scale (sphere + plane, 2 lights, Gouraud + textured,
640x480). Prints ONE JSON line; vs_baseline is fps relative to the 60 fps
north-star target (BASELINE.md working target — the reference publishes no
numbers of its own).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_sphere(rows: int = 16, cols: int = 24, radius: float = 1.0):
    th = np.linspace(0, np.pi, rows + 1)
    ph = np.linspace(0, 2 * np.pi, cols, endpoint=False)
    T, Ph = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([
        radius * np.sin(T) * np.cos(Ph),
        radius * np.cos(T),
        radius * np.sin(T) * np.sin(Ph),
    ], -1).reshape(-1, 3).astype(np.float32)
    uv = np.stack([Ph / (2 * np.pi), T / np.pi], -1).reshape(-1, 2).astype(np.float32)

    faces = []
    for r in range(rows):
        for c in range(cols):
            a = r * cols + c
            b = r * cols + (c + 1) % cols
            cidx = (r + 1) * cols + c
            d = (r + 1) * cols + (c + 1) % cols
            faces.append([a, cidx, b])
            faces.append([b, cidx, d])
    return pts, uv, np.asarray(faces, np.int32)


def build_scene(width: int, height: int):
    from ckrenderengine_tpu.objects import (
        CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh, CKTexture,
    )
    from ckrenderengine_tpu.raster.types import VXLIGHT

    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(width, height)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 1.5, -5.0))
    cam.SetFrontPlane(0.5)
    cam.SetBackPlane(200.0)
    rc.AttachViewpointToCamera(cam)

    pts, uv, faces = make_sphere()
    sphere_mesh = CKMesh(ctx, "sphere")
    sphere_mesh.SetPositions(pts)
    sphere_mesh.SetUVs(uv)
    sphere_mesh.SetFaces(faces)
    sphere_mesh.BuildNormals()
    smat = CKMaterial(ctx, "spheremat")
    smat.SetDiffuse((0.8, 0.3, 0.2, 1.0))
    smat.SetPower(20.0)
    sphere_mesh.ApplyGlobalMaterial(smat)
    sphere = CK3dObject(ctx, "sphere")
    sphere.SetCurrentMesh(sphere_mesh)

    plane_mesh = CKMesh(ctx, "plane")
    plane_mesh.SetPositions(np.array(
        [[-6, -1, -6], [6, -1, -6], [6, -1, 6], [-6, -1, 6]], np.float32))
    plane_mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    plane_mesh.SetUVs(np.array([[0, 0], [8, 0], [8, 8], [0, 8]], np.float32))
    plane_mesh.BuildNormals()
    tex = CKTexture(ctx, "checker")
    img = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img, img, img, np.ones_like(img)], -1))
    pmat = CKMaterial(ctx, "planemat")
    pmat.SetTexture(tex)
    plane_mesh.ApplyGlobalMaterial(pmat)
    plane = CK3dObject(ctx, "plane")
    plane.SetCurrentMesh(plane_mesh)

    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1.0, 0.5))
    sun.SetSpecularFlag(True)
    bulb = CKLight(ctx, "bulb")
    bulb.SetType(int(VXLIGHT.POINT))
    bulb.SetPosition((2.0, 3.0, -2.0))
    bulb.SetColor((0.4, 0.5, 1.0, 1.0))

    return ctx, rc, sphere


def main():
    width, height = 640, 480
    ctx, rc, sphere = build_scene(width, height)
    import jax

    # Warmup / compile.
    rc.Render()
    jax.block_until_ready(rc.fb)

    n_frames = 20
    t0 = time.perf_counter()
    for i in range(n_frames):
        sphere.Rotate((0, 1, 0), 0.05)
        rc.Render()
    jax.block_until_ready(rc.fb)
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    tris = rc.GetStats().NbTrianglesDrawn
    result = {
        "metric": f"fps_640x480_lit_textured_{tris}tris",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
