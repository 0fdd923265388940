"""Honest stress benches for the scale/ordered-path claims.

Cases (pick by name on the command line; default: all):
    clipplane   the 527k-tri headline scene + 1 user clip plane — clip
                planes ride the DEFERRED reduce per pixel (triangle_setup
                dplane), so this must stay at ~headline rate, not fall to a
                per-triangle ordered scan (reference: clip planes are free
                in the hardware rasterizer, CKDX9RasterizerContext
                SetUserClipPlane).
    alpha50k    a 50k-triangle alpha-blended field over an opaque floor —
                the tile-binned ordered pass (raster/jax_backend.py
                render_pass_tiled) with back-to-front order per pixel.
    tris2m      ~2.1M-triangle terrain (the scale axis of BASELINE
                config 5).

Each prints one JSON line (bench.honest_fps protocol — pre-drained window,
data-dependent scalar fence).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def case_clipplane():
    import bench

    ctx, rc, spinner = bench.build_scene(1024, 768)
    # A tilted world-space half-space through the scene's middle.
    rc.SetUserClipPlane(0, (0.3, 1.0, 0.1, -2.0))

    def tick(i):
        spinner.Rotate((0, 1, 0), 0.01)

    return rc, tick, "clipplane_527k_1024x768"


def case_alpha50k():
    import bench
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
    )
    from ckrenderengine_tpu.raster.types import VXBLEND, VXLIGHT

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(1024, 768)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 14.0, -40.0))
    cam.SetOrientation((0.0, -0.3, 1.0))
    cam.SetBackPlane(500.0)
    rc.AttachViewpointToCamera(cam)
    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.2, -1.0, 0.3))

    # Opaque floor.
    fverts, fuv, ffaces = bench.make_terrain(40, 60.0, 1.0)
    floor_mesh = CKMesh(ctx, "floor")
    floor_mesh.SetPositions(fverts)
    floor_mesh.SetUVs(fuv)
    floor_mesh.SetFaces(ffaces)
    floor_mesh.BuildNormals()
    fmat = CKMaterial(ctx, "floormat")
    fmat.SetDiffuse((0.4, 0.45, 0.5, 1.0))
    floor_mesh.ApplyGlobalMaterial(fmat)
    floor = CK3dObject(ctx, "floor")
    floor.SetCurrentMesh(floor_mesh)

    # 50k alpha-blended triangles: layered translucent sheets.
    rng = np.random.default_rng(11)
    n_sheets = 25
    sheet_verts, sheet_uv, sheet_faces = bench.make_terrain(31, 30.0, 0.5)
    amat = CKMaterial(ctx, "glass")
    amat.SetDiffuse((0.9, 0.3, 0.25, 0.35))
    amat.EnableAlphaBlend(True)
    amat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    amat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
    amat.EnableZWrite(False)       # standard transparent configuration
    sheet_mesh = CKMesh(ctx, "sheet")
    sheet_mesh.SetPositions(sheet_verts)
    sheet_mesh.SetUVs(sheet_uv)
    sheet_mesh.SetFaces(sheet_faces)
    sheet_mesh.BuildNormals()
    sheet_mesh.ApplyGlobalMaterial(amat)
    spinner = CK3dObject(ctx, "spin")
    for i in range(n_sheets):
        s = CK3dObject(ctx, f"sheet{i}")
        s.SetCurrentMesh(sheet_mesh)
        s.SetParent(spinner)
        s.SetPosition((rng.uniform(-6, 6), 2.0 + i * 0.8,
                       rng.uniform(-6, 6)), ref=spinner)

    def tick(i):
        spinner.Rotate((0, 1, 0), 0.02)

    n_alpha = n_sheets * sheet_faces.shape[0]
    return rc, tick, f"alpha{n_alpha}_1024x768"


def case_tris2m():
    import bench
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
    )
    from ckrenderengine_tpu.raster.types import VXLIGHT

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(1024, 768)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 25.0, -80.0))
    cam.SetOrientation((0.0, -0.25, 1.0))
    cam.SetBackPlane(4000.0)
    rc.AttachViewpointToCamera(cam)
    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.2, -1.0, 0.3))

    tverts, tuv, tfaces = bench.make_terrain(1024, 400.0, 5.0)  # ~2.1M tris
    mesh = CKMesh(ctx, "bigterrain")
    mesh.SetPositions(tverts)
    mesh.SetUVs(tuv)
    mesh.SetFaces(tfaces)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "mat")
    mat.SetDiffuse((0.7, 0.75, 0.65, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    terrain = CK3dObject(ctx, "terrain")
    terrain.SetCurrentMesh(mesh)
    spin = CK3dObject(ctx, "spin")
    terrain.SetParent(spin)

    def tick(i):
        spin.Rotate((0, 1, 0), 0.002)

    return rc, tick, f"tris{tfaces.shape[0]}_1024x768"


CASES = {"clipplane": case_clipplane, "alpha50k": case_alpha50k,
         "tris2m": case_tris2m}


def main():
    import jax

    import bench

    names = sys.argv[1:] or list(CASES)
    for name in names:
        rc, tick, label = CASES[name]()
        rc.Render()
        np.asarray(jax.device_get(rc.fb))
        tick(0)
        rc.Render()
        np.asarray(jax.device_get(rc.fb))
        fps = bench.honest_fps(rc, tick)
        print(json.dumps({
            "metric": f"fps_stress_{label}",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        }), flush=True)


def case_alpha_tex50k():
    """Textured transparency at scale: ~50k TEXTURED alpha-over triangles
    in 4 stacked sheets over an opaque floor — bounded per-pixel depth
    (<= 4 + floor), so the frame rides the layer-peel kernel path
    (raster/pallas_ordered.ordered_peel_tiled_pallas) instead of the
    sequential per-triangle composite."""
    import bench
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
        CKTexture,
    )
    from ckrenderengine_tpu.raster.types import VXBLEND, VXLIGHT

    ctx = CKContext()
    rm = ctx.GetRenderManager()
    # Opt into the bounded-K textured peel path (the scene stacks exactly
    # 4 sheets, inside the K=4 bound -> the peeled result is exact here).
    rm.SetRenderOptions("TexturedPeel", 1)
    rc = rm.CreateRenderContext(1024, 768)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 14.0, -40.0))
    cam.SetOrientation((0.0, -0.3, 1.0))
    cam.SetBackPlane(500.0)
    rc.AttachViewpointToCamera(cam)
    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.2, -1.0, 0.3))

    fverts, fuv, ffaces = bench.make_terrain(40, 60.0, 1.0)
    floor_mesh = CKMesh(ctx, "floor")
    floor_mesh.SetPositions(fverts)
    floor_mesh.SetUVs(fuv)
    floor_mesh.SetFaces(ffaces)
    floor_mesh.BuildNormals()
    fmat = CKMaterial(ctx, "floormat")
    fmat.SetDiffuse((0.4, 0.45, 0.5, 1.0))
    floor_mesh.ApplyGlobalMaterial(fmat)
    floor = CK3dObject(ctx, "floor")
    floor.SetCurrentMesh(floor_mesh)

    tex = CKTexture(ctx, "glasstex")
    img = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img * 0.3 + 0.6, img * 0.2 + 0.7,
                           img * 0.2 + 0.75, img * 0.3 + 0.55], -1))

    rng = np.random.default_rng(13)
    n_sheets = 4
    sheet_verts, sheet_uv, sheet_faces = bench.make_terrain(79, 30.0, 0.4)
    amat = CKMaterial(ctx, "texglass")
    amat.SetDiffuse((0.9, 0.95, 1.0, 0.45))
    amat.SetTexture(tex)
    amat.EnableAlphaBlend(True)
    amat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    amat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
    amat.EnableZWrite(False)
    sheet_mesh = CKMesh(ctx, "texsheet")
    sheet_mesh.SetPositions(sheet_verts)
    sheet_mesh.SetUVs(sheet_uv)
    sheet_mesh.SetFaces(sheet_faces)
    sheet_mesh.BuildNormals()
    sheet_mesh.ApplyGlobalMaterial(amat)
    spinner = CK3dObject(ctx, "spin")
    for i in range(n_sheets):
        s = CK3dObject(ctx, f"texsheet{i}")
        s.SetCurrentMesh(sheet_mesh)
        s.SetParent(spinner)
        s.SetPosition((rng.uniform(-3, 3), 3.0 + i * 1.5,
                       rng.uniform(-3, 3)), ref=spinner)

    def tick(i):
        spinner.Rotate((0, 1, 0), 0.02)

    n_alpha = n_sheets * sheet_faces.shape[0]
    return rc, tick, f"alpha_textured{n_alpha}_1024x768"


CASES["alpha_tex50k"] = case_alpha_tex50k


if __name__ == "__main__":
    import bench  # noqa: F401  (case builders use bench helpers)
    main()


