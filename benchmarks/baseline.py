"""Reproducible benchmark suite: the five BASELINE.json configs.

Usage:
    python benchmarks/baseline.py config1 [--frames N] [--phases]
    python benchmarks/baseline.py all

Each config prints ONE JSON line (same schema as bench.py: metric / value /
unit / vs_baseline against the 60 fps north star). ``--phases`` adds the
host/device split from the context's VxStats phase timers.

Configs (BASELINE.json, SURVEY.md §6):
    config1  flat cube, 256x256
    config2  lit sphere + textured plane, 2 lights, 640x480
    config3  1000-entity hierarchy (depth 6), moving point light, 1024x768
    config4  128-bone / 60k-vert skinned tube + keyed clip, 1024x768
    config5  Ballance scale: 527k-tri terrain + sphere field, 1024x768
             (the bench.py scene)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])   # repo root for bench.py


# ---------------------------------------------------------------------------
# Scene builders
# ---------------------------------------------------------------------------

def _objects():
    from ckrenderengine_tpu.objects import (
        CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh,
        CKTexture,
    )
    from ckrenderengine_tpu.raster.types import VXLIGHT
    return (CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh,
            CKTexture, VXLIGHT)


def build_config1():
    """Flat-shaded cube, 256x256 (BASELINE config 1)."""
    (CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh,
     CKTexture, VXLIGHT) = _objects()
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(256, 256)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 1.0, -4.0))
    rc.AttachViewpointToCamera(cam)
    s = 0.5
    verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32)
    faces = np.array([
        [0, 2, 3], [0, 3, 1], [4, 5, 7], [4, 7, 6], [0, 1, 5], [0, 5, 4],
        [2, 6, 7], [2, 7, 3], [0, 4, 6], [0, 6, 2], [1, 3, 7], [1, 7, 5],
    ], np.int32)
    mesh = CKMesh(ctx, "cube")
    mesh.SetPositions(verts)
    mesh.SetFaces(faces)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "mat")
    mat.SetDiffuse((0.9, 0.4, 0.2, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    cube = CK3dObject(ctx, "cube")
    cube.SetCurrentMesh(mesh)

    def tick(i):
        cube.Rotate((0, 1, 0), 0.02)

    return rc, tick, "flat_cube_256"


def build_config2():
    """Lit sphere over a textured plane, 2 lights, 640x480."""
    (CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh,
     CKTexture, VXLIGHT) = _objects()
    import bench

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(640, 480)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 2.0, -7.0))
    cam.SetOrientation((0.0, -0.15, 1.0))
    rc.AttachViewpointToCamera(cam)

    spts, suv, sfaces = bench.make_sphere(32, 48, 1.5)
    sphere_mesh = CKMesh(ctx, "sphere")
    sphere_mesh.SetPositions(spts)
    sphere_mesh.SetUVs(suv)
    sphere_mesh.SetFaces(sfaces)
    sphere_mesh.BuildNormals()
    smat = CKMaterial(ctx, "smat")
    smat.SetDiffuse((0.8, 0.3, 0.2, 1.0))
    smat.SetPower(32.0)
    sphere_mesh.ApplyGlobalMaterial(smat)
    ball = CK3dObject(ctx, "ball")
    ball.SetCurrentMesh(sphere_mesh)
    ball.SetPosition((0.0, 0.8, 0.0))

    tex = CKTexture(ctx, "checker")
    img = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img, img * 0.8 + 0.1, img * 0.6 + 0.2,
                           np.ones_like(img)], -1))
    plane = CKMesh(ctx, "plane")
    plane.SetPositions(np.array([[-6, -1, -6], [6, -1, -6], [6, -1, 6],
                                 [-6, -1, 6]], np.float32))
    plane.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    plane.SetUVs(np.array([[0, 0], [6, 0], [6, 6], [0, 6]], np.float32))
    plane.BuildNormals()
    pmat = CKMaterial(ctx, "pmat")
    pmat.SetDiffuse((0.9, 0.9, 0.9, 1.0))
    pmat.SetTexture(tex)
    plane.ApplyGlobalMaterial(pmat)
    floor = CK3dObject(ctx, "floor")
    floor.SetCurrentMesh(plane)

    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1.0, 0.4))
    sun.SetSpecularFlag(True)
    bulb = CKLight(ctx, "bulb")
    bulb.SetType(int(VXLIGHT.POINT))
    bulb.SetPosition((2.0, 3.0, -2.0))
    bulb.SetColor((0.4, 0.5, 1.0, 1.0))
    bulb.SetRange(30.0)

    def tick(i):
        ball.Rotate((0, 1, 0), 0.03)

    return rc, tick, "sphere_plane_640x480"


def build_config3():
    """1000-entity hierarchy (depth 6), moving point light, 1024x768."""
    (CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh,
     CKTexture, VXLIGHT) = _objects()
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(1024, 768)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 10.0, -42.0))
    cam.SetOrientation((0.0, -0.2, 1.0))
    cam.SetBackPlane(400.0)
    rc.AttachViewpointToCamera(cam)

    s = 0.4
    verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32)
    faces = np.array([
        [0, 2, 3], [0, 3, 1], [4, 5, 7], [4, 7, 6], [0, 1, 5], [0, 5, 4],
        [2, 6, 7], [2, 7, 3], [0, 4, 6], [0, 6, 2], [1, 3, 7], [1, 7, 5],
    ], np.int32)
    mesh = CKMesh(ctx, "cube")
    mesh.SetPositions(verts)
    mesh.SetFaces(faces)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "mat")
    mat.SetDiffuse((0.7, 0.7, 0.8, 1.0))
    mat.SetPower(16.0)
    mesh.ApplyGlobalMaterial(mat)

    rng = np.random.default_rng(3)
    roots = []
    ents = []
    n_made = 0
    # ~1000 entities in trees of depth 6: 6 roots x (1 + 5 children x ...)
    def grow(parent, depth):
        nonlocal n_made
        if depth == 0 or n_made >= 1000:
            return
        k = 4 if depth > 2 else 3
        for _ in range(k):
            if n_made >= 1000:
                return
            e = CK3dObject(ctx, f"e{n_made}")
            n_made += 1
            e.SetCurrentMesh(mesh)
            if parent is not None:
                e.SetParent(parent)
            e.SetPosition(tuple(rng.uniform(-3.5, 3.5, 3)),
                          ref=parent)
            ents.append(e)
            grow(e, depth - 1)

    while n_made < 1000:
        root = CK3dObject(ctx, f"root{len(roots)}")
        n_made += 1
        root.SetCurrentMesh(mesh)
        root.SetPosition((float(rng.uniform(-25, 25)), 5.0,
                          float(rng.uniform(-20, 30))))
        roots.append(root)
        ents.append(root)
        grow(root, 5)

    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1.0, 0.2))
    bulb = CKLight(ctx, "bulb")
    bulb.SetType(int(VXLIGHT.POINT))
    bulb.SetPosition((0.0, 12.0, 0.0))
    bulb.SetColor((1.0, 0.7, 0.4, 1.0))
    bulb.SetRange(120.0)

    # 2D sprite + text overlay (BASELINE config 3 spec: "2D sprite/text
    # overlay"): a HUD corner sprite plus a text readout, both foreground.
    from ckrenderengine_tpu.objects import CKSprite, CKSpriteText

    hud = CKSprite(ctx, "hud")
    icon = np.zeros((24, 24, 4), np.float32)
    icon[4:20, 4:20] = (0.9, 0.2, 0.1, 0.85)
    hud.SetImage(icon)
    hud.SetRect((8, 8, 32, 32))
    txt = CKSpriteText(ctx, "fpslabel")
    txt.Create(128, 20)
    txt.SetText("entities: 1000")
    txt.SetRect((40, 8, 168, 28))

    def tick(i):
        for r in roots:
            r.Rotate((0, 1, 0), 0.01)
        bulb.SetPosition((18.0 * np.sin(i * 0.05), 12.0,
                          18.0 * np.cos(i * 0.05)))

    return rc, tick, "hierarchy_1000_1024x768"


def make_skinned_tube(ctx, n_bones=128, rings_per_bone=4, ring_verts=120):
    """A long tube skinned to a chain of bones, with a keyed clip that
    waves the chain (config 4's scene)."""
    from ckrenderengine_tpu.objects import CK3dObject, CKMaterial, CKMesh
    from ckrenderengine_tpu.anim import (
        CKKeyedAnimation, CKObjectAnimation,
        CKANIMATION_LINEAR_ROT,
    )

    seg_len = 0.35
    length = n_bones * seg_len
    rings = n_bones * rings_per_bone
    # tube vertices: rings x ring_verts
    zs = np.linspace(0.0, length, rings, dtype=np.float32)
    th = np.linspace(0, 2 * np.pi, ring_verts, endpoint=False,
                     dtype=np.float32)
    Z, Th = np.meshgrid(zs, th, indexing="ij")
    R = 1.0 + 0.15 * np.sin(Z * 0.8)
    pos = np.stack([R * np.cos(Th), R * np.sin(Th), Z], -1).reshape(-1, 3)
    pos = pos.astype(np.float32)
    faces = []
    for r in range(rings - 1):
        for c in range(ring_verts):
            a = r * ring_verts + c
            b = r * ring_verts + (c + 1) % ring_verts
            cc = (r + 1) * ring_verts + c
            d = (r + 1) * ring_verts + (c + 1) % ring_verts
            faces += [[a, cc, b], [b, cc, d]]
    faces = np.asarray(faces, np.int32)

    mesh = CKMesh(ctx, "tube")
    mesh.SetPositions(pos)
    mesh.SetFaces(faces)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "tubemat")
    mat.SetDiffuse((0.3, 0.7, 0.9, 1.0))
    mat.SetPower(24.0)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "snake")
    obj.SetCurrentMesh(mesh)

    # bone chain along +z
    bones = []
    parent = None
    for i in range(n_bones):
        b = CK3dObject(ctx, f"bone{i}")
        if parent is not None:
            b.SetParent(parent)
            b.SetPosition((0, 0, seg_len), ref=parent)
        bones.append(b)
        parent = b

    skin = obj.CreateSkin()
    skin.SetObjectInitMatrix(np.eye(4, dtype=np.float32))
    skin.SetBoneCount(n_bones)
    for i, b in enumerate(bones):
        bd = skin.GetBoneData(i)
        bd.SetBone(b)
        inv = np.eye(4, dtype=np.float32)
        inv[3, 2] = -zs[min(i * rings_per_bone, rings - 1)]
        bd.SetBoneInitialInverseMatrix(inv)
    skin.SetRestPose(pos, mesh.normals)
    # each vertex binds to its ring's bone and the next (50/50 at seams)
    ring_of = np.repeat(np.arange(rings), ring_verts)
    bone_of = np.minimum(ring_of // rings_per_bone, n_bones - 1)
    frac = (ring_of % rings_per_bone) / rings_per_bone
    nxt = np.minimum(bone_of + 1, n_bones - 1)
    for v in range(pos.shape[0]):
        w1 = float(frac[v]) * 0.5
        skin.SetVertexWeights(v, [int(bone_of[v]), int(nxt[v])],
                              [1.0 - w1, w1])

    # keyed clip: every bone sways with a phase offset
    clip = CKKeyedAnimation(ctx, "wave")
    clip.SetLength(60.0)
    for i, b in enumerate(bones):
        oa = CKObjectAnimation(ctx, f"oa{i}")
        oa.Set3dEntity(b)
        rcn = oa.CreateController(CKANIMATION_LINEAR_ROT)
        phase = i * 0.21
        for t in np.linspace(0.0, 60.0, 13):
            ang = 0.10 * np.sin(t * 0.35 + phase)
            h = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2) * 1.0, 0.0],
                         np.float32)  # w,x,y,z? match helper below
            # quaternion about +y axis, (x,y,z,w) convention
            q = np.array([0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2)],
                         np.float32)
            rcn.AddKey(float(t), q)
        clip.AddAnimation(oa)
    return obj, mesh, skin, bones, clip


def make_patch_sheet(ctx, n: int = 6, iterations: int = 5,
                     extent: float = 12.0, amp: float = 1.2):
    """An n x n grid of Bezier quad patches forming a wavy ground sheet
    (BASELINE config 4's "patch tessellation" component; reference
    RCKPatchMesh runtime tessellation, include/RCKPatchMesh.h:151-205)."""
    from ckrenderengine_tpu.objects.patchmesh import CKPatch, CKPatchMesh

    pm = CKPatchMesh(ctx, "patchsheet")

    def height(x, y):
        return amp * (np.sin(x * 0.6) * np.cos(y * 0.5))

    xs = np.linspace(-extent, extent, n + 1)
    corners = np.array([[x, height(x, y), y] for y in xs for x in xs],
                       np.float32)
    pm.SetVerts(corners)
    vecs = []
    patches = []

    def pt(x, y):
        return np.array([x, height(x, y), y], np.float32)

    for r in range(n):
        for c in range(n):
            i00 = r * (n + 1) + c
            quad = [i00, i00 + 1, i00 + n + 2, i00 + n + 1]
            x0, x1 = xs[c], xs[c + 1]
            y0, y1 = xs[r], xs[r + 1]
            base = len(vecs)
            # 8 edge control points (1/3, 2/3 along each edge), sampled off
            # the analytic surface so tessellation reconstructs the waves.
            for (ax, ay), (bx, by) in (((x0, y0), (x1, y0)),
                                       ((x1, y0), (x1, y1)),
                                       ((x1, y1), (x0, y1)),
                                       ((x0, y1), (x0, y0))):
                for tpar in (1 / 3, 2 / 3):
                    vecs.append(pt(ax + (bx - ax) * tpar,
                                   ay + (by - ay) * tpar))
            for (u, v) in ((1 / 3, 1 / 3), (2 / 3, 1 / 3), (2 / 3, 2 / 3),
                           (1 / 3, 2 / 3)):
                vecs.append(pt(x0 + (x1 - x0) * u, y0 + (y1 - y0) * v))
            patches.append(CKPatch(quad, list(range(base, base + 8)),
                                   list(range(base + 8, base + 12))))
    pm.SetVecs(np.asarray(vecs, np.float32))
    for p in patches:
        pm.AddPatch(p)
    pm.SetIterationCount(iterations)
    pm.BuildRenderMesh()
    return pm


def build_config4():
    """Skinned character path per BASELINE.md: 128-bone / 60k-vert skinned
    tube + keyed (device-bound) clip + Bezier PATCH TESSELLATION sheet,
    1024x768."""
    (CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh,
     CKTexture, VXLIGHT) = _objects()
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(1024, 768)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((8.0, 6.0, -14.0))
    cam.SetOrientation((-0.25, -0.18, 1.0))
    cam.SetBackPlane(300.0)
    rc.AttachViewpointToCamera(cam)

    obj, mesh, skin, bones, clip = make_skinned_tube(ctx)
    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1.0, 0.4))
    sun.SetSpecularFlag(True)

    # Patch-tessellated ground sheet under the character (the BASELINE
    # config-4 component the round-2 scene omitted): 36 bicubic patches
    # tessellated at iteration 5 (3,600 faces) through the RCKPatchMesh
    # runtime path, drawn with its own lit material.
    pmesh = make_patch_sheet(ctx)
    pmat = CKMaterial(ctx, "patchmat")
    pmat.SetDiffuse((0.45, 0.55, 0.75, 1.0))
    pmat.SetPower(16.0)
    pmesh.ApplyGlobalMaterial(pmat)
    ground = CK3dObject(ctx, "patchground")
    ground.SetCurrentMesh(pmesh)
    ground.SetPosition((0.0, -3.5, 0.0))

    # Device-bound clip: track evaluation fuses into the frame program
    # (animate -> compose -> skin -> render); SetFrame ships one scalar.
    assert rc.BindAnimation(clip)

    state = {"t": 0.0}

    def tick(i):
        state["t"] = (state["t"] + 0.5) % clip.GetLength()
        clip.SetFrame(state["t"])

    return rc, tick, "skinned_128bone_60kvert_patchtess_1024x768"


def build_config5():
    import bench
    ctx, rc, spinner = bench.build_scene(1024, 768)

    def tick(i):
        spinner.Rotate((0, 1, 0), 0.01)

    return rc, tick, "ballance_scale_1024x768"


CONFIGS = {
    "config1": build_config1,
    "config2": build_config2,
    "config3": build_config3,
    "config4": build_config4,
    "config5": build_config5,
}


def run(name: str, frames: int, phases: bool) -> dict:
    import bench
    import jax

    rc, tick, label = CONFIGS[name]()
    rc.Render()
    jax.block_until_ready(rc.fb)
    # steady state: one more post-warmup frame (second compile class, if any)
    tick(0)
    rc.Render()
    jax.block_until_ready(rc.fb)
    # Frame-window pipelining (see bench.py main) — honest fence intact.
    # Small scenes are tunnel-RPC-bound (~2 RPCs/window at ~5-15 ms each),
    # so they run a LONGER window to amortize; device-bound scenes keep
    # W=8 (window compute dominates there and a flush mid-window pads).
    rc.SetFramePipelining(32 if name in ("config1", "config2", "config3")
                          else 8)

    # Honest timing (pre-drain + final full readback per window): see
    # bench.honest_fps — block_until_ready alone does not wait on the
    # axon tunnel and measures dispatch rate, not rendering.
    host_ms = 0.0
    n_ticks = 0

    def timed_tick(i):
        nonlocal host_ms, n_ticks
        th = time.perf_counter()
        tick(i)
        host_ms += time.perf_counter() - th
        n_ticks += 1

    fps = bench.honest_fps(rc, timed_tick, windows=2, max_frames=frames)
    # phases below report per-frame quantities
    dt = 1.0 / max(fps, 1e-9)
    host_ms /= max(n_ticks, 1)
    frames = 1
    out = {
        "metric": f"fps_{label}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
    }
    if phases:
        s = rc.GetStats()
        out["phases_ms"] = {
            "frame": round(dt / frames * 1000, 3),
            "tick_host": round(host_ms / frames * 1000, 3),
            "scene_build": round(s.SceneTraversalTime, 3),
            "device": round(s.ObjectsRenderTime, 3),
            "callbacks": round(s.ObjectsCallbacksTime, 3),
        }
        out["tris"] = int(s.NbTrianglesDrawn)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=list(CONFIGS) + ["all"])
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--phases", action="store_true")
    args = ap.parse_args()
    names = list(CONFIGS) if args.config == "all" else [args.config]
    for n in names:
        print(json.dumps(run(n, args.frames, args.phases)))


if __name__ == "__main__":
    sys.exit(main())
