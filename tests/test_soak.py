"""Soak: sustained frame loop with scene churn — entity create/destroy and
row recycling, mesh morphs (dynamic pool refresh), texture updates, sprite
text redraw, camera motion, and a save/load cycle — asserting every frame
stays finite and the entity table doesn't leak rows. Compressed pytest form
of the 200-frame robustness soak (reference long-run stability is implied by
its per-frame engine loop; SURVEY §4 robustness layer)."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
    CKSpriteText, CKTexture,
)


def _ball(ctx, name, mat, n=6):
    th = np.linspace(0, np.pi, n + 1)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([np.sin(T) * np.cos(P), np.cos(T),
                    np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    faces = []
    for r in range(n):
        for c in range(n):
            a, b = r * n + c, r * n + (c + 1) % n
            d, e = (r + 1) * n + c, (r + 1) * n + (c + 1) % n
            faces += [[a, d, b], [b, d, e]]
    mesh = CKMesh(ctx, f"{name}m")
    mesh.SetPositions(pts.astype(np.float32))
    mesh.SetFaces(np.asarray(faces, np.int32))
    mesh.BuildNormals()
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj, mesh


def test_churn_soak(tmp_path):
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(96, 96)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 2, -8))
    rc.AttachViewpointToCamera(cam)
    sun = CKLight(ctx, "sun")
    sun.SetType(3)

    tex = CKTexture(ctx, "tex")
    img = (np.indices((8, 8)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img] * 3 + [np.ones_like(img)], -1))
    mat = CKMaterial(ctx, "mat")
    mat.SetTexture(tex)

    base, base_mesh = _ball(ctx, "base", mat)
    label = CKSpriteText(ctx, "label")
    label.SetRect((2, 2, 60, 14))

    churn: list = []
    rows_seen = set()
    max_rows = 0
    for f in range(24):
        # churn: every other frame add a ball, every 4th destroy the oldest
        if f % 2 == 0:
            o, _m = _ball(ctx, f"b{f}", mat)
            o.SetPosition(((f % 5) - 2.0, 0.5, f % 3))
            churn.append(o)
            rows_seen.add(o.row)
        if f % 4 == 3 and churn:
            ctx.DestroyObject(churn.pop(0))
        # morph the base mesh (dynamic pool refresh, no recompile)
        pts = np.asarray(base_mesh.positions)
        base_mesh.SetPositions(pts * (1.0 + 0.02 * np.sin(f)))
        # text + texture updates
        if f % 5 == 0:
            label.SetText(f"frame {f}")
        if f % 7 == 0:
            tex.SetImage(np.stack(
                [np.roll(img, f, 0)] * 3 + [np.ones_like(img)], -1))
        cam.SetPosition((3 * np.sin(f * 0.2), 2, -8 * np.cos(f * 0.1)))
        cam.LookAt((0, 0, 0)) if hasattr(cam, "LookAt") else None
        rc.Render()
        fb = np.asarray(rc.framebuffer())
        assert np.isfinite(fb).all(), f"nonfinite frame at {f}"
        assert fb.sum() > 0
        max_rows = max(max_rows, ctx.entity_table.count)
        # save/load cycle mid-soak
        if f == 12:
            p = str(tmp_path / "soak.ck")
            ctx.Save(p)
            ctx2 = CKContext()
            ctx2.Load(p)
            rc2 = ctx2.GetRenderManager().CreateRenderContext(64, 64)
            rc2.AttachViewpointToCamera(ctx2.GetObjectByName("cam"))
            rc2.Render()
            assert np.isfinite(np.asarray(rc2.framebuffer())).all()

    # Row recycling: destroyed rows get reused, so the table stays bounded
    # (churn adds 12 balls but never holds more than ~4 live).
    live = sum(1 for _ in churn)
    assert live <= 6
    assert max_rows < 8 + len(rows_seen)
