"""Material-effects demo: four quads showing DP3 normal mapping, EMBM
bump-env, a 2-texture modulate blend, and chrome TexGen side by side.

Run:  python examples/effects_demo.py [--size 384] [--out /tmp] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ckrenderengine_tpu.objects import (          # noqa: E402
    CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh, CKTexture,
    VXEFFECT_2TEXTURES, VXEFFECT_BUMPENV, VXEFFECT_DP3, VXEFFECT_TEXGEN,
)
from ckrenderengine_tpu.objects.material import CKRST_TOP_MODULATE  # noqa: E402
from ckrenderengine_tpu.raster.types import TEXGEN_CHROME  # noqa: E402


def quad(ctx, name, center, mat):
    mesh = CKMesh(ctx, f"{name}m")
    cx, cy = center
    s = 0.85
    mesh.SetPositions(np.array(
        [[cx - s, cy - s, 0], [cx + s, cy - s, 0],
         [cx + s, cy + s, 0], [cx - s, cy + s, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
    mesh.BuildNormals()
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--out", default="/tmp")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(args.size, args.size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    rc.SetBackgroundColor((0.06, 0.06, 0.1, 1))
    sun = CKLight(ctx, "sun")
    sun.SetType(3)
    sun.SetOrientation((0.3, -0.5, 1.0))

    def tex(name, arr):
        t = CKTexture(ctx, name)
        t.SetImage(arr.astype(np.float32))
        return t

    img = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
    checker = tex("checker", np.stack([img, img * .6, 1 - img,
                                       np.ones_like(img)], -1))
    yy, xx = np.mgrid[0:16, 0:16] / 15.0
    env = tex("env", np.stack([xx, yy, 1 - xx, np.ones_like(xx)], -1))
    # object-space normal map: bumpy normals around +z
    ny, nx = np.mgrid[0:16, 0:16]
    nz = np.sin(nx * 1.3) * 0.4
    nmap = tex("nmap", np.stack([nz * 0.5 + 0.5,
                                 np.cos(ny * 0.9) * 0.2 + 0.5,
                                 np.full_like(nz, 1.0),
                                 np.ones_like(nz)], -1))
    rng = np.random.default_rng(3)
    b = rng.uniform(0.2, 0.8, (16, 16)).astype(np.float32)
    bump = tex("bump", np.stack([b, 1 - b, b, np.ones_like(b)], -1))

    # 1. DP3 normal mapping
    m1 = CKMaterial(ctx, "dp3")
    m1.SetEmissive((1, 1, 1, 1))
    m1.SetTwoSided(True)
    m1.SetTexture(checker)
    m1.SetTexture(nmap, 1)
    m1.SetEffect(VXEFFECT_DP3)
    quad(ctx, "q_dp3", (-1, 1), m1)

    # 2. EMBM bump-env
    m2 = CKMaterial(ctx, "embm")
    m2.SetEmissive((1, 1, 1, 1))
    m2.SetTwoSided(True)
    m2.SetTexture(checker)
    m2.SetTexture(bump, 1)
    m2.SetTexture(env, 2)
    m2.SetEffect(VXEFFECT_BUMPENV)
    m2.SetEffectParameter(bump_scale=-1.3)
    quad(ctx, "q_embm", (1, 1), m2)

    # 3. 2-texture modulate
    m3 = CKMaterial(ctx, "blend2")
    m3.SetEmissive((1, 1, 1, 1))
    m3.SetTwoSided(True)
    m3.SetTexture(checker)
    m3.SetTexture(env, 1)
    m3.SetEffect(VXEFFECT_2TEXTURES)
    m3.SetEffectParameter(op=CKRST_TOP_MODULATE)
    quad(ctx, "q_blend", (-1, -1), m3)

    # 4. chrome TexGen
    m4 = CKMaterial(ctx, "chrome")
    m4.SetEmissive((1, 1, 1, 1))
    m4.SetTwoSided(True)
    m4.SetTexture(env)
    m4.SetEffect(VXEFFECT_TEXGEN)
    m4.SetEffectParameter(texgen=TEXGEN_CHROME)
    quad(ctx, "q_chrome", (1, -1), m4)

    rc.Render()
    p = os.path.join(args.out, "effects_demo.png")
    rc.DumpToFile(p)
    fb = rc.framebuffer()
    print(f"wrote {p}; quadrant mean RGB:")
    h = args.size // 2
    for name, sl in (("DP3", (slice(0, h), slice(0, h))),
                     ("EMBM", (slice(0, h), slice(h, None))),
                     ("2TEX", (slice(h, None), slice(0, h))),
                     ("CHROME", (slice(h, None), slice(h, None)))):
        q = fb[sl[0], sl[1], :3]
        print(f"  {name:6s} {np.round(q.mean(0).mean(0), 3)}")


if __name__ == "__main__":
    main()
