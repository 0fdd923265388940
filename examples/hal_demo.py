"""Drive the rasterizer HAL directly — no scene graph, no render manager.

The HAL (`raster/hal.py`) is the reference's CKRasterizer/Driver/Context
device boundary (reference include/CKRasterizer.h) as a working software
device: immediate DrawPrimitive with fixed-function lighting, render-state
cache, VB/IB objects, sprites, display lists. This demo renders a lit
spinning triangle + a sprite blit and writes PNGs.

    python examples/hal_demo.py [--cpu] [--frames 8] [--out /tmp]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--out", default="/tmp")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ckrenderengine_tpu.raster.hal import (
        CKRST_CTXCLEAR_ALL, CKRST_OBJ_SPRITE, CKRasterizer, VXMATRIX_PROJECTION,
        VXMATRIX_VIEW, VXMATRIX_WORLD, VXRENDERSTATE,
    )
    from ckrenderengine_tpu.raster.types import VXPRIMITIVE

    rst = CKRasterizer()
    rst.Start(None)
    dev = rst.GetDriver(0).CreateContext()
    dev.Create(None, args.size, args.size)

    # camera: z=-4, simple perspective
    view = np.eye(4, dtype=np.float32)
    view[3, 2] = 4.0
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.5
    proj[2, 2] = 100.0 / 99.0
    proj[3, 2] = -100.0 / 99.0
    proj[2, 3] = 1.0
    dev.SetTransformMatrix(VXMATRIX_VIEW, view)
    dev.SetTransformMatrix(VXMATRIX_PROJECTION, proj)
    dev.SetLight(0, {"direction": (0.3, -0.5, 1.0), "diffuse": (1, 0.9, 0.7)})
    dev.EnableLight(0)
    dev.SetMaterial({"diffuse": (0.9, 0.4, 0.2, 1.0)})
    dev.SetRenderState(VXRENDERSTATE.AMBIENT, 0x202020)

    # a sprite (HAL pow2 decomposition path)
    si = rst.CreateObjectIndex(CKRST_OBJ_SPRITE)
    dev.CreateSprite(si, 24, 10)
    badge = np.zeros((10, 24, 4), np.float32)
    badge[1:-1, 1:-1] = (0.2, 0.9, 0.2, 0.8)
    dev.LoadSprite(si, badge)

    tri = np.array([[-1, -1, 0], [0, 1.3, 0], [1, -1, 0]], np.float32)
    nrm = np.tile([0, 0, -1], (3, 1)).astype(np.float32)
    for f in range(args.frames):
        a = f * 0.35
        rot = np.eye(4, dtype=np.float32)
        rot[0, 0] = rot[2, 2] = np.cos(a)
        rot[0, 2] = np.sin(a)
        rot[2, 0] = -np.sin(a)
        dev.SetTransformMatrix(VXMATRIX_WORLD, rot)
        dev.BeginScene()
        dev.Clear(CKRST_CTXCLEAR_ALL, 0xFF101828)
        dev.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST), None,
                          {"positions": tri,
                           "normals": (nrm @ rot[:3, :3].T)})
        dev.DrawSprite(si, dst_rect=(4, 4, 28, 14))
        dev.EndScene()
        img = dev.BackToFront()
        path = f"{args.out}/hal_{f:03d}.png"
        try:
            from PIL import Image
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
            print(f"frame {f}: {path}  tris={dev.stats['NbTrianglesDrawn']}")
        except ImportError:
            print(f"frame {f}: (PIL missing; fb mean {img.mean():.3f})")
    print("render-state cache:",
          f"hit={dev.render_state_cache_hit} miss={dev.render_state_cache_miss}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
