"""Split the headline bench frame into host fill / dispatch / device time.

Runs the config-5 scene (bench.build_scene) on the real TPU and reports:
  fill_ms      host-only packed-buffer fill (no device dispatch)
  dispatch_ms  wall time per Render() in an unfenced loop (host cost while
               the device pipeline is saturated)
  honest_ms    full honest-window frame time (bench protocol)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from bench import build_scene, honest_fps

    ctx, rc, spinner = build_scene(1024, 768)
    rc.Render()
    jax.block_until_ready(rc.fb)

    def tick(i):
        spinner.Rotate((0, 1, 0), 0.01)

    # Host fill only (packed-buffer build, no dispatch).
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        tick(i)
        rc._fill_packed([], [])
    fill_ms = (time.perf_counter() - t0) / n * 1e3

    # Unfenced dispatch loop: host cost per Render() while queueing.
    np.asarray(jax.device_get(rc.fb))
    t0 = time.perf_counter()
    for i in range(n):
        tick(i)
        rc.Render()
    dispatch_ms = (time.perf_counter() - t0) / n * 1e3
    np.asarray(jax.device_get(rc.fb))

    fps = honest_fps(rc, tick)
    print(f"fill_ms={fill_ms:.2f} dispatch_ms={dispatch_ms:.2f} "
          f"honest_ms={1e3 / fps:.2f} honest_fps={fps:.2f}")


if __name__ == "__main__":
    main()
