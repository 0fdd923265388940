"""Round-4 probe: can a multi-frame program amortize the per-program floor?

Round-3 established a ~4.3 ms/frame floor (RPC/queue cost per dispatched
program, independent of arg count/transfer size) that survives pipelined
async dispatch — i.e. it is serialized per program execution, not host
time that overlaps away. If real, the only fix is FEWER programs per
frame: fold W frames into ONE program via lax.scan over stacked packed
buffers (frames are data-independent; the scan body is the whole frame).

Stages (each compiled once, round-robin windows, min-of-rounds):
    floor1      trivial program, 1 frame / program        (expect ~4.3)
    floor_s8    trivial scan, 8 frames / program          (floor/8 + scan?)
    full1       full frame program                        (expect ~25)
    full_s2     scan of 2 full frames in one program      (per-frame cost?)
    full_s4     scan of 4 full frames in one program

Usage: python benchmarks/window_probe.py [--config config5] [--stages ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config5")
    ap.add_argument("--stages", default="floor1,floor_s8,full1,full_s2,full_s4")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.stages import build_packed
    from ckrenderengine_tpu.pipeline import frame as fr

    rc, static, dyn_f, dyn_i, params = build_packed(args.config)
    layout, levels = params["layout"], params["levels"]
    height, width = params["height"], params["width"]

    def one_frame(st, f, i):
        p = {k: v for k, v in params.items()
             if k not in ("layout", "levels", "height", "width", "texdev",
                          "texdev_rects")}
        out = fr.render_frame_packed_impl(
            st, f, i, layout, levels, height, width,
            texdev=params.get("texdev"),
            texdev_rects=params.get("texdev_rects", ()), **p)
        return out[0]                                   # fb (4, H, W)

    def full1(st, f, i):
        return one_frame(st, f, i).sum()

    def make_scan(w, body_is_full):
        def fn(st, fs, is_):
            def body(carry, xs):
                f, i = xs
                if body_is_full:
                    fb = one_frame(st, f, i)
                    return carry + fb.sum(), fb.sum()
                return carry + f.sum() + i.sum(), f.sum()

            tot, ys = jax.lax.scan(body, jnp.float32(0.0), (fs, is_))
            return tot
        return fn, w

    def floor1(st, f, i):
        return f.sum() + i.sum()

    stages = {}
    stages["floor1"] = (jax.jit(floor1), 1, (dyn_f, dyn_i))
    f8 = np.broadcast_to(dyn_f, (8,) + dyn_f.shape).copy()
    i8 = np.broadcast_to(dyn_i, (8,) + dyn_i.shape).copy()
    fn8, _ = make_scan(8, False)
    stages["floor_s8"] = (jax.jit(fn8), 8, (f8, i8))
    stages["full1"] = (jax.jit(full1), 1, (dyn_f, dyn_i))
    for w in (2, 4):
        fw = np.broadcast_to(dyn_f, (w,) + dyn_f.shape).copy()
        iw = np.broadcast_to(dyn_i, (w,) + dyn_i.shape).copy()
        fnw, _ = make_scan(w, True)
        stages[f"full_s{w}"] = (jax.jit(fnw), w, (fw, iw))

    names = [n for n in args.stages.split(",") if n in stages]
    for n in names:
        jf, w, dyn = stages[n]
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jf(static, *dyn)))
        print(f"compiled {n} [{time.perf_counter()-t0:.0f}s]", flush=True)
    best = {n: 1e9 for n in names}
    for r in range(args.rounds):
        for n in names:
            jf, w, dyn = stages[n]
            np.asarray(jax.device_get(jf(static, *dyn)))      # drain
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jf(static, *dyn)
            np.asarray(jax.device_get(out))
            per_frame = (time.perf_counter() - t0) / (args.iters * w) * 1000
            best[n] = min(best[n], per_frame)
    for n in names:
        print(f"{n:10s} {best[n]:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
