"""Layout micro-probe: rank-3 (T,3,C) vs planar 2D corner layouts on TPU.

Hypothesis (from asm_probe): materializing (T,3,14) costs ~26 ms at T=527k
because the trailing (3,14) dims pad to native (8,128) tiles — a 16x
blow-up — while (T,42) 2D or three (T,14) planar slices stay near the raw
88 MB stream size.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    T = 527_000
    NC = 3 * T

    key = jax.random.PRNGKey(0)
    xin = jax.random.normal(key, (NC, 14), jnp.float32)
    xin = jax.block_until_ready(xin)

    def interleaved_r3(x):      # today's corner_take: (nc,14)->(T,3,14)
        return x.reshape(T, 3, 14).sum()

    def wide_2d(x):             # (nc,14)->(T,42) row-major reshape
        return x.reshape(T, 42).sum()

    def planar_slices(x):       # corner-planar: three contiguous 2D slices
        return x[:T].sum() + x[T:2 * T].sum() + x[2 * T:].sum()

    def planar_stack(x):        # planar slices stacked to rank-3
        return jnp.stack([x[:T], x[T:2 * T], x[2 * T:]], axis=1).sum()

    def cross_from_r3(x):       # setup-style math from interleaved rank-3
        c = x.reshape(T, 3, 14)
        v0, v1, v2 = c[:, 0, :3], c[:, 1, :3], c[:, 2, :3]
        adj0 = jnp.cross(v1, v2)
        det = jnp.sum(v0 * adj0, axis=-1)
        return det.sum()

    def cross_from_planar(x):   # same math from planar 2D slices
        v0, v1, v2 = x[:T, :3], x[T:2 * T, :3], x[2 * T:, :3]
        adj0 = jnp.cross(v1, v2)
        det = jnp.sum(v0 * adj0, axis=-1)
        return det.sum()

    def flags_r2(x):            # a_flags-style (nc,)->(T,3) reshape
        f = (x[:, 0] > 0).astype(jnp.int32)
        f3 = f.reshape(T, 3)
        return ((f3[:, 0] & f3[:, 1] & f3[:, 2]) != 0).sum()

    def flags_planar(x):
        f = (x[:, 0] > 0).astype(jnp.int32)
        return ((f[:T] & f[T:2 * T] & f[2 * T:]) != 0).sum()

    for name, fn in [("interleaved_r3", interleaved_r3),
                     ("wide_2d", wide_2d),
                     ("planar_slices", planar_slices),
                     ("planar_stack", planar_stack),
                     ("cross_from_r3", cross_from_r3),
                     ("cross_from_planar", cross_from_planar),
                     ("flags_r2", flags_r2),
                     ("flags_planar", flags_planar)]:
        f = jax.jit(fn)
        r = f(xin)
        np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            r = f(xin)
        np.asarray(jax.device_get(r))
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:18s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
