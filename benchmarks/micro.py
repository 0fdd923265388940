"""Micro-benchmarks for the primitives that bound the frame pipeline.

Each probe uses the honest protocol (pre-drain, pipelined window, one final
readback fence — docs/PERFORMANCE.md). Run on a QUIET host.

Usage: python benchmarks/micro.py [probe ...]
Probes:
    dispatch   per-call overhead: trivial program, few args vs many args
    gather     wide-row gathers at the shade's shapes (786k rows)
    onehot     chunked one-hot MXU matmul (the kernel shade-fetch candidate)
    texel      quad-texel gather (786k x 16)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def timeit(fn, *args, iters=8, inner=1):
    import jax

    r = fn(*args)
    np.asarray(jax.device_get(r)).sum()          # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(jax.device_get(r)).sum()
    return (time.perf_counter() - t0) / iters * 1000


def probe_dispatch():
    import jax
    import jax.numpy as jnp

    f = jnp.zeros((1755,), jnp.float32)
    i = jnp.zeros((129,), jnp.int32)
    fn2 = jax.jit(lambda a, b: a.sum() + b.sum())
    print(f"dispatch 2 dev args          {timeit(fn2, f, i):8.2f} ms")

    fh = np.zeros((1755,), np.float32)
    ih = np.zeros((129,), np.int32)
    print(f"dispatch 2 HOST args         {timeit(fn2, fh, ih):8.2f} ms")

    # 20 large device-resident args (the packed static dict shape).
    big = [jnp.zeros((1 << 20,), jnp.float32) for _ in range(18)]

    def fn20(a, b, *rest):
        return a.sum() + b.sum() + rest[0][0]

    fn20 = jax.jit(fn20)
    print(f"dispatch 2 host + 18 dev     {timeit(fn20, fh, ih, *big):8.2f} ms")

    # Same statics CLOSED OVER (constants) instead of passed.
    fn_cl = jax.jit(lambda a, b: a.sum() + b.sum() + big[0][0])
    print(f"dispatch closure statics     {timeit(fn_cl, fh, ih):8.2f} ms")

    # 60 small slices (the unpack shape) of one host buffer.
    offs = np.cumsum([0] + [29] * 59)

    def unpackish(a, b):
        tot = b.sum().astype(np.float32)
        for o in offs:
            tot += a[int(o):int(o) + 29].sum()
        return tot

    fnu = jax.jit(unpackish)
    print(f"dispatch 60-slice unpack     {timeit(fnu, fh, ih):8.2f} ms")


def probe_gather(rows=786432):
    import jax
    import jax.numpy as jnp

    t = 527744
    for w in (16, 32, 74, 128):
        tbl = jnp.zeros((t, w), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, t, rows), jnp.int32)

        fn = jax.jit(lambda tb, ix: jnp.take(
            jax.lax.optimization_barrier(tb), ix, axis=0).sum())
        ms = timeit(fn, tbl, idx)
        print(f"row gather  {rows} x W{w:<4d}    {ms:8.2f} ms  "
              f"({rows / ms / 1e3:7.0f} Mrows/s)" if ms else "")

        fnT = jax.jit(lambda tb, ix: jnp.take(
            jax.lax.optimization_barrier(tb.T), ix, axis=1).sum())
        msT = timeit(fnT, tbl, idx)
        print(f"col gather  {rows} x W{w:<4d}    {msT:8.2f} ms")


def probe_onehot():
    import jax
    import jax.numpy as jnp

    # The kernel shade-fetch shape: per chunk (npix x kchunk) @ (kchunk x W).
    npix, kchunk, w = 1024, 128, 104
    for nchunks in (768, 1536, 3072):
        ids = jnp.asarray(np.random.randint(0, 1 << 20, (nchunks, kchunk)),
                          jnp.float32)
        best = jnp.asarray(np.random.randint(0, 1 << 20, (nchunks, npix)),
                           jnp.float32)
        rows = jnp.zeros((nchunks, kchunk, w), jnp.float32)

        def fetch(ids, best, rows):
            oh = (best[:, :, None] == ids[:, None, :]).astype(jnp.float32)
            return jnp.einsum("cpk,ckw->cpw", oh, rows,
                              preferred_element_type=jnp.float32).sum()

        ms = timeit(jax.jit(fetch), ids, best, rows)
        mac = nchunks * npix * kchunk * w
        print(f"onehot fetch {nchunks:5d} chunks   {ms:8.2f} ms  "
              f"({mac / ms / 1e9:6.1f} GMAC/ms)")


def probe_texel(rows=786432):
    import jax
    import jax.numpy as jnp

    for nt in (1536, 65536):
        quad = jnp.zeros((nt, 16), jnp.float32)
        idx = jnp.asarray(np.random.randint(0, nt, rows), jnp.int32)
        fn = jax.jit(lambda q, ix: jnp.take(
            jax.lax.optimization_barrier(q), ix, axis=0).sum())
        print(f"texel quad gather {rows} from {nt:6d}  "
              f"{timeit(fn, quad, idx):8.2f} ms")


def main():
    probes = sys.argv[1:] or ["dispatch", "gather", "onehot", "texel"]
    for p in probes:
        print(f"--- {p} ---", flush=True)
        globals()[f"probe_{p}"]()


if __name__ == "__main__":
    main()
