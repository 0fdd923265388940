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


def probe_cliff(rows=786432):
    """Shape of the row-gather width cliff: lanes vs bytes, dtype, and
    whether two independent gathers in one program pipeline."""
    import jax
    import jax.numpy as jnp

    t = 527744
    idx = jnp.asarray(np.random.randint(0, t, rows), jnp.int32)
    for w, dt in ((16, jnp.float32), (20, jnp.float32), (24, jnp.float32),
                  (28, jnp.float32), (32, jnp.float32),
                  (32, jnp.bfloat16), (44, jnp.bfloat16),
                  (64, jnp.bfloat16), (64, jnp.int8), (128, jnp.int8)):
        tbl = jnp.zeros((t, w), dt)
        fn = jax.jit(lambda tb, ix: jnp.take(
            jax.lax.optimization_barrier(tb), ix, axis=0).sum(
                dtype=jnp.float32))
        ms = timeit(fn, tbl, idx)
        print(f"row gather {rows} x W{w:<4d}{dt.__name__:<9s} {ms:8.2f} ms "
              f"({rows / ms / 1e3:7.0f} Mrows/s, "
              f"{w * dt(0).dtype.itemsize:4d} B/row)", flush=True)

    # Two INDEPENDENT W16 gathers in one program: do they pipeline?
    tbl16 = jnp.zeros((t, 16), jnp.float32)
    idx2 = jnp.asarray(np.random.randint(0, t, rows), jnp.int32)
    fn2 = jax.jit(lambda tb, ia, ib: jnp.take(tb, ia, axis=0).sum()
                  + jnp.take(tb, ib, axis=0).sum())
    print(f"2 indep W16 gathers          {timeit(fn2, tbl16, idx, idx2):8.2f}"
          " ms", flush=True)
    # One W16 + one W28 (the split-44 candidate).
    tbl28 = jnp.zeros((t, 28), jnp.float32)
    fn3 = jax.jit(lambda ta, tb, ia: jnp.take(ta, ia, axis=0).sum()
                  + jnp.take(tb, ia, axis=0).sum())
    print(f"W16 + W28 gathers            {timeit(fn3, tbl16, tbl28, idx):8.2f}"
          " ms", flush=True)


def probe_int8(rows=786432):
    """int8-bytes row gather + bitcast back to f32: the fast-fetch candidate.
    Validates speed AND bit-exactness vs the f32 gather."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    t = 527744
    rng = np.random.default_rng(3)
    tbl_np = rng.standard_normal((t, 44), np.float32)
    idx_np = rng.integers(0, t, rows).astype(np.int32)
    tbl = jnp.asarray(tbl_np)
    idx = jnp.asarray(idx_np)

    def f32_gather(tb, ix):
        return jnp.take(jax.lax.optimization_barrier(tb), ix, axis=0)

    def i8_row(tb, ix):
        b = jax.lax.optimization_barrier(
            lax.bitcast_convert_type(tb, jnp.uint8).reshape(t, 44 * 4))
        g = jnp.take(b, ix, axis=0)                       # (R, 176) u8
        return lax.bitcast_convert_type(g.reshape(-1, 44, 4), jnp.float32)

    def i8_col(tb, ix):
        b = jax.lax.optimization_barrier(
            lax.bitcast_convert_type(tb, jnp.uint8).reshape(t, 176).T)
        g = jnp.take(b, ix, axis=1)                       # (176, R) u8
        w = g.reshape(44, 4, -1).astype(jnp.int32)
        word = (w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16)
                | (w[:, 3] << 24))                        # (44, R) i32
        return lax.bitcast_convert_type(word, jnp.float32)

    # bit-exactness
    want = tbl_np[idx_np]
    got_r = np.asarray(jax.jit(i8_row)(tbl, idx))
    got_c = np.asarray(jax.jit(i8_col)(tbl, idx)).T
    print(f"i8 row bit-exact: {np.array_equal(want, got_r)}  "
          f"i8 col bit-exact: {np.array_equal(want, got_c)}", flush=True)

    for name, fn in (("f32 W44 gather", f32_gather), ("i8 row+bitcast", i8_row),
                     ("i8 col+repack", i8_col)):
        ms = timeit(jax.jit(lambda tb, ix, f=fn: f(tb, ix).sum()), tbl, idx)
        print(f"{name:22s} {ms:8.2f} ms", flush=True)

    # solve-phase shape: 139k x W128 f32 slab gather as int8
    t2, r2 = 139264, 139264
    tbl2 = jnp.asarray(rng.standard_normal((t2, 128), np.float32))
    idx2 = jnp.asarray(rng.integers(0, t2, r2).astype(np.int32))
    ms = timeit(jax.jit(lambda tb, ix: jnp.take(
        jax.lax.optimization_barrier(tb), ix, axis=0).sum()), tbl2, idx2)
    print(f"slab f32 W128 139k     {ms:8.2f} ms", flush=True)

    def i8_slab(tb, ix):
        b = jax.lax.optimization_barrier(
            lax.bitcast_convert_type(tb, jnp.uint8).reshape(t2, 512))
        g = jnp.take(b, ix, axis=0)
        return lax.bitcast_convert_type(
            g.reshape(-1, 128, 4), jnp.float32).sum()

    ms = timeit(jax.jit(i8_slab), tbl2, idx2)
    print(f"slab i8  W512 139k     {ms:8.2f} ms", flush=True)


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
