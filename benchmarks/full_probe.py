"""Bisect the FULL frame program: which sub-pass hides the extra ~14 ms
that the stage-prefix probes don't see (configs 3/4)?  Variants toggle one
feature each; interleaved min-of-rounds timing."""
import sys, time, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from benchmarks.stages import build_packed
    from ckrenderengine_tpu.pipeline import frame as fr

    cfg = os.environ.get("CK_PROBE_CONFIG", "config3")
    rc, static, dyn_f, dyn_i, params = build_packed(cfg)
    layout, levels = params["layout"], params["levels"]
    height, width = params["height"], params["width"]

    base_kw = {k: v for k, v in params.items()
               if k not in ("layout", "levels", "height", "width", "texdev",
                            "texdev_rects")}
    base_kw["texdev"] = params.get("texdev")
    base_kw["texdev_rects"] = params.get("texdev_rects", ())
    print("params:", {k: (v if not hasattr(v, 'shape') else type(v).__name__)
                      for k, v in base_kw.items()
                      if k in ("ordered_cap", "want_stencil", "ss",
                               "sort_transparent", "sampler_profile",
                               "corner")}, flush=True)

    def full(st, f, i, **over):
        kw = dict(base_kw)
        kw.update(over)
        out = fr.render_frame_packed_impl(st, f, i, layout, levels, height,
                                          width, **kw)
        return sum(x.sum() for x in out if x is not None)

    def strip_quads(st, f, i):
        # quads ride the layout; re-run unpack with the quad banks nulled by
        # monkeypatching has_field — instead just zero their valid flags:
        return full(st, f, i)

    variants = {
        "full": {},
        "no_ordered": {"ordered_cap": 0},
        "no_lines": {"lines": None},
        "no_skin": {"skin": None},
        "no_anim": {"anim": None, "world_in": None},
        "no_stencil": {"want_stencil": False},
    }
    jits = {}
    for n, over in variants.items():
        try:
            jf = jax.jit(functools.partial(full, **over))
            np.asarray(jax.device_get(jf(static, dyn_f, dyn_i)))
            jits[n] = jf
            print("compiled", n, flush=True)
        except Exception as e:
            print("SKIP", n, str(e)[:120], flush=True)
    iters, rounds = 8, 4
    best = {n: 1e9 for n in jits}
    for r in range(rounds):
        for n, jf in jits.items():
            np.asarray(jax.device_get(jf(static, dyn_f, dyn_i)))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jf(static, dyn_f, dyn_i)
            np.asarray(jax.device_get(out))
            best[n] = min(best[n], (time.perf_counter() - t0) / iters * 1000)
    for n in jits:
        print(f"{n:12s} {best[n]:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
