"""Capacity planning (round-4): the tiled solve exports bin statistics and
the render context's governor derives/bumps its static capacity caps from
them — a config-4-class silent fallback regression (47 -> 14 fps when a
denser pose overflowed pair_cap) is now impossible: the fallback surfaces
in VxStats.SolveFallbackRows and the caps recompile with headroom."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.objects import CKCamera, CKContext


def _rc():
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    rc.Render()                      # compile so _default_solve_caps works
    return rc


def _stats(live=1000, cut=0, g_over=0, s_over=0, n_small=800, n_mid=10,
           peak=50):
    return {"SolveBinStats": jnp.asarray(
        [peak, live, cut, g_over, s_over, n_small, n_mid], jnp.int32)}


class TestGovernor:
    def test_initial_plan_shrinks_to_scene(self):
        rc = _rc()
        rc._gov_on = True
        assert rc._solve_caps is None
        rc._governor_tick(_stats(live=5000, n_small=4000, n_mid=20))
        pair, slab, gcap = rc._solve_caps
        p0, s0, g0 = rc._default_solve_caps()
        assert pair < p0 and slab < s0 and gcap < g0
        assert pair >= 5000 * 2 and slab >= 4000 * 2    # safety margins
        assert gcap >= 1024

    def test_bumps_on_fallback_rows(self):
        rc = _rc()
        rc._gov_on = True
        rc._governor_tick(_stats())                     # frame 1: plan
        caps0 = rc._solve_caps
        # Post-plan samples STASH (never block the pipeline); the newest
        # stash applies at the next sync point (_governor_resolve — called
        # from GetFrameFence / fb reads in production).
        rc._governor_tick(_stats(live=int(caps0[0] * 0.95), cut=128))
        assert rc._solve_caps == caps0                  # not yet resolved
        rc._governor_resolve()
        assert rc._solve_caps[0] > caps0[0]             # pair_cap bumped
        assert rc.stats.SolveCapBumps >= 1
        assert rc.stats.SolveFallbackRows > 0
        assert rc.stats.SolveLivePairs > 0

    def test_small_loads_stay_at_cap_floors(self):
        """Tiny scenes plan at the cap floors; the shrink pass finds no
        room below them and never churns the compile."""
        rc = _rc()
        rc._gov_on = True
        rc._governor_tick(_stats())
        caps0 = rc._solve_caps
        for _ in range(20):
            rc._governor_tick(_stats())
            rc._governor_resolve()
        assert rc._solve_caps == caps0
        assert rc.stats.SolveCapBumps == 0
        assert rc.stats.SolveCapShrinks == 0

    def test_steady_state_shrinks_to_observed_peak(self):
        rc = _rc()
        rc._gov_on = True
        # Frame-1 pose bins heavy: generous 2.5x plan.
        rc._governor_tick(_stats(live=39000, n_small=40000, n_mid=3000))
        caps0 = rc._solve_caps
        assert caps0[0] >= 39000 * 2.4
        # Steady observed load well under the plan: 5 resolved samples
        # build history without touching the caps...
        for _ in range(5):
            rc._governor_tick(_stats(live=30000, n_small=20000, n_mid=700))
            rc._governor_resolve()
        assert rc._solve_caps == caps0
        assert rc.stats.SolveCapBumps == 0
        # ...the 6th completes the observed-peak window: ONE shrink to
        # 1.25x the peak (the plan's 2.5x frame-1 margin is pose-swing
        # insurance, not a steady-state cost).
        rc._governor_tick(_stats(live=30000, n_small=20000, n_mid=700))
        rc._governor_resolve()
        assert rc.stats.SolveCapShrinks == 1
        assert rc._solve_caps[0] < caps0[0]
        assert rc._solve_caps[1] < caps0[1]
        # and the shrunk caps still clear the observed peak with margin
        assert rc._solve_caps[0] >= 30000 * 1.25
        assert rc._solve_caps[1] >= 20000 * 1.25
        # further steady samples change nothing (one shrink per compile)
        caps1 = rc._solve_caps
        for _ in range(10):
            rc._governor_tick(_stats(live=30000, n_small=20000, n_mid=700))
            rc._governor_resolve()
        assert rc._solve_caps == caps1
        assert rc.stats.SolveCapShrinks == 1

    def test_recompile_resets_caps(self):
        rc = _rc()
        rc._gov_on = True
        rc._governor_tick(_stats())
        assert rc._solve_caps is not None
        rc._compile()
        assert rc._solve_caps is None


class TestBinStats:
    def test_solver_exports_exact_fallback_counts(self):
        """Tiny pair_cap forces the sorted-tail fallback: output must stay
        EXACT (fallback is correctness insurance) and the binstats vector
        must report the cut rows — the governor's trigger. This is the
        1.5x-denser-scene scenario as a unit test."""
        from ckrenderengine_tpu.raster import deferred as df
        from ckrenderengine_tpu.raster.pallas_tiled import (
            depth_reduce_tiled_pallas,
        )
        from ckrenderengine_tpu.raster.types import RasterState, pack_states
        from tests.test_tiled_raster import _random_batch

        h = w = 64
        xyw, z, state_idx, valid = _random_batch(600, h, w, seed=7)
        si, _sf = pack_states([RasterState()])
        setup = df.triangle_setup(xyw, z, state_idx, valid, jnp.asarray(si))
        defer = valid
        batch_xyw = xyw
        vp = jnp.asarray([0, 0, w, h], jnp.float32)
        kw = dict(interpret=True, want_binstats=True)
        bi_ref, bd_ref, st_ref = depth_reduce_tiled_pallas(
            setup, defer, 1.0, vp, batch_xyw, h, w, **kw)
        bi, bd, st = depth_reduce_tiled_pallas(
            setup, defer, 1.0, vp, batch_xyw, h, w, pair_cap=128, **kw)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi_ref))
        np.testing.assert_array_equal(np.asarray(bd), np.asarray(bd_ref))
        st = np.asarray(st)
        st_ref = np.asarray(st_ref)
        assert st.shape == (7,) and st_ref.shape == (7,)
        assert st_ref[2] == 0                    # default caps: no fallback
        assert st[2] > 0                         # cut rows reported
        assert st[1] == st_ref[1]                # live pairs agree
