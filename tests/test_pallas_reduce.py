"""Pallas flat depth-reduce parity (interpreter mode on CPU): ids and depths
must match the XLA reduce exactly, including draw-order tie-breaks."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.raster import deferred as df
from ckrenderengine_tpu.raster.pallas_reduce import depth_reduce_pallas
from ckrenderengine_tpu.raster.types import RasterState, pack_states
from tests.test_tiled_raster import _random_batch


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_xla(seed):
    h, w = 64, 64
    t = 160
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed)
    si, sf = pack_states([RasterState()])
    setup = df.triangle_setup(xyw, z, state_idx, valid, jnp.asarray(si))
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    bi_x, bd_x = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_p, bd_p = depth_reduce_pallas(setup, defer, 1.0, viewport, h, w,
                                     block_h=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi_p), np.asarray(bi_x))
    np.testing.assert_allclose(np.asarray(bd_p), np.asarray(bd_x), atol=0)


def test_pallas_equal_depth_tie_later_wins():
    # two identical triangles: the later draw id must win everywhere
    h, w = 32, 32
    xyw = np.tile(np.array(
        [[[2, 2, 1], [30, 2, 1], [16, 30, 1]]], np.float32), (2, 1, 1))
    z = np.full((2, 3), 0.5, np.float32)
    si, sf = pack_states([RasterState()])
    setup = df.triangle_setup(jnp.asarray(xyw), jnp.asarray(z),
                              jnp.zeros(2, jnp.int32), jnp.ones(2, bool),
                              jnp.asarray(si))
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi, bd = depth_reduce_pallas(setup, jnp.ones(2, bool), 1.0, viewport,
                                 h, w, block_h=32, interpret=True)
    covered = np.asarray(bi) >= 0
    assert covered.any()
    assert (np.asarray(bi)[covered] == 1).all()
