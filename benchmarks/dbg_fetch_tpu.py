import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_pallas_tiled import _random_batch, _setup_for, _fake_shade_tbl
from ckrenderengine_tpu.raster import deferred as df
from ckrenderengine_tpu.raster.pallas_tiled import depth_reduce_tiled_pallas

h, w = 48, 96
t = 260
xyw, z, state_idx, valid = _random_batch(t, h, w, seed=2)
setup = _setup_for(xyw, z, t)
defer = jnp.ones(t, bool)
viewport = jnp.asarray([0, 0, w, h], jnp.float32)
tbl = _fake_shade_tbl(t, 65)
bi, bd, peak, rows = depth_reduce_tiled_pallas(
    setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=4,
    span2=16, interpret=False, shade_tbl=tbl)
bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
bi, rows = np.asarray(bi), np.asarray(rows)
np.testing.assert_array_equal(bi, np.asarray(bi_f))
want = np.where(bi[None] >= 0,
                np.asarray(jnp.take(tbl.T, jnp.clip(jnp.asarray(bi), 0, t - 1)
                                    .reshape(-1), axis=1).reshape(65, h, w)), 0.0)
bad = ~np.isclose(rows, want, atol=1e-6)
print("bad elements:", bad.sum(), "of", bad.size)
if bad.sum():
    ch, yy, xx = np.nonzero(bad)
    print("first bad:", ch[0], yy[0], xx[0], "got", rows[ch[0], yy[0], xx[0]],
          "want", want[ch[0], yy[0], xx[0]], "winner", bi[yy[0], xx[0]])
    # which channels/tiles are bad?
    print("bad ch uniq:", np.unique(ch)[:10], "ntile bad y:", np.unique(yy//16), "x:", np.unique(xx//16))
