import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from ckrenderengine_tpu.raster import deferred as df
from ckrenderengine_tpu.raster.tiled import depth_reduce_tiled
from ckrenderengine_tpu.raster.pallas_tiled import depth_reduce_tiled_pallas

rng = np.random.default_rng(3)
T, H, W = 9000, 320, 512
xyw = np.zeros((T,3,3), np.float32)
ctr = rng.uniform([0,0],[W,H],(T,2)).astype(np.float32)
for k in range(3):
    ang = rng.uniform(0, 2*np.pi, T); rad = rng.uniform(2, 60, T)
    w = rng.uniform(0.5, 2.0, T).astype(np.float32)
    xyw[:,k,0] = (ctr[:,0] + np.cos(ang)*rad) * w
    xyw[:,k,1] = (ctr[:,1] + np.sin(ang)*rad) * w
    xyw[:,k,2] = w
z = rng.uniform(0, 1, (T,3)).astype(np.float32) * xyw[:,:,2]
state_idx = np.zeros(T, np.int32)
valid = np.ones(T, bool)
from ckrenderengine_tpu.raster.types import SI_CULL, VXCULL
state_i = np.zeros((1, 32), np.int32)
state_i[:, SI_CULL] = int(VXCULL.NONE)
setup = df.triangle_setup(jnp.asarray(xyw), jnp.asarray(z), jnp.asarray(state_idx),
                          jnp.asarray(valid), jnp.asarray(state_i))
defer = jnp.asarray(valid)
vp = jnp.asarray([0,0,W,H], jnp.float32)
tbl = jnp.asarray(rng.uniform(-1,1,(T,65)).astype(np.float32))
bi0, bd0, pk0 = depth_reduce_tiled(setup, defer, 1.0, vp, jnp.asarray(xyw), H, W)
bi1, bd1, pk1, rows = depth_reduce_tiled_pallas(setup, defer, 1.0, vp, jnp.asarray(xyw), H, W, shade_tbl=tbl)
bi0, bd0, bi1, bd1, rows = map(np.asarray, jax.device_get((bi0, bd0, bi1, bd1, rows)))
assert (bi0 == bi1).all(), f"id mismatch {np.sum(bi0!=bi1)}"
assert (bd0 == bd1).all(), "depth mismatch"
hit = bi1 >= 0
want = np.asarray(tbl)[np.clip(bi1,0,T-1)]
got = np.moveaxis(rows, 0, -1)
assert np.array_equal(got[hit], want[hit]), f"row mismatch {np.sum(~np.isclose(got[hit],want[hit]))}"
assert (got[~hit] == 0).all()
print("TPU PARITY OK", bi1.min(), bi1.max(), hit.mean())
