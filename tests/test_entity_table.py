import jax.numpy as jnp
import numpy as np
import pytest

from ckrenderengine_tpu.math import vxmath as vx
from ckrenderengine_tpu.scene import entity_table as et


def _chain_table(depth=4):
    t = et.EntityTable()
    ids = [t.allocate() for _ in range(depth)]
    for i in range(1, depth):
        t.set_parent(ids[i], ids[i - 1])
        t.local[ids[i]] = np.asarray(vx.from_translation([1.0, 0.0, 0.0]))
    return t, ids


def test_levels_of_chain():
    t, ids = _chain_table(4)
    lv = t.levels()
    assert [list(x) for x in lv] == [[0], [1], [2], [3]]


def test_compose_world_chain():
    t, ids = _chain_table(4)
    w = np.asarray(t.world_matrices())
    # Each link adds +X 1: world translation of node k = (k, 0, 0).
    for k in range(4):
        np.testing.assert_allclose(w[k][3, :3], [k, 0, 0], atol=1e-6)


def test_compose_world_rotation_propagates():
    t = et.EntityTable()
    root = t.allocate()
    child = t.allocate()
    t.set_parent(child, root)
    t.local[root] = np.asarray(vx.rotation_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2))
    t.local[child] = np.asarray(vx.from_translation([1.0, 0.0, 0.0]))
    w = np.asarray(t.world_matrices())
    # Child at parent-local +X -> world +Y after parent's 90deg Z rotation.
    np.testing.assert_allclose(w[child][3, :3], [0, 1, 0], atol=1e-5)


def test_compose_world_doubling_matches_levels():
    rng = np.random.default_rng(0)
    t = et.EntityTable()
    n = 30
    ids = [t.allocate() for _ in range(n)]
    for i in range(1, n):
        t.set_parent(ids[i], int(rng.integers(0, i)))
        tr = vx.from_translation(rng.normal(size=3).astype(np.float32))
        rot = vx.rotation_axis_angle(jnp.asarray(rng.normal(size=3).astype(np.float32)), float(rng.normal()))
        t.local[ids[i]] = np.asarray(vx.multiply(rot, tr))
    w_level = np.asarray(t.world_matrices())
    depth = len(t.levels())
    w_dbl = np.asarray(
        et.compose_world_doubling(jnp.asarray(t.local[:n]), jnp.asarray(t.parent[:n]), depth)
    )
    np.testing.assert_allclose(w_level, w_dbl, atol=1e-4)


def test_cycle_rejected():
    t, ids = _chain_table(3)
    with pytest.raises(ValueError):
        t.set_parent(ids[0], ids[2])


def test_capacity_growth_preserves_data():
    t = et.EntityTable(capacity=2)
    a = t.allocate()
    t.local[a] = np.asarray(vx.from_translation([5.0, 0.0, 0.0]))
    for _ in range(10):
        t.allocate()
    w = np.asarray(t.world_matrices())
    np.testing.assert_allclose(w[a][3, :3], [5, 0, 0], atol=1e-6)
    assert t.count == 11
