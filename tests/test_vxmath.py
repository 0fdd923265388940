import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ckrenderengine_tpu.math import vxmath as vx
from ckrenderengine_tpu.math import frustum as fr


def test_row_vector_translation():
    m = vx.from_translation([1.0, 2.0, 3.0])
    p = vx.transform_points(jnp.array([0.0, 0.0, 0.0]), m)
    np.testing.assert_allclose(np.asarray(p), [1, 2, 3], atol=1e-6)
    # Row 3 is translation (the layout RCKLight::Setup reads).
    np.testing.assert_allclose(np.asarray(m)[3, :3], [1, 2, 3])


def test_compose_order_local_then_parent():
    # child local = +X translation; parent = rotate 90deg about Z then translate.
    local = vx.from_translation([1.0, 0.0, 0.0])
    parent = vx.multiply(vx.rotation_axis_angle([0, 0, 1], jnp.pi / 2), vx.from_translation([0.0, 0.0, 5.0]))
    world = vx.multiply(local, parent)
    p = vx.transform_points(jnp.zeros(3), world)
    # Local origin at +X 1 -> rotated to +Y 1 -> translated +Z 5.
    np.testing.assert_allclose(np.asarray(p), [0, 1, 5], atol=1e-5)


def test_inverse_rigid_matches_general():
    m = vx.multiply(vx.rotation_axis_angle([1, 2, 3], 0.7), vx.from_translation([4.0, -5.0, 6.0]))
    np.testing.assert_allclose(np.asarray(vx.inverse_rigid(m)), np.asarray(vx.inverse(m)), atol=1e-5)


def test_perspective_matches_d3d_structure():
    fov, aspect, near, far = 0.8, 4 / 3, 1.0, 4000.0
    m = np.asarray(vx.perspective(fov, aspect, near, far))
    cot = np.cos(fov / 2) / np.sin(fov / 2)
    assert m[0, 0] == pytest.approx(cot)
    assert m[1, 1] == pytest.approx(cot * aspect)
    assert m[2, 2] == pytest.approx(far / (far - near))
    assert m[3, 2] == pytest.approx(-far / (far - near) * near)
    assert m[2, 3] == 1.0 and m[3, 3] == 0.0


def test_clip_flags_and_screen_mapping():
    view = vx.identity()  # camera at origin looking +Z
    proj = vx.perspective(jnp.pi / 2, 1.0, 1.0, 100.0)
    total = vx.multiply(view, proj)
    # Point straight ahead -> screen center.
    clip = vx.transform_points4(jnp.array([[0.0, 0.0, 10.0]]), total)
    assert int(vx.clip_flags(clip)[0]) == 0
    scr = vx.clip_to_screen(clip, 0, 0, 640, 480)
    np.testing.assert_allclose(np.asarray(scr)[0, :2], [320, 240], atol=1e-3)
    # Behind camera -> FRONT flag.
    clip_b = vx.transform_points4(jnp.array([[0.0, 0.0, -10.0]]), total)
    assert int(vx.clip_flags(clip_b)[0]) & vx.VXCLIP_FRONT
    # Far off to the left -> LEFT flag.
    clip_l = vx.transform_points4(jnp.array([[-100.0, 0.0, 10.0]]), total)
    assert int(vx.clip_flags(clip_l)[0]) & vx.VXCLIP_LEFT
    # +Y in world -> screen y decreases (D3D viewport flips y).
    clip_u = vx.transform_points4(jnp.array([[0.0, 1.0, 10.0]]), total)
    scr_u = vx.clip_to_screen(clip_u, 0, 0, 640, 480)
    assert float(scr_u[0, 1]) < 240


def test_quat_roundtrip_and_slerp():
    q = vx.quat_from_axis_angle([0.0, 1.0, 0.0], 0.9)
    m = vx.quat_to_matrix(q)
    q2 = vx.quat_from_matrix(m)
    d = abs(float(jnp.sum(q * q2)))
    assert d == pytest.approx(1.0, abs=1e-5)
    # slerp endpoints
    a = vx.quat_from_axis_angle([0, 0, 1], 0.0)
    b = vx.quat_from_axis_angle([0, 0, 1], 1.0)
    np.testing.assert_allclose(np.asarray(vx.quat_slerp(a, b, 0.0)), np.asarray(a), atol=1e-6)
    mid = vx.quat_slerp(a, b, 0.5)
    expect = vx.quat_from_axis_angle([0, 0, 1], 0.5)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(expect), atol=1e-5)


def test_quat_matrix_matches_axis_angle_matrix():
    axis, ang = jnp.array([1.0, -2.0, 0.5]), 1.2
    m1 = vx.rotation_axis_angle(axis, ang)
    m2 = vx.quat_to_matrix(vx.quat_from_axis_angle(axis, ang))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_compose_decompose_prs():
    pos = jnp.array([1.0, 2.0, 3.0])
    rot = vx.quat_from_axis_angle([0.3, 0.8, -0.2], 0.6)
    scale = jnp.array([2.0, 0.5, 1.5])
    m = vx.compose_prs(pos, rot, scale)
    p2, r2, s2 = vx.decompose_prs(m)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(scale), atol=1e-5)
    assert abs(float(jnp.sum(rot * r2))) == pytest.approx(1.0, abs=1e-4)
    # And scale-first ordering: unit +X scaled by 2 then rotated then moved.
    p = vx.transform_points(jnp.array([1.0, 0.0, 0.0]), m)
    expect = vx.transform_vectors(jnp.array([2.0, 0.0, 0.0]), vx.quat_to_matrix(rot)) + pos
    np.testing.assert_allclose(np.asarray(p), np.asarray(expect), atol=1e-5)


def test_box_visibility_classification():
    proj = vx.perspective(jnp.pi / 2, 1.0, 1.0, 100.0)
    # Box fully in front of camera, small -> ALLINSIDE.
    v = fr.box_visibility(proj, jnp.array([-1.0, -1.0, 9.0]), jnp.array([1.0, 1.0, 11.0]))
    assert int(v) == vx.CBV_ALLINSIDE
    # Box behind camera -> OFFSCREEN.
    v = fr.box_visibility(proj, jnp.array([-1.0, -1.0, -20.0]), jnp.array([1.0, 1.0, -10.0]))
    assert int(v) == vx.CBV_OFFSCREEN
    # Box straddling the left clip plane -> VISIBLE.
    v = fr.box_visibility(proj, jnp.array([-50.0, -1.0, 9.0]), jnp.array([1.0, 1.0, 11.0]))
    assert int(v) == vx.CBV_VISIBLE


def test_box_visibility_batched():
    proj = vx.perspective(jnp.pi / 2, 1.0, 1.0, 100.0)
    bmin = jnp.array([[-1.0, -1.0, 9.0], [-1.0, -1.0, -20.0]])
    bmax = jnp.array([[1.0, 1.0, 11.0], [1.0, 1.0, -10.0]])
    v = fr.box_visibility(proj, bmin, bmax)
    assert v.shape == (2,)
    assert int(v[0]) == vx.CBV_ALLINSIDE and int(v[1]) == vx.CBV_OFFSCREEN


def test_transform_box_2d_extents():
    proj = vx.perspective(jnp.pi / 2, 1.0, 1.0, 100.0)
    orf, andf, ext = fr.transform_box_2d(
        proj, jnp.array([-1.0, -1.0, 9.0]), jnp.array([1.0, 1.0, 11.0]), 0, 0, 640, 480
    )
    ext = np.asarray(ext)
    # Centered box -> extents centered around (320,240), left<right, top<bottom.
    assert ext[0] < 320 < ext[2]
    assert ext[1] < 240 < ext[3]
    assert int(andf) == 0 and int(orf) == 0


def test_ray_triangle_and_box():
    hit, t, u, v = fr.ray_triangles(
        jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, -1.0, 0.0]), jnp.array([1.0, -1.0, 0.0]), jnp.array([0.0, 1.0, 0.0]),
    )
    assert bool(hit) and float(t) == pytest.approx(5.0)
    hitb, tb = fr.ray_box(
        jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
    )
    assert bool(hitb) and float(tb) == pytest.approx(4.0)
    miss, _, _, _ = fr.ray_triangles(
        jnp.array([5.0, 5.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
        jnp.array([-1.0, -1.0, 0.0]), jnp.array([1.0, -1.0, 0.0]), jnp.array([0.0, 1.0, 0.0]),
    )
    assert not bool(miss)


def test_look_at():
    m = vx.look_at(jnp.array([0.0, 0.0, -10.0]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(m)[3, :3], [0, 0, -10], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m)[2, :3], [0, 0, 1], atol=1e-6)  # +Z forward


class TestNumpyTwins:
    """Host-side np_* math must match the traced jnp versions exactly —
    host queries and device programs disagree otherwise."""

    def test_rotation_axis_angle(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            axis = rng.normal(size=3)
            ang = rng.uniform(-np.pi, np.pi)
            a = vx.np_rotation_axis_angle(axis, ang)
            b = np.asarray(vx.rotation_axis_angle(
                jnp.asarray(axis / np.linalg.norm(axis), jnp.float32),
                jnp.asarray(ang, jnp.float32)))
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_perspective_orthographic(self):
        a = vx.np_perspective(0.6, 1.5, 0.5, 500.0)
        b = np.asarray(vx.perspective(0.6, 1.5, 0.5, 500.0))
        np.testing.assert_allclose(a, b, atol=1e-5)
        a = vx.np_orthographic(2.0, 1.25, 1.0, 100.0)
        b = np.asarray(vx.orthographic(2.0, 1.25, 1.0, 100.0))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_compose_decompose_prs(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            p = rng.normal(size=3).astype(np.float32)
            q = rng.normal(size=4).astype(np.float32)
            q /= np.linalg.norm(q)
            s = rng.uniform(0.5, 2.0, 3).astype(np.float32)
            a = vx.np_compose_prs(p, q, s)
            b = np.asarray(vx.compose_prs(jnp.asarray(p), jnp.asarray(q),
                                          jnp.asarray(s)))
            np.testing.assert_allclose(a, b, atol=1e-5)
            # decompose round-trip
            p2, q2, s2 = vx.np_decompose_prs(a)
            m2 = vx.np_compose_prs(p2, q2, s2)
            np.testing.assert_allclose(m2, a, atol=1e-4)

    def test_quat_slerp(self):
        rng = np.random.default_rng(2)
        for _ in range(5):
            qa = rng.normal(size=4).astype(np.float32)
            qa /= np.linalg.norm(qa)
            qb = rng.normal(size=4).astype(np.float32)
            qb /= np.linalg.norm(qb)
            t = float(rng.uniform())
            a = vx.np_quat_slerp(qa, qb, t)
            b = np.asarray(vx.quat_slerp(jnp.asarray(qa), jnp.asarray(qb), t))
            assert min(np.linalg.norm(a - b), np.linalg.norm(a + b)) < 1e-4

    def test_doubling_compose_matches_levels(self):
        from ckrenderengine_tpu.scene.entity_table import (
            compose_world, compose_world_doubling, compute_levels,
        )

        rng = np.random.default_rng(3)
        n = 20
        parent = np.full(n, -1, np.int32)
        for i in range(1, n):
            parent[i] = rng.integers(0, i)
        local = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        local[:, 3, :3] = rng.normal(size=(n, 3))
        levels = tuple(tuple(int(x) for x in l) for l in compute_levels(parent))
        a = np.asarray(compose_world(jnp.asarray(local), jnp.asarray(parent),
                                     levels))
        b = np.asarray(compose_world_doubling(jnp.asarray(local),
                                              jnp.asarray(parent), n))
        np.testing.assert_allclose(a, b, atol=1e-5)
