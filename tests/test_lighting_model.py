"""Fixed-function lighting model semantics (reference RCKLight::Setup,
src/CKLight.cpp:592-656 + D3D9 fixed-function rules): attenuation, range
cutoff, spot cones, specular power/flag, light power scaling, prelit mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.pipeline.lighting import (
    LightArray, MaterialLighting, compute_vertex_lighting, fog_factor,
)
from ckrenderengine_tpu.raster.types import VXFOG, VXLIGHT


def _one_light(**kw):
    la = LightArray.zeros(1)
    d = {f: np.asarray(getattr(la, f)).copy() for f in LightArray._fields}
    d["active"][0] = True
    d["type"][0] = kw.pop("type", int(VXLIGHT.POINT))
    d["diffuse"][0] = kw.pop("diffuse", (1, 1, 1, 1))
    for k, v in kw.items():
        d[k][0] = v
    return LightArray(**{k: jnp.asarray(v) for k, v in d.items()})


def _mat(v=1, power=0.0):
    one = jnp.ones((v, 4), jnp.float32)
    return MaterialLighting(
        diffuse=one, ambient=jnp.zeros((v, 4)), specular=one,
        emissive=jnp.zeros((v, 4)), power=jnp.full((v,), power, jnp.float32))


def _lit(pos, normal, lights, power=0.0, cam=(0, 0, -5)):
    pos = jnp.asarray(pos, jnp.float32).reshape(-1, 3)
    normal = jnp.asarray(normal, jnp.float32).reshape(-1, 3)
    d, s = compute_vertex_lighting(
        pos, normal, _mat(pos.shape[0], power), lights,
        jnp.zeros(4, jnp.float32), jnp.asarray(cam, jnp.float32))
    return np.asarray(d), np.asarray(s)


class TestAttenuation:
    def test_quadratic_falloff(self):
        la = _one_light(position=(0, 0, 0), attenuation=(0, 0, 1), range=100.0)
        d1, _ = _lit((1, 0, 0), (-1, 0, 0), la)
        d2, _ = _lit((2, 0, 0), (-1, 0, 0), la)
        assert d1[0, 0] == pytest.approx(1.0, abs=1e-5)         # 1/d² = 1
        assert d2[0, 0] == pytest.approx(0.25, abs=1e-5)        # 1/4

    def test_range_cutoff(self):
        la = _one_light(position=(0, 0, 0), attenuation=(1, 0, 0), range=5.0)
        din, _ = _lit((4, 0, 0), (-1, 0, 0), la)
        dout, _ = _lit((6, 0, 0), (-1, 0, 0), la)
        assert din[0, 0] > 0.9
        assert dout[0, 0] == pytest.approx(0.0, abs=1e-6)

    def test_directional_ignores_distance(self):
        la = _one_light(type=int(VXLIGHT.DIREC), direction=(0, 0, 1))
        near, _ = _lit((0, 0, 1), (0, 0, -1), la)
        far, _ = _lit((0, 0, 500), (0, 0, -1), la)
        assert near[0, 0] == pytest.approx(far[0, 0], abs=1e-6)
        assert near[0, 0] > 0.9


class TestSpot:
    def test_cone_inside_outside(self):
        la = _one_light(type=int(VXLIGHT.SPOT), position=(0, 0, 0),
                        direction=(0, 0, 1), attenuation=(1, 0, 0),
                        range=100.0,
                        cos_theta=np.cos(0.2), cos_phi=np.cos(0.5))
        inside, _ = _lit((0, 0, 5), (0, 0, -1), la)      # on axis
        outside, _ = _lit((10, 0, 5), (-1, 0, 0), la)    # far off axis
        assert inside[0, 0] > 0.9
        assert outside[0, 0] == pytest.approx(0.0, abs=1e-5)

    def test_penumbra_between_cones(self):
        la = _one_light(type=int(VXLIGHT.SPOT), position=(0, 0, 0),
                        direction=(0, 0, 1), attenuation=(1, 0, 0),
                        range=100.0, falloff=1.0,
                        cos_theta=np.cos(0.1), cos_phi=np.cos(0.8))
        # point at ~0.45 rad off axis: inside outer, outside inner
        p = (np.tan(0.45) * 5, 0, 5)
        mid, _ = _lit(p, tuple(-np.asarray(p) / np.linalg.norm(p)), la)
        assert 0.05 < mid[0, 0] < 0.95


class TestSpecular:
    def test_power_sharpens_highlight(self):
        la = _one_light(type=int(VXLIGHT.DIREC), direction=(0, 0, 1),
                        specular=(1, 1, 1, 1))
        # aligned normal: halfway = normal -> strong highlight at any power
        _, s_low = _lit((0, 0, 0), (0, 0, -1), la, power=2.0)
        _, s_high = _lit((0, 0, 0), (0, 0, -1), la, power=50.0)
        assert s_low[0, 0] > 0.9 and s_high[0, 0] > 0.9
        # tilted normal: high power kills the highlight faster
        n = np.array([0.5, 0, -1.0])
        n = n / np.linalg.norm(n)
        _, s_low_t = _lit((0, 0, 0), n, la, power=2.0)
        _, s_high_t = _lit((0, 0, 0), n, la, power=50.0)
        assert s_high_t[0, 0] < s_low_t[0, 0]

    def test_specular_off_below_power_threshold(self):
        la = _one_light(type=int(VXLIGHT.DIREC), direction=(0, 0, 1),
                        specular=(1, 1, 1, 1))
        _, s = _lit((0, 0, 0), (0, 0, -1), la, power=0.01)
        assert s[0, 0] == pytest.approx(0.0, abs=1e-6)   # SPECULARENABLE rule


class TestFog:
    def test_linear_fog_factor(self):
        z = jnp.asarray([0.0, 5.0, 10.0, 20.0])
        f = np.asarray(fog_factor(z, jnp.asarray(int(VXFOG.LINEAR)),
                                  jnp.asarray(0.0), jnp.asarray(10.0),
                                  jnp.asarray(1.0)))
        assert f[0] == pytest.approx(1.0, abs=1e-5)      # at start: no fog
        assert f[1] == pytest.approx(0.5, abs=1e-5)
        assert f[2] == pytest.approx(0.0, abs=1e-5)      # at end: full fog
        assert f[3] == pytest.approx(0.0, abs=1e-5)

    def test_exp_fog_density(self):
        z = jnp.asarray([1.0])
        f1 = np.asarray(fog_factor(z, jnp.asarray(int(VXFOG.EXP)),
                                   jnp.asarray(0.0), jnp.asarray(1.0),
                                   jnp.asarray(1.0)))
        f2 = np.asarray(fog_factor(z, jnp.asarray(int(VXFOG.EXP2)),
                                   jnp.asarray(0.0), jnp.asarray(1.0),
                                   jnp.asarray(1.0)))
        assert f1[0] == pytest.approx(np.exp(-1.0), abs=1e-4)
        assert f2[0] == pytest.approx(np.exp(-1.0), abs=1e-4)
