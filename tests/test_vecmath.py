"""Unit tests: core/vecmath vs numpy (reference Vec3, Serial/geometry.h:13-78)."""

import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.core import vecmath as vm


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_dot_cross_length():
    a, b = _rand((32, 3), 1), _rand((32, 3), 2)
    np.testing.assert_allclose(np.asarray(vm.dot(a, b)), np.sum(a * b, -1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vm.cross(a, b)), np.cross(a, b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vm.length(a)), np.linalg.norm(a, axis=-1), rtol=1e-6
    )


def test_normalize_safe_on_zero():
    a = np.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]], np.float32)
    out = np.asarray(vm.normalize(a))
    np.testing.assert_allclose(out[0], [0.6, 0.0, 0.8], rtol=1e-6)
    assert (out[1] == 0).all()  # reference's `if (nor2 > 0)` guard


def test_reflect():
    i = np.array([[1.0, -1.0, 0.0]], np.float32)
    n = np.array([[0.0, 1.0, 0.0]], np.float32)
    np.testing.assert_allclose(np.asarray(vm.reflect(i, n))[0], [1.0, 1.0, 0.0], atol=1e-7)


def test_det3_matches_numpy_and_expansion_order():
    m = _rand((50, 3, 3), 3).astype(np.float64)
    got = np.asarray(
        vm.det3(
            m[:, 0, 0], m[:, 0, 1], m[:, 0, 2],
            m[:, 1, 0], m[:, 1, 1], m[:, 1, 2],
            m[:, 2, 0], m[:, 2, 1], m[:, 2, 2],
        )
    )
    np.testing.assert_allclose(got, np.linalg.det(m), rtol=1e-9)
