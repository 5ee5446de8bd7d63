import numpy as np
import jax
import jax.numpy as jnp

from mad_tpu.core.geometry import (apply_rigid, axis_angle_mat, kabsch,
                                   random_rotation, rmsd, rotation_about_z,
                                   rotation_to_pole, spherical_angles, unit)


def test_axis_angle_orthonormal():
    key = jax.random.PRNGKey(0)
    ax = unit(jax.random.normal(key, (5, 3)))
    ang = jax.random.uniform(jax.random.PRNGKey(1), (5,)) * np.pi
    R = axis_angle_mat(ax, ang)
    eye = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-6)


def test_axis_angle_matches_reference_formula():
    # Reference convention (mad/math_utils.py:15-27): the negated-sin
    # quaternion combined with the row layout makes R @ v the standard
    # right-handed rotation: +90 deg about z sends x to +y.
    R = np.asarray(axis_angle_mat(jnp.array([0.0, 0, 1]), jnp.array(np.pi / 2)))
    v = np.array([1.0, 0, 0])
    np.testing.assert_allclose(R @ v, [0, 1, 0], atol=1e-6)


def test_rotation_to_pole():
    key = jax.random.PRNGKey(3)
    v = unit(jax.random.normal(key, (8, 3)))
    R = rotation_to_pole(v)
    # Following the pipeline's application convention (dirs @ R.T),
    # the source vector must land on +z.
    out = jnp.einsum("bij,bj->bi", R, v)
    # R @ v with the reference's sign convention maps v to +z
    np.testing.assert_allclose(np.asarray(out[:, 2]), 1.0, atol=1e-5)


def test_kabsch_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 3)) * 10
    R_true = np.asarray(random_rotation(jax.random.PRNGKey(7)))
    t_true = np.array([5.0, -3.0, 2.0])
    y = x @ R_true + t_true
    R, T = kabsch(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(T), t_true, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(apply_rigid(jnp.asarray(x), R, T)), y, atol=1e-4)


def test_kabsch_reflection_guard():
    # Mirror-image clouds must still produce a proper rotation (det=+1).
    rng = np.random.default_rng(1)
    x = rng.normal(size=(20, 3))
    y = x.copy()
    y[:, 0] *= -1
    R, T = kabsch(jnp.asarray(x), jnp.asarray(y))
    assert np.linalg.det(np.asarray(R)) > 0.99


def test_spherical_angles_ranges():
    v = unit(jax.random.normal(jax.random.PRNGKey(5), (100, 3)))
    th, ph = spherical_angles(v)
    assert np.all((np.asarray(th) >= 0) & (np.asarray(th) < 2 * np.pi))
    assert np.all((np.asarray(ph) >= 0) & (np.asarray(ph) <= np.pi))


def test_rmsd():
    a = jnp.zeros((4, 3))
    b = jnp.ones((4, 3))
    np.testing.assert_allclose(float(rmsd(a, b)), np.sqrt(3), atol=1e-6)
