import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gaussianavatar_tpu.ops.rotations import (
    axis_angle_to_matrix,
    euler_angles_to_matrix,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    quaternion_to_matrix,
)


def test_axis_angle_matches_scipy():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(64, 3)).astype(np.float32)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(vecs)))
    ref = Rotation.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_axis_angle_zero_is_identity():
    out = np.asarray(axis_angle_to_matrix(jnp.zeros((1, 3))))
    np.testing.assert_allclose(out[0], np.eye(3), atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(32, 3)).astype(np.float32)
    R = axis_angle_to_matrix(jnp.asarray(vecs))
    back = np.asarray(matrix_to_axis_angle(R))
    ref = Rotation.from_matrix(np.asarray(R)).as_rotvec()
    # rotvec is unique up to 2pi wrap; scipy returns the canonical one
    np.testing.assert_allclose(back, ref, atol=1e-4)


def test_quaternion_matches_scipy():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    # scipy uses xyzw order
    ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_matrix_to_quaternion_roundtrip():
    rng = np.random.default_rng(3)
    R = Rotation.random(50, random_state=4).as_matrix().astype(np.float32)
    q = matrix_to_quaternion(jnp.asarray(R))
    R2 = np.asarray(quaternion_to_matrix(q))
    np.testing.assert_allclose(R2, R, atol=1e-4)


@pytest.mark.parametrize("conv", ["XYZ", "ZYX"])
def test_euler_matches_scipy(conv):
    rng = np.random.default_rng(5)
    angles = rng.uniform(-np.pi, np.pi, size=(16, 3)).astype(np.float32)
    ours = np.asarray(euler_angles_to_matrix(jnp.asarray(angles), conv))
    # pytorch3d/our convention == scipy intrinsic (capital letters)
    ref = Rotation.from_euler(conv, angles).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_canonical_pose_constants():
    """The reference's canonical A-pose: legs +-30 deg about z of hip joints
    (reference arguments/__init__.py:44-53)."""
    from gaussianavatar_tpu.config import smpl_canonical_pose

    cpose = smpl_canonical_pose()
    assert cpose.shape == (72,)
    assert abs(cpose[5] - np.pi / 6) < 1e-6
    assert abs(cpose[8] + np.pi / 6) < 1e-6
    assert np.count_nonzero(cpose) == 2
