import math

import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.camera import (
    Camera,
    focal2fov,
    fov2focal,
    projection_from_fov,
    projection_from_intrinsics,
    world_to_view,
)


def _look_at_identity():
    return np.eye(3, dtype=np.float32), np.array([0.0, 0.0, 2.0], np.float32)


def test_fov_focal_roundtrip():
    for focal, pixels in [(500.0, 512), (1111.0, 1024)]:
        fov = focal2fov(focal, pixels)
        assert abs(fov2focal(fov, pixels) - focal) < 1e-6


def test_world_to_view_identity():
    R, t = _look_at_identity()
    w2v = world_to_view(R, t)
    expected = np.eye(4, dtype=np.float32)
    expected[:3, 3] = t
    np.testing.assert_allclose(w2v, expected, atol=1e-6)


def test_world_to_view_inverse_property():
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    # dataset convention: R is stored transposed (dataset_mono.py:165)
    R = Rotation.random(random_state=1).as_matrix().astype(np.float32).T
    t = rng.normal(size=3).astype(np.float32)
    w2v = world_to_view(R, t)
    # camera center must map to origin
    cam_center = np.linalg.inv(w2v)[:3, 3]
    mapped = w2v @ np.append(cam_center, 1.0)
    np.testing.assert_allclose(mapped[:3], 0.0, atol=1e-5)


def test_projection_centered_K_matches_fov():
    """With a perfectly centered principal point, the intrinsics-based frustum
    equals the symmetric-FoV frustum."""
    h = w = 512
    fx = fy = 600.0
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32)
    P_k = projection_from_intrinsics(0.01, 100.0, K, h, w)
    P_fov = projection_from_fov(0.01, 100.0, focal2fov(fx, w), focal2fov(fy, h))
    np.testing.assert_allclose(P_k, P_fov, atol=1e-6)


def test_projection_maps_frustum_corners():
    h = w = 256
    fx = fy = 300.0
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32)
    znear, zfar = 0.01, 100.0
    P = projection_from_intrinsics(znear, zfar, K, h, w)

    # a point on the +x frustum boundary at depth z maps to ndc x=+1
    z = 5.0
    x_edge = (w / 2) * z / fx
    p = P @ np.array([x_edge, 0, z, 1.0])
    assert abs(p[0] / p[3] - 1.0) < 1e-6
    # near plane -> ndc z=0, far plane -> ndc z=1 (3DGS convention)
    pn = P @ np.array([0, 0, znear, 1.0])
    pf = P @ np.array([0, 0, zfar, 1.0])
    assert abs(pn[2] / pn[3]) < 1e-5
    assert abs(pf[2] / pf[3] - 1.0) < 1e-5


def test_camera_container_projects_point_to_pixel():
    h = w = 128
    fx = fy = 150.0
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32)
    R, t = _look_at_identity()
    cam = Camera.from_extrinsics(R, t, K, h, w)

    # world point at (0.1, -0.05, 1.0) in front of camera at z=+2
    pw = jnp.array([0.1, -0.05, 1.0, 1.0])
    clip = pw @ cam.full_proj_transform
    ndc = clip[:3] / (clip[3] + 1e-9)
    px = ((float(ndc[0]) + 1) * w - 1) * 0.5
    py = ((float(ndc[1]) + 1) * h - 1) * 0.5
    depth = 3.0  # 1.0 + camera z offset 2.0
    expected_px = w / 2 + fx * 0.1 / depth - 0.5
    expected_py = h / 2 + fy * (-0.05) / depth - 0.5
    assert abs(px - expected_px) < 1e-3
    assert abs(py - expected_py) < 1e-3
    np.testing.assert_allclose(np.asarray(cam.camera_center), [0, 0, -2.0], atol=1e-5)
