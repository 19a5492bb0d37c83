import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.camera import Camera
from gaussianavatar_tpu.ops.projection import project_gaussians
from gaussianavatar_tpu.ops.rasterize_ref import rasterize_brute


def simple_camera(h=32, w=32, f=40.0):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    return Camera.from_extrinsics(np.eye(3, dtype=np.float32), np.array([0, 0, 2.0], np.float32), K, h, w)


def _project(cam, means, scales, quats):
    return project_gaussians(
        means, scales, quats,
        cam.world_view_transform, cam.full_proj_transform,
        cam.tan_fovx, cam.tan_fovy, cam.height, cam.width,
    )


def test_empty_scene_is_background():
    cam = simple_camera()
    means = jnp.array([[0.0, 0.0, -5.0]])  # behind the camera -> culled
    scales = jnp.full((1, 3), 0.1)
    quats = jnp.array([[1.0, 0, 0, 0]])
    proj = _project(cam, means, scales, quats)
    assert float(proj.radii[0]) == 0.0
    img = rasterize_brute(proj, jnp.ones((1, 3)), jnp.ones((1,)), jnp.array([1.0, 0.5, 0.25]), cam.height, cam.width)
    np.testing.assert_allclose(np.asarray(img[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img[1]), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img[2]), 0.25, atol=1e-6)


def test_single_gaussian_analytic_alpha():
    """A lone isotropic gaussian at the camera axis: the center pixel color
    must be c*alpha + (1-alpha)*bg with alpha from the projected conic."""
    cam = simple_camera()
    means = jnp.array([[0.0, 0.0, 0.0]])  # depth 2 in view space
    s = 0.05
    scales = jnp.full((1, 3), s)
    quats = jnp.array([[1.0, 0, 0, 0]])
    opac = jnp.array([0.8])
    color = jnp.array([[0.2, 0.9, 0.4]])
    bg = jnp.zeros(3)
    proj = _project(cam, means, scales, quats)
    img = rasterize_brute(proj, color, opac, bg, cam.height, cam.width)

    mx, my = float(proj.means2d[0, 0]), float(proj.means2d[0, 1])
    a, b, c = [float(v) for v in proj.conics[0]]
    # nearest pixel center
    pxi, pyi = round(mx), round(my)
    dx, dy = pxi - mx, pyi - my
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = min(0.99, 0.8 * np.exp(power))
    expected = np.array([0.2, 0.9, 0.4]) * alpha
    got = np.asarray(img[:, pyi, pxi])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_depth_ordering_front_occludes_back():
    cam = simple_camera()
    # two identical gaussians; red in front (closer), green behind
    means = jnp.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]])  # view z = 2.5, 1.5
    scales = jnp.full((2, 3), 0.3)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([0.95, 0.95])
    colors = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])  # far=green, near=red
    proj = _project(cam, means, scales, quats)
    img = rasterize_brute(proj, colors, opac, jnp.zeros(3), cam.height, cam.width)
    center = np.asarray(img[:, 16, 16])
    # near (red) dominates: contributes alpha~0.95, green only 0.05*0.95
    assert center[0] > 0.9
    assert center[1] < 0.1


def test_alpha_saturation_early_termination():
    """Stack many near-opaque gaussians: transmittance must floor near 0 and
    the background must not leak through."""
    cam = simple_camera()
    n = 50
    means = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.linspace(-0.5, 0.5, n)], axis=1)
    scales = jnp.full((n, 3), 0.4)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opac = jnp.full((n,), 0.9)
    colors = jnp.full((n, 3), 0.5)
    proj = _project(cam, means, scales, quats)
    img = rasterize_brute(proj, colors, opac, jnp.ones(3), cam.height, cam.width)
    center = np.asarray(img[:, 16, 16])
    np.testing.assert_allclose(center, 0.5, atol=1e-3)


def test_gradients_finite_and_match_fd():
    cam = simple_camera(h=16, w=16, f=20.0)
    rng = np.random.default_rng(0)
    n = 5
    means = jnp.asarray(rng.normal(scale=0.2, size=(n, 3)).astype(np.float32))
    scales = jnp.asarray(np.full((n, 3), 0.15, np.float32))
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opac = jnp.asarray(rng.uniform(0.3, 0.7, size=(n,)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    target = jnp.zeros((3, 16, 16))

    def loss(means, scales, colors, opac):
        proj = _project(cam, means, scales, quats)
        img = rasterize_brute(proj, colors, opac, bg, cam.height, cam.width)
        return ((img - target) ** 2).mean()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(means, scales, colors, opac)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()

    # finite differences on a few coordinates of means
    eps = 1e-3
    f0 = float(loss(means, scales, colors, opac))
    for (i, j) in [(0, 0), (2, 1), (4, 2)]:
        m2 = means.at[i, j].add(eps)
        m1 = means.at[i, j].add(-eps)
        fd = (float(loss(m2, scales, colors, opac)) - float(loss(m1, scales, colors, opac))) / (2 * eps)
        an = float(grads[0][i, j])
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd), abs(an)), (i, j, fd, an)
