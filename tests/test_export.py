import numpy as np

from gaussianavatar_tpu.engine.export import export_gaussians_ply, load_gaussians_ply


def test_3dgs_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 100
    means = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(1e-3, 0.1, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.1, 0.99, size=(n,)).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=-1, keepdims=True)

    path = str(tmp_path / "g.ply")
    export_gaussians_ply(path, means, colors, scales, opac, rots)

    # header is the standard 3DGS layout any viewer expects
    head = open(path, "rb").read(800).decode("ascii", errors="ignore")
    for prop in ("f_dc_0", "opacity", "scale_0", "rot_3"):
        assert f"property float {prop}" in head

    back = load_gaussians_ply(path)
    np.testing.assert_allclose(back["means"], means, atol=1e-6)
    np.testing.assert_allclose(back["colors"], colors, atol=1e-5)
    np.testing.assert_allclose(back["scales"], scales, rtol=1e-4)
    np.testing.assert_allclose(back["opacities"], opac, atol=1e-4)
    np.testing.assert_allclose(back["rotations"], rots, atol=1e-6)
