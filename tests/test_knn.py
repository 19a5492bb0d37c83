import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.knn import aiap_loss, grid_knn, host_knn


def test_grid_knn_matches_exact():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(500, 3)).astype(np.float32)
    k = 4
    exact = host_knn(pts, k)
    # exactness contract: cell_size >= max k-NN radius (~0.13 for 500 pts in
    # the unit cube); 0.25 gives margin
    idx, dists = grid_knn(jnp.asarray(pts), k, cell_size=0.25, max_per_cell=32)
    idx = np.asarray(idx)
    # compare neighbor SETS (ordering ties may differ)
    agree = np.mean([len(set(exact[i]) & set(idx[i])) / k for i in range(len(pts))])
    assert agree > 0.98, agree
    # distances ascending and positive
    d = np.asarray(dists)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    assert (d > 0).all()


def test_aiap_zero_for_rigid_motion():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    nn = host_knn(pts, 5)
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    moved = pts @ R.T + np.array([0.3, -0.1, 2.0], np.float32)
    loss = float(aiap_loss(jnp.asarray(pts), jnp.asarray(moved), jnp.asarray(nn)))
    assert loss < 1e-5

    # non-isometric deformation is penalized
    stretched = pts * np.array([2.0, 1.0, 1.0], np.float32)
    loss2 = float(aiap_loss(jnp.asarray(pts), jnp.asarray(stretched), jnp.asarray(nn)))
    assert loss2 > 0.01


def test_aiap_differentiable():
    import jax

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    nn = jnp.asarray(host_knn(np.asarray(pts), 3))
    g = jax.grad(lambda x: aiap_loss(pts, x, nn))(pts * 1.1)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
