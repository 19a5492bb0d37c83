import jax
import jax.numpy as jnp
import numpy as np

from gaussianavatar_tpu.ops.embedder import get_embedder
from gaussianavatar_tpu.ops.sh import C0, eval_sh, sh_to_colors


def test_sh_degree0_is_constant():
    rng = np.random.default_rng(0)
    sh = jnp.asarray(rng.normal(size=(10, 1, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(
        np.asarray(out), np.maximum(C0 * np.asarray(sh[:, 0]) + 0.5, 0.0), atol=1e-6
    )


def test_sh_degree1_view_dependence():
    sh = jnp.zeros((1, 4, 3)).at[0, 2, :].set(1.0)  # z-linear band
    up = eval_sh(1, sh, jnp.asarray([[0.0, 0.0, 1.0]]))
    down = eval_sh(1, sh, jnp.asarray([[0.0, 0.0, -1.0]]))
    assert float(up[0, 0]) > float(down[0, 0])
    # clamped at zero
    assert float(down.min()) >= 0.0


def test_sh_rasterize_integration():
    """rasterize(shs=...) must render view-dependent colors."""
    from gaussianavatar_tpu.ops.camera import Camera
    from gaussianavatar_tpu.ops.rasterize import RasterizeConfig, rasterize

    K = np.array([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], np.float32)
    cam = Camera.from_extrinsics(
        np.eye(3, dtype=np.float32), np.array([0, 0, 2.0], np.float32), K, 32, 32
    )
    n = 4
    means = jnp.asarray(np.random.default_rng(1).normal(scale=0.1, size=(n, 3)).astype(np.float32))
    sh = jnp.zeros((n, 1, 3)).at[:, 0, 0].set(1.0)
    img = rasterize(
        means, None, jnp.full((n, 3), 0.1), jnp.zeros((n, 4)).at[:, 0].set(1.0),
        jnp.ones((n,)), cam, jnp.zeros(3),
        config=RasterizeConfig(tile_size=16, tile_capacity=64, backend="xla"),
        shs=sh, sh_degree=0,
    )
    assert np.isfinite(np.asarray(img)).all()
    assert float(img[0].max()) > 0.5  # red-dominant


def test_embedder_shapes_and_values():
    embed, out_dim = get_embedder(4, input_dims=2)
    x = jnp.asarray([[0.5, -0.25]])
    y = embed(x)
    assert y.shape == (1, out_dim)
    assert out_dim == 2 * (2 * 4 + 1)
    np.testing.assert_allclose(np.asarray(y[0, :2]), [0.5, -0.25], atol=1e-6)
    np.testing.assert_allclose(float(y[0, 2]), np.sin(0.5), atol=1e-6)
    np.testing.assert_allclose(float(y[0, 4]), np.cos(0.5), atol=1e-6)
    # multires 0 -> identity
    ident, d = get_embedder(0, input_dims=3)
    assert d == 3


def test_pop_with_pos_encoding():
    from gaussianavatar_tpu.models.pop import POPDecoder

    rng = np.random.default_rng(2)
    R = 32
    geom = jnp.asarray(rng.normal(scale=0.01, size=(1, 16, 16, 8)).astype(np.float32))
    valid = np.arange(100, dtype=np.int32)
    uv = jnp.asarray(rng.uniform(size=(100, 2)).astype(np.float32))
    m = POPDecoder(c_geom=8, hsize=32, nf=8, pos_encoding=True, num_emb_freqs=4)
    variables = m.init(jax.random.PRNGKey(0), geom, uv, jnp.asarray(valid), R)
    (xyz, s, c), _ = m.apply(variables, geom, uv, jnp.asarray(valid), R,
                             train=True, mutable=["batch_stats"])
    assert xyz.shape == (1, 100, 3)
