import jax.numpy as jnp
import numpy as np
from scipy.ndimage import convolve

from gaussianavatar_tpu.ops.ssim import l1_loss, psnr, ssim


def _ssim_numpy(img1, img2, window_size=11, sigma=1.5):
    """Independent scipy implementation of the reference SSIM
    (loss_utils.py:13-53): zero-padded depthwise gaussian filtering."""
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    w = np.outer(g, g)

    def filt(x):  # x: (B,C,H,W)
        out = np.empty_like(x)
        for b in range(x.shape[0]):
            for c in range(x.shape[1]):
                out[b, c] = convolve(x[b, c], w, mode="constant", cval=0.0)
        return out

    mu1, mu2 = filt(img1), filt(img2)
    s1 = filt(img1 * img1) - mu1**2
    s2 = filt(img2 * img2) - mu2**2
    s12 = filt(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
    return m.mean()


def test_ssim_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 3, 32, 32)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(img), jnp.asarray(img))) - 1.0) < 1e-5


def test_ssim_matches_scipy():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(2, 3, 24, 24)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _ssim_numpy(a.astype(np.float64), b.astype(np.float64))
    assert abs(ours - ref) < 1e-4


def test_ssim_differentiable():
    import jax

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(size=(1, 3, 16, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 3, 16, 16)).astype(np.float32))
    g = jax.grad(lambda x: 1.0 - ssim(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_psnr_and_l1():
    a = jnp.zeros((1, 3, 8, 8))
    b = jnp.ones((1, 3, 8, 8)) * 0.1
    assert abs(float(l1_loss(a, b)) - 0.1) < 1e-6
    assert abs(float(psnr(a, b)[0, 0]) - 20.0) < 1e-4
