"""pop_upsample must reproduce the reference's grid_sample-based feature
upsampling exactly (network.py:65-67 + modules.py:745-754 + the
getIdxMap uv convention, general_utils.py:165-176)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gaussianavatar_tpu.ops.resample import grid_sample, pop_upsample


def reference_grid_sample_upsample(feat_nchw: np.ndarray, uv_res: int) -> np.ndarray:
    """The reference pipeline in torch: build the uv idx map (y,x)/(R-1),
    reshape *2-1, transpose(1,2), F.grid_sample(align_corners=False)."""
    B = feat_nchw.shape[0]
    ys, xs = np.meshgrid(np.arange(uv_res), np.arange(uv_res), indexing="ij")
    uv = np.stack([ys, xs], -1).reshape(-1, 2).astype(np.float32) / (uv_res - 1)
    uv = np.broadcast_to(uv[None], (B, uv_res * uv_res, 2))
    grid = torch.from_numpy(uv.copy()).reshape(B, uv_res, uv_res, 2) * 2 - 1
    grid = grid.transpose(1, 2)
    with torch.no_grad():
        out = F.grid_sample(torch.from_numpy(feat_nchw), grid, mode="bilinear", align_corners=False)
    return out.numpy()


def test_pop_upsample_matches_reference_grid_sample():
    rng = np.random.default_rng(0)
    B, C, F_, R = 2, 8, 16, 64
    feat = rng.normal(size=(B, C, F_, F_)).astype(np.float32)
    ref = reference_grid_sample_upsample(feat, R)  # (B, C, R, R)
    ours = pop_upsample(jnp.asarray(np.transpose(feat, (0, 2, 3, 1))), R)
    np.testing.assert_allclose(
        np.transpose(ref, (0, 2, 3, 1)), np.asarray(ours), atol=1e-5
    )


def test_pop_upsample_identity_when_same_res():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 4)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(pop_upsample(x, 8)), np.asarray(x))


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(2, 5, 9, 11)).astype(np.float32)  # NCHW
    grid = rng.uniform(-1.2, 1.2, size=(2, 6, 7, 2)).astype(np.float32)
    with torch.no_grad():
        ref = F.grid_sample(
            torch.from_numpy(feat), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy()
    ours = grid_sample(jnp.asarray(np.transpose(feat, (0, 2, 3, 1))), jnp.asarray(grid))
    np.testing.assert_allclose(np.transpose(ref, (0, 2, 3, 1)), np.asarray(ours), atol=1e-5)


def test_pop_upsample_differentiable():
    x = jnp.ones((1, 4, 4, 2))
    g = jax.grad(lambda x: pop_upsample(x, 16).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
