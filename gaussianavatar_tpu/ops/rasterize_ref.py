"""Brute-force reference splatter (pure jnp, autodiff-differentiable).

Semantics lock for the fast tile-binned path: every pixel alpha-blends ALL
gaussians in global depth order with exactly the CUDA rasterizer's gating
rules (power>0 skip, alpha<1/255 skip, 0.99 alpha clamp, early termination
when transmittance would drop below 1e-4). O(N * H * W) — use only for tests
and tiny scenes. The early-termination recurrence is rewritten as cumulative
products/or-scans so the whole thing is branchless and exactly autodiffable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussianavatar_tpu.ops.projection import ProjectedGaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _clamp_alpha_straight_through(alpha_raw: jax.Array) -> jax.Array:
    """min(alpha, 0.99) in the forward pass but identity in the backward pass,
    matching the CUDA backward which ignores the clamp when propagating
    dL/dG = opacity * dL/dalpha (graphdeco backward.cu renderCUDA)."""
    return alpha_raw + jax.lax.stop_gradient(jnp.minimum(alpha_raw, ALPHA_MAX) - alpha_raw)


def blend_pixels(
    px: jax.Array,          # (P,) pixel x coords (float)
    py: jax.Array,          # (P,) pixel y coords
    means2d: jax.Array,     # (K, 2) depth-ordered
    conics: jax.Array,      # (K, 3)
    colors: jax.Array,      # (K, 3)
    opacities: jax.Array,   # (K,)
    active: jax.Array,      # (K,) bool: gaussian participates at all
):
    """Blend K depth-ordered gaussians into P pixels.

    Returns (premult_color (P,3), final_T (P,), n_contrib (P,) int32,
    done (P,) bool — True where the CUDA early-termination rule fired, i.e.
    the pixel must accept NO further contributions even from a continuation
    segment); the caller adds final_T * bg.
    """
    dx = px[None, :] - means2d[:, 0:1]  # (K, P)
    dy = py[None, :] - means2d[:, 1:2]
    a, b, c = conics[:, 0:1], conics[:, 1:2], conics[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = _clamp_alpha_straight_through(opacities[:, None] * jnp.exp(power))
    gate = active[:, None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(gate, alpha, 0.0)

    one_minus = 1.0 - alpha
    # exclusive cumprod along the gaussian axis: T before gaussian i
    T_before = jnp.concatenate(
        [jnp.ones_like(one_minus[:1]), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0
    )

    test_T = T_before * one_minus
    trigger = gate & (test_T < T_EPS)
    done = jnp.cumsum(trigger.astype(jnp.int32), axis=0) > 0  # inclusive OR-scan
    contrib = gate & (~done)

    weight = jnp.where(contrib, alpha * T_before, 0.0)  # (K, P)
    color = jnp.matmul(weight.T, colors, precision=jax.lax.Precision.HIGHEST)  # (P, 3)

    log1m = jnp.where(contrib, jnp.log1p(-alpha), 0.0)
    final_T = jnp.exp(jnp.sum(log1m, axis=0))  # (P,)

    idx = jnp.arange(1, alpha.shape[0] + 1, dtype=jnp.int32)[:, None]
    n_contrib = jnp.max(jnp.where(contrib, idx, 0), axis=0)
    return color, final_T, n_contrib, done[-1]


def rasterize_brute(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    bg: jax.Array,
    height: int,
    width: int,
    pixel_chunk: int = 4096,
) -> jax.Array:
    """Render (3, H, W) by brute force. Gaussians with radius<=0 are skipped."""
    opacities = opacities.reshape(-1)
    order = jnp.argsort(jnp.where(proj.radii > 0, proj.depths, jnp.inf), stable=True)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    cols = colors[order]
    ops = opacities[order]
    active = proj.radii[order] > 0

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=means2d.dtype),
        jnp.arange(width, dtype=means2d.dtype),
        indexing="ij",
    )
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    P = px.shape[0]
    pad = (-P) % pixel_chunk
    px = jnp.pad(px, (0, pad))
    py = jnp.pad(py, (0, pad))
    n_chunks = px.shape[0] // pixel_chunk

    def chunk_fn(i):
        s = i * pixel_chunk
        premult, final_T, _, _ = blend_pixels(
            jax.lax.dynamic_slice_in_dim(px, s, pixel_chunk),
            jax.lax.dynamic_slice_in_dim(py, s, pixel_chunk),
            means2d, conics, cols, ops, active,
        )
        return premult + final_T[:, None] * bg[None, :]

    chunks = jax.lax.map(chunk_fn, jnp.arange(n_chunks))
    img = chunks.reshape(-1, 3)[:P]
    return img.reshape(height, width, 3).transpose(2, 0, 1)
